"""Join operators Spark lacks natively, composed from built-ins
(prompt/guide pattern list: as-of join, range join).

as-of join — for each left row, the latest right row at-or-before its
timestamp (per key). Spark has no ASOF JOIN; the scalable composition
is the union trick: tag both sides, union, sort per key by (ts, side)
with a window, carry the last seen right value forward, keep left
rows. ONE shuffle on the key — same cost as a regular join, no
range-explosion. (The applyInPandas + pd.merge_asof per-group variant
is the fallback when per-key data fits in memory; this one never
materializes a group.)

range join — equi-bucketize the range key, join on bucket, residual
filter. Turns an O(n·m) inequality join into a banded equi-join;
bucket width = the query interval so each left row probes ≤2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row: the most recent right row with
    right.on <= left.on, matched within `by` groups (left join
    semantics — unmatched left rows keep nulls).

    Output: all left columns + `right_value_cols` (prefixed asof_).
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    lt = left.withColumn("_side", F.lit(1))
    # ALL right values ride in ONE struct: the carry-forward then picks
    # whole right ROWS atomically. (Carrying columns independently with
    # ignorenulls would tear rows: a legitimately-NULL value in the
    # matched row would be back-filled from an older row.)
    rt = right.select(
        by,
        on,
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rrow"),
    ).withColumn("_side", F.lit(0))

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (side 0 < 1), so a
    # right row AT the left timestamp is eligible ("at-or-before")
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_carry", F.last("_rrow", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[
                F.col("_carry").getField(c).alias(f"asof_{c}")
                for c in right_value_cols
            ],
        )
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    interval_ms: int,
    bucket_ms: int | None = None,
) -> DataFrame:
    """Pairs (left, right) with 0 <= left_ts − right_ts < interval_ms,
    both bounds at FULL timestamp precision (microseconds — Spark's
    internal resolution), as a banded equi-join: both sides bucketed,
    each left row probes every bucket its lookback window can touch
    (⌈interval/bucket⌉ + 1 of them), residual filter exact.
    Cross-join never materializes. Bucketing uses floor division so
    pre-1970 timestamps band correctly; a true delta < interval_ms
    implies an ms-truncated delta ≤ interval_ms, which the probe
    range ⌈interval/bucket⌉ always covers."""
    bucket_ms = bucket_ms or interval_ms
    n_back = -(-interval_ms // bucket_ms)  # ceil: full lookback coverage
    lb = left.withColumn(
        "_lbucket",
        F.floor(F.unix_millis(F.col(left_ts)) / F.lit(bucket_ms)).cast("long"),
    )
    rb = right.withColumn(
        "_rbucket",
        F.floor(F.unix_millis(F.col(right_ts)) / F.lit(bucket_ms)).cast("long"),
    )
    probe = lb.withColumn(
        "_probe",
        F.explode(
            F.array(*[F.col("_lbucket") - i for i in range(n_back + 1)])
        ),
    )
    # both bounds at microsecond precision: unix_millis truncates, so
    # a right row microseconds AFTER the left row inside the same
    # millisecond would otherwise sneak in as delta == 0 (caught by
    # the sf0.1 oracle stress run — invisible at sf0.01), and a pair
    # whose true delta sits inside (interval − 1ms, interval) would be
    # dropped by a truncated upper bound
    delta_us = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))
    return (
        probe.join(rb, probe._probe == rb._rbucket)
        .filter((delta_us >= 0) & (delta_us < interval_ms * 1000))
        .drop("_lbucket", "_rbucket", "_probe")
    )


def resample_ffill(
    obs: DataFrame,
    key: str,
    ts: str,
    value: str,
    step: str = "1 hour",
) -> DataFrame:
    """Resample an irregular time series onto a fixed grid with
    forward fill: per key, one grid point every `step` from the first
    to the last observation (both truncated to the step's UNIT — e.g.
    step '15 minutes' anchors the grid on a whole minute, '1 day' on
    midnight), each carrying the latest observed value at-or-before it
    (NULL before the first observation).

    Same union trick as asof_join — observations and grid points
    union, one shuffle on the key, a `last(ignorenulls)` running
    window carries values onto the grid. Grid size is bounded per key
    (span/step), so a 100 TB event table resamples with exactly one
    wide exchange. Duplicate (key, ts) observations collapse to
    max(value) first so the fill is deterministic.
    """
    o = obs.groupBy(
        F.col(key).alias("k"), F.col(ts).alias("t")
    ).agg(F.max(value).alias("v"))
    # anchor the grid on the step's unit ("15 minutes" → minute,
    # "1 day" → midnight) so non-hour steps aren't hour-misaligned
    unit = step.split()[-1].rstrip("s").lower()
    bounds = o.groupBy("k").agg(
        F.date_trunc(unit, F.min("t")).alias("t0"),
        F.date_trunc(unit, F.max("t")).alias("t1"),
    )
    grid = bounds.select(
        "k",
        F.explode(
            F.sequence("t0", "t1", F.expr(f"INTERVAL {step}"))
        ).alias("t"),
    )
    unioned = o.select(
        "k", "t", "v", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select(
            "k", "t", F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("fv", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            F.col("k").alias(key),
            F.unix_millis("t").alias("grid_ts_ms"),
            F.col("fv").alias("filled_value"),
        )
    )


def scd2_intervals(
    changelog: DataFrame,
    key: str,
    ts: str,
    state: str,
    tiebreak: str,
) -> DataFrame:
    """Compress a changelog into slowly-changing-dimension type-2
    history: per ``key``, consecutive rows with an unchanged ``state``
    collapse, and each surviving change opens a validity interval
    [valid_from, valid_to) closed by the next change — valid_to NULL
    (open-ended) for the current state.

    One (key)-keyed Exchange+Sort serves the change-detection lag, the
    interval lead and the version row_number (Catalyst reuses the sort
    for same-spec windows), so the whole build is a single shuffle;
    keys are numerous and uniform, so no skew at any scale. ``tiebreak``
    must make (ts, tiebreak) unique per key or lag/lead order — and
    therefore the output — is nondeterministic.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed = changelog.withColumn(
        "_prev", F.lag(state).over(w)
    ).filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state)))
    nxt = F.lead(ts).over(w)
    return changed.select(
        key,
        F.col(state).alias("state"),
        F.col(ts).alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w).alias("version"),
        nxt.isNull().alias("is_current"),
    )


def interval_overlap_join(
    intervals: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    bucket_ms: int = 600_000,
) -> DataFrame:
    """Self-join of half-open intervals on true overlap — NON-EMPTY
    intersection, ``greatest(s_a, s_b) < least(e_a, e_b)`` (the
    textbook ``s_a < e_b AND s_b < e_a`` form wrongly admits
    zero-length intervals sitting inside another) → one row per
    unordered pair
    ``(<key>, a_id, b_id, overlap_ms)`` with ``a_id < b_id`` — the
    time-range join a cross join cannot survive at scale.

    Banded: every interval explodes to the time buckets it touches
    (``F.sequence`` — any interval length, ⌈len/bucket⌉+1 rows), the
    pair join is an equi-join on (key, bucket), and each true pair is
    claimed EXACTLY once by the bucket containing its overlap start
    (``floor(greatest(s_a, s_b) / bucket)`` — a point both intervals
    cover, so both sides carry that bucket row; lossless for any
    bucket width, hypothesis-tested against brute force). Shuffle
    volume is interval rows × small fan-out, never the quadratic
    pair space; residual predicates run post-join on bucket-local
    candidates.
    """
    keys = [key] if key else []
    base = intervals.select(
        *keys,
        F.col(id_col).alias("_id"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    ).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / F.lit(bucket_ms)).cast("long"),
                F.floor(F.col("_e") / F.lit(bucket_ms)).cast("long"),
            )
        ),
    )
    a = base.select(
        *keys,
        "_bucket",
        F.col("_id").alias("a_id"),
        F.col("_s").alias("a_s"),
        F.col("_e").alias("a_e"),
    )
    b = base.select(
        *([F.col(k).alias(f"_b_{k}") for k in keys]),
        F.col("_bucket").alias("_b_bucket"),
        F.col("_id").alias("b_id"),
        F.col("_s").alias("b_s"),
        F.col("_e").alias("b_e"),
    )
    cond = (F.col("_bucket") == F.col("_b_bucket")) & (
        F.col("a_id") < F.col("b_id")
    )
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_b_{k}"))
    own = F.floor(
        F.greatest("a_s", "b_s") / F.lit(bucket_ms)
    ).cast("long")
    return (
        a.join(b, cond)
        .filter(
            (
                F.greatest("a_s", "b_s") < F.least("a_e", "b_e")
            )
            & (F.col("_bucket") == own)
        )
        .select(
            *keys,
            "a_id",
            "b_id",
            (
                F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
            ).alias("overlap_ms"),
        )
    )
