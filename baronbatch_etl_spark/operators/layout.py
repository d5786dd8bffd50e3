"""Multidimensional table layout: Morton (z-order) clustering.

``q_zorder_layout`` (queries/catalog_heavy.py) AUDITS the property;
``write_zordered`` below actually lays a table out that way. Sorting
files by the interleaved key makes every file cover a small rectangle
of the 2-D key space, so parquet footer min/max statistics prune
scans on EITHER predicate column — the standard big-table layout for
two-column point/range workloads (Delta/Iceberg expose the same idea
as OPTIMIZE ZORDER / sort orders; this is the plain-Spark shape).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_z(zx: Column, zy: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = zx bit i, bit 2i+1 = zy bit i. Same arithmetic as
    the SQL builder in queries/catalog_heavy.py `_z_terms` (audited
    against the DuckDB oracle)."""
    return reduce(
        add,
        (
            F.shiftleft(F.shiftright(zx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(zy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            for i in range(bits)
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 8,
    prefix_bits: int = 4,
) -> None:
    """Write ``df`` z-order-clustered on two integer-keyed dimension
    columns: bucket rows by the top ``prefix_bits`` of the Morton
    code (deterministic bit-prefix buckets — no sampled range
    boundaries, so re-runs produce identical layout) and write one
    directory partition per bucket, rows sorted by the full code
    within each file.

    Guarantee (the audited one): each bucket spans at most
    2^(bits − ceil(prefix_bits/2)) values in BOTH dimensions — with
    the defaults, a 64×64 rectangle of the 256×256 space — so every
    file's footer min/max bounds both columns tightly, and a filter
    on either column prunes most files at scan time.

    Both key columns must already be reduced to [0, 2^bits) — e.g.
    ``% 256`` buckets of the raw key. Out-of-range values would wrap
    under the bit mask and SILENTLY void the pruning guarantee (rows
    with key 10 and 266 would cluster together while the file's
    min/max on the raw column spans the whole domain), so they are
    rejected up front with a bounded two-column pre-scan — a narrow
    columnar pass, negligible next to the clustered write itself.

    At 100 TB: one shuffle (repartition on the bucket), then a
    per-partition sort that feeds the writer — the same cost class as
    any clustered write; raise ``prefix_bits`` so each bucket is a
    few files of ~128 MiB.
    """
    limit = 1 << bits
    bad = df.select(
        F.sum(
            (
                F.col(x).isNull()
                | (F.col(x) < 0)
                | (F.col(x) >= limit)
                | F.col(y).isNull()
                | (F.col(y) < 0)
                | (F.col(y) >= limit)
            ).cast("long")
        ).alias("n")
    ).first()["n"]
    if bad:
        raise ValueError(
            f"write_zordered: {bad} rows have {x}/{y} outside "
            f"[0, {limit}) — reduce the keys first (e.g. % {limit}); "
            "masking them would silently void the footer-stats "
            "pruning guarantee"
        )
    zx = F.col(x).cast("long")
    zy = F.col(y).cast("long")
    zval = morton_z(zx, zy, bits)
    bucket = F.shiftright(zval, 2 * bits - prefix_bits)
    (
        df.withColumn("_zval", zval)
        .withColumn("z_bucket", bucket)
        .repartition(1 << prefix_bits, F.col("z_bucket"))
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .partitionBy("z_bucket")
        .parquet(path)
    )
