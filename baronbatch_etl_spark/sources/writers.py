"""Sinks and physical-layout tools for scale.

Three levers that matter at 100 TB, none of which the reference has
(its sink is row-at-a-time Mongo insert_one):

  * partitioned writes — downstream queries prune whole directories
    (`PartitionFilters` in the scan);
  * bucketed tables — two tables bucketed on the join key co-locate,
    so the join plans with ZERO Exchange (no shuffle of either side);
  * salting — a skewed hot key is split across `salt_buckets`
    sub-keys; the small side is replicated per sub-key, turning one
    straggler partition into N even ones. (AQE skew-join handles
    moderate skew automatically; salting is the explicit fix for
    pathological keys.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (one directory per
    partition value; scans with a partition predicate read only the
    matching directories)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    Joins/aggregations between tables bucketed on the same key with
    the same bucket count require no Exchange — verified by
    tests/test_sources.py asserting a shuffle-free join plan.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join with the big (skewed) side salted.

    big rows get a deterministic salt from the full-row hash (NOT the
    key alone — a hot key hashes to one value and would stay hot);
    the small side is exploded once per salt value. Join key becomes
    (key, salt) → the hot key's rows spread over `salt_buckets`
    partitions, reproducibly.
    """
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)),
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(salted_small, [key, "_salt"])
    return out.drop("_salt")
