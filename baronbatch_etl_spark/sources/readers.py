"""Format readers — always schema'd (schema inference is a full extra
pass over the data; at 100 TB it is never acceptable on the hot path;
bronze-zone JSON uses permissive mode to quarantine bad rows instead
of failing the job, mirroring the reference's defensive `.get()`
parsing, transformer_loader/main.py:43-57)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan: pushdown + pruning via Catalyst."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return spark.read.options(header=str(header).lower(), **options).schema(
        schema
    ).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    permissive: bool = True,
    **options: str,
) -> DataFrame:
    """JSON lines with declared schema. Permissive mode keeps
    malformed rows (nulls + `_corrupt_record` if declared) — the
    bronze-zone stance; FAILFAST is for curated inputs."""
    mode = "PERMISSIVE" if permissive else "FAILFAST"
    return spark.read.options(mode=mode, **options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
