"""SparkSession factory.

One place to pin the configs every part of the engine depends on:
UTC session time zone (oracle comparability — the reference stores
tz-aware UTC timestamps, extractor/main.py:427), AQE for runtime
re-planning/skew handling, Arrow for the pandas-UDF slow path, and
shuffle partitions sized to the local core count rather than the
200 default (right-sized partitions matter at 100 TB too — there
the knob is set per-job from input size, not left at a constant).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "baronbatch_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are local-mode friendly but every setting is the one we
    would also want on a 1000-executor cluster (AQE, UTC, Arrow,
    partition-size-aware file splits). ``SPARK_GRAFT_CPUS`` controls
    local parallelism (driver contract).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Files: 128 MiB splits is the at-scale default; harmless locally.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # Env override for robustness sweeps without touching callers —
    # e.g. SPARK_GRAFT_EXTRA_CONF='{"spark.sql.adaptive.enabled":
    # "false"}' python tools/check_oracle.py … re-runs the whole gate
    # under a different planner regime (results must not depend on
    # AQE/partitioning knobs; only speed may). Applied LAST so the
    # sweep wins over caller-supplied conf.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json

        for k, v in json.loads(env_conf).items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
