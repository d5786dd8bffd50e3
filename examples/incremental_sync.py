"""Incremental table sync from periodic full dumps — the CDC pair in
one user-facing flow.

    python examples/incremental_sync.py [sf_dir]

A vendor ships you a full `orders` dump every night; you keep a
synced copy and want to move only the delta. The pair from
`pipeline/medallion.py` does it losslessly:

1. `snapshot_diff(old, new)` → an insert/update/delete changelog
   (delta-sized — the only thing that crosses the wire).
2. `apply_changelog(copy, log)` → tomorrow's copy, bit-identical to
   the new dump (`apply(old, diff(old, new)) == new` is pinned by a
   property test in tests/test_medallion.py).
3. The synced copy itself is then monitored: daily order volumes per
   status, scored with the shared trailing z-score fold
   (`operators/corpus.py::hourly_zscores` — the `w_anomaly_zscore`
   machinery pointed at a day grain).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from baronbatch_etl_spark.io import DEFAULT_SF_DIR, load_table
from baronbatch_etl_spark.pipeline.medallion import (
    apply_changelog,
    snapshot_diff,
)
from baronbatch_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    spark = get_spark("incremental-sync")

    orders = load_table(spark, sf_dir, "orders")
    keys, cols = ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    # simulate last night's and tonight's dumps (same derivation the
    # q_snapshot_diff catalog fixture uses)
    old = orders.filter(F.col("o_orderkey") % 97 != 0).select(*keys, *cols)
    new = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    log = snapshot_diff(old, new, keys=keys, compare_cols=cols)
    print("=== changelog (delta-sized) ===")
    log.groupBy("op").count().orderBy("op").show()

    rebuilt = apply_changelog(old, log, keys=keys, compare_cols=cols)
    drift = rebuilt.exceptAll(new).count() + new.exceptAll(rebuilt).count()
    print(f"roundtrip drift rows: {drift} (must be 0)")
    assert drift == 0

    print("=== volume anomalies on the synced feed ===")
    # re-derive dates for the synced keys and score daily volumes per
    # order status with the shared fold (trailing 30 days, >=12 seen)
    from baronbatch_etl_spark.operators.corpus import hourly_zscores

    daily = (
        rebuilt.join(orders.select("o_orderkey", "o_orderdate"), "o_orderkey")
        .groupBy(
            F.col("o_orderstatus").alias("event_type"),
            F.date_trunc("day", "o_orderdate").alias("hour"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    hourly_zscores(daily, window_hours=30, min_history=12, top=8).show(
        8, truncate=False
    )


if __name__ == "__main__":
    main()
