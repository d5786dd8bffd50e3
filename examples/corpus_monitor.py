"""Run the corpus-monitoring battery a training-data pipeline keeps on
every ingest source — batch AND its streaming twin on the same data.

    python examples/corpus_monitor.py [sf_dir]

1. Per-source total-variation drift vs the corpus token distribution
   (`t_corpus_drift` — exact-integer arithmetic).
2. Pairwise cross-source content overlap: MinHash estimate calibrated
   against exact shingle-set Jaccard (`d_source_overlap`).
3. Count-min heavy hitters with the CMS guarantee shown per probe
   (`a_cms_heavy_hitters`).
4. The streaming twins: the documents table replayed as 3 micro-batch
   files through `drift_monitor_ingest` + `cms_monitor_ingest`; the
   folded per-epoch state answers bit-identically to the batch
   queries — counts and grid cells are the mergeable state.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.io import DEFAULT_SF_DIR, load_table
from baronbatch_etl_spark.queries import load_all
from baronbatch_etl_spark.session import get_spark
from baronbatch_etl_spark.streaming import ops


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    registry = load_all()
    spark = get_spark("corpus-monitor")
    spark.sparkContext.setLogLevel("ERROR")

    print("== per-source drift (batch) ==")
    drift = registry["t_corpus_drift"].fn(spark, sf_dir)
    drift.orderBy("source").show(20, truncate=False)

    print("== cross-source overlap: MinHash estimate vs exact ==")
    registry["d_source_overlap"].fn(spark, sf_dir).orderBy(
        "src_a", "src_b"
    ).show(20, truncate=False)

    print("== count-min heavy hitters (est >= true on every probe) ==")
    hitters = registry["a_cms_heavy_hitters"].fn(spark, sf_dir)
    hitters.orderBy("exact_count", ascending=False).show(20, truncate=False)

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/stream_src"
        load_table(spark, sf_dir, "documents").repartition(3).write.mode(
            "overwrite"
        ).parquet(src)

        print("== streaming drift monitor (3 micro-batches) ==")
        q = ops.drift_monitor_ingest(
            ops.stream_sourced_docs(spark, src), f"{tmp}/drift"
        ).start()
        q.awaitTermination(300)
        q.stop()
        streamed = ops.read_drift(spark, f"{tmp}/drift")
        streamed.orderBy("source").show(20, truncate=False)
        batch = {
            r.source: r.tv_dist for r in drift.collect()
        }
        got = {r.source: r.tv_dist for r in streamed.collect()}
        assert got == batch, "streamed drift must be bit-identical"
        print("streamed drift == batch drift (bit-identical)")

        print("== streaming CMS monitor: grid cells sum across epochs ==")
        q = ops.cms_monitor_ingest(
            ops.stream_sourced_docs(spark, src), f"{tmp}/cms"
        ).start()
        q.awaitTermination(300)
        q.stop()
        grid = ops.read_cms(spark, f"{tmp}/cms")
        print(f"grid cells: {grid.count()} (d*w bounded)")
        watch = [
            r.tok
            for r in hitters.orderBy("exact_count", ascending=False)
            .limit(5)
            .collect()
        ]
        print(f"watchlist probe over the streamed grid: {watch}")
        ops.cms_estimate(spark, f"{tmp}/cms", watch + ["never-seen"]).orderBy(
            "cms_est", ascending=False
        ).show(truncate=False)


if __name__ == "__main__":
    main()
