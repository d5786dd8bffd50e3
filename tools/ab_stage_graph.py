"""One-JVM A/B of the graph operators' stage= flag over the session
fixtures — isolates the staged-input checkpoint question from host
phase and session bring-up (both variants run interleaved in the same
warmed session; min-of-N per variant).

Usage: python tools/ab_stage_graph.py [sf_dir] [passes]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.operators import graph as G
from baronbatch_etl_spark.queries.catalog_graph import (
    _frequent_copurchase_edges,
    _order_pair_counts,
)
from baronbatch_etl_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-stage-graph")

    edges = _frequent_copurchase_edges(spark, sf_dir)
    pairs = _order_pair_counts(spark, sf_dir).select("c", "s")
    # settle the fixtures + codegen before timing
    _force(edges)
    _force(pairs)

    cases = {
        "triangle_stats": lambda stage: G.triangle_stats(edges, stage=stage),
        "adamic_adar": lambda stage: G.adamic_adar(
            edges, max_degree=64, stage=stage
        ),
        "hits_auth": lambda stage: G.hits(pairs, iters=2, stage=stage)[0],
    }
    best: dict[tuple[str, bool], float] = {}
    for p in range(passes):
        for name, fn in cases.items():
            for stage in (True, False):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _force(fn(stage))
                dt = time.perf_counter() - t0
                key = (name, stage)
                best[key] = min(best.get(key, float("inf")), dt)
                print(
                    f"pass{p} {name} stage={stage}: {dt:.3f}s",
                    file=sys.stderr,
                    flush=True,
                )
    print("\n== min over passes ==")
    for name in cases:
        t = best[(name, True)]
        f = best[(name, False)]
        print(
            f"{name}: stage=True {t:.3f}s  stage=False {f:.3f}s  "
            f"delta {t - f:+.3f}s"
        )


if __name__ == "__main__":
    main()
