"""Score entities by link-graph authority — the CommonCrawl-style
quality prior a corpus-curation pipeline attaches to documents, run
over the customer↔supplier order graph.

    python examples/graph_authority.py [sf_dir]

1. PageRank (`g_pagerank`): three unrolled fixed-point rounds over
   the undirected interaction graph, edge list staged once.
2. HITS (`g_hits`): Kleinberg hubs & authorities over the bipartite
   pair list — exact BIGINT arithmetic, no floating point at all.
3. The two rankings compared side by side for the top suppliers.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from baronbatch_etl_spark.io import DEFAULT_SF_DIR
from baronbatch_etl_spark.queries import load_all
from baronbatch_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    spark = get_spark("graph-authority")
    registry = load_all()

    pr = registry["g_pagerank"].fn(spark, sf_dir)
    print("\n=== PageRank top 20 (blended graph) ===")
    pr.show(20, truncate=False)

    hits = registry["g_hits"].fn(spark, sf_dir)
    print("=== HITS top 10 per role (bipartite) ===")
    hits.show(20, truncate=False)

    # PageRank's supplier slice vs HITS authorities: two views of
    # "who concentrates incoming mass"
    pr_supp = (
        pr.filter(F.col("node_type") == "supplier")
        .select(((F.col("node") - 1) / 2).cast("long").alias("key"))
        .limit(10)
    )
    overlap = pr_supp.join(
        hits.filter(F.col("role") == "authority").select("key"), "key"
    ).count()
    print(f"supplier overlap between the two rankings: {overlap}/10")
    spark.stop()


if __name__ == "__main__":
    main()
