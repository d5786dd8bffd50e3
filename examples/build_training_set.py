"""Build a training set from a raw document corpus — the engine's
north-star pipeline as a user would run it.

    python examples/build_training_set.py [sf_dir]

Stages (all one Catalyst DAG, see queries/catalog_curation.py):
quality filter → exact dedup → MinHash-LSH near-dup keep-one →
benchmark decontamination → target-mixture sampling → train/val/test
split → per-(split, lang) dataset card.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.io import DEFAULT_SF_DIR
from baronbatch_etl_spark.queries import load_all
from baronbatch_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    spark = get_spark("build-training-set")
    registry = load_all()

    card = registry["t_training_set"].fn(spark, sf_dir)
    print("\n=== dataset card (split × lang) ===")
    card.show(50, truncate=False)

    # the standalone stages, for inspection
    for name in ("t_corpus_dedup", "t_contamination", "t_mixture_sample"):
        n = registry[name].fn(spark, sf_dir).count()
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
