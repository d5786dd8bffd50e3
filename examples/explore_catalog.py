"""Run any registered query by name and show its result + final plan.

    python examples/explore_catalog.py <query_name> [sf_dir]
    python examples/explore_catalog.py --list
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.io import DEFAULT_SF_DIR
from baronbatch_etl_spark.queries import load_all
from baronbatch_etl_spark.session import get_spark


def main() -> None:
    registry = load_all()
    if len(sys.argv) < 2 or sys.argv[1] == "--list":
        for name, spec in registry.items():
            doc = (spec.doc or "").strip().splitlines()[0]
            print(f"{name:32s} {doc}")
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_SF_DIR
    spark = get_spark("explore")
    df = registry[name].fn(spark, sf_dir)
    df.show(20, truncate=False)
    df.explain("formatted")


if __name__ == "__main__":
    main()
