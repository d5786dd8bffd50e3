"""Dump `.explain("formatted")` for a set of queries to files.

Usage: python tools/dump_r10_plans.py OUT_DIR SUFFIX query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query — the
before/after plan evidence the optimization rounds commit under
plans/rNN/. Run once from the optimized tree (suffix `after`) and
once from a git worktree of the pre-round commit (suffix `before`).
Plans are captured at sf0.01 (plan SHAPE is scale-independent; the
driver's bench runs sf0.1 with the same plans modulo AQE statistics).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.queries import load_all  # noqa: E402
from baronbatch_etl_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _elide(plan: str) -> str:
    # huge literal arrays (k-means centroids, PQ codebooks) bloat the
    # dump without adding plan-shape evidence
    return re.sub(
        r"\[(-?\d+\.\d+(?:E-?\d+)?,){8,}-?\d+\.\d+(?:E-?\d+)?\]",
        "[…literal double array elided…]",
        plan,
    )


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("plan-dump")
    registry = load_all()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        text = _elide(explain_formatted(df))
        path = out / f"{name}_{suffix}.txt"
        path.write_text(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
