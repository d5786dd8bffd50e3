"""Full-catalog 10× scale-ratio gate (BENCH_SCALE.json round diff).

Measures every registered query at sf0.1 AND at the 10× upsample
(``localdata_sf1/``, regenerable — see SCALING.md), computes the
per-query sf0.1→sf1 wall ratio, and diffs it against the map recorded
in ``BENCH_SCALE.json::full_catalog_sf1.per_query``. A query whose 10×
ratio worsened by more than ``--factor`` (default 1.5×) vs the prior
recorded map is flagged — so a scale regression surfaces as a file
diff + nonzero exit instead of judge archaeology.

Usage:
    python tools/scale_gate.py [--passes 3] [--factor 1.5]
        [--min-sf1-s 0.5] [--update] [query ...]

  --update   rewrite full_catalog_sf1 in BENCH_SCALE.json with the new
             map (flags, if any, are recorded under "regressions" so
             the git history shows what worsened and when).
  query ...  restrict to named queries (spot re-measure; --update then
             patches only those entries).

Noise discipline (memory: never trust one reading): min-of-N with the
same noop-sink protocol as bench.py; queries whose sf1 time is under
``--min-sf1-s`` are never flagged — a 0.2 s→0.35 s wobble is host
noise, not a scale break.

Flag-confirmation protocol: a full 199×2-SF sequential session
accumulates JVM/GC state that reproducibly inflates a few
broadcast-heavy mid-run readings 2-6× (d_bloom_dedup: 2 s isolated vs
12 s mid-run). Treat full-run flags as ADVISORY — confirm each with an
isolated re-measure (``scale_gate <name> --passes 3``) before acting,
and patch confirmed-artifact entries the same way (``--update`` with
query args merges instead of replacing).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from baronbatch_etl_spark.queries import load_all  # noqa: E402
from baronbatch_etl_spark.session import get_spark  # noqa: E402

SF01_DIR = "/root/testdata/sf0.1"
SF1_DIR = str(ROOT / "localdata_sf1")
SCALE_FILE = ROOT / "BENCH_SCALE.json"


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def measure(names: list[str], passes: int) -> dict[str, dict[str, float]]:
    registry = load_all()
    spark = get_spark("scale-gate")
    # warm-up: JVM/codegen + one Arrow worker bring-up, as in bench.py
    _force(registry["p1_projection"].fn(spark, SF01_DIR))
    _force(registry["f_norm_concat"].fn(spark, SF01_DIR))
    out: dict[str, dict[str, float]] = {}
    for name in names:
        row: dict[str, float] = {}
        for key, sf_dir in (("sf0.1", SF01_DIR), ("sf1", SF1_DIR)):
            best = float("inf")
            for _ in range(passes):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _force(registry[name].fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            row[key] = round(best, 3)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
        print(
            f"{name}: sf0.1={row['sf0.1']}s sf1={row['sf1']}s "
            f"ratio={row['ratio']}",
            file=sys.stderr,
            flush=True,
        )
    return out


def diff(
    new: dict[str, dict[str, float]],
    prior: dict[str, dict[str, float]],
    factor: float,
    min_sf1_s: float,
) -> list[str]:
    flags = []
    for name, row in sorted(new.items()):
        old = prior.get(name)
        if old is None or row["sf1"] < min_sf1_s:
            continue
        if row["ratio"] > old["ratio"] * factor:
            flags.append(
                f"{name}: 10x ratio {old['ratio']} -> {row['ratio']} "
                f"(sf1 {old['sf1']}s -> {row['sf1']}s)"
            )
    return flags


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--factor", type=float, default=1.5)
    ap.add_argument("--min-sf1-s", type=float, default=0.5)
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    if not Path(SF1_DIR).exists():
        print(
            f"{SF1_DIR} missing — regenerate the 10x upsample first "
            "(SCALING.md)",
            file=sys.stderr,
        )
        return 2

    scale = json.loads(SCALE_FILE.read_text())
    block = scale.get("full_catalog_sf1", {})
    prior = block.get("per_query", {})

    names = args.queries or list(load_all())
    new = measure(names, args.passes)
    flags = diff(new, prior, args.factor, args.min_sf1_s)

    for f in flags:
        print(f"REGRESSION {f}")
    print(f"{len(flags)} regression(s) over {len(new)} measured queries")

    if args.update:
        merged = {**prior, **new}
        block["per_query"] = merged
        block["total_sf0.1"] = round(
            sum(r["sf0.1"] for r in merged.values()), 3
        )
        block["total_sf1"] = round(sum(r["sf1"] for r in merged.values()), 3)
        block["regressions"] = flags
        scale["full_catalog_sf1"] = block
        SCALE_FILE.write_text(json.dumps(scale, indent=1) + "\n")
        print(f"updated {SCALE_FILE.name}")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
