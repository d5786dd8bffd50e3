"""One-off A/B for the r7 verdict's d_chunk_dedup reconcile item.

Measures d_chunk_dedup under the pinned protocol (min over N fresh-JVM
sessions) twice: with the widened chunk pass (current code, 3e07b7a)
and with the widen disabled, plus the host-phase canary, so the
"widen win real or host-band noise?" question gets one recorded
answer. Child mode measures one variant in-process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = "/root/testdata/sf0.1"


def child(widen: bool) -> None:
    from baronbatch_etl_spark.queries import catalog_llm, load_all
    from baronbatch_etl_spark.session import get_spark

    reg = load_all()
    spark = get_spark("ab-chunk")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    force(reg["p1_projection"].fn(spark, SF_DIR))
    force(reg["f_norm_concat"].fn(spark, SF_DIR))

    canary = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(reg["flagship_player_stats"].fn(spark, SF_DIR))
        canary.append(round(time.perf_counter() - t0, 3))

    if not widen:
        orig = catalog_llm._chunk_df
        catalog_llm.__dict__["_chunk_df_orig"] = orig

        def no_widen(spark, sf_dir, widen=False):
            return orig(spark, sf_dir, widen=False)

        catalog_llm._chunk_df = no_widen
        # re-bind inside the registered fn's globals
        reg["d_chunk_dedup"].fn.__globals__["_chunk_df"] = no_widen

    runs = []
    for _ in range(4):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(reg["d_chunk_dedup"].fn(spark, SF_DIR))
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"widen": widen, "canary": min(canary), "runs": runs,
                      "best": min(runs)}))


def main() -> None:
    if os.environ.get("AB_CHILD"):
        child(os.environ["AB_CHILD"] == "widen")
        return
    results = []
    for session in range(2):
        for variant in ("widen", "nowiden"):
            time.sleep(float(os.environ.get("AB_IDLE_S", "30")))
            res = subprocess.run(
                [sys.executable, __file__],
                env={**os.environ, "AB_CHILD": variant},
                capture_output=True,
                text=True,
            )
            for line in res.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        obj = json.loads(line)
                    except ValueError:
                        continue
                    results.append(obj)
                    print(f"session {session + 1} {variant}: {obj}",
                          file=sys.stderr, flush=True)
    summary = {}
    for v in (True, False):
        rows = [r for r in results if r["widen"] is v]
        if rows:
            summary["widen" if v else "nowiden"] = {
                "best": min(r["best"] for r in rows),
                "canaries": [r["canary"] for r in rows],
            }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
