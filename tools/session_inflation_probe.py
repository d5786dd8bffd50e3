"""Instrumented unchunked catalog session — the r8 verdict's item #4.

Runs the whole registry front to back in ONE JVM (the driver's bench
shape), recording per-query wall time alongside JVM-internal gauges
read through the management MXBeans:

  * cumulative GC time (all collectors),
  * heap used,
  * loaded class count (codegen classes accumulate per query),
  * JIT code-cache occupancy (CodeHeap pools) — the classic failure
    is the cache filling and the compiler shutting off, which makes
    every subsequent query run partially interpreted (a uniform
    2-6x tail slowdown, exactly the observed signature),
  * metaspace occupancy,
  * cumulative JIT compilation time,
  * live broadcast/accumulator bookkeeping via the ContextCleaner
    queue length proxy (referenceQueue size is not exposed; we track
    the BlockManager's broadcast block count instead).

At the end, the first K queries are re-measured in the SAME session:
the early-vs-late delta on identical plans is the inflation, and the
gauge trajectory says which mechanism moved with it.

Usage: python tools/session_inflation_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.queries import load_all
from baronbatch_etl_spark.session import get_spark


def _gauges(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    for b in mf.getGarbageCollectorMXBeans():
        t = b.getCollectionTime()
        if t > 0:
            gc_ms += t
    heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed()
    classes = mf.getClassLoadingMXBean().getLoadedClassCount()
    comp_ms = mf.getCompilationMXBean().getTotalCompilationTime()
    code_used = 0
    code_max = 0
    meta_used = 0
    for p in mf.getMemoryPoolMXBeans():
        name = p.getName()
        u = p.getUsage()
        if "CodeHeap" in name or "Code Cache" in name:
            code_used += u.getUsed()
            # getMax() is -1 when the pool max is undefined — adding
            # the sentinel would corrupt the reported cap (r9 advice;
            # mirrors the getCollectionTime() guard above)
            if u.getMax() > 0:
                code_max += u.getMax()
        elif name == "Metaspace":
            meta_used = u.getUsed()
    # broadcast blocks still alive on the driver block manager
    try:
        sc = spark.sparkContext._jsc.sc()
        n_blocks = sc.env().blockManager().getStatus().size()
    except Exception:  # noqa: BLE001
        n_blocks = -1
    return {
        "gc_ms": int(gc_ms),
        "heap_mb": int(heap / 1e6),
        "classes": int(classes),
        "compile_ms": int(comp_ms),
        "codecache_mb": round(code_used / 1e6, 1),
        "codecache_max_mb": round(code_max / 1e6, 1),
        "metaspace_mb": round(meta_used / 1e6, 1),
        "driver_blocks": int(n_blocks),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "INFLATION_PROBE.json")
    registry = load_all()
    spark = get_spark("inflation-probe")

    def measure(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).collect()
        return round(time.perf_counter() - t0, 3)

    rows = []
    names = list(registry)
    for i, name in enumerate(names):
        dt = measure(name)
        g = _gauges(spark)
        rows.append({"i": i, "name": name, "sec": dt, **g})
        print(
            f"{i:3d} {name:28s} {dt:7.3f}s gc={g['gc_ms']}ms "
            f"classes={g['classes']} code={g['codecache_mb']}MB "
            f"meta={g['metaspace_mb']}MB heap={g['heap_mb']}MB",
            flush=True,
        )

    # early-vs-late: re-measure the session's first 12 queries now
    late = {}
    for name in names[:12]:
        late[name] = measure(name)
        print(f"LATE {name}: {late[name]:.3f}s (early "
              f"{rows[names.index(name)]['sec']:.3f}s)", flush=True)

    out.write_text(json.dumps({"rows": rows, "late_rerun": late}, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
