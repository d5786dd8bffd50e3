"""Regenerate CATALOG.md: one line per registered query — the
skimmable index of the engine's whole verified surface."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.queries import load_all  # noqa: E402

GROUPS = {
    "catalog_core": "Core: projections / filters / scalar functions",
    "catalog_aggs": "Aggregations",
    "catalog_joins": "Joins",
    "catalog_windows": "Windows / sorts / set ops",
    "catalog_heavy": "TPC-H shapes / pivots / approx / profiling",
    "catalog_sql": "Spark SQL surface",
    "catalog_llm": "LLM data ops: text / dedup / similarity / multimodal",
    "catalog_corpus": "Corpus monitoring: drift / cross-source overlap",
    "catalog_graph": "Graph analytics",
    "catalog_curation": "Corpus curation",
    "catalog_streaming": "Streaming batch-twins",
}


def main() -> None:
    registry = load_all()
    by_mod: dict[str, list] = {}
    for name, spec in registry.items():
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        by_mod.setdefault(mod, []).append((name, spec))
    out = [
        "# CATALOG — every registered query",
        "",
        f"{len(registry)} queries; each is a PySpark callable plus "
        "(unless noted) a DuckDB oracle hash-checked at sf0.01. "
        "Regenerate with `python tools/dump_catalog.py`.",
        "",
    ]
    for mod, title in GROUPS.items():
        entries = by_mod.get(mod, [])
        if not entries:
            continue
        out += [f"## {title} ({len(entries)})", ""]
        out += ["| query | oracle | summary |", "| --- | --- | --- |"]
        for name, spec in sorted(entries):
            doc = (spec.doc or "").strip().splitlines()[0].rstrip()
            oracle = "yes" if spec.oracle else "rows-only"
            if spec.oracle and (
                "approx_ok" in spec.oracle or "true AS approx_ok" in spec.oracle
            ):
                oracle = "invariant"
            out.append(f"| `{name}` | {oracle} | {doc} |")
        out.append("")
    Path(__file__).resolve().parent.parent.joinpath("CATALOG.md").write_text(
        "\n".join(out)
    )
    print(f"CATALOG.md written ({len(registry)} queries)")


if __name__ == "__main__":
    main()
