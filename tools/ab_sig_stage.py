"""One-JVM A/B of the dedup operators' base= staging — the inline
Arrow signature pass vs the staged doc_signatures parquet fixture,
interleaved in the same warmed session (min-of-N per variant) so host
phase and session bring-up cancel out (the ab_stage_graph.py pattern).

Usage: python tools/ab_sig_stage.py [sf_dir] [passes]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.operators import dedup as D
from baronbatch_etl_spark.queries.catalog_llm import _doc_signatures
from baronbatch_etl_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-sig-stage")

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    base = _doc_signatures(spark, sf_dir)
    _force(base)
    print(
        f"fixture build+settle: {time.perf_counter() - t0:.3f}s",
        file=sys.stderr,
        flush=True,
    )

    def lsh(staged: bool):
        if staged:
            return D.minhash_lsh_pairs(None, threshold=0.8, base=base)
        return D.minhash_lsh_pairs(docs, threshold=0.8)

    def clusters(staged: bool):
        return D.connected_components(lsh(staged))

    def containment(staged: bool):
        if staged:
            return D.containment_pairs(None, threshold_pct=90, base=base)
        return D.containment_pairs(docs, threshold_pct=90)

    def lsh_recall_side(staged: bool):
        if staged:
            return D.minhash_lsh_pairs(
                None,
                threshold=0.8,
                base=base.filter(F.col("doc_id") % 3 == 0),
            )
        return D.minhash_lsh_pairs(
            docs.filter(F.col("doc_id") % 3 == 0), threshold=0.8
        )

    def survivor_subset(staged: bool):
        # the curate_survivors shape: quality gate + exact-dedup
        # keep-first, then LSH over the survivor pool — inline Arrow
        # pass on the subset vs the staged signature table joined to
        # the survivor ids
        from baronbatch_etl_spark.operators import text as X

        qual = docs.filter(X.quality_score("text", "n_chars") >= 0.35)
        keep = (
            qual.select("doc_id", F.md5("text").alias("text_md5"))
            .groupBy("text_md5")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        sdocs = qual.join(keep.select("doc_id"), "doc_id").localCheckpoint(
            eager=False
        )
        if staged:
            sub = base.join(sdocs.select("doc_id"), "doc_id")
            return D.connected_components(
                D.minhash_lsh_pairs(None, threshold=0.8, base=sub)
            )
        return D.connected_components(
            D.minhash_lsh_pairs(sdocs, threshold=0.8)
        )

    def source_vocab(staged: bool):
        # d_source_overlap's vocabulary prefix: (source, shingle)
        # distinct set — Arrow hash over text vs staged-sh explode
        from baronbatch_etl_spark.operators.fast_text import (
            shingle_hashes_fast,
        )

        if staged:
            return base.select(
                "source", F.explode("sh").alias("h")
            ).distinct()
        return docs.select(
            "source",
            F.explode(shingle_hashes_fast(F.col("text"))).alias("h"),
        ).distinct()

    def ngram(staged: bool):
        if staged:
            return D.ngram_jaccard_pairs(None, threshold=0.5, base=base)
        return D.ngram_jaccard_pairs(docs, threshold=0.5)

    def editdist(staged: bool):
        if staged:
            return D.edit_distance_pairs(None, prefix_len=64, base=base)
        return D.edit_distance_pairs(docs, prefix_len=64)

    def simhash(staged: bool):
        if staged:
            return D.simhash_near_pairs(None, base=base)
        return D.simhash_near_pairs(docs)

    def contamination(staged: bool):
        # t_contamination's shape: 4-gram shingles, benchmark slice
        # broadcast, per-doc shared-shingle count
        from baronbatch_etl_spark.queries.catalog_curation import (
            _contam_shingles_fast,
        )

        if staged:
            sh = base.select("doc_id", F.explode("sh4").alias("h"))
        else:
            sh = docs.select(
                "doc_id",
                F.explode(_contam_shingles_fast(F.col("text"))).alias("h"),
            )
        bench = sh.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
        return (
            sh.filter(F.col("doc_id") % 97 != 0)
            .join(F.broadcast(bench), "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared"))
        )

    cases = {
        "contamination": contamination,
        "minhash_pairs": lsh,
        "dup_clusters": clusters,
        "containment": containment,
        "lsh_filtered": lsh_recall_side,
        "survivor_subset": survivor_subset,
        "source_vocab": source_vocab,
        "ngram_jaccard": ngram,
        "edit_distance": editdist,
        "simhash_pairs": simhash,
    }
    best: dict[tuple[str, bool], float] = {}
    for p in range(passes):
        for name, fn in cases.items():
            for staged in (False, True):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _force(fn(staged))
                dt = time.perf_counter() - t0
                key = (name, staged)
                best[key] = min(best.get(key, float("inf")), dt)
                print(
                    f"pass{p} {name} staged={staged}: {dt:.3f}s",
                    file=sys.stderr,
                    flush=True,
                )
    print("\n== min over passes ==")
    for name in cases:
        s = best[(name, True)]
        i = best[(name, False)]
        print(
            f"{name}: inline {i:.3f}s  staged {s:.3f}s  delta {s - i:+.3f}s"
        )


if __name__ == "__main__":
    main()
