"""Semantic tests for the corpus-level monitoring family
(catalog_corpus.py): total-variation drift and cross-source overlap
on hand-computable fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from baronbatch_etl_spark.queries import load_all

REG = load_all()


def _corpus_dir(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=t,
                lang="en",
                source=s,
                n_chars=len(t),
            )
            for i, (s, t) in enumerate(rows)
        ]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_tv_drift_zero_for_identical_distributions(spark, tmp_path):
    # both sources emit the same token distribution -> TV = 0 exactly
    sf = _corpus_dir(
        spark, tmp_path, [("a", "x y z"), ("b", "x y z"), ("b", "x y z")]
    )
    out = {r.source: r for r in REG["t_corpus_drift"].fn(spark, sf).collect()}
    assert out["a"].tv_dist == 0.0
    assert out["b"].tv_dist == 0.0
    assert out["a"].n_tokens == 3 and out["b"].n_tokens == 6
    assert out["a"].vocab_size == 3


def test_tv_drift_hand_computed(spark, tmp_path):
    # A = {a:2, b:1}, B = {a:1, b:2}; corpus = {a:3, b:3}
    # TV(A) = 0.5*(|2/3-1/2| + |1/3-1/2|) = 1/6 — and symmetrically B.
    sf = _corpus_dir(spark, tmp_path, [("A", "a a b"), ("B", "a b b")])
    out = {r.source: r.tv_dist for r in REG["t_corpus_drift"].fn(spark, sf).collect()}
    assert out["A"] == pytest.approx(1 / 6, abs=1e-15)
    assert out["B"] == pytest.approx(1 / 6, abs=1e-15)


def test_tv_drift_disjoint_vocab_bounds(spark, tmp_path):
    # a source sharing NO tokens with the rest: TV = 1 - C_s/C
    # (its mass is fully displaced except its own corpus share)
    sf = _corpus_dir(spark, tmp_path, [("A", "a a a"), ("B", "b b b b b b")])
    out = {r.source: r.tv_dist for r in REG["t_corpus_drift"].fn(spark, sf).collect()}
    assert out["A"] == pytest.approx(1 - 3 / 9, abs=1e-15)
    assert out["B"] == pytest.approx(1 - 6 / 9, abs=1e-15)
    for v in out.values():
        assert 0.0 <= v <= 1.0


BASE = "the quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely different words populate this document with nothing shared"


def test_source_overlap_identical_and_disjoint(spark, tmp_path):
    sf = _corpus_dir(
        spark, tmp_path, [("a", BASE), ("b", BASE), ("c", OTHER)]
    )
    out = {
        (r.src_a, r.src_b): r
        for r in REG["d_source_overlap"].fn(spark, sf).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    # identical shingle sets: exact jaccard 1, all 16 signature mins agree
    assert ab.exact_jaccard == 1.0
    assert ab.sig_matches == 16 and ab.est_jaccard == 1.0
    for pair in (("a", "c"), ("b", "c")):
        r = out[pair]
        assert r.n_inter == 0 and r.exact_jaccard == 0.0
        assert 0 <= r.sig_matches <= 16  # estimator may collide by chance
    assert ab.n_a == ab.n_b  # same doc -> same shingle count


def test_source_overlap_partial(spark, tmp_path):
    # two sources sharing half their documents: 0 < jaccard < 1 and
    # the MinHash estimate lands within its coarse (k=16) resolution.
    sf = _corpus_dir(
        spark,
        tmp_path,
        [("a", BASE), ("a", OTHER), ("b", BASE), ("b", "totally fresh content never seen elsewhere in corpus")],
    )
    out = {
        (r.src_a, r.src_b): r
        for r in REG["d_source_overlap"].fn(spark, sf).collect()
    }
    r = out[("a", "b")]
    assert 0.0 < r.exact_jaccard < 1.0
    assert r.n_inter > 0
    assert 0.0 <= r.est_jaccard <= 1.0
