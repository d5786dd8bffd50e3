"""Bit-for-bit parity between the Arrow-vectorized signature UDFs and
the pure-expression implementations (same integer arithmetic by
construction; this guards both against drift)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from baronbatch_etl_spark.operators import dedup as D
from baronbatch_etl_spark.operators import text as X
from baronbatch_etl_spark.operators.fast_text import (
    doc_fingerprint_fast,
    make_cdc_chunks_udf,
    make_shingle_hashes_udf,
    shingle_hashes_fast,
    token_hashes_fast,
)
from baronbatch_etl_spark.operators.text import POLY_P

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "one two",  # < 3 tokens → empty shingle set
    "",  # empty doc
    "répétition déjà vu naïve ﬁsh",  # non-ASCII codepoints
    "a a a a a a",  # heavy repetition → distinct shingles collapse
    # astral-plane codepoints (UTF-16 surrogate pairs JVM-side): the
    # utf-32 fast path and Spark's ascii() must agree beyond the BMP
    "hello \U0001F600 world \U0001F680 rocket launch pad",
    "\U0001F600\U0001F601 pair \U00010348 gothic letter here",
]


def _df(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])


def test_shingle_hash_parity(spark):
    # fast path returns sorted-unique hash values (set semantics);
    # compare as sets — every consumer is order-insensitive
    df = _df(spark)
    out = df.select(
        X.shingle_hashes(F.col("text")).alias("expr"),
        shingle_hashes_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in out:
        assert sorted(set(r.expr)) == r.fast


def test_shingle_hash_parity_width4(spark):
    # the contamination path uses 4-gram shingles via the factory;
    # same set-semantics comparison as the width-3 test
    df = _df(spark)
    fast4 = make_shingle_hashes_udf(4)
    out = df.select(
        X.shingle_hashes(F.col("text"), 4).alias("expr"),
        fast4(F.col("text")).alias("fast"),
    ).collect()
    for r in out:
        assert sorted(set(r.expr)) == r.fast


def test_token_hash_parity(spark):
    df = _df(spark)
    out = df.select(
        X.token_hashes(F.col("text")).alias("expr"),
        token_hashes_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in out:
        assert r.expr == r.fast


def test_fingerprint_parity(spark):
    df = _df(spark)
    out = df.select(
        X.doc_fingerprint(F.col("text")).alias("expr"),
        doc_fingerprint_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in out:
        assert r.expr == r.fast


def test_minhash_parity(spark):
    df = _df(spark)
    out = df.select(
        D.minhash_signature(F.col("text")).alias("expr"),
        D.minhash_signature_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in out:
        assert r.expr == r.fast


def test_simhash_parity(spark):
    df = _df(spark)
    out = df.select(
        D.simhash(F.col("text")).alias("expr"),
        D.simhash_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in out:
        assert r.expr == r.fast


def _ref_cdc(text: str, modulus: int):
    # straightforward per-token reference: boundary token ENDS a chunk
    def th(tok):
        h = 0
        for ch in tok:
            h = (h * 31 + ord(ch)) % POLY_P
        return h

    chunks, cur = [], []
    for tok in text.split(" "):
        cur.append(th(tok))
        if cur[-1] % modulus == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    out = []
    for cid, hs in enumerate(chunks):
        fp = 0
        for h in hs:
            fp = (fp * 131 + h) % POLY_P
        out.append((cid, len(hs), fp))
    return out


def test_cdc_chunks_vs_reference(spark):
    # small modulus → several chunks per doc; includes empty doc
    # (hash 0 ≡ 0 → single 1-token chunk) and boundary-at-doc-end
    texts = TEXTS + ["x " * 50, "lone"]
    cdc = make_cdc_chunks_udf(4)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: [(c.chunk_id, c.n_tokens, c.fp) for c in r.c]
        for r in df.select("doc_id", cdc(F.col("text")).alias("c")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_cdc(t, 4), f"doc {i}: {t!r}"


def test_cdc_total_tokens_conserved(spark):
    # chunking is a partition of the token stream: per-doc chunk token
    # counts must sum to the doc's token count
    df = _df(spark)
    cdc = make_cdc_chunks_udf(8)
    out = df.select(
        F.size(F.split("text", " ")).alias("n_tok"),
        F.aggregate(
            cdc(F.col("text")),
            F.lit(0).cast("long"),
            lambda acc, c: acc + c.n_tokens,
        ).alias("chunk_tok"),
    ).collect()
    for r in out:
        assert r.n_tok == r.chunk_tok


def test_sig_and_shingles_parity(spark):
    # the fused UDF must agree with both single-output fast paths
    df = _df(spark)
    out = df.select(
        D.minhash_signature_fast(F.col("text")).alias("sig1"),
        shingle_hashes_fast(F.col("text")).alias("sh1"),
        D.sig_and_shingles_fast(F.col("text")).alias("x"),
    ).collect()
    for r in out:
        assert r.sig1 == r.x.sig
        assert r.sh1 == r.x.sh


def test_payload_ahash_parity(spark):
    # the Arrow aHash must be bit-identical to the 57-fold expression
    # twin — including non-ASCII codepoints (character-indexed slices)
    # and null payloads
    from baronbatch_etl_spark.operators import multimodal as M

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    media = M.documents_as_media(spark.createDataFrame(rows))
    media = media.unionByName(
        spark.createDataFrame(
            [Row(media_id=99, payload=None, meta=None)], M.MEDIA_SCHEMA
        )
    )
    expr = {r.media_id: r.fp for r in M.payload_fingerprints_expr(media).collect()}
    fast = {r.media_id: r.fp for r in M.payload_fingerprints(media).collect()}
    assert expr == fast
    assert fast[99] is None


def test_word_bigrams_parity(spark):
    # the Arrow bigram twin must be SET-equal to word_ngrams(_, 2)
    # (order differs; every consumer is order-insensitive)
    from baronbatch_etl_spark.operators import text as X2
    from baronbatch_etl_spark.operators.fast_text import word_bigrams_fast

    df = _df(spark)
    out = df.select(
        X2.word_ngrams(F.col("text"), 2).alias("expr"),
        word_bigrams_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in out:
        assert sorted(set(r.expr)) == sorted(set(r.fast))
        assert len(set(r.fast)) == len(r.fast)  # distinct contract


def test_cdc_row_mapper_matches_array_udf(spark):
    # the mapInPandas flat-row mapper and the array-returning UDF share
    # _cdc_chunk_arrays today; this pins them together if either path
    # is ever edited independently
    from baronbatch_etl_spark.operators.fast_text import (
        make_cdc_chunk_rows_mapper,
        make_cdc_chunks_udf,
    )

    texts = TEXTS + ["x " * 50, "lone", ""]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    via_udf = {
        (r.doc_id, c.chunk_id, c.n_tokens, c.fp)
        for r in df.select(
            "doc_id", make_cdc_chunks_udf(4)(F.col("text")).alias("c")
        ).collect()
        for c in r.c
    }
    via_rows = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.fp)
        for r in df.mapInPandas(
            make_cdc_chunk_rows_mapper(4),
            "doc_id long, chunk_id long, n_tokens long, fp long",
        ).collect()
    }
    assert via_rows == via_udf
