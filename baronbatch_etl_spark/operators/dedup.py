"""Deduplication operators for LLM-data pipelines: exact, MinHash-LSH,
SimHash, n-gram Jaccard (north-star family; the reference's only dedup
is keep-first on a key, utils/clean_db.py:14-24 — covered by
catalog_aggs.a8).

Scale design:
  * signatures/fingerprints are ROW-LOCAL higher-order expressions —
    computed at scan speed, no shuffle, no UDF;
  * the only shuffles are the LSH band-bucket join (shuffle on band
    key — standard production shape) and the final pair verification
    joins;
  * all hash constants are fixed literals so runs are deterministic
    and the DuckDB oracle can replay them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import spread
from baronbatch_etl_spark.operators.fast_text import (
    jaccard_fast,
    make_minhash_udf,
    make_sig_and_shingles_udf,
    make_simhash_udf,
    shingle_hashes_fast,
)
from baronbatch_etl_spark.operators.text import (
    POLY_P,
    char_poly_hash,
    char_poly_hash131,
    shingle_hashes,
    token_hashes,
    token_hashes131,
)

# Fixed MinHash family h_j(x) = (A[j]·x + B[j]) mod P  (seed 42).
MINHASH_K = 16
MINHASH_A = (
    686579304, 119540832, 26855093, 796233791, 295310486, 262950629,
    239670712, 149827707, 790779947, 110053354, 726600540, 795285933,
    957970517, 585582862, 93349857, 634036507,
)
MINHASH_B = (
    453035110, 34126396, 31994523, 100604502, 234760738, 249817734,
    542621108, 646412689, 28492780, 602632297, 213500298, 768820204,
    697808098, 753041955, 585126461, 450455977,
)
LSH_BANDS = 4  # 4 bands × 4 rows ⇒ P(candidate) = 1-(1-s⁴)⁴
LSH_ROWS = MINHASH_K // LSH_BANDS

#: Prefix width the staged signature table stores in its ``pfx``
#: column (catalog_llm._doc_signatures and its DuckDB oracle twin
#: both read this). edit_distance_pairs(base=...) accepts any
#: prefix_len <= this width exactly, and raises beyond it.
STAGED_PREFIX_LEN = 64

# 60-bit fingerprint assembled from TWO independent token-hash
# families (base-31 → bits 0..29, base-131 → bits 30..59): POLY_P is
# ~2^30, so one family alone yields ≤30 informative bits, and a wider
# fingerprint is what keeps the pigeonhole blocks selective (15-bit
# block keys ⇒ 32k buckets/block; an 8-bit key over a 32-bit simhash
# put ~n²/256-plus-correlation candidate pairs through the verifier).
SIMHASH_BITS = 60
SIMHASH_HALF = 30  # bits per hash family
SIMHASH_BLOCK_BITS = SIMHASH_BITS // 4  # 4 blocks: complete for r ≤ 3

# Arrow-vectorized signature UDFs (same arithmetic as the expression
# versions below — see operators/fast_text.py; parity is tested).
minhash_signature_fast = make_minhash_udf(MINHASH_A, MINHASH_B)
sig_and_shingles_fast = make_sig_and_shingles_udf(MINHASH_A, MINHASH_B)
simhash_fast = make_simhash_udf(SIMHASH_BITS, SIMHASH_HALF)


def exact_dedup_survivors(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: min doc_id per md5(text) survives.

    At scale: one hash-groupBy shuffle on the digest — the canonical
    100 TB exact-dedup plan (digest first, never shuffle full text).
    """
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
    )


def minhash_signature_from_hashes(hs: Column) -> Column:
    """array<long> MinHash signature (k=16) from pre-hashed shingles.

    Row-local: sig[j] = min over shingles of (A[j]·h + B[j]) mod P.
    Empty shingle sets sign as P (sentinel > any hash).
    """

    def perm(j: int):
        a, b = MINHASH_A[j], MINHASH_B[j]
        return lambda h: (F.lit(a) * h + F.lit(b)) % POLY_P

    sigs = [
        F.when(
            F.size(hs) > 0, F.array_min(F.transform(hs, perm(j)))
        ).otherwise(F.lit(POLY_P).cast("long"))
        for j in range(MINHASH_K)
    ]
    return F.array(*sigs)


def minhash_signature(text: Column, n: int = 3) -> Column:
    """MinHash signature straight from text (convenience wrapper)."""
    return minhash_signature_from_hashes(shingle_hashes(text, n))


def lsh_bands(sig: Column) -> Column:
    """array<string> of band keys: each band is ROWS consecutive
    signature slots joined into one bucket key."""
    keys = []
    for b in range(LSH_BANDS):
        parts = [F.element_at(sig, b * LSH_ROWS + r + 1) for r in range(LSH_ROWS)]
        keys.append(F.concat_ws("-", *[p.cast("string") for p in parts]))
    return F.array(*keys)


def lsh_candidate_pairs(base: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) LSH band-collision candidates from a
    (doc_id, sig, sh) signature frame — the shared candidate generator
    for every verify flavor (exact Jaccard, edit distance, ...).

    Docs with no shingles (< n tokens) all share the sentinel
    signature — banding them would make every short doc a candidate
    pair with every other (O(n²) on that subset); they can never
    verify, so they are excluded up front.
    """
    banded = base.filter(F.size("sh") > 0).select(
        "doc_id", F.posexplode(lsh_bands(F.col("sig"))).alias("band", "key")
    )
    # probe side repartitioned: single-file inputs otherwise run the
    # whole band join in one task (see simhash_near_pairs)
    left = banded.repartition(F.col("doc_id")).alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


#: Columns a caller-staged signature frame must carry (see the
#: ``base=`` parameter of :func:`minhash_lsh_pairs` /
#: :func:`containment_pairs`).
_SIG_BASE_COLS = ("doc_id", "sig", "sh")


def _require_docs_or_base(
    docs: DataFrame | None, base: DataFrame | None
) -> None:
    """Loud misuse guard: every pair operator needs either the raw
    ``docs`` frame or a staged ``base`` — with neither, the failure
    used to surface as an opaque AttributeError deep inside
    ``spread(None)`` (the r10 advice item)."""
    if docs is None and base is None:
        raise ValueError(
            "pass either docs= (raw documents) or base= (a staged "
            "signature frame); both were None"
        )


def _require_sig_base(base: DataFrame, cols: tuple[str, ...]) -> None:
    """Loud misuse guard for caller-staged signature frames: a base
    missing a required column would otherwise fail deep inside the
    plan with an unresolved-attribute error (or worse, resolve against
    an unrelated column of the same name)."""
    missing = [c for c in cols if c not in base.columns]
    if missing:
        raise ValueError(
            f"signature base is missing column(s) {missing}; expected "
            f"at least {list(cols)} (doc_id + the sig_and_shingles_fast "
            "outputs)"
        )


def minhash_lsh_pairs(
    docs: DataFrame | None, threshold: float = 0.8, n: int = 3,
    ephemeral: bool = True, base: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding, verified by exact
    shingle Jaccard ≥ threshold.

    Plan: scan → row-local signature/bands → explode bands (×4 rows)
    → self-join on (band, key) for candidates → join shingle sets back
    → exact-verify. Shuffle only on band keys and candidate doc ids.

    The default ``ephemeral=True`` materializes the internal signature
    frame via a lazy localCheckpoint instead of ``.cache()``:
    checkpoint blocks are freed by the ContextCleaner once the frame
    is unreferenced, so neither a 187-query catalog run nor a caller
    that builds pairs per micro-batch (streaming curate_ingest)
    accumulates immortal executor-storage entries (the round-4 advice:
    opt IN to ``.cache()``, never leak by default).

    Fault-tolerance trade (applies to every ``ephemeral`` site in
    this module): localCheckpoint blocks are UNREPLICATED and the
    lineage is truncated, so losing an executor after materialization
    fails the job instead of recomputing the lost partitions. Fine
    for this repo's short interactive/bench runs; a long multi-tenant
    run where executor loss is routine (dynamic allocation, spot
    nodes) should pass ``ephemeral=False`` and ``unpersist()`` the
    result when done — cache keeps lineage, so a lost block recomputes
    — or use a reliable ``checkpoint()`` to durable storage.

    ``base=`` hands in an already-staged ``(doc_id, sig, sh)``
    signature frame (e.g. the once-per-session
    ``catalog_llm._doc_signatures`` parquet fixture) instead of
    re-running the Arrow signature pass per call — the "materialize
    the signature table" deployment shape the paragraph above
    describes, actually stored. A staged base is NOT re-checkpointed
    (the stage=False precedent from operators/graph.py): it is
    already storage-backed, so the three consuming branches fan out
    from the pushdown-capable scan directly, and column pruning gives
    the banding branch (doc_id, sig) and the verify branches
    (doc_id, sh) without either reading the other's array column."""
    _require_docs_or_base(docs, base)
    if base is not None:
        _require_sig_base(base, _SIG_BASE_COLS)
        base = base.select("doc_id", "sig", "sh")
    else:
        # Signatures + shingle hashes in one Arrow pass (shared
        # tokenize/shingle/hash work); the frame is materialized
        # because three plan branches (banding + both verification
        # sides) reuse it — at 100 TB you'd materialize the signature
        # table the same way (that is exactly what ``base=`` feeds in).
        base = (
            spread(docs).select(
                "doc_id", sig_and_shingles_fast(F.col("text")).alias("x")
            )
            .select(
                "doc_id", F.col("x.sig").alias("sig"), F.col("x.sh").alias("sh")
            )
        )
        base = base.localCheckpoint(eager=False) if ephemeral else base.cache()
    cand = lsh_candidate_pairs(base)
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            jaccard_fast(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def containment_pairs(
    docs: DataFrame | None,
    threshold_pct: int = 90,
    rare_per_doc: int = 2,
    df_cap: int = 1000,
    ephemeral: bool = True,
    base: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: rare-shingle blocking,
    verified by exact shingle containment ``|A∩B| / min(|A|, |B|)``
    ≥ threshold.

    Containment is the subset-duplication detector Jaccard
    structurally misses: a short document quoted whole inside a long
    one has Jaccard ≈ |A|/|B| (arbitrarily low) but containment 1.0
    (Broder 1997 distinguishes "resemblance" from "containment" for
    exactly this). MinHash-LSH banding is the WRONG candidate
    generator here — band-collision probability tracks resemblance,
    so low-Jaccard subset pairs are missed — so candidates come from
    **rare-shingle blocking** (the entity-resolution pattern): each
    doc posts its ``rare_per_doc`` globally-rarest shingles (ties by
    hash) against the full shingle inverted index. A fully contained
    doc shares ALL its shingles with its container, so full
    containment is found with probability 1; at threshold t the miss
    chance is ≈ (1−t)^rare_per_doc. Ultra-common shingles
    (df > ``df_cap``) are skipped as blocking keys — the hub-cap
    precedent: quadratic candidate cost, no discriminative value.

    Scale shape: one shingle-keyed df count (the token-aggregate
    family's shuffle), one rare→index equi-join whose fan-out per
    posting is the shingle's df (≤ df_cap), then candidate-bounded
    verification. Output carries ``inner_doc`` — the smaller shingle
    set, the drop candidate (ties → doc_a, mirrored in the oracle).
    Threshold test is pure integer arithmetic; the score is one IEEE
    division.

    ``base=`` accepts the staged ``(doc_id, …, sh)`` signature frame
    (``sh`` is already sorted+deduped by the Arrow UDF contract —
    see make_sig_and_shingles_udf) so a catalog session computes the
    shingle sets once; a staged base is storage-backed and is not
    re-checkpointed (the minhash_lsh_pairs ``base=`` contract).
    """
    _require_docs_or_base(docs, base)
    if base is not None:
        _require_sig_base(base, ("doc_id", "sh"))
        base = base.select("doc_id", "sh")
    else:
        base = (
            spread(docs).select(
                "doc_id", sig_and_shingles_fast(F.col("text")).alias("x")
            )
            .select(
                "doc_id", F.array_distinct(F.col("x.sh")).alias("sh")
            )
        )
        # inverted index + both verification sides reuse it; the
        # default collectable checkpoint frees with the frame — opt in
        # to cache() only from a caller that unpersists (the
        # minhash_lsh_pairs pattern — see operators/multimodal.py:412
        # for the leak story; fault-tolerance trade documented on
        # minhash_lsh_pairs)
        base = base.localCheckpoint(eager=False) if ephemeral else base.cache()
    index = base.select("doc_id", F.explode("sh").alias("h"))
    dfc = index.groupBy("h").agg(F.count("*").cast("long").alias("df"))
    w_rare = Window.partitionBy("doc_id").orderBy("df", "h")
    rare = (
        index.join(dfc, "h")
        .withColumn("rn", F.row_number().over(w_rare))
        .filter((F.col("rn") <= rare_per_doc) & (F.col("df") <= df_cap))
        .select(F.col("doc_id").alias("post_id"), "h")
    )
    cand = (
        rare.join(index.withColumnRenamed("doc_id", "other_id"), "h")
        .filter(F.col("post_id") != F.col("other_id"))
        .select(
            F.least("post_id", "other_id").alias("doc_a"),
            F.greatest("post_id", "other_id").alias("doc_b"),
        )
        .distinct()
    )
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    j = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
        )
    )
    return (
        j.filter(
            (F.col("na") > 0)
            & (F.col("nb") > 0)
            & (
                F.col("inter") * 100
                >= F.least("na", "nb") * F.lit(threshold_pct)
            )
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double") / F.least("na", "nb")
            ).alias("containment"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("inner_doc"),
        )
    )


def edit_distance_pairs(
    docs: DataFrame | None,
    prefix_len: int = 64,
    max_dist: int = 8,
    base: DataFrame | None = None,
) -> DataFrame:
    """Character-level near-dup pairs: LSH band-collision candidates
    verified by bounded-prefix Levenshtein ≤ ``max_dist``.

    Edit distance is the strongest (and most expensive) exact
    verifier, so it never runs all-pairs: candidates come from the
    shared MinHash banding (`lsh_candidate_pairs` — shuffle only on
    band keys), and the DP is doubly bounded — on a ``prefix_len``
    char prefix AND thresholded (Spark's 3-arg ``levenshtein`` stops
    at ``max_dist+1``, O(k·len) not O(len²); pairs over the threshold
    return −1 and are filtered). At 100 TB the verify cost is
    O(candidates · k · prefix_len) — candidate-bounded, like the
    Jaccard verify.

    Output: (doc_a, doc_b, prefix_dist, prefix_sim) where prefix_sim
    = 1 − dist/max(|pfx_a|, |pfx_b|) (one IEEE division — oracle
    bit-stable).

    ``base=`` accepts a staged ``(doc_id, pfx, sig, sh)`` frame (the
    minhash_lsh_pairs contract, plus ``pfx`` which must hold AT LEAST
    ``prefix_len`` chars of each document's text; catalog_llm.
    _doc_signatures stores the 64-char default). The staged column is
    re-trimmed to ``prefix_len`` here — exact whenever the stored
    width ≥ ``prefix_len`` (substring of a longer stored prefix IS
    the requested prefix); a caller asking for MORE than the stored
    width would get stored-width distances silently, so that case
    raises (the stored width is not introspectable from the frame,
    but any doc with a full-width ``pfx`` proves the stage width —
    cheaper to verify at plan level: we require prefix_len <= the
    documented stage width). A staged base is storage-backed and not
    re-checkpointed.
    """
    _require_docs_or_base(docs, base)
    if base is not None:
        _require_sig_base(base, ("doc_id", "pfx", "sig", "sh"))
        if prefix_len > STAGED_PREFIX_LEN:
            raise ValueError(
                f"prefix_len={prefix_len} exceeds the staged prefix "
                f"width ({STAGED_PREFIX_LEN}); rebuild the signature "
                "base with a wider pfx or pass docs= for an inline "
                "pass"
            )
        base = base.select(
            "doc_id",
            # exact: stored pfx is substring(text, 1, STAGED_PREFIX_LEN)
            # and prefix_len <= STAGED_PREFIX_LEN, so this equals
            # substring(text, 1, prefix_len) (the r10 advice item:
            # the parameter used to be silently ignored)
            F.substring(F.col("pfx"), 1, prefix_len).alias("pfx"),
            "sig",
            "sh",
        )
    else:
        base = (
            spread(docs)
            .select(
                "doc_id",
                F.substring(F.col("text"), 1, prefix_len).alias("pfx"),
                sig_and_shingles_fast(F.col("text")).alias("x"),
            )
            .select(
                "doc_id", "pfx",
                F.col("x.sig").alias("sig"), F.col("x.sh").alias("sh"),
            )
            # ephemeral checkpoint: banding + both verification sides
            # reuse the materialized blocks, which free with the frame
            .localCheckpoint(eager=False)
        )
    cand = lsh_candidate_pairs(base)
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pfx_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pfx_b"))
    dist = F.levenshtein(F.col("pfx_a"), F.col("pfx_b"), max_dist)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.alias("prefix_dist"),
            F.greatest(F.length("pfx_a"), F.length("pfx_b")).alias("_m"),
        )
        .filter(
            (F.col("prefix_dist") >= 0) & (F.col("prefix_dist") <= max_dist)
        )
        .select(
            "doc_a",
            "doc_b",
            "prefix_dist",
            (
                F.lit(1.0)
                - F.col("prefix_dist").cast("double") / F.col("_m")
            ).alias("prefix_sim"),
        )
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    ephemeral: bool = True,
) -> DataFrame:
    """Cluster near-dup pairs into components: (node, component) where
    component = min doc_id reachable through the pair graph — the
    standard keep-one-per-cluster dedup contract.

    Min-label propagation: each round every node takes the minimum of
    its own label and its neighbors' labels; converges in O(graph
    diameter) rounds (dedup clusters are shallow — near-clique, tiny
    diameter). The driver loop is the legitimate iterative-algorithm
    exception to "no driver-side loops": each iteration is a fully
    distributed join+agg, `localCheckpoint` truncates the growing
    lineage, and the loop exits on a converged (zero-change) round.
    At 100 TB the same loop holds — GraphFrames/GraphX use exactly
    this alternating-join shape.
    """
    # symmetrize with one explode, not a 2-branch union — the union
    # form scans (and for LSH input, recomputes) the pair plan twice
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
    )
    # default ephemeral: checkpoint blocks free with the frame (no
    # per-query storage pinning); cache: opt-in, cleared by clearCache.
    # Unreplicated + lineage-truncating: executor loss mid-run fails
    # the job (fault-tolerance trade documented on minhash_lsh_pairs)
    edges = edges.localCheckpoint(eager=False) if ephemeral else edges.cache()
    # seed with round 1 directly: label(node) = min(node, neighbors)
    # — one distributed agg instead of a full join round
    labels = edges.groupBy(F.col("s").alias("node")).agg(
        F.least(F.min("s"), F.min("d")).alias("comp")
    )
    # Convergence via the label-sum invariant: labels only ever
    # DECREASE (min of a growing neighbor set) over a fixed node set,
    # so Σcomp is strictly monotone — equal consecutive sums ⟺ a
    # zero-change round. That folds propagate + update + convergence
    # test into ONE job per round (the old shape paid an eager
    # checkpoint job plus a changed-row count job and a second join).
    prev_sum = object()  # sentinel ≠ any sum (incl. None for empty)
    for _ in range(max_iter):
        prop = edges.join(labels, edges.d == labels.node).select(
            F.col("s").alias("node"), "comp"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            # lazy local checkpoint: truncates lineage each round but
            # materializes inside the stats job below, not as its own
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "— pathological chain-shaped dup graph; raise max_iter"
        )
    edges.unpersist()
    return labels


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint over token hashes (row-local).

    bit b is set iff Σ_tokens (2·bit_b(h) − 1) > 0, where bits
    0..HALF−1 vote from the base-31 token hash and bits HALF.. from
    the independent base-131 hash (each family carries only
    log2(POLY_P) ≈ 30 informative bits).
    """
    hs1 = token_hashes(text)
    hs2 = token_hashes131(text)

    def voter(b: int):
        return lambda s, h: s + (
            F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1
        )

    acc = F.lit(0).cast("long")
    for b in range(bits):
        src, shift = (hs1, b) if b < SIMHASH_HALF else (hs2, b - SIMHASH_HALF)
        vote = F.aggregate(src, F.lit(0).cast("long"), voter(shift))
        acc = acc + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return acc


def simhash_near_pairs(
    docs: DataFrame | None,
    max_hamming: int = 3,
    base: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the four 15-bit slices of
    the 60-bit fingerprint (pigeonhole: any pair within hamming ≤ 3
    has at least one untouched slice, so it collides in ≥1 block),
    then verify candidates with popcount(xor) ≤ max_hamming.

    ``base=`` accepts a staged ``(doc_id, simhash)`` fingerprint frame
    (the column is named ``simhash`` to avoid colliding with the
    signature table's shingle-set ``sh``); staged bases are
    storage-backed and not re-checkpointed (the minhash_lsh_pairs
    contract)."""
    if max_hamming > 3:
        raise ValueError(
            "4-block blocking is only complete for max_hamming <= 3; "
            f"got {max_hamming} — pairs differing in every block would be "
            "silently missed (use more/smaller blocks for larger radii)"
        )
    _require_docs_or_base(docs, base)
    if base is not None:
        _require_sig_base(base, ("doc_id", "simhash"))
        base = base.select("doc_id", F.col("simhash").alias("sh"))
    else:
        base = spread(docs).select(
            "doc_id", simhash_fast(F.col("text")).alias("sh")
        ).localCheckpoint(eager=False)  # freed with the frame
    # SimHash bits are CORRELATED across similar-vocabulary docs, so
    # block buckets skew beyond what uniform hashing suggests; 15-bit
    # keys (32k buckets/block) keep the candidate multiset small where
    # 8-bit keys put millions of pairs through the verifier. The
    # verification itself evaluates INLINE in the join condition —
    # popcount plus a first-colliding-block predicate that makes each
    # qualifying pair come out exactly once — so no candidate row ever
    # hits an exchange or a distinct: the whole operator is one
    # broadcast/hash join probe in codegen.
    bb = SIMHASH_BLOCK_BITS
    bmask = (1 << bb) - 1
    blocks = base.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sh", bb * i).bitwiseAND(F.lit(bmask)).cast("long")
                    for i in range(4)
                ]
            )
        ).alias("block", "key"),
    )
    # The probe side repartitions by doc_id so the heavy probe work
    # spreads across every core even when the input arrives as one
    # small file (one file → one task, all other cores idle). The
    # build side stays unhinted: under the broadcast threshold Spark
    # broadcasts it; beyond, AQE falls back to a shuffle join with
    # skew splitting — both correct at their scale.
    l = blocks.repartition(F.col("doc_id")).alias("l")
    r = blocks.alias("r")

    def blk(side: str, i) -> Column:
        return F.shiftright(F.col(f"{side}.sh"), bb * i).bitwiseAND(F.lit(bmask))

    # block is the FIRST index where the two fingerprints agree on the
    # slice: all earlier blocks must differ (dedup without distinct)
    diff = [blk("l", i) != blk("r", i) for i in range(4)]
    earlier_differ = (
        (F.col("l.block") == 0)
        | ((F.col("l.block") == 1) & diff[0])
        | ((F.col("l.block") == 2) & diff[0] & diff[1])
        | ((F.col("l.block") == 3) & diff[0] & diff[1] & diff[2])
    )
    return (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id"))
            & (
                F.bit_count(
                    (F.col("l.sh").bitwiseXOR(F.col("r.sh"))).cast("long")
                )
                <= max_hamming
            )
            & earlier_differ,
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                (F.col("l.sh").bitwiseXOR(F.col("r.sh"))).cast("long")
            ).alias("hamming"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame | None,
    threshold: float,
    n: int = 3,
    max_char_delta: int = 10,
    base: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over blocked candidate pairs: only
    same-language docs within max_char_delta chars are compared, and a
    POSITIONAL PREFIX FILTER (AllPairs/PPJoin) prunes the pair space
    before any Jaccard math.

    Prefix principle: shingle sets are sorted ascending (the global
    canonical order); Jaccard(A,B) ≥ τ implies |A∩B| ≥ ⌈τ·|A|⌉, so A
    and B must share a hash within their first |·| − ⌈τ·|·|⌉ + 1
    elements. Candidates therefore come from an equi-join on
    (lang, prefix_hash) — high-cardinality keys that hash-distribute
    evenly — instead of a near-cross probe within each language
    block. Lossless for τ > 0: the survivor set is identical, so the
    exact-verify stage (and the oracle) are unchanged. At 100 TB this
    is the difference between O(pairs-in-stratum) and
    O(pairs-sharing-a-rare-prefix-token).

    ``base=`` accepts a staged ``(doc_id, lang, n_chars, sh)`` frame
    (``sh`` is shingle_hashes_fast's sorted/deduped hashes — the
    minhash_lsh_pairs contract); a staged base is storage-backed and
    not re-checkpointed.
    """
    if threshold <= 0:
        raise ValueError("prefix filter requires threshold > 0")
    _require_docs_or_base(docs, base)
    if base is not None:
        _require_sig_base(base, ("doc_id", "lang", "n_chars", "sh"))
        hashed = base.select("doc_id", "lang", "n_chars", "sh")
    else:
        hashed = spread(docs).select(
            "doc_id", "lang", "n_chars",
            shingle_hashes_fast(F.col("text")).alias("sh"),
        ).localCheckpoint(  # one Arrow hashing pass feeds prefixes AND
            eager=False  # verification; blocks free with the frame
        )
    # first (len − ⌈τ·len⌉ + 1) of the ascending-sorted distinct hashes
    pref_len = F.size("sh") - F.ceil(
        F.lit(float(threshold)) * F.size("sh")
    ).cast("int") + 1
    pref = hashed.select(
        "doc_id", "lang", "n_chars",
        F.explode(F.slice("sh", F.lit(1), pref_len)).alias("tok"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
                <= max_char_delta
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()  # a pair can share several prefix hashes
    )
    return (
        cand.join(hashed.select(F.col("doc_id").alias("doc_a"),
                                F.col("sh").alias("sh_a")), "doc_a")
        .join(hashed.select(F.col("doc_id").alias("doc_b"),
                            F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            jaccard_fast(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- exact repeated-span detection (substring-level dedup) -----------------

SPAN_K = 8  # tokens per span


def repeated_spans(
    docs: DataFrame, k: int = SPAN_K, min_docs: int = 2
) -> DataFrame:
    """Exact repeated k-token spans across the corpus — the hashed
    k-gram approximation of suffix-array substring dedup ("train-set
    memorization spans"; no reference analogue, the corpus-level twin
    of utils/clean_db.py:14-24's row dedup).

    Returns (span, n_docs, n_occ): every k-token window that appears
    in ≥ min_docs distinct documents, with its distinct-doc count and
    total occurrence count.

    Scale: span extraction is a row-local explode at scan speed; the
    ONLY shuffle is the hash-partitioned groupBy on the span key, with
    map-side partial aggregation folding each file's repeats before
    the exchange. At 100 TB, group by xxhash64(span) instead of the
    span string so shuffle rows are 8 B — collisions only ever merge
    counts and are re-verified by the string-keyed pass over the
    (tiny) surviving span set. Span strings are kept here so the
    DuckDB oracle can replay the exact grouping.
    """
    toks = F.split(F.col("text"), " ")
    spans = F.when(
        F.size(toks) >= k,
        F.expr(
            f"transform(sequence(0, size(split(text, ' ')) - {k}), "
            f"i -> array_join(slice(split(text, ' '), i + 1, {k}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        spread(docs).select("doc_id", F.explode(spans).alias("span"))
        .groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


# --- Bloom-filter incremental dedup ----------------------------------------

BLOOM_BITS = 32_768  # 1024 × 32-bit words
BLOOM_WORD = 32
BLOOM_K = 4  # probes per key


def _bloom_positions(key: Column) -> Column:
    """array<long> of BLOOM_K bit positions via double hashing:
    pos_i = (h1 + i·h2) mod BLOOM_BITS, i = 1..K. Both hashes are the
    portable polynomial folds, so DuckDB replays identical bits."""
    h1 = char_poly_hash(key)
    h2 = char_poly_hash131(key)
    return F.transform(
        F.sequence(F.lit(1), F.lit(BLOOM_K)),
        lambda i: (h1 + i.cast("long") * h2) % BLOOM_BITS,
    )


def bloom_build(corpus: DataFrame, key: str = "text") -> DataFrame:
    """Fold a corpus into a Bloom filter: (word, bits) rows, ≤ 1024 of
    them (BLOOM_BITS/BLOOM_WORD).

    Scale: this is how a new crawl is deduped against a 100 TB corpus
    WITHOUT an O(corpus) join per batch — one linear pass builds the
    filter (map-side bit_or partials, then a 1024-row exchange), the
    result broadcasts to every executor, and membership probes are
    thereafter map-only. Size BLOOM_BITS ≈ 10 bits/key for ~1% false
    positives; false negatives are impossible, so the filter is a
    sound pre-filter for an exact verify of flagged rows only.
    """
    pos = spread(corpus).select(
        F.explode(_bloom_positions(F.col(key))).alias("pos")
    )
    return (
        pos.groupBy((F.col("pos") / BLOOM_WORD).cast("long").alias("word"))
        .agg(
            F.bit_or(
                # python shiftleft() wants a literal shift; the SQL
                # form takes the per-row bit offset column
                F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD} AS INT))")
            ).alias("bits")
        )
    )


def bloom_probe(
    batch: DataFrame, bloom: DataFrame, key: str = "text"
) -> DataFrame:
    """Probe every batch row against a built Bloom filter; adds
    boolean ``bloom_hit`` (true ⇒ key is possibly in the corpus,
    false ⇒ DEFINITELY new). The filter side is broadcast; the only
    shuffle is the batch-local regroup folding the K probe bits back
    to one row — the corpus is never touched."""
    probes = spread(batch).select(
        "*", F.posexplode(_bloom_positions(F.col(key))).alias("_i", "pos")
    ).withColumn("word", (F.col("pos") / BLOOM_WORD).cast("long"))
    joined = probes.join(F.broadcast(bloom), "word", "left")
    hit = F.coalesce(
        F.col("bits").bitwiseAND(
            F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD} AS INT))")
        )
        != 0,
        F.lit(False),
    )
    group_cols = [c for c in batch.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.bool_and(hit).alias("bloom_hit"))
    )
