"""Structured-Streaming operators — SURVEY §2.9 T1–T6.

The reference is a micro-batch incremental pipeline built from an
APScheduler timer + a `processed` flag + `$inc` upserts
(transformer_loader/main.py:76-207). Here those semantics are the
standard Spark streaming surface:

  T1 micro-batch trigger   → trigger(processingTime=...) / availableNow
  T2 progress tracking     → checkpoint offsets (no flag column)
  T3 dedup on ingest       → dropDuplicatesWithinWatermark / dropDuplicates
  T4 incremental aggregate → groupBy().agg() in update mode
  T5 queue + backpressure  → source rate limits (maxFilesPerTrigger)
  T6 batch splitting       → partition sizing, not engine-visible

Batch twins of each computation live in queries/catalog_streaming.py
(oracle-checked); these streaming versions are exercised by
tests/test_streaming.py with a memory sink. Every query works on any
additional files dropped into the source directory — at scale the
source is a bucket prefix and nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: events.parquet stores TIMESTAMP(NANOS); streaming readers declare it
#: LONG (with the nanosAsLong conf) and rebuild microsecond timestamps.
EVENTS_DDL = (
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """File-source stream over the events table (S4's idiomatic form:
    the `processed == False` incremental scan becomes checkpointed
    file-source offsets). `glob` selects the event files within the
    directory (the fixture dir holds all ten tables; a dedicated
    multi-file source dir streams with glob='*.parquet')."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Streams need a declared schema; fixture vintages store ts as
    # either TIMESTAMP(NANOS) (arrives as LONG under nanosAsLong) or
    # TIMESTAMP(MICROS) (a ready timestamp). Probe with a driver-side
    # batch read of the footer — no job — and declare to match.
    probe = (
        spark.read.option("pathGlobFilter", glob).parquet(sf_dir).dtypes
    )
    ts_is_long = dict(probe).get("ts") == "bigint"
    ddl = EVENTS_DDL if ts_is_long else EVENTS_DDL.replace(
        "ts LONG", "ts TIMESTAMP"
    )
    raw = (
        spark.readStream.format("parquet")
        .schema(ddl)
        .option("maxFilesPerTrigger", 1)  # T5: bounded per micro-batch
        .option("pathGlobFilter", glob)
        .load(sf_dir)
    )
    if ts_is_long:
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return raw


def tumbling_counts(events: DataFrame) -> DataFrame:
    """T4: hourly tumbling window aggregate with a 10-minute watermark
    (late rows beyond it are dropped; state is bounded)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def watermark_dedup(events: DataFrame) -> DataFrame:
    """T3: idempotent ingest — the unique-index + exists-check of the
    reference (extractor/main.py:413,513) as bounded-state streaming
    dedup on the natural key."""
    return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-merged), the streaming twin of
    catalog_windows.w_sessionize."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )


def click_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to the same
    user's clicks in the preceding 30 minutes. Both sides carry
    watermarks and the join has an explicit event-time range bound, so
    state is provably droppable — the shape Spark requires for
    unbounded stream-stream joins (and the shape that stays bounded at
    any scale)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("buy_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("value").alias("buy_value"),
        )
        .withWatermark("buy_ts", "10 minutes")
    )
    return clicks.join(
        buys,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "click_id",
        "buy_id",
        F.col("c_user").alias("user_id"),
        F.unix_millis("click_ts").alias("click_ts_ms"),
        F.unix_millis("buy_ts").alias("buy_ts_ms"),
        "buy_value",
    )


def incremental_gold(
    events: DataFrame, gold_path: str, query_name: str = "gold"
):
    """T4 exactly-once gold maintenance: foreachBatch writes each
    micro-batch's PARTIAL aggregate to ``{gold_path}/epoch=<id>`` —
    the Spark rewrite of the reference's `$inc` upsert
    (transformer_loader/main.py:184-190).

    Idempotence comes from the epoch key: a retried batch overwrites
    its own epoch directory, so at-least-once foreachBatch delivery
    folds to exactly-once gold totals. The partials are commutative
    (count + sum), so ``read_gold`` recombines them with a second
    groupBy — no driver-side state, and at scale the same shape is a
    MERGE into a transactional table keyed by epoch."""

    def merge(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.groupBy("user_id", "event_type")
            .agg(F.count("*").alias("games"), F.sum("value").alias("value_sum"))
            .write.mode("overwrite")
            .parquet(f"{gold_path}/epoch={epoch_id}")
        )

    return (
        events.writeStream.foreachBatch(merge)
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def read_gold(spark: SparkSession, gold_path: str) -> DataFrame:
    """Fold the per-epoch partial aggregates into current gold totals
    (the read side of incremental_gold)."""
    return (
        spark.read.parquet(gold_path)
        .groupBy("user_id", "event_type")
        .agg(
            F.sum("games").alias("games"),
            F.sum("value_sum").alias("value_sum"),
        )
    )


def compact_epoch_store(
    spark: SparkSession,
    store_path: str,
    out_path: str,
    group_cols: list[str],
    sum_cols: list[str],
) -> int:
    """Offline maintenance for the epoch-keyed partial stores (gold /
    drift counts / CMS grids): fold every ``epoch=*`` partial into ONE
    base epoch at ``out_path``, so read-side folds stop re-summing an
    unbounded epoch history.

    All three stores hold commutative sums, so re-aggregation is
    exact: any read fold over the compacted store is bit-identical to
    the fold over the raw one (tested). Written to a NEW path — the
    stream stays epoch-keyed and idempotent: point it (and readers) at
    the compacted store and let new epochs accumulate on top; run
    compaction again whenever the directory count matters (the same
    cadence as parquet small-file compaction, sources/writers.compact).

    The base partial lands under ``epoch=-1`` — retried real epochs
    (ids ≥ 0) can never collide with it. Returns the number of rows in
    the compacted base.
    """
    from pathlib import Path

    src, dst = Path(store_path).resolve(), Path(out_path).resolve()
    if dst == src or src in dst.parents:
        # writing the base INSIDE the store being read would make
        # every later fold sum the history plus its own copy — silent
        # 2× counts; refuse instead
        raise ValueError(
            f"compact_epoch_store: out_path {out_path!r} must not be "
            f"the store itself or inside it ({store_path!r})"
        )
    folded = (
        spark.read.parquet(store_path)
        .groupBy(*group_cols)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    folded.write.mode("overwrite").parquet(f"{out_path}/epoch=-1")
    # count the just-written base (small), not the lazy plan (which
    # would re-run the whole history fold a second time)
    return spark.read.parquet(f"{out_path}/epoch=-1").count()


DOCS_DDL = "doc_id LONG, text STRING"


def _stream_parquet(
    spark: SparkSession, src_dir: str, ddl: str, glob: str
) -> DataFrame:
    """Shared file-source stream: one file per micro-batch (admission
    order = file drop order), declared schema (no inference pass)."""
    return (
        spark.readStream.format("parquet")
        .schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .load(src_dir)
    )


def stream_documents(
    spark: SparkSession, src_dir: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream over incoming document files (the corpus
    ingest path)."""
    return _stream_parquet(spark, src_dir, DOCS_DDL, glob)


def _doc_keys(batch: DataFrame) -> DataFrame:
    """(doc_id, band, key) admission keys for a document micro-batch:
    the MinHash-LSH band keys (near-dup granularity) plus an md5
    digest key as band −1 (exact granularity — also the only gate for
    sub-shingle-length docs, which sign as the sentinel and are
    excluded from banding, same as the batch operator)."""
    from baronbatch_etl_spark.operators import dedup as D

    sig = batch.select(
        "doc_id", "text", D.sig_and_shingles_fast(F.col("text")).alias("x")
    ).select(
        "doc_id",
        "text",
        F.col("x.sig").alias("sig"),
        F.col("x.sh").alias("sh"),
    )
    banded = sig.filter(F.size("sh") > 0).select(
        "doc_id",
        F.posexplode(D.lsh_bands(F.col("sig"))).alias("band", "key"),
    )
    digest = batch.select(
        "doc_id", F.lit(-1).alias("band"), F.md5("text").alias("key")
    )
    return banded.unionByName(digest)


def neardup_ingest(
    docs: DataFrame,
    store_path: str,
    accepted_path: str,
    query_name: str = "neardup_ingest",
):
    """Online near-duplicate admission control on document ingest —
    the streaming twin of the batch LSH keep-one family (and the
    near-dup analogue of d_bloom_dedup's exact gate).

    Per micro-batch, greedily and deterministically:
      1. a doc whose keys (LSH bands ∪ exact digest) hit the
         accumulated key store of previously ACCEPTED docs is dropped;
      2. among the store-clean docs of the batch, a doc is dropped if
         a lower-doc_id store-clean doc shares any key with it
         (bucket-greedy, non-recursive — the same admission decision
         replayed on a retry);
      3. survivors' keys append to ``store_path`` and survivor docs to
         ``accepted_path``, both under epoch=<id> (idempotent retry:
         the batch overwrites its own epoch, and the store read
         EXCLUDES the current epoch, so a replayed batch sees exactly
         the state it saw first time).

    Scale shape: the store is (band, key) parquet — read as a
    key-partitioned join side, never the full corpus text; batch keys
    shuffle on (band, key) against it (at 100 TB: bucketed store +
    AQE, or a Bloom pre-filter on key like bloom_build to make the
    common no-hit path map-only). State grows with ACCEPTED docs
    only, ~(bands+1) small rows per doc."""

    def gate(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        keys = _doc_keys(batch).cache()
        try:
            store = (
                spark.read.parquet(store_path)
                .filter(F.col("epoch") != epoch_id)
                .select("band", "key")
            )
        except AnalysisException:
            # missing-path only (first epoch, no store yet); corrupt
            # files / transient FS errors surface at action time and
            # FAIL the batch instead of silently admitting duplicates
            store = None
        if store is not None:
            hit = (
                keys.join(store, ["band", "key"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            clean_keys = keys.join(hit, "doc_id", "left_anti")
        else:
            clean_keys = keys
        l, r = clean_keys.alias("l"), clean_keys.alias("r")
        dropped = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.key") == F.col("r.key"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(F.col("r.doc_id").alias("doc_id"))
            .distinct()
        )
        surv_keys = clean_keys.join(dropped, "doc_id", "left_anti")
        surv_keys.write.mode("overwrite").parquet(
            f"{store_path}/epoch={epoch_id}"
        )
        batch.join(
            surv_keys.select("doc_id").distinct(), "doc_id", "left_semi"
        ).write.mode("overwrite").parquet(f"{accepted_path}/epoch={epoch_id}")
        keys.unpersist()

    return (
        docs.writeStream.foreachBatch(gate)
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
    )


#: Full corpus-document schema (documents.parquet's curation columns).
CORPUS_DDL = "doc_id LONG, lang STRING, text STRING, n_chars LONG"


def stream_corpus(
    spark: SparkSession, src_dir: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream of full corpus documents (doc_id, lang,
    text, n_chars) — the ingest side of the streaming training-set
    build (curate_ingest)."""
    return _stream_parquet(spark, src_dir, CORPUS_DDL, glob)


def curate_ingest(
    docs: DataFrame,
    accepted_path: str,
    quality_min: float = 0.35,
    threshold: float = 0.8,
    query_name: str = "curate_ingest",
):
    """Streaming twin of the training-set capstone's survivor stages:
    per micro-batch, quality filter → exact dedup → MinHash-LSH
    near-dup keep-one against the accumulated accepted corpus — run
    with the SAME batch operators (``minhash_lsh_pairs`` incl. its
    exact-Jaccard verify, ``connected_components``) inside
    foreachBatch, so the admitted survivor set equals the batch
    pipeline's (``t_training_set`` stages 1–3) whenever near-dup
    clusters are cliques under doc_id-ordered replay — true for
    copy-derived near-duplicates, the dominant real-world case, and
    asserted end-to-end by tests/test_streaming_multibatch.py. (For a
    chain-shaped cluster a–b, b–c with a≁c, any single-pass admission
    policy must diverge from global connected components; the greedy
    key-store gate ``neardup_ingest`` is the documented contract
    there.)

    Idempotence: survivors write under epoch=<id> and the accepted
    read EXCLUDES the current epoch, so a replayed batch re-derives
    exactly the decision it made first time (same contract as
    neardup_ingest / ivf_ingest).

    Scale: signatures for the accepted pool are recomputed per batch
    here for operator parity; a production run persists the signature
    table alongside the accepted docs (one Arrow pass per doc ever)
    and probes it — the join shapes are identical."""
    from baronbatch_etl_spark.operators import dedup as D
    from baronbatch_etl_spark.operators import text as X

    def gate(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        qual = batch.filter(X.quality_score("text", "n_chars") >= quality_min)
        keep = (
            qual.select("doc_id", F.md5("text").alias("_md5"))
            .groupBy("_md5")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        sdocs = qual.join(keep.select("doc_id"), "doc_id")
        try:
            accepted = (
                spark.read.parquet(accepted_path)
                .filter(F.col("epoch") != epoch_id)
                .drop("epoch")
            )
        except AnalysisException:  # missing path only: first epoch
            accepted = None
        if accepted is not None:
            sdocs = sdocs.join(
                accepted.select(F.md5("text").alias("_md5")),
                F.md5(sdocs["text"]) == F.col("_md5"),
                "left_anti",
            )
        sdocs = sdocs.cache()
        pool = (
            sdocs.select("doc_id", "text")
            if accepted is None
            else accepted.select("doc_id", "text").unionByName(
                sdocs.select("doc_id", "text")
            )
        )
        # pairs among accepted docs cannot exist (each was admitted
        # non-adjacent), so every pair touches this batch.
        # ephemeral: the helper's internal signature frame checkpoints
        # instead of caching, so per-batch state frees with the frame
        # rather than accumulating one immortal cache entry per epoch
        pairs = D.minhash_lsh_pairs(
            pool, threshold=threshold, ephemeral=True
        ).cache()
        if accepted is not None:
            acc_a = accepted.select(F.col("doc_id").alias("doc_a"))
            acc_b = accepted.select(F.col("doc_id").alias("doc_b"))
            store_adj = (
                pairs.join(acc_a, "doc_a", "left_semi")
                .select(F.col("doc_b").alias("doc_id"))
                .unionByName(
                    pairs.join(acc_b, "doc_b", "left_semi")
                    .select(F.col("doc_a").alias("doc_id"))
                )
                .distinct()
            )
            in_batch = pairs.join(acc_a, "doc_a", "left_anti").join(
                acc_b, "doc_b", "left_anti"
            )
            cand = sdocs.join(store_adj, "doc_id", "left_anti")
        else:
            in_batch, cand = pairs, sdocs
        comp = D.connected_components(in_batch, ephemeral=True)
        removed = comp.filter(F.col("node") != F.col("comp")).select(
            F.col("node").alias("doc_id")
        )
        surv = cand.join(removed, "doc_id", "left_anti")
        surv.write.mode("overwrite").parquet(
            f"{accepted_path}/epoch={epoch_id}"
        )
        pairs.unpersist()
        sdocs.unpersist()

    return (
        docs.writeStream.foreachBatch(gate)
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
    )


def read_curated(spark: SparkSession, accepted_path: str) -> DataFrame:
    """The stream-built survivor corpus (all epochs)."""
    return spark.read.parquet(accepted_path).drop("epoch")


EMB_DDL = "vec_id LONG, embedding ARRAY<FLOAT>, label LONG"


def stream_embeddings(
    spark: SparkSession, src_dir: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream of incoming embedding rows (index ingest)."""
    return (
        spark.readStream.format("parquet")
        .schema(EMB_DDL)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .load(src_dir)
    )


def ivf_ingest(
    vecs: DataFrame,
    cents: list[tuple[int, list[float]]],
    index_path: str,
    query_name: str = "ivf_ingest",
):
    """Incremental IVF index maintenance: each micro-batch of new
    vectors is assigned to its nearest coarse cell (the trained
    k-means centroids, e.g. from ``similarity.kmeans_assign``) with
    the same map-only literal-centroid expression the batch trainer
    uses, then appended to a CELL-PARTITIONED parquet index under
    epoch=<id> (idempotent retry, same contract as neardup_ingest).

    The payoff at scale: searches prune to one cell DIRECTORY
    (PartitionFilters at the scan — see ``ivf_search``), so the index
    grows without rewrites and reads never touch other cells. The
    centroids stay fixed between retrains, which is what keeps the
    layout append-only; a retrain is a new index root."""
    from baronbatch_etl_spark.operators.similarity import _nearest_centroid

    def add(batch: DataFrame, epoch_id: int) -> None:
        best = _nearest_centroid(F.col("embedding"), cents)
        (
            batch.select(
                "vec_id", "embedding", best.getField("cid").alias("cell")
            )
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{index_path}/epoch={epoch_id}")
        )

    return (
        vecs.writeStream.foreachBatch(add)
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
    )


def ivf_search(
    spark: SparkSession,
    index_path: str,
    cents: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 5,
) -> DataFrame:
    """Cell-pruned top-k over the incrementally-maintained index: the
    query's cell id is computed driver-side against the same
    centroids, and the scan's partition filter prunes every other
    cell directory before any file is opened."""
    from baronbatch_etl_spark.operators.similarity import cosine

    # mirror _nearest_centroid exactly — (x−y)·(x−y) terms folded
    # left-to-right from 0.0, ties to the lowest cid — so a near-tie
    # between centroids sends the search to the SAME cell the
    # matching vectors were ingested into (bit-identical assignment)
    def _sqdist(c: list[float]) -> float:
        acc = 0.0
        for x, y in zip(query_vec, c):
            d = float(x) - float(y)
            acc = acc + d * d
        return acc

    best_cell = min((_sqdist(c), cid) for cid, c in cents)[1]
    idx = spark.read.parquet(index_path).filter(F.col("cell") == best_cell)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = idx.select(
        "vec_id", "cell", cosine(F.col("embedding"), q).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(k)


def volume_monitor_ingest(
    events: DataFrame, counts_path: str, query_name: str = "volume"
):
    """Streaming twin of ``w_anomaly_zscore``'s input build: each
    micro-batch folds to (event_type, hour, n) hourly-count partials
    written to ``{counts_path}/epoch=<id>`` — the same epoch-keyed
    idempotent sink as incremental_gold (a retried batch overwrites
    its own epoch, so at-least-once delivery folds to exactly-once
    counts). Hourly counts are the mergeable monitoring state:
    ``read_anomalies`` re-sums them and applies the shared trailing
    z-score fold (operators/corpus.py::hourly_zscores), so the live
    monitor's answer is bit-identical to the batch query over the
    same events — no raw events retained, only |types|×hours counts
    per epoch.
    """

    def fold(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("hour")
            )
            .agg(F.count("*").cast("long").alias("n"))
            .write.mode("overwrite")
            .parquet(f"{counts_path}/epoch={epoch_id}")
        )

    return (
        events.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def read_anomalies(spark: SparkSession, counts_path: str) -> DataFrame:
    """Fold the per-epoch hourly-count partials into the current
    top-20 volume anomalies (the read side of volume_monitor_ingest;
    same fold as the batch ``w_anomaly_zscore``)."""
    from baronbatch_etl_spark.operators.corpus import hourly_zscores

    hourly = (
        spark.read.parquet(counts_path)
        .groupBy("event_type", "hour")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return hourly_zscores(hourly, window_hours=24, min_history=12, top=20)


def enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of events joins
    the (static, broadcastable) customer dim — Spark's native
    stream-static join, the streaming form of J1's broadcast dim
    lookup. The static side re-resolves per micro-batch, so a dim
    refresh lands without restarting the query; no watermark or state
    is needed because the static side never changes mid-batch."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return events.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", "user_name", "segment", "event_type", "value"
    )


def with_ingest_metrics(events: DataFrame, name: str = "ingest") -> DataFrame:
    """Attach per-micro-batch observed metrics to a stream: row count
    and a null-key count ride each batch's own processing (the
    streaming twin of sources.write_with_metrics) and surface in every
    StreamingQueryProgress under ``observedMetrics[name]`` — the
    monitoring hook an ingest SLO dashboard consumes, with zero extra
    passes over the data."""
    return events.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        # coalesce: an empty micro-batch reports 0, not NULL
        F.coalesce(
            F.sum(
                F.when(F.col("user_id").isNull(), F.lit(1)).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("null_users"),
    )


def rate_progress_report(query) -> list[dict]:
    """Per-micro-batch rate/backpressure digest of a StreamingQuery's
    ``recentProgress`` — the T5 observability surface next to
    ``with_ingest_metrics``: with ``maxFilesPerTrigger=N`` the report
    shows the source feeding bounded batches (one row per trigger),
    and a ``processed_rps`` persistently below ``input_rps`` is the
    backpressure signal that the sink can't keep up with the source
    rate cap. Driver-side and O(#batches) — recentProgress retains at
    most ``spark.sql.streaming.numRecentProgressUpdates`` (100)
    entries, so this never scales with data volume.

    Empty triggers (numInputRows=0 heartbeats) are dropped: they carry
    no rate information and availableNow runs end with one."""
    out = []
    for p in query.recentProgress:
        n = p.get("numInputRows", 0) or 0
        if n == 0:
            continue
        dur = p.get("durationMs", {}) or {}
        out.append(
            {
                "batch_id": p.get("batchId"),
                "num_input_rows": n,
                "input_rps": float(p.get("inputRowsPerSecond") or 0.0),
                "processed_rps": float(
                    p.get("processedRowsPerSecond") or 0.0
                ),
                "trigger_ms": int(dur.get("triggerExecution", 0) or 0),
                "addbatch_ms": int(dur.get("addBatch", 0) or 0),
            }
        )
    return out


SOURCED_DOCS_DDL = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)


def stream_sourced_docs(
    spark: SparkSession, src_dir: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream of provenance-tagged documents (the full
    fixture schema incl. ``source``) — input to the drift monitor."""
    return _stream_parquet(spark, src_dir, SOURCED_DOCS_DDL, glob)


def drift_monitor_ingest(
    docs: DataFrame, stats_path: str, query_name: str = "drift"
):
    """Streaming twin of ``t_corpus_drift``: each micro-batch folds to
    (source, tok, c_st) token-count partials written to
    ``{stats_path}/epoch=<id>`` — the same epoch-keyed idempotent sink
    as incremental_gold (a retried batch overwrites its own epoch, so
    at-least-once delivery folds to exactly-once counts).

    Counts are the mergeable drift state: ``read_drift`` re-sums them
    and applies the shared exact-integer TV fold
    (operators/corpus.py), so the monitor's answer is bit-identical to
    the batch query over the same documents — no text is retained,
    only vocabulary-sized counts per epoch.
    """
    from baronbatch_etl_spark.operators import text as X

    def fold(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.select(
                "source", F.explode(X.tokens("text")).alias("tok")
            )
            .groupBy("source", "tok")
            .agg(F.count("*").alias("c_st"))
            .write.mode("overwrite")
            .parquet(f"{stats_path}/epoch={epoch_id}")
        )

    return (
        docs.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def read_drift(spark: SparkSession, stats_path: str) -> DataFrame:
    """Fold the per-epoch token-count partials into current per-source
    TV drift (the read side of drift_monitor_ingest)."""
    from baronbatch_etl_spark.operators import corpus as C

    st = (
        spark.read.parquet(stats_path)
        .groupBy("source", "tok")
        .agg(F.sum("c_st").alias("c_st"))
    )
    return C.tv_drift_from_counts(st)


def cms_monitor_ingest(
    docs: DataFrame, grid_path: str, query_name: str = "cms"
):
    """Streaming twin of ``a_cms_heavy_hitters``'s grid build: each
    micro-batch folds to a partial d×w count-min grid written to
    ``{grid_path}/epoch=<id>`` — per-batch token counts first (a
    batch-bounded partial agg), then the shared grid fold
    (operators/corpus.py), so per-epoch state is ≤ d·w = 2048 BIGINT
    cells no matter the batch size and no text or vocabulary is
    retained at all.

    Grids union by cell addition, so ``read_cms``'s re-sum is
    bit-identical to the batch grid over the same documents. The
    epoch-keyed overwrite makes at-least-once delivery fold to
    exactly-once cells (same contract as incremental_gold).
    """
    from baronbatch_etl_spark.operators import corpus as C
    from baronbatch_etl_spark.operators import text as X

    def fold(batch: DataFrame, epoch_id: int) -> None:
        hashed = (
            batch.select(F.explode(X.tokens("text")).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("c"))
            .select(X.char_poly_hash(F.col("tok")).alias("hv"), "c")
        )
        (
            C.cms_grid_from_hashes(hashed, weight="c")
            .write.mode("overwrite")
            .parquet(f"{grid_path}/epoch={epoch_id}")
        )

    return (
        docs.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def read_cms(spark: SparkSession, grid_path: str) -> DataFrame:
    """Fold the per-epoch partial grids into the current d×w counter
    grid (the read side of cms_monitor_ingest). Point estimates read
    as min over the d cells a token hashes to — join
    operators/corpus.cms_buckets against this frame, or use
    ``cms_estimate`` below."""
    return (
        spark.read.parquet(grid_path)
        .groupBy("j", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )


def cms_estimate(
    spark: SparkSession, grid_path: str, tokens: list[str]
) -> DataFrame:
    """Point-estimate token frequencies from the streamed grid:
    (tok, cms_est) with the CMS guarantee est ≥ true count over
    everything ingested so far. The token list is a driver-side probe
    set (a dashboard's watchlist), the grid is ≤ d·w rows — both
    sides broadcast-scale, so this runs in milliseconds regardless of
    how much text the monitor has folded."""
    from baronbatch_etl_spark.operators import corpus as C
    from baronbatch_etl_spark.operators import text as X

    probes = (
        spark.createDataFrame([(t,) for t in tokens], "tok STRING")
        .select("tok", X.char_poly_hash(F.col("tok")).alias("hv"))
        .select("tok", F.explode(C.cms_buckets(F.col("hv"))).alias("jb"))
        .select("tok", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    )
    return (
        probes.join(
            F.broadcast(read_cms(spark, grid_path)), ["j", "bucket"], "left"
        )
        .groupBy("tok")
        # an absent cell means nothing ever hashed there: its counter
        # is 0, so the min (the estimate) is 0 — never-seen tokens
        # report 0, not the min of their non-empty cells
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("cms_est"))
    )


def media_features_ingest(
    docs: DataFrame, features_path: str, query_name: str = "media_features"
):
    """Streaming twin of the multimodal feature lane (mm_features +
    the aHash fingerprint): each micro-batch maps documents through
    the media convention, runs the Arrow feature extraction and
    payload fingerprint, and writes the rows to
    ``{features_path}/epoch=<id>`` — the same epoch-keyed idempotent
    sink as incremental_gold (a retried batch overwrites its own
    epoch). Feature extraction is row-local — no cross-batch state —
    so the union of epochs equals the batch operators over the union
    of inputs, bit-for-bit (asserted in
    tests/test_streaming_multibatch.py). At 100 TB this is the shape
    for continuous media-asset enrichment: decode cost rides the
    ingest stream once, and downstream near-dup blocking reads the
    accumulated fingerprint store instead of re-decoding the corpus.
    """
    from baronbatch_etl_spark.operators import multimodal as M

    def fold(batch: DataFrame, epoch_id: int) -> None:
        media = M.documents_as_media(batch)
        (
            M.extract_features(media)
            .join(M.payload_fingerprints(media), "media_id")
            .write.mode("overwrite")
            .parquet(f"{features_path}/epoch={epoch_id}")
        )

    return (
        docs.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def read_media_features(spark: SparkSession, features_path: str) -> DataFrame:
    """Read side of media_features_ingest: the epoch union IS the
    feature store (media ids are unique across an append-only ingest,
    so no fold is needed — a replayed epoch was overwritten in place).
    """
    return spark.read.parquet(features_path)


# ---------------------------------------------------------------------------
# Graph authority: epoch-folded edge store + deterministic recompute
# ---------------------------------------------------------------------------

#: Interaction-pair stream schema (customer key, supplier key).
PAIRS_DDL = "c BIGINT, s BIGINT"


def stream_pairs(
    spark: SparkSession, src_dir: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream of (c, s) interaction pairs — input to the
    graph-authority monitor."""
    return _stream_parquet(spark, src_dir, PAIRS_DDL, glob)


def authority_ingest(
    pairs: DataFrame, edges_path: str, query_name: str = "authority"
):
    """Streaming twin of the graph-authority family (``g_pagerank`` /
    ``g_hits``): each micro-batch folds its interaction pairs to a
    DISTINCT (c, s) partial written to ``{edges_path}/epoch=<id>``.

    The edge SET is the mergeable graph state: partials union by
    distinct-on-read, and a replayed epoch overwrites its own
    directory, so at-least-once delivery folds to exactly-once edges
    (the incremental_gold contract). ``read_authority`` re-runs the
    shared deterministic operators over the folded set — link-graph
    scores are recomputed per read, the production cadence for
    authority priors (rank state is NOT incrementally mergeable, edge
    sets are; recompute-from-edges is how host-graph PageRank is
    actually refreshed). Per-epoch state: batch-bounded distinct key
    pairs, nothing else retained.
    """

    def fold(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.select("c", "s")
            .distinct()
            .write.mode("overwrite")
            .parquet(f"{edges_path}/epoch={epoch_id}")
        )

    return (
        pairs.writeStream.foreachBatch(fold)
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def read_authority(
    spark: SparkSession,
    edges_path: str,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the folded edge store (read side of
    ``authority_ingest``): distinct-union the epoch partials, apply
    the even/odd node encoding of ``g_pagerank``, undirected closure,
    shared fixed-point operator — bit-identical to the batch query
    over the same pair set (multibatch-tested)."""
    from baronbatch_etl_spark.operators import graph as G

    pairs = (
        spark.read.parquet(edges_path)
        .select(
            (F.col("c") * 2).alias("a"), (F.col("s") * 2 + 1).alias("b")
        )
        .distinct()
    )
    return G.pagerank(
        G.undirected_edges(pairs, "a", "b", disjoint=True),
        iters=iters,
        damping=damping,
    )
