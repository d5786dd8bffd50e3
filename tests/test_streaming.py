"""Live Structured-Streaming tests: each streaming op runs against the
parquet file source with a memory sink and is checked against its
batch twin (complete/update modes are exact; append mode holds back
windows newer than the final watermark, so those assert containment)."""

from __future__ import annotations

import pytest

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.queries import load_all
from baronbatch_etl_spark.streaming import ops

REGISTRY = load_all()


def _run_stream(df_writer, spark, name):
    q = df_writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return ops.stream_events(spark, sf_dir)


def test_tumbling_counts_complete_equals_batch(spark, sf_dir, events_stream):
    out = _run_stream(
        ops.tumbling_counts(events_stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_tumble"),
        spark,
        "t_tumble",
    )
    batch = REGISTRY["st_tumbling_agg"].fn(spark, sf_dir)
    got = {(r.window_start_ms, r.event_type): r.n for r in out.collect()}
    want = {(r.window_start_ms, r.event_type): r.n for r in batch.collect()}
    assert got == want


def test_watermark_dedup_removes_replays(spark, sf_dir, events_stream):
    out = _run_stream(
        ops.watermark_dedup(events_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup"),
        spark,
        "t_dedup",
    )
    n_batch = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_batch  # source has unique ids; none dropped
    assert out.select("event_id").distinct().count() == n_batch


def test_session_aggregate_append_is_subset_of_batch(
    spark, sf_dir, events_stream
):
    out = _run_stream(
        ops.session_aggregate(events_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess"),
        spark,
        "t_sess",
    )
    batch = REGISTRY["st_session_window"].fn(spark, sf_dir)
    got = {
        (r.user_id, r.session_start_ms): r.n_events for r in out.collect()
    }
    want = {
        (r.user_id, r.session_start_ms): r.n_events for r in batch.collect()
    }
    # append mode emits only sessions closed w.r.t. the final watermark
    assert got, "no sessions emitted"
    assert all(want.get(k) == v for k, v in got.items())
    assert len(got) >= len(want) * 0.9


def test_incremental_gold_foreachbatch_matches_batch(
    spark, sf_dir, events_stream, tmp_path
):
    gold_path = str(tmp_path / "gold")
    q = ops.incremental_gold(events_stream, gold_path, "t_gold").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = {
        (r.user_id, r.event_type): r.games
        for r in REGISTRY["a2_grouped_rollup"].fn(spark, sf_dir).collect()
    }
    got = {
        (r.user_id, r.event_type): r.games
        for r in ops.read_gold(spark, gold_path).collect()
    }
    assert got == batch


def test_stream_stream_join_equals_batch(spark, sf_dir, events_stream):
    # inner stream-stream join with watermarks + time bound: with the
    # whole fixture processed, every match must appear (inner joins
    # emit on match; nothing is held back for this data)
    out = _run_stream(
        ops.click_purchase_join(events_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssjoin"),
        spark,
        "t_ssjoin",
    )
    batch = REGISTRY["st_stream_join"].fn(spark, sf_dir)
    got = {(r.click_id, r.buy_id) for r in out.collect()}
    want = {(r.click_id, r.buy_id) for r in batch.collect()}
    assert got == want


def test_stream_static_enrichment_equals_batch(spark, sf_dir, events_stream):
    from baronbatch_etl_spark.io import load_table

    customers = load_table(spark, sf_dir, "customer")
    q = (
        ops.enrich_events(events_stream, customers)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM enriched")
    batch = ops.enrich_events(
        load_table(spark, sf_dir, "events").selectExpr(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ),
        customers,
    )
    assert got.count() == batch.count()
    # spot-check: enrichment values match the batch join row-for-row
    a = {r.event_id: (r.user_name, r.segment) for r in got.collect()}
    b = {r.event_id: (r.user_name, r.segment) for r in batch.collect()}
    assert a == b


def test_observed_metrics_surface_in_progress(spark, sf_dir, events_stream):
    q = (
        ops.with_ingest_metrics(events_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("observed_ingest")
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = q.recentProgress
    finally:
        q.stop()
    got = sum(
        p["observedMetrics"]["ingest"]["n_rows"]
        for p in progresses
        if "ingest" in p.get("observedMetrics", {})
    )
    from baronbatch_etl_spark.io import load_table

    assert got == load_table(spark, sf_dir, "events").count()
