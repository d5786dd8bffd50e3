"""Multi-micro-batch streaming: split events into several files, feed
them one per trigger (maxFilesPerTrigger=1), and check that the
incrementally-maintained gold aggregate converges to the batch answer
— the reference's `$inc`-upsert-over-many-ticks semantics (T1/T4/T5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.streaming import ops


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stream") / "files")
    ev = load_table(spark, sf_dir, "events")
    # 4 files → 4 micro-batches at maxFilesPerTrigger=1;
    # keep ts as epoch-nanos LONG to match the streaming reader schema
    (
        ev.withColumn("ts", F.unix_micros("ts") * 1000)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_multibatch_incremental_gold_converges(
    spark, sf_dir, split_events_dir, tmp_path
):
    stream = ops.stream_events(spark, split_events_dir, glob="*.parquet")
    gold_path = str(tmp_path / "gold")
    q = ops.incremental_gold(stream, gold_path, "mb_gold").start()
    try:
        # availableNow: the query drains all files then stops itself
        q.awaitTermination(120)
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 4, n_batches  # one per file: true progression

    batch = load_table(spark, sf_dir, "events").groupBy(
        "user_id", "event_type"
    ).agg(F.count("*").alias("games"))
    want = {(r.user_id, r.event_type): r.games for r in batch.collect()}
    got = {
        (r.user_id, r.event_type): r.games
        for r in ops.read_gold(spark, gold_path).collect()
    }
    assert got == want


def test_multibatch_dedup_replayed_file(spark, split_events_dir, tmp_path):
    # copy one source file twice into a fresh dir → at-least-once
    # delivery; watermark dedup must collapse the replay
    import glob
    import shutil

    d = str(tmp_path / "replay")
    files = sorted(glob.glob(f"{split_events_dir}/part-*.parquet"))
    shutil.os.makedirs(d)
    shutil.copy(files[0], f"{d}/a.parquet")
    shutil.copy(files[0], f"{d}/b.parquet")  # replayed batch

    stream = ops.stream_events(spark, d, glob="*.parquet")
    q = (
        ops.watermark_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mb_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM mb_dedup")
    one_file = spark.read.parquet(files[0]).count()
    assert out.count() == one_file
    assert out.select("event_id").distinct().count() == one_file
