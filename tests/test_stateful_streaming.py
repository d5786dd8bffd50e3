"""Custom stateful operator (applyInPandasWithState) + checkpointed
exactly-once recovery (T2): a restarted query resumes from offsets and
never reprocesses finished files."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.streaming import ops
from baronbatch_etl_spark.streaming.stateful import running_user_stats


@pytest.fixture(scope="module")
def event_files(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stateful") / "src")
    ev = load_table(spark, sf_dir, "events")
    (
        ev.withColumn("ts", F.unix_micros("ts") * 1000)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    return sorted(glob.glob(f"{src}/part-*.parquet"))


def test_stateful_running_stats_accumulates(spark, sf_dir, event_files, tmp_path):
    d = str(tmp_path / "all")
    shutil.os.makedirs(d)
    for i, f in enumerate(event_files):
        shutil.copy(f, f"{d}/f{i}.parquet")

    out = running_user_stats(ops.stream_events(spark, d, glob="*.parquet"))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 4

    # update mode emits one row per user per batch; the LAST emission
    # per user must equal the full batch aggregate (state accumulated
    # correctly across micro-batches)
    emitted = spark.sql(
        """SELECT user_id, max_by(games, games) AS games,
                  max_by(value_sum, games) AS value_sum
           FROM state_out GROUP BY user_id"""
    ).collect()
    got = {r.user_id: r.games for r in emitted}
    want = {
        r.user_id: r.games
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("games"))
        .collect()
    }
    assert got == want


def test_checkpoint_restart_does_not_reprocess(spark, event_files, tmp_path):
    src = str(tmp_path / "grow")
    ckpt = str(tmp_path / "ckpt")
    shutil.os.makedirs(src)

    gold_path = str(tmp_path / "gold")

    def run_once():
        stream = ops.stream_events(spark, src, glob="*.parquet")
        q = (
            ops.incremental_gold(stream, gold_path, "ckpt_gold")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()

    def gold_total() -> int:
        return sum(
            r.games for r in ops.read_gold(spark, gold_path).collect()
        )

    # phase 1: two files
    shutil.copy(event_files[0], f"{src}/a.parquet")
    shutil.copy(event_files[1], f"{src}/b.parquet")
    run_once()
    phase1_total = gold_total()

    # phase 2: two more files arrive; SAME checkpoint, SAME gold dir.
    # If the restart re-read a+b, their epochs would double-count.
    shutil.copy(event_files[2], f"{src}/c.parquet")
    shutil.copy(event_files[3], f"{src}/d.parquet")
    run_once()
    total = gold_total()

    n_all = sum(
        spark.read.parquet(f).count() for f in event_files
    )
    n_first_two = (
        spark.read.parquet(event_files[0]).count()
        + spark.read.parquet(event_files[1]).count()
    )
    assert phase1_total == n_first_two
    assert total == n_all  # exactly-once: c+d added, a+b NOT replayed


def test_stateful_funnel_matches_batch_fold(spark, sf_dir, tmp_path):
    """In-order micro-batches through funnel_progress must land every
    user on exactly the stage a single-pass replay of the fold rule
    over the globally ts-sorted stream produces (the w_funnel batch
    semantics)."""
    from baronbatch_etl_spark.streaming.stateful import funnel_progress

    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    rows = ev.collect()

    # expected: replay the strict-progression rule per user
    want: dict[int, int] = {}
    state: dict[int, list] = {}
    for r in rows:
        v, c, p = state.setdefault(r.user_id, [None, None, None])
        if v is None:
            if r.event_type == "view":
                state[r.user_id][0] = r.ts
        elif c is None:
            if r.event_type == "click" and r.ts > v:
                state[r.user_id][1] = r.ts
        elif p is None:
            if r.event_type == "purchase" and r.ts > c:
                state[r.user_id][2] = r.ts
    for u, (v, c, p) in state.items():
        want[u] = sum(t is not None for t in (v, c, p))

    # feed the SAME order in 4 sequential chunks (one file per batch)
    src = str(tmp_path / "src")
    shutil.os.makedirs(src)
    n = len(rows)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        chunk = rows[cuts[i]:cuts[i + 1]]
        (
            spark.createDataFrame(chunk, ev.schema)
            .withColumn("ts", F.unix_micros("ts") * 1000)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/stage_{i}")
        )
        for f in glob.glob(f"{src}/stage_{i}/part-*.parquet"):
            shutil.copy(f, f"{src}/f{i}.parquet")

    stream = ops.stream_events(spark, src, glob="f*.parquet").select(
        "user_id", "ts", "event_id", "event_type"
    )
    q = (
        funnel_progress(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
        assert len(q.recentProgress) >= 4  # one file per trigger
    finally:
        q.stop()

    got = {
        r.user_id: r.stage
        for r in spark.sql(
            "SELECT user_id, max(stage) AS stage FROM funnel_out GROUP BY user_id"
        ).collect()
    }
    assert got == want


def test_funnel_fold_is_chunk_order_invariant():
    """applyInPandasWithState hands one GROUP to the fold as multiple
    Arrow chunks (default ~10k rows) in arbitrary shuffle order. The
    fold must produce the same result no matter how the group's rows
    are split into chunks or how the chunks are ordered — the r4
    advice caught per-chunk sorting, which is not a total order."""
    import pandas as pd

    from baronbatch_etl_spark.streaming.stateful import _update_funnel

    class FakeState:
        exists = False

        def update(self, t):
            self.value = t

    # view@10 < click@20 < purchase@30, plus decoys; a per-chunk sort
    # with the purchase/click chunk arriving FIRST never advances past
    # stage 1 — the whole-group sort reaches stage 3.
    rows = pd.DataFrame(
        {
            "ts_us": [30, 20, 5, 10, 25],
            "event_id": [5, 4, 1, 2, 3],
            "event_type": ["purchase", "click", "click", "view", "view"],
        }
    )

    def run(chunks):
        st = FakeState()
        out = list(_update_funnel((7,), iter(chunks), st))
        assert len(out) == 1
        return int(out[0]["stage"].iloc[0]), st.value

    want = run([rows.sort_values(["ts_us", "event_id"])])
    assert want[0] == 3 and want[1] == (10, 20, 30)
    # late-stage events in the FIRST chunk, early in the second
    assert run([rows.iloc[:2], rows.iloc[2:]]) == want
    # one row per chunk, reversed
    assert run([rows.iloc[[i]] for i in range(4, -1, -1)]) == want
    # empty group (no chunks) still emits current state
    st = FakeState()
    out = list(_update_funnel((7,), iter([]), st))
    assert int(out[0]["stage"].iloc[0]) == 0


def test_ttl_debounce_matches_batch_lag_fold(spark, sf_dir, tmp_path):
    """In-order micro-batches through ttl_debounce must admit exactly
    the rows the batch lag-gap fold (st_ttl_dedup) keeps — TTL
    debounce is prefix-decomposable, so streaming state carried
    across batches reproduces the batch answer row-for-row. Also
    exercises the EventTimeTimeout eviction path end-to-end (the
    only stateful op here with bounded state)."""
    from baronbatch_etl_spark.queries import load_all
    from baronbatch_etl_spark.streaming.stateful import ttl_debounce

    reg = load_all()
    want = {
        (r.user_id, r.event_type, r.ts_us, r.event_id)
        for r in reg["st_ttl_dedup"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    rows = ev.collect()
    src = str(tmp_path / "src")
    shutil.os.makedirs(src)
    n = len(rows)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        chunk = rows[cuts[i]:cuts[i + 1]]
        (
            spark.createDataFrame(chunk, ev.schema)
            .withColumn("ts", F.unix_micros("ts") * 1000)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/stage_{i}")
        )
        for f in glob.glob(f"{src}/stage_{i}/part-*.parquet"):
            shutil.copy(f, f"{src}/f{i}.parquet")

    stream = ops.stream_events(spark, src, glob="f*.parquet")
    q = (
        ttl_debounce(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
        assert len(q.recentProgress) >= 4
    finally:
        q.stop()

    got = {
        (r.user_id, r.event_type, r.ts_us, r.event_id)
        for r in spark.sql("SELECT * FROM ttl_out").collect()
    }
    assert got == want
