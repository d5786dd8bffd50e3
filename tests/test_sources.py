"""Source/sink tests: format round-trips, permissive JSON, partitioned
writes with pruning, bucketed shuffle-free joins, salted skew joins."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.sources import (
    read_csv,
    read_json,
    salted_join,
    write_bucketed_table,
    write_partitioned,
)


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(k=1, name="a"), Row(k=2, name="b")]
    )
    csv_dir, json_dir = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.mode("overwrite").option("header", "true").csv(csv_dir)
    df.write.mode("overwrite").json(json_dir)
    back_csv = read_csv(spark, csv_dir, "k LONG, name STRING")
    back_json = read_json(spark, json_dir, "k LONG, name STRING")
    want = {(1, "a"), (2, "b")}
    assert {tuple(r) for r in back_csv.collect()} == want
    assert {tuple(r) for r in back_json.collect()} == want


def test_permissive_json_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"k": 1, "name": "ok"}\n{"k": broken\n{"k": 3, "name": "ok2"}\n')
    df = read_json(
        spark,
        str(p),
        "k LONG, name STRING, _corrupt_record STRING",
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.k for r in good} == {1, 3}
    assert len(bad) == 1  # quarantined, job not failed


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "by_status")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, out, ["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the status predicate must be a partition filter, not a data filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or (
        "PartitionFilters: [" in plan and "o_orderstatus" in
        plan.split("PartitionFilters:")[1].split("]")[0]
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    # bucketed tables are managed → they land in the default
    # warehouse dir (spark-warehouse/, gitignored); dropped below.
    # Clean both catalog entries and any orphaned locations from
    # earlier aborted runs.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey"
    )
    write_bucketed_table(
        lineitem.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey"
    )
    # at fixture sizes the planner prefers a broadcast (and skips the
    # bucketed layout entirely); disable it to observe the bucketed
    # co-located join — the at-scale shape where neither side fits in
    # a broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: no shuffle of either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(1000)]
        + [Row(k="cold", v=i) for i in range(10)]
    )
    small = spark.createDataFrame(
        [Row(k="hot", name="H"), Row(k="cold", name="C")]
    )
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", salt_buckets=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the hot key actually spreads across salt values
    spread = (
        big.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)),
        )
        .filter("k = 'hot'")
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_compact_merges_small_files_without_shuffle(spark, tmp_path):
    from baronbatch_etl_spark.sources.writers import compact

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 64

    n = compact(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1  # everything fits one target-sized file
    got = spark.read.parquet(dst)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_range_clusters_for_pruning(spark, tmp_path):
    import pyarrow.parquet as pq

    from baronbatch_etl_spark.sources.writers import compact

    src, dst = str(tmp_path / "small2"), str(tmp_path / "clustered")
    spark.range(50_000).withColumn(
        "k", F.pmod(F.xxhash64("id"), F.lit(50_000))
    ).repartition(32).write.parquet(src)

    # force several output files, clustered on k
    compact(spark, src, dst, target_file_bytes=64 * 1024, sort_col="k")
    files = spark.read.parquet(dst).inputFiles()
    assert len(files) > 1
    # every output file covers a disjoint k-range (footer min/max
    # prune whole files for a key predicate)
    ranges = []
    for f in files:
        md = pq.read_metadata(f.removeprefix("file:"))
        lo = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_binary_assets_reader_feeds_multimodal(spark, tmp_path):
    from baronbatch_etl_spark.operators import multimodal as M
    from baronbatch_etl_spark.sources.readers import read_binary_assets

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"\xff\xd8\xff" + b"x" * 40)
    (d / "b.png").write_bytes(b"\x89PNG" + b"y" * 10)
    (d / "huge.mp4").write_bytes(b"z" * 5000)
    (d / "notes.txt").write_bytes(b"hello")

    df = read_binary_assets(spark, str(d), max_bytes=1000)
    rows = {r.src_path.split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.png", "notes.txt"}  # mp4 gated out
    assert rows["a.jpg"].meta.mime == "image/jpeg"
    assert rows["b.png"].meta.mime == "image/png"
    assert rows["notes.txt"].meta.mime == "application/octet-stream"
    assert bytes(rows["a.jpg"].payload).startswith(b"\xff\xd8\xff")
    # media_id is deterministic: re-read gives identical ids
    again = {
        r.src_path.split("/")[-1]: r.media_id
        for r in read_binary_assets(spark, str(d), max_bytes=1000).collect()
    }
    assert {k: v.media_id for k, v in rows.items()} == again
    # the media convention feeds the feature extractor directly
    feats = M.extract_features(
        df.select("media_id", "payload", "meta")
    ).collect()
    assert len(feats) == 3 and all(r.features is not None for r in feats)


def test_schema_evolution_merges_and_backfills_nulls(spark, tmp_path):
    # the reference's Mongo documents are schemaless and grow fields
    # over time; the parquet-zone answer is mergeSchema on read: old
    # files gain NULL for new columns, nothing is rewritten
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "old")], "id LONG, a STRING"
    ).write.parquet(f"{d}/batch=1")
    spark.createDataFrame(
        [(2, "new", 5.0)], "id LONG, a STRING, score DOUBLE"
    ).write.parquet(f"{d}/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert {"id", "a", "score", "batch"} <= set(df.columns)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 5.0


def test_write_with_metrics_observes_during_write(spark, tmp_path):
    from pyspark.sql import functions as F

    from baronbatch_etl_spark.sources.writers import write_with_metrics

    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(1000)], "id LONG, v DOUBLE"
    )
    metrics = write_with_metrics(
        df,
        str(tmp_path / "out"),
        rules={"v_zero": F.col("v") == 0.0, "v_big": F.col("v") > 7.0},
    )
    assert metrics["n_rows"] == 1000
    assert metrics["violations_v_zero"] == 100
    assert metrics["violations_v_big"] == 200
    # and the write itself is intact
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1000


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    # the idempotent backfill write: re-running one day's job must
    # replace THAT partition only, not truncate the table (static
    # overwrite mode would)
    d = str(tmp_path / "by_day")
    full = spark.createDataFrame(
        [(1, "d1", "old1"), (2, "d2", "old2"), (3, "d3", "old3")],
        "id LONG, day STRING, payload STRING",
    )
    full.write.partitionBy("day").mode("overwrite").parquet(d)
    redo = spark.createDataFrame(
        [(9, "d2", "new2")], "id LONG, day STRING, payload STRING"
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        redo.write.partitionBy("day").mode("overwrite").parquet(d)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    rows = {r.day: r.payload for r in spark.read.parquet(d).collect()}
    assert rows == {"d1": "old1", "d2": "new2", "d3": "old3"}


# ---------------------------------------------------------------------------
# Custom Python DataSource: paginated API scan (paged_api)
# ---------------------------------------------------------------------------


def test_paged_api_batch_rows_and_partitions(spark):
    from baronbatch_etl_spark.sources import paged_api

    paged_api.register(spark)
    df = (
        spark.read.format("paged_api")
        .option("n_users", 5)
        .option("pages", 3)
        .option("page_size", 4)
        .load()
    )
    assert df.count() == 5 * 3 * 4
    # pagination IS partition planning: one task per (user, page)
    assert df.rdd.getNumPartitions() == 5 * 3
    rows = {(r.user_id, r.match_idx): r.match_id for r in df.collect()}
    assert rows[(2, 7)] == "m-2-7"  # deterministic fake fetch
    # filtered read returns exactly one user's pages
    assert df.filter(F.col("user_id") == 2).count() == 3 * 4


def test_paged_api_pushdown_prunes_pages():
    # in-process unit check of the planner: user_id predicates are
    # consumed (nothing left over) and the partition plan shrinks to
    # the matching users' pages only
    import pyspark.sql.datasource as ds

    from baronbatch_etl_spark.sources.paged_api import PagedApiReader

    opts = {"n_users": "10", "pages": "4", "page_size": "25"}
    r = PagedApiReader(opts)
    assert list(r.pushFilters([ds.EqualTo(("user_id",), 7)])) == []
    assert len(r.partitions()) == 4

    r = PagedApiReader(opts)
    assert list(r.pushFilters([ds.In(("user_id",), (1, 2, 99))])) == []
    assert len(r.partitions()) == 2 * 4

    r = PagedApiReader(opts)
    assert list(r.pushFilters([ds.GreaterThanOrEqual(("user_id",), 8)])) == []
    assert len(r.partitions()) == 2 * 4

    # filters on other columns are returned unsupported (Spark
    # re-applies them post-scan) and leave the plan untouched
    r = PagedApiReader(opts)
    left = list(r.pushFilters([ds.EqualTo(("page",), 0)]))
    assert len(left) == 1 and len(r.partitions()) == 10 * 4


def test_paged_api_stream_one_page_per_batch(spark, tmp_path):
    from baronbatch_etl_spark.sources import paged_api

    paged_api.register(spark)
    stream = (
        spark.readStream.format("paged_api")
        .option("n_users", 3)
        .option("pages", 4)
        .option("page_size", 2)
        .load()
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # drained source returns an unchanged offset → terminates
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    out = spark.read.parquet(out_dir)
    # drained listing: every page exactly once, one page per batch
    assert out.count() == 3 * 4 * 2
    assert out.select("page").distinct().count() == 4
    assert n_batches >= 4

    # restart from the committed offset is a no-op (page=pages)
    stream2 = (
        spark.readStream.format("paged_api")
        .option("n_users", 3)
        .option("pages", 4)
        .option("page_size", 2)
        .load()
    )
    q2 = (
        stream2.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out_dir).count() == 3 * 4 * 2  # unchanged


def test_paged_api_read_between_offsets_replays_exactly():
    # failure recovery: a batch that reached the WAL but not the
    # commit log is replayed via readBetweenOffsets — must equal the
    # rows the lost read() produced, and compose across pages
    from baronbatch_etl_spark.sources.paged_api import PagedApiStreamReader

    r = PagedApiStreamReader({"n_users": "3", "pages": "4", "page_size": "2"})
    it, nxt = r.read({"page": 1})
    assert nxt == {"page": 2}
    assert list(r.readBetweenOffsets({"page": 1}, {"page": 2})) == list(it)
    # multi-page replay covers each page exactly once
    rows = list(r.readBetweenOffsets({"page": 0}, {"page": 4}))
    assert len(rows) == 3 * 4 * 2
    assert len(set(rows)) == len(rows)
    # past-the-end replay is empty (drained source)
    assert list(r.readBetweenOffsets({"page": 4}, {"page": 4})) == []


# ---------------------------------------------------------------------------
# Retry policy: the reference's 429 sleep-and-retry and key-mismatch
# refetch (extractor/main.py:61-63, 379-391) as bounded recovery


def test_retry_policy_backs_off_then_succeeds():
    from baronbatch_etl_spark.sources.paged_api import RateLimited, RetryPolicy

    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise RateLimited()
        return ["row"]

    p = RetryPolicy(max_retries=5, backoff_ms=120_000, sleep=sleeps.append)
    assert p.call(flaky) == ["row"]
    assert calls["n"] == 4
    assert sleeps == [120.0, 120.0, 120.0]  # the reference's flat 2 min


def test_retry_policy_bounded_gives_up():
    import pytest

    from baronbatch_etl_spark.sources.paged_api import RateLimited, RetryPolicy

    sleeps: list[float] = []

    def dead():
        raise RateLimited()

    p = RetryPolicy(max_retries=2, backoff_ms=1_000, sleep=sleeps.append)
    with pytest.raises(RateLimited):
        p.call(dead)
    assert len(sleeps) == 2  # retried exactly max_retries times


def test_retry_policy_stale_key_refreshes_once():
    import pytest

    from baronbatch_etl_spark.sources.paged_api import RetryPolicy, StaleKey

    state = {"key": "stale", "refreshes": 0}

    def fetch():
        if state["key"] == "stale":
            raise StaleKey()
        return [state["key"]]

    def refresh():
        state["refreshes"] += 1
        state["key"] = "fresh"

    p = RetryPolicy(sleep=lambda s: None)
    assert p.call(fetch, refresh_key=refresh) == ["fresh"]
    assert state["refreshes"] == 1

    # a refresh that does NOT fix the key aborts (the reference's
    # "Failed to resolve local PUUID. Aborting batch." path)
    state2 = {"refreshes": 0}

    def still_stale():
        raise StaleKey()

    def refresh2():
        state2["refreshes"] += 1

    with pytest.raises(StaleKey):
        p.call(still_stale, refresh_key=refresh2)
    assert state2["refreshes"] == 1
    # and with no resolver at all, the first StaleKey propagates
    with pytest.raises(StaleKey):
        p.call(still_stale)


def test_retry_policy_mixed_rate_limit_and_stale_key():
    from baronbatch_etl_spark.sources.paged_api import (
        RateLimited,
        RetryPolicy,
        StaleKey,
    )

    sleeps: list[float] = []
    seq = [RateLimited(), StaleKey(), RateLimited(), None]
    state = {"i": 0}

    def fetch():
        e = seq[state["i"]]
        state["i"] += 1
        if e is not None:
            raise e
        return ["ok"]

    p = RetryPolicy(max_retries=5, backoff_ms=2_000, sleep=sleeps.append)
    assert p.call(fetch, refresh_key=lambda: None) == ["ok"]
    assert sleeps == [2.0, 2.0]  # 429s backed off; StaleKey did not


def test_stream_reader_retries_through_rate_limits(monkeypatch):
    # a flaky fetch inside a micro-batch read recovers via the same
    # bounded policy as the batch reader — the batch replays intact
    from baronbatch_etl_spark.sources import paged_api as P

    real = P._fetch_page
    fails = {"left": 2}

    def flaky(user_id, page, page_size):
        if fails["left"]:
            fails["left"] -= 1
            raise P.RateLimited()
        return real(user_id, page, page_size)

    monkeypatch.setattr(P, "_fetch_page", flaky)
    r = P.PagedApiStreamReader(
        {"n_users": "3", "pages": "2", "page_size": "2",
         "retry_backoff_ms": "0"}
    )
    rows = r._pages_between(0, 2)
    assert len(rows) == 3 * 2 * 2
    assert fails["left"] == 0  # the failures actually happened
