"""Window / top-k / sort / set-op catalog — SURVEY §2.5–§2.7.

The reference's only window-shaped work is keep-newest-N retention
(api_service/main.py:237-249) and a newest-300 read slice (:334-338);
the engine exposes the full Window surface (rank/lag/lead/frames) as
first-class queries. Every ordering carries a unique tiebreaker so
results are deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.queries import register

# ---------------------------------------------------------------------------
# W1 — retention trim: keep newest N per user, drop the rest
# (api_service/main.py:237-249; N=200 there, N=5 here so the trim
# actually drops rows at every scale factor).
# ---------------------------------------------------------------------------


@register(
    "w1_retention_trim",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM (
    SELECT e.*, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e
) WHERE rn <= 5
""",
    tags=("window", "retention"),
)
def w1_retention_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest-N-per-key via row_number — one shuffle on the key,
    no driver-side loop (the reference deletes row-by-row)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# W2/O1 — newest-N slice of one user, then global top-k (sort desc +
# limit → Spark plans TakeOrderedAndProject, a distributed top-k).
# ---------------------------------------------------------------------------


@register(
    "o1_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("topk", "sort"),
)
def o1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tiebreak — TakeOrderedAndProject
    (each partition keeps k, merge at the driver; no full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "w2_recent_slice",
    oracle="""
SELECT event_id, user_id, ts_ms, value
FROM (
    SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value,
           row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id = 7
) WHERE rn <= 300
""",
    tags=("window", "slice"),
)
def w2_recent_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest-300 of a single user (api_service/main.py:334-338):
    filter pushes to the scan, then ``orderBy(desc).limit(300)`` —
    Spark plans TakeOrderedAndProject (each partition keeps 300,
    merge at the driver), not a single-partition WindowExec sort.
    Same rows and hash as the row_number form the oracle keeps."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") == 7)
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(300)
        .select(
            "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "value"
        )
    )


# ---------------------------------------------------------------------------
# Full window-function surface (rank/dense_rank/lag/lead/frames) —
# free in Spark (SURVEY §2.5 note), exposed as engine queries.
# ---------------------------------------------------------------------------


@register(
    "w_rank_lag_lead",
    oracle="""
SELECT event_id, user_id,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window",),
)
def w_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lag / lead over a per-user event timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "w_running_sum",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_value
FROM events
""",
    tags=("window", "frame"),
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total with an explicit rows frame; DECIMAL
    accumulation keeps the prefix sums exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@register(
    "w_resample_ffill",
    oracle="""
WITH obs AS (
    SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, max(value) AS v
    FROM events GROUP BY 1, 2
),
b AS (
    SELECT k, date_trunc('hour', min(t)) AS t0,
           date_trunc('hour', max(t)) AS t1
    FROM obs GROUP BY k
),
grid AS (
    SELECT k, g.g AS gts
    FROM b, LATERAL (
        SELECT unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS g
    ) g
)
SELECT grid.k AS user_id, epoch_ms(grid.gts) AS grid_ts_ms,
       obs.v AS filled_value
FROM grid ASOF LEFT JOIN obs
  ON grid.k = obs.k AND grid.gts >= obs.t
""",
    tags=("window", "timeseries", "resample"),
)
def w_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular→hourly-grid resampling with forward fill (per-user
    carry-forward of the latest value; the DuckDB oracle replays it
    as a native ASOF LEFT JOIN against the generated grid)."""
    from baronbatch_etl_spark.operators.joins import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    return resample_ffill(ev, key="user_id", ts="ts", value="value")


@register(
    "w_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS ts_ms,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY epoch(o_orderdate)
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS spend_7d
FROM orders
""",
    tags=("window", "frame", "range"),
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: each order's trailing-7-day per-customer
    spend. Unlike a rows frame, peers at the same timestamp aggregate
    together regardless of tie order — so no unique tiebreaker is
    needed for determinism. Ordering on epoch seconds keeps the frame
    bound numeric in both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.unix_millis("o_orderdate").alias("ts_ms"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
    )


# ---------------------------------------------------------------------------
# Sessionization — gap-based sessions via lag + cumulative flag (the
# batch twin of streaming session_window; SURVEY §2.9 / guide pattern).
# ---------------------------------------------------------------------------


@register(
    "w_sessionize",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
                     - lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id)
                     > 1800000
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), sessions AS (
    SELECT user_id, event_id,
           CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no
    FROM flagged
)
SELECT user_id, session_no, count(*) AS n_events
FROM sessions GROUP BY user_id, session_no
""",
    tags=("window", "session"),
)
def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization: lag → new-session flag → running sum
    as session id → per-session rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (ms - F.lag(ms).over(w) > 1800000) | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events")
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations (union/intersect/except; the reference only
# has them implicitly via distinct/$nin, engine exposes all three).
# ---------------------------------------------------------------------------


@register(
    "set_ops",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT c_custkey FROM customer WHERE c_nationkey = 3
""",
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union (distinct) then except — composed set algebra."""
    c = load_table(spark, sf_dir, "customer")
    furniture = c.filter(F.col("c_mktsegment") == "FURNITURE").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    nat3 = c.filter(F.col("c_nationkey") == 3).select("c_custkey")
    return furniture.union(rich).distinct().exceptAll(nat3.distinct())


@register(
    "set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect: customers having both finished and open orders."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)
