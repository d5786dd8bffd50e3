"""Window / top-k / sort / set-op catalog — SURVEY §2.5–§2.7.

The reference's only window-shaped work is keep-newest-N retention
(api_service/main.py:237-249) and a newest-300 read slice (:334-338);
the engine exposes the full Window surface (rank/lag/lead/frames) as
first-class queries. Every ordering carries a unique tiebreaker so
results are deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from baronbatch_etl_spark.functions.scalars import round_half_up
from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.operators import joins as J
from baronbatch_etl_spark.operators import ranking as R
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


# ---------------------------------------------------------------------------
# Funnel analysis: ordered multi-stage conversion over the event stream
# ---------------------------------------------------------------------------


def funnel_state() -> "F.Column":
    """The funnel fold: collapse this group's (ts, et) events into a
    struct(v, c, p) of first-view / first-later-click /
    first-still-later-purchase timestamps. An aggregate expression
    (collect → sort → single left fold with O(1) state); usable under
    any groupBy. The strict ``ts > previous-stage`` comparisons live
    in the fold itself, so equal-timestamp events resolve identically
    to the declarative chained-min semantics no matter where
    array_sort places them within a tie (property-tested against a
    brute-force chained-min replay in test_properties.py)."""
    nil = F.lit(None).cast("timestamp")
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct("ts", "et"))),
        F.struct(nil.alias("v"), nil.alias("c"), nil.alias("p")),
        lambda acc, x: F.struct(
            F.when(
                acc["v"].isNull() & (x["et"] == "view"), x["ts"]
            ).otherwise(acc["v"]).alias("v"),
            F.when(
                acc["c"].isNull()
                & acc["v"].isNotNull()
                & (x["et"] == "click")
                & (x["ts"] > acc["v"]),
                x["ts"],
            ).otherwise(acc["c"]).alias("c"),
            F.when(
                acc["p"].isNull()
                & acc["c"].isNotNull()
                & (x["et"] == "purchase")
                & (x["ts"] > acc["c"]),
                x["ts"],
            ).otherwise(acc["p"]).alias("p"),
        ),
    )


@register(
    "w_funnel",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t1
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t2
    GROUP BY e.user_id
)
SELECT * FROM (
    SELECT 1 AS stage_idx, 'view' AS stage,
           (SELECT count(*) FROM v) AS users,
           1.0 AS conv FROM (VALUES (1)) 
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM c),
           (SELECT count(*) FROM c)::DOUBLE
             / (SELECT count(*) FROM v) FROM (VALUES (1))
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM p),
           (SELECT count(*) FROM p)::DOUBLE
             / (SELECT count(*) FROM v) FROM (VALUES (1))
) ORDER BY stage_idx
""",
    tags=("window", "events", "sequence"),
)
def w_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: how many users did view → click →
    purchase with STRICTLY increasing timestamps (each stage's clock
    starts at the previous stage's first qualifying event). Spark has
    no native funnel operator; the SQL decorrelation is three chained
    min-aggregate + join passes over the fact (the oracle does exactly
    that). The engine instead folds each user's ts-sorted (ts, type)
    sequence once with a 3-field O(1) state — first view, first
    later click, first still-later purchase — so the WHOLE funnel is
    ONE narrow-projected shuffle keyed by user_id plus a 3-row global
    rollup. Depth-k funnels stay one pass (state grows by one field
    per stage), while the join rewrite re-shuffles the fact per stage:
    at 100 TB that is 1 fact pass vs k.

    Tie safety: the fold checks strict ``ts > state`` itself, so
    equal-timestamp events (microsecond collisions at sf0.1+) resolve
    identically to the oracle's ``e.ts > v.t1`` no matter where
    array_sort places them within the tie.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", F.col("event_type").alias("et"))
    )
    per_user = ev.groupBy("user_id").agg(funnel_state().alias("s"))
    counts = per_user.agg(
        F.count(F.col("s.v")).alias("n1"),
        F.count(F.col("s.c")).alias("n2"),
        F.count(F.col("s.p")).alias("n3"),
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_idx"),
                    F.lit("view").alias("stage"),
                    F.col("n1").alias("users"),
                    F.lit(1.0).alias("conv"),
                ),
                F.struct(
                    F.lit(2).alias("stage_idx"),
                    F.lit("click").alias("stage"),
                    F.col("n2").alias("users"),
                    (F.col("n2").cast("double") / F.col("n1")).alias("conv"),
                ),
                F.struct(
                    F.lit(3).alias("stage_idx"),
                    F.lit("purchase").alias("stage"),
                    F.col("n3").alias("users"),
                    (F.col("n3").cast("double") / F.col("n1")).alias("conv"),
                ),
            )
        ).alias("r")
    )
    return stages.select("r.stage_idx", "r.stage", "r.users", "r.conv")


# ---------------------------------------------------------------------------
# Cohort retention: first-purchase-day cohorts × day-offset activity
# ---------------------------------------------------------------------------


@register(
    "w_cohort_retention",
    oracle="""
WITH first_ev AS (
    SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events WHERE event_type = 'purchase'
), grid AS (
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, a.d) AS day_offset,
           count(*) AS active_users
    FROM activity a JOIN first_ev f ON a.user_id = f.user_id
    GROUP BY 1, 2
)
SELECT cohort_day, day_offset, active_users,
       active_users::DOUBLE / max(CASE WHEN day_offset = 0
                                       THEN active_users END)
                              OVER (PARTITION BY cohort_day) AS retention
FROM grid
ORDER BY cohort_day, day_offset
""",
    tags=("window", "events", "cohort"),
)
def w_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-purchase day,
    activity = distinct purchase days, cells = users from cohort c
    still purchasing at day offset k (plus retention as a fraction of
    the cohort's day-0 size). The textbook decorrelation is two
    aggregates + a user join (the oracle); the engine collapses it to
    ONE user-keyed shuffle: ``collect_set(day)`` per user (set-dedup
    partials fold map-side, state bounded by history length in days),
    the cohort is ``array_min`` of the set — no join back — and the
    exploded offsets reduce into the cohort×offset grid, which is
    calendar-bounded (days², not data-sized), so the retention window
    runs on dimension-scale rows. At 100 TB: one fact shuffle of
    (user, day) pairs, everything after is dim-sized.

    Reference parity: the dashboard's per-player activity timelines
    (dashboard/app.py:498-550 date formatting over match history)
    lifted to the population-level retention rollup.
    """
    purch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("d"))
    )
    per_user = purch.groupBy("user_id").agg(
        F.collect_set("d").alias("days")
    )
    grid = (
        per_user.select(
            F.array_min("days").alias("cohort_day"),
            F.explode("days").alias("d"),
        )
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    w = Window.partitionBy("cohort_day")
    return (
        grid.withColumn(
            "retention",
            F.col("active_users").cast("double")
            / F.max(
                F.when(F.col("day_offset") == 0, F.col("active_users"))
            ).over(w),
        )
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Event-transition matrix: first-order Markov counts over user streams
# ---------------------------------------------------------------------------


@register(
    "w_event_transitions",
    oracle="""
WITH seq AS (
    SELECT event_type AS et,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_et
    FROM events
), grid AS (
    SELECT et, next_et, count(*) AS transitions
    FROM seq WHERE next_et IS NOT NULL
    GROUP BY et, next_et
)
SELECT et, next_et, transitions,
       transitions::DOUBLE
         / sum(transitions) OVER (PARTITION BY et) AS prob
FROM grid
ORDER BY et, next_et
""",
    tags=("window", "events", "sequence"),
)
def w_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for each (event_type → next event_type) adjacency, the
    raw count and the row-normalized transition probability. The
    transition pairing is ONE user-keyed window (lead over ts with
    event_id as the unique tiebreaker — deterministic under the
    microsecond-collision fixtures); the count reduces with map-side
    partials into a |types|² grid, so the probability normalization
    window runs on dimension-scale rows. At 100 TB: one fact shuffle
    keyed by user_id, everything downstream is O(|event types|²).
    Prob denominators are exact BIGINT sums → the double division is
    bit-identical across engines and partition orders.

    Reference parity: the dashboard's per-queue event breakdowns
    (dashboard/app.py:114 aggregate counters) extended to sequential
    structure — which state follows which.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("et"),
            F.lead("event_type").over(w).alias("next_et"),
        )
        .filter(F.col("next_et").isNotNull())
    )
    grid = seq.groupBy("et", "next_et").agg(
        F.count("*").alias("transitions")
    )
    norm = Window.partitionBy("et")
    return (
        grid.withColumn(
            "prob",
            F.col("transitions").cast("double")
            / F.sum("transitions").over(norm),
        )
        .orderBy("et", "next_et")
    )


# ---------------------------------------------------------------------------
# RFM segmentation — the classic customer-value rollup
# ---------------------------------------------------------------------------

_RFM_CASE_SQL = """CASE
        WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
            THEN 'champion'
        WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
        WHEN r_score >= 4 THEN 'recent'
        WHEN r_score <= 2 AND m_score >= 4 THEN 'at_risk'
        WHEN r_score <= 2 THEN 'hibernating'
        ELSE 'regular' END"""


@register(
    "w_rfm_segment",
    oracle=f"""
WITH anchor AS (
    SELECT max(CAST(o_orderdate AS DATE)) AS anchor_d FROM orders
),
cust AS (
    SELECT o_custkey,
           date_diff('day', max(CAST(o_orderdate AS DATE)),
                     anchor.anchor_d) AS recency_days,
           count(*) AS frequency,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
    FROM orders, anchor
    GROUP BY o_custkey, anchor.anchor_d
),
scored AS (
    SELECT o_custkey, recency_days, frequency, monetary,
           ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
               AS r_score,
           ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
           ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
    FROM cust
)
SELECT {_RFM_CASE_SQL} AS segment,
       count(*) AS n_customers,
       CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
           AS total_monetary,
       min(recency_days) AS min_recency_days,
       max(frequency) AS max_frequency
FROM scored
GROUP BY segment
""",
    tags=("window", "analytics", "segmentation"),
)
def w_rfm_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation: one
    fact-table rollup to the customer grain, three ntile(5) scores
    with unique tiebreakers, a CASE lattice into six named segments,
    and a per-segment rollup. The heavy work is the single o_custkey
    aggregation shuffle; the three exact ntile(5) scores ride ONE
    distributed-rank pass (operators/ranking.py): the three metrics
    stack into a narrow (custkey, metric_id, value) frame — recency
    negated so every metric ranks ascending — and a single global
    rank ordered by (metric_id, value, custkey) yields each metric's
    rank as ``grank - (metric_id-1)*n`` (every metric block holds
    exactly n rows, n = total/3). A groupBy(custkey) pivot then
    recovers the three buckets AND the three metric values — no
    join-back, no chained range exchanges (the r9 shape paid three
    rank passes + six persists over the same grain; this is one range
    shuffle of 3n narrow rows + one pivot shuffle). Monetary sums
    ride DECIMAL(18,2) so both engines agree bit-for-bit.
    """
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("anchor_d")
    )
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor_d", "last_order").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # doubles carry every metric exactly: recency_days/frequency are
    # small integers and monetary is already the double the oracle
    # ranks (r_score orders recency DESC, hence the negation)
    stacked = cust.select(
        "o_custkey",
        F.inline(
            F.array(
                F.struct(
                    F.lit(1).alias("mid"),
                    (-F.col("recency_days")).cast("double").alias("val"),
                ),
                F.struct(
                    F.lit(2).alias("mid"),
                    F.col("frequency").cast("double").alias("val"),
                ),
                F.struct(
                    F.lit(3).alias("mid"),
                    F.col("monetary").alias("val"),
                ),
            )
        ),
    )
    ranked = R.global_row_number(
        stacked,
        ["mid", "val", "o_custkey"],
        rank_name="_rk",
        total_name="_tot",
    ).select(
        "o_custkey",
        "mid",
        "val",
        (F.col("_rk") - (F.col("mid") - 1) * (F.col("_tot") / 3))
        .cast("long")
        .alias("_mrk"),
        (F.col("_tot") / 3).cast("long").alias("_mn"),
    ).withColumn("_score", R.ntile_from_rank("_mrk", "_mn", 5))

    def _metric(mid: int, col: str) -> Column:
        return F.max(F.when(F.col("mid") == mid, F.col(col)))

    scored = ranked.groupBy("o_custkey").agg(
        (-_metric(1, "val")).cast("int").alias("recency_days"),
        _metric(2, "val").cast("long").alias("frequency"),
        _metric(3, "val").alias("monetary"),
        _metric(1, "_score").alias("r_score"),
        _metric(2, "_score").alias("f_score"),
        _metric(3, "_score").alias("m_score"),
    )
    segment = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champion",
        )
        .when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 3), "loyal"
        )
        .when(F.col("r_score") >= 4, "recent")
        .when(
            (F.col("r_score") <= 2) & (F.col("m_score") >= 4),
            "at_risk",
        )
        .when(F.col("r_score") <= 2, "hibernating")
        .otherwise("regular")
    )
    return (
        scored.select(segment.alias("segment"), "recency_days",
                      "frequency", "monetary")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_monetary"),
            F.min("recency_days").alias("min_recency_days"),
            F.max("frequency").alias("max_frequency"),
        )
    )


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency — the occupancy/max-overlap staple
# ---------------------------------------------------------------------------

@register(
    "w_peak_concurrency",
    oracle="""
WITH iv AS (
    SELECT event_id, event_type,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS s_ms,
           epoch_ms(CAST(ts AS TIMESTAMP))
             + CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS e_ms
    FROM events
),
sweep AS (
    SELECT event_type, s_ms AS t, 1 AS delta, event_id FROM iv
    UNION ALL
    SELECT event_type, e_ms AS t, -1 AS delta, event_id FROM iv
),
run AS (
    SELECT event_type, t,
           CAST(sum(delta) OVER (
               PARTITION BY event_type ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS conc
    FROM sweep
),
mx AS (SELECT event_type, max(conc) AS peak FROM run GROUP BY event_type)
SELECT r.event_type, m.peak AS peak_concurrency,
       min(r.t) AS first_peak_ms
FROM run r JOIN mx m ON r.event_type = m.event_type AND r.conc = m.peak
GROUP BY r.event_type, m.peak
""",
    tags=("window", "analytics", "sweepline"),
)
def w_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent holds per event type via the sweep-line
    pattern: each event holds a slot for `value` seconds, every
    interval becomes a +1/−1 delta pair, and a single running-sum
    window over (t, delta, event_id) gives instantaneous occupancy —
    max concurrency and when it is first reached. The [s, e) ordering
    convention (−1 sorts before +1 at equal t) is pinned by the
    window's delta tiebreak, so both engines agree exactly. One
    event-type-keyed exchange for the window plus a 5-row broadcast
    peak join-back: the fact table is shuffled once, everything after
    is dimension-scale.
    """
    ev = load_table(spark, sf_dir, "events")
    s_ms = F.unix_millis("ts")
    iv = ev.select(
        "event_id",
        "event_type",
        s_ms.alias("s_ms"),
        (
            s_ms
            + F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
        ).alias("e_ms"),
    )
    sweep = iv.select(
        "event_type",
        F.col("s_ms").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    ).unionByName(
        iv.select(
            "event_type",
            F.col("e_ms").alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = sweep.select(
        "event_type", "t", F.sum("delta").over(w).cast("long").alias("conc")
    )
    mx = run.groupBy("event_type").agg(F.max("conc").alias("peak"))
    mx = mx.select(F.col("event_type").alias("mx_type"), "peak")
    return (
        run.join(
            F.broadcast(mx),
            (F.col("event_type") == F.col("mx_type"))
            & (F.col("conc") == F.col("peak")),
        )
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("first_peak_ms"))
        .select(
            "event_type",
            F.col("peak").alias("peak_concurrency"),
            "first_peak_ms",
        )
    )


@register(
    "j_interval_overlap",
    oracle="""
WITH iv AS (
    SELECT event_id, event_type,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS s_ms,
           epoch_ms(CAST(ts AS TIMESTAMP))
             + CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS e_ms
    FROM events
)
SELECT a.event_type,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(max(least(a.e_ms, b.e_ms) - greatest(a.s_ms, b.s_ms))
            AS BIGINT) AS max_overlap_ms
FROM iv a JOIN iv b
  ON a.event_type = b.event_type AND a.event_id < b.event_id
 AND greatest(a.s_ms, b.s_ms) < least(a.e_ms, b.e_ms)
GROUP BY a.event_type
""",
    tags=("join", "interval", "sweepline"),
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join per event type: which same-type
    holds (each event occupies [ts, ts + value·1s)) ran concurrently,
    rolled up to pair count + longest overlap. Spark runs the BANDED
    plan (`operators/joins.py::interval_overlap_join` — bucket
    explode, (type, bucket) equi-join, exactly-once ownership by the
    overlap-start bucket, hypothesis-tested lossless); the oracle is
    the independent brute-force quadratic join, so the hash check
    proves the banding loses and invents nothing.
    """
    ev = load_table(spark, sf_dir, "events")
    s_ms = F.unix_millis("ts")
    iv = ev.select(
        "event_id",
        "event_type",
        s_ms.alias("s_ms"),
        (
            s_ms + F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
        ).alias("e_ms"),
    )
    pairs = J.interval_overlap_join(
        iv, "event_id", "s_ms", "e_ms", key="event_type"
    )
    return pairs.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.max("overlap_ms").alias("max_overlap_ms"),
    )


@register(
    "w_m4_downsample",
    oracle="""
WITH b AS (
    SELECT user_id,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bkt,
           ts, event_id, value
    FROM events
),
r AS (
    SELECT user_id, bkt, value,
           row_number() OVER (PARTITION BY user_id, bkt
                              ORDER BY ts, event_id) AS rf,
           row_number() OVER (PARTITION BY user_id, bkt
                              ORDER BY ts DESC, event_id DESC) AS rl
    FROM b
)
SELECT user_id, epoch_ms(bkt) AS bucket_ms,
       max(CASE WHEN rf = 1 THEN value END) AS first_v,
       max(CASE WHEN rl = 1 THEN value END) AS last_v,
       min(value) AS min_v,
       max(value) AS max_v,
       CAST(count(*) AS BIGINT) AS n_points
FROM r GROUP BY user_id, bkt
""",
    tags=("window", "timeseries", "downsample"),
)
def w_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    (user, hour) bucket keep first/last/min/max — the four points
    that make a line chart pixel-exact at any zoom, and the shape
    every observability store serves instead of raw points. One
    (user, bucket)-keyed exchange; the two row_number passes share
    it (same partition keys), and min/max/count fold map-side. No
    summed floats anywhere, so engine agreement is trivial.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("bkt"),
        "ts",
        "event_id",
        "value",
    )
    wf = Window.partitionBy("user_id", "bkt").orderBy("ts", "event_id")
    wl = Window.partitionBy("user_id", "bkt").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = b.select(
        "user_id",
        "bkt",
        "value",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    return r.groupBy("user_id", "bkt").agg(
        F.max(F.when(F.col("rf") == 1, F.col("value"))).alias("first_v"),
        F.max(F.when(F.col("rl") == 1, F.col("value"))).alias("last_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.count("*").alias("n_points"),
    ).select(
        "user_id",
        F.unix_millis("bkt").alias("bucket_ms"),
        "first_v",
        "last_v",
        "min_v",
        "max_v",
        "n_points",
    )


@register(
    "w_attribution",
    oracle="""
WITH tl AS (
    SELECT user_id, ts, event_id, event_type, value,
           last_value(CASE WHEN event_type <> 'purchase'
                           THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS attributed
    FROM events
)
SELECT coalesce(attributed, 'none') AS attributed_type,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
           AS converted_value
FROM tl WHERE event_type = 'purchase'
GROUP BY coalesce(attributed, 'none')
""",
    tags=("window", "analytics", "attribution"),
)
def w_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited
    to the user's most recent preceding non-purchase event (an
    IGNORE-NULLS last_value over the per-user timeline — the carry-
    forward shape), rolled up to conversions and decimal-exact value
    per attributed touchpoint. One user-keyed exchange; everything
    after the window is touchpoint-cardinality scale.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tl = ev.select(
        "event_type",
        "value",
        F.last(
            F.when(
                F.col("event_type") != "purchase", F.col("event_type")
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("attributed"),
    )
    return (
        tl.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(F.col("attributed"), F.lit("none")).alias(
                "attributed_type"
            ),
            "value",
        )
        .groupBy("attributed_type")
        .agg(
            F.count("*").alias("n_conversions"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("converted_value"),
        )
    )


@register(
    "w_anomaly_zscore",
    oracle="""
WITH hourly AS (
    SELECT event_type,
           date_trunc('hour', ts) AS hour,
           epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
),
roll AS (
    SELECT event_type, hour, n,
           CAST(count(*) OVER w AS BIGINT) AS k,
           CAST(sum(n) OVER w AS DECIMAL(38,0)) AS s1,
           CAST(sum(CAST(n AS DECIMAL(19,0)) * n) OVER w
                AS DECIMAL(38,0)) AS s2
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hidx
                 RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
z AS (
    SELECT event_type, hour, n, k,
           (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / k)
             / sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1))
             AS zscore
    FROM roll
    WHERE k >= 12
      AND s2 * k > s1 * s1
),
rounded AS (
    SELECT event_type, hour, n,
           floor(zscore * 1000000.0 + 0.5) / 1000000.0 AS zscore
    FROM z
)
SELECT event_type, hour, n, zscore
FROM rounded
ORDER BY abs(zscore) DESC, event_type, hour
LIMIT 20
""",
    tags=("window", "analytics", "anomaly"),
)
def w_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: the 20 most aberrant
    (event_type, hour) traffic counts, scored against the TRAILING
    24-hour window (current row excluded, ≥12 observed hours, zero
    variance gated out). The streaming-ops monitoring shape — ingest
    volume spikes/drops per source — run batch; the live path
    (`streaming/ops.py::volume_monitor_ingest`) folds the SAME
    mergeable hourly counts per epoch and replays the same fold
    (`operators/corpus.py::hourly_zscores`) on read, multibatch-
    tested bit-equal to this query. Determinism: the
    rolling moments are exact BIGINT window sums (count/Σn/Σn²);
    mean and sample variance derive from them with the IDENTICAL
    double expression on both engines, one sqrt, one division —
    no accumulation-order dependence anywhere.
    """
    from baronbatch_etl_spark.operators.corpus import hourly_zscores

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").cast("long").alias("n"))
    return hourly_zscores(hourly, window_hours=24, min_history=12, top=20)


@register(
    "w_streak_islands",
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grp AS (
    SELECT user_id, day,
           day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER)
             AS island
    FROM days
),
streaks AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS streak_days,
           min(day) AS streak_start
    FROM grp GROUP BY user_id, island
),
best AS (
    SELECT user_id, streak_days, streak_start,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY streak_days DESC, streak_start)
             AS rn
    FROM streaks
)
SELECT user_id, streak_days, streak_start
FROM best WHERE rn = 1
ORDER BY streak_days DESC, user_id
LIMIT 20
""",
    tags=("window", "analytics", "islands"),
)
def w_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive
    active days (top-20 streaks). The classic islands trick — day
    minus its per-user row_number is constant exactly along an
    unbroken run — turns streak detection into a plain groupBy:
    no self-join, no iterative logic, two keyed window passes and
    one aggregate, all integer/date arithmetic (bit-deterministic).
    Scale: everything is partitioned by user_id; no global ordering
    until the final 20-row top-k (TakeOrderedAndProject).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w_rn = Window.partitionBy("user_id").orderBy("day")
    grp = days.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w_rn)).alias("island"),
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("streak_days"),
        F.min("day").alias("streak_start"),
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), "streak_start"
    )
    return (
        streaks.select(
            "user_id",
            "streak_days",
            "streak_start",
            F.row_number().over(w_best).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy(F.col("streak_days").desc(), "user_id")
        .limit(20)
    )


@register(
    "w_percent_of_total",
    oracle="""
WITH brand AS (
    SELECT p.p_brand,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2))
                  - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
),
tot AS (SELECT sum(rev) AS total FROM brand),
ranked AS (
    SELECT p_brand, rev, total,
           sum(rev) OVER (ORDER BY rev DESC, p_brand
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_rev
    FROM brand, tot
)
SELECT p_brand,
       CAST(rev AS DOUBLE) AS revenue,
       floor((CAST(rev AS DOUBLE) / CAST(total AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS share,
       floor((CAST(cum_rev AS DOUBLE) / CAST(total AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS cum_share,
       CASE WHEN (cum_rev - rev) * 10 < total * 8
            THEN 1 ELSE 0 END AS in_pareto_head
FROM ranked
ORDER BY rev DESC, p_brand
""",
    tags=("window", "analytics", "pareto"),
)
def w_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total + Pareto head analysis: every brand's revenue
    share, running cumulative share (largest first), and an 80/20
    head flag — the contribution-concentration readout every BI
    layer wants, and the same cumulative-share machinery corpus
    curation uses for 'which sources make up 80 % of tokens'.
    Determinism: revenue stays DECIMAL through the rollup AND the
    running window sum (exact at any accumulation order); the head
    test ``(cum − rev)·10 < total·8`` is pure decimal-integer
    comparison (no 0.8 float anywhere); shares round half-up at 6
    places from single IEEE divisions. Scale: one fact exchange to
    the brand grain; the ordered window runs over the brand
    DIMENSION (dozens of rows), never the fact.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev_expr = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    brand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(rev_expr).alias("rev"))
    )
    total_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_w = (
        Window.orderBy(F.col("rev").desc(), "p_brand")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = brand.select(
        "p_brand",
        "rev",
        F.sum("rev").over(total_w).alias("total"),
        F.sum("rev").over(cum_w).alias("cum_rev"),
    )
    return ranked.select(
        "p_brand",
        F.col("rev").cast("double").alias("revenue"),
        round_half_up(
            F.col("rev").cast("double") / F.col("total").cast("double"),
            6,
        ).alias("share"),
        round_half_up(
            F.col("cum_rev").cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("cum_share"),
        F.when(
            (F.col("cum_rev") - F.col("rev")) * 10
            < F.col("total") * 8,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("in_pareto_head"),
    ).orderBy(F.col("revenue").desc(), "p_brand")


@register(
    "w_time_to_convert",
    oracle="""
WITH s AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'purchase' GROUP BY user_id
),
d AS (
    SELECT s.user_id,
           epoch_us(p.t) - epoch_us(s.t) AS delay_us
    FROM s JOIN p USING (user_id)
    WHERE p.t > s.t
),
r AS (
    SELECT user_id, delay_us,
           CAST(row_number() OVER (ORDER BY delay_us, user_id)
                AS BIGINT) AS rn,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM d
)
SELECT q.q AS quantile_pct, r.delay_us, r.n AS n_converters
FROM r JOIN (VALUES (50), (90), (99)) q(q)
  ON r.rn = CAST(floor((q.q * r.n + 99) / 100.0) AS BIGINT)
ORDER BY quantile_pct
""",
    tags=("window", "analytics", "funnel"),
)
def w_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: exact p50/p90/p99 of the first-
    signup → first-purchase latency across converting users — the
    funnel-latency readout (`w_funnel` counts WHO converts; this
    measures HOW FAST). Exact order statistics, not sketches: delays
    in integer MICROseconds (no truncation semantics to disagree on),
    ranked with a user tiebreak, and the q-th index is pure integer
    arithmetic ``⌈q·n/100⌉ = ⌊(q·n+99)/100⌋`` — both engines select
    the identical physical row. Scale: two (user, min-ts) partial
    aggs + one user-keyed join; the global rank runs over the
    CONVERTER dimension (≪ events), the `a_gini_concentration`
    precedent.
    """
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_s"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    d = (
        s.join(p, "user_id")
        .filter(F.col("t_p") > F.col("t_s"))
        .select(
            "user_id",
            (F.unix_micros("t_p") - F.unix_micros("t_s")).alias(
                "delay_us"
            ),
        )
    )
    # distributed exact rank + total (operators/ranking.py) — the old
    # row_number/count pair over an unpartitioned window funneled the
    # converter grain through one task (r8 verdict borderline-fifth)
    r = R.global_row_number(
        d,
        [F.col("delay_us"), F.col("user_id")],
        rank_name="rn",
        total_name="n",
    ).select("user_id", "delay_us", "rn", "n")
    q = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias(
            "quantile_pct"
        )
    )
    return (
        r.join(
            F.broadcast(q),
            F.col("rn")
            == F.floor(
                (F.col("quantile_pct") * F.col("n") + 99) / F.lit(100.0)
            ).cast("long"),
        )
        .select(
            "quantile_pct",
            "delay_us",
            F.col("n").alias("n_converters"),
        )
        .orderBy("quantile_pct")
    )


@register(
    "w_ab_test",
    oracle="""
WITH u AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
),
arms AS (
    SELECT user_id % 2 AS arm,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(conv) AS BIGINT) AS x
    FROM u GROUP BY user_id % 2
),
wide AS (
    SELECT CAST(max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
           CAST(max(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x_a,
           CAST(max(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
           CAST(max(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x_b
    FROM arms
),
z AS (
    SELECT n_a, x_a, n_b, x_b,
           CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b THEN
               (CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(x_a + x_b AS DOUBLE)
                           / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b))
           END AS zval
    FROM wide
)
SELECT n_a, x_a, n_b, x_b,
       floor((CAST(x_a AS DOUBLE) / n_a) * 1000000.0 + 0.5)
         / 1000000.0 AS rate_a,
       floor((CAST(x_b AS DOUBLE) / n_b) * 1000000.0 + 0.5)
         / 1000000.0 AS rate_b,
       floor(zval * 1000000.0 + 0.5) / 1000000.0 AS z,
       CASE WHEN zval IS NOT NULL AND abs(zval) > 1.96
            THEN 1 ELSE 0 END AS significant
FROM z
""",
    tags=("window", "analytics", "abtest"),
)
def w_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the A/B experimentation readout: users
    split into arms by ``user_id % 2`` (the hash-bucket assignment
    every experiment platform uses), per-arm conversion = made a
    high-value purchase (>150), pooled-variance z with the 1.96
    gate. Counts are exact BIGINTs off two keyed rollups (user grain,
    then 2 arms); the z statistic derives from them with ONE fixed
    IEEE expression both engines spell identically (NULL when the
    pooled rate is degenerate at 0 or 1 — a 0/0 otherwise), so even
    the significance flag (a float boundary) is deterministic. At
    scale:
    one user-grain exchange; everything after is 2 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    arms = u.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x_b"),
    )
    pooled = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    nondegenerate = (
        (F.col("x_a") + F.col("x_b") > 0)
        & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b"))
    )
    zval = F.when(
        nondegenerate,
        (
            F.col("x_a").cast("double") / F.col("n_a")
            - F.col("x_b").cast("double") / F.col("n_b")
        )
        / F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (
                F.lit(1.0) / F.col("n_a")
                + F.lit(1.0) / F.col("n_b")
            )
        ),
    )
    return wide.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        round_half_up(
            F.col("x_a").cast("double") / F.col("n_a"), 6
        ).alias("rate_a"),
        round_half_up(
            F.col("x_b").cast("double") / F.col("n_b"), 6
        ).alias("rate_b"),
        round_half_up(zval, 6).alias("z"),
        F.when(
            zval.isNotNull() & (F.abs(zval) > 1.96), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("significant"),
    )


@register(
    "w_seasonal_residual",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                AS DECIMAL(38,0)) AS cents
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE),
             dayofweek(CAST(o_orderdate AS DATE)) + 1
),
prof AS (
    SELECT dow,
           CAST(sum(cents) AS DECIMAL(38,0)) AS s,
           CAST(count(*) AS BIGINT) AS k
    FROM daily GROUP BY dow
),
resid AS (
    SELECT d.day, d.dow,
           CAST(d.cents AS DOUBLE) / 100.0 AS revenue,
           (CAST(d.cents AS DOUBLE)
            - CAST(p.s AS DOUBLE) / p.k) / 100.0 AS residual
    FROM daily d JOIN prof p USING (dow)
),
rounded AS (
    SELECT day, dow,
           floor(revenue * 100.0 + 0.5) / 100.0 AS revenue,
           floor(residual * 100.0 + 0.5) / 100.0 AS residual
    FROM resid
)
SELECT day, dow, revenue, residual
FROM rounded
ORDER BY abs(residual) DESC, day
LIMIT 20
""",
    tags=("window", "analytics", "timeseries"),
)
def w_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive decomposition: daily revenue minus its
    day-of-week profile mean, top-20 days by |residual| — the
    'was Tuesday actually unusual, or are Tuesdays just like that'
    readout that complements `w_anomaly_zscore`'s trailing-window
    view with a calendar-seasonality view. Revenue accumulates as
    exact integer cents (DECIMAL); the profile mean and residual are
    a fixed pair of IEEE ops both engines spell identically, rounded
    half-up at cents. Scale: one fact exchange to the day grain, a
    7-row profile joined back (broadcast at any scale), final 20-row
    TakeOrderedAndProject.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(38,0)")
        .alias("cents")
    )
    prof = daily.groupBy("dow").agg(
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.count("*").cast("long").alias("k"),
    )
    resid = daily.join(F.broadcast(prof), "dow").select(
        "day",
        "dow",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
        (
            (
                F.col("cents").cast("double")
                - F.col("s").cast("double") / F.col("k")
            )
            / F.lit(100.0)
        ).alias("residual"),
    )
    return (
        resid.select(
            "day",
            "dow",
            round_half_up(F.col("revenue"), 2).alias("revenue"),
            round_half_up(F.col("residual"), 2).alias("residual"),
        )
        .orderBy(F.abs("residual").desc(), "day")
        .limit(20)
    )


@register(
    "w_cusum_changepoint",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                AS DECIMAL(38,0)) AS cents
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
pre AS (
    SELECT day, cents,
           CAST(sum(cents) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,0)) AS prefix,
           CAST(row_number() OVER (ORDER BY day) AS DECIMAL(38,0))
             AS k,
           CAST(sum(cents) OVER () AS DECIMAL(38,0)) AS total,
           CAST(count(*) OVER () AS DECIMAL(38,0)) AS n
    FROM daily
),
dev AS (
    SELECT day,
           CAST(n * prefix - k * total AS DECIMAL(38,0)) AS d,
           n
    FROM pre
),
peak AS (
    SELECT day AS change_day,
           CAST(abs(d) AS DECIMAL(38,0)) AS absd,
           n,
           row_number() OVER (ORDER BY abs(d) DESC, day) AS rn
    FROM dev
)
SELECT change_day,
       floor((CAST(absd AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
             * 100.0 + 0.5) / 100.0 AS cusum_peak,
       CAST(n AS BIGINT) AS n_days
FROM peak WHERE rn = 1
""",
    tags=("window", "analytics", "changepoint"),
)
def w_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue: the day where
    the cumulative deviation from the global mean peaks — the
    standard 'when did the level shift' estimator (Page 1954; the
    peak of S_k = Σ_{i≤k}(y_i − ȳ) locates the single change point).
    Exactness trick: instead of the float mean, the deviation is
    scaled by n — ``D_k = n·prefix_k − k·total`` — so every value in
    the argmax is an exact DECIMAL(38,0) integer and the peak
    location is bit-deterministic; the reported magnitude
    ``max|S_k| = max|D_k|/n`` takes the ONLY division at the very
    end (rounded to cents→dollars). Scale: one fact exchange to the
    day grain; the ordered prefix window runs over the
    calendar-bounded daily frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(38,0)")
        .alias("cents")
    )
    w_ord = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = daily.select(
        "day",
        F.sum("cents").over(w_ord).cast("decimal(38,0)").alias("prefix"),
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("decimal(38,0)")
        .alias("k"),
        F.sum("cents").over(w_all).cast("decimal(38,0)").alias("total"),
        F.count("*").over(w_all).cast("decimal(38,0)").alias("n"),
    )
    dev = pre.select(
        "day",
        (F.col("n") * F.col("prefix") - F.col("k") * F.col("total"))
        .cast("decimal(38,0)")
        .alias("d"),
        "n",
    )
    peak = dev.select(
        F.col("day").alias("change_day"),
        F.abs("d").cast("decimal(38,0)").alias("absd"),
        "n",
        F.row_number()
        .over(Window.orderBy(F.abs("d").desc(), "day"))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    return peak.select(
        "change_day",
        round_half_up(
            F.col("absd").cast("double")
            / F.col("n").cast("double")
            / F.lit(100.0),
            2,
        ).alias("cusum_peak"),
        F.col("n").cast("long").alias("n_days"),
    )
