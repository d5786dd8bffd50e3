"""Join catalog — SURVEY §2.3 J1–J7.

The reference implements join *semantics* in application code
(per-row ``find_one`` lookups, Python ``next()`` scans); here each
becomes a real distributed join. Scale posture: dimension sides are
explicit ``broadcast()`` (no shuffle of the fact table for lookups),
fact↔fact joins shuffle on their keys and lean on AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.operators.joins import asof_join, range_join_bucketed
from baronbatch_etl_spark.queries import register

# ---------------------------------------------------------------------------
# J1 — fact→dim broadcast lookups (reference: per-row find_one on
# summoners while transforming, transformer_loader/main.py:108).
# Chained through the dim hierarchy customer→nation→region.
# ---------------------------------------------------------------------------


@register(
    "j1_broadcast_dim_lookup",
    oracle="""
SELECT o.o_orderkey, c.c_name, n.n_name AS nation, r.r_name AS region,
       o.o_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""",
    tags=("join", "broadcast"),
)
def j1_broadcast_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact enriched via broadcast hash joins down the dim hierarchy —
    zero fact-side shuffles (check: .explain shows BroadcastHashJoin)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "o_orderkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            "o_totalprice",
        )
    )


# ---------------------------------------------------------------------------
# J2 — staged-key resolution join (the hardest reference semantics:
# transformer_loader/main.py:102-131). Stage 1: direct key equality
# (puuid). Stage 2, on the unresolved remainder: normalized-name
# equality AND (tag equal OR tag missing). Stage 3, on what's left:
# legacy name only. First stage to match wins; union of the stages.
#
# Synthetic mapping: orders are the facts. key1 (puuid analog) is
# present on 2/3 of rows; full_name is the reconstructable customer
# name (upper-cased so normalization does work); tag (riotIdTagLine
# analog) is NULL on half the rows and sometimes *wrong* (≠ the
# customer's segment), which pushes those rows to stage 3 — all three
# fallback paths carry traffic.
# ---------------------------------------------------------------------------

_J2_FACTS_SQL = """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS key1,
           upper(concat('Customer#', lpad(CAST(o_custkey AS VARCHAR), 9, '0'))) AS full_name,
           CASE WHEN o_orderkey % 2 = 0 THEN NULL
                WHEN o_orderkey % 4 = 1 THEN 'BUILDING'
                ELSE 'FURNITURE' END AS tag
    FROM orders
"""


@register(
    "j2_staged_resolution",
    oracle=f"""
WITH f AS ({_J2_FACTS_SQL}),
d AS (SELECT c_custkey, lower(c_name) AS norm_name, c_mktsegment FROM customer),
s1 AS (
    SELECT f.o_orderkey, d.c_custkey, 1 AS stage
    FROM f JOIN d ON f.key1 = d.c_custkey
),
r1 AS (SELECT * FROM f ANTI JOIN s1 USING (o_orderkey)),
s2 AS (
    SELECT r1.o_orderkey, d.c_custkey, 2 AS stage
    FROM r1 JOIN d ON lower(r1.full_name) = d.norm_name
                  AND (r1.tag IS NULL OR r1.tag = d.c_mktsegment)
),
r2 AS (SELECT * FROM r1 ANTI JOIN s2 USING (o_orderkey)),
s3 AS (
    SELECT r2.o_orderkey, d.c_custkey, 3 AS stage
    FROM r2 JOIN d ON lower(r2.full_name) = d.norm_name
)
SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
""",
    tags=("join", "staged", "null-tolerant"),
)
def j2_staged_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-stage fallback resolution: key equality → normalized name with
    null-tolerant tag residual → name only; anti-join remainders,
    unionByName of the stages. The dim side broadcasts at every match
    stage; the remainder anti-joins shuffle on the fact key (their
    matched-id sides grow with the facts, so they can't broadcast) —
    that's the correct at-scale trade: sort-merge anti on ids only,
    broadcast for every dim lookup."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    facts = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("key1"),
        F.upper(
            F.concat(
                F.lit("Customer#"),
                F.lpad(F.col("o_custkey").cast("string"), 9, "0"),
            )
        ).alias("full_name"),
        F.when(F.col("o_orderkey") % 2 == 0, None)
        .when(F.col("o_orderkey") % 4 == 1, "BUILDING")
        .otherwise("FURNITURE")
        .alias("tag"),
    )
    dim = customer.select(
        "c_custkey",
        F.lower("c_name").alias("norm_name"),
        "c_mktsegment",
    )

    s1 = facts.join(F.broadcast(dim), facts.key1 == dim.c_custkey).select(
        "o_orderkey", "c_custkey", F.lit(1).alias("stage")
    )
    r1 = facts.join(s1.select("o_orderkey"), "o_orderkey", "left_anti")
    s2 = r1.join(
        F.broadcast(dim),
        (F.lower(r1.full_name) == dim.norm_name)
        & (r1.tag.isNull() | (r1.tag == dim.c_mktsegment)),
    ).select("o_orderkey", "c_custkey", F.lit(2).alias("stage"))
    r2 = r1.join(s2.select("o_orderkey"), "o_orderkey", "left_anti")
    s3 = r2.join(
        F.broadcast(dim), F.lower(r2.full_name) == dim.norm_name
    ).select("o_orderkey", "c_custkey", F.lit(3).alias("stage"))

    return s1.unionByName(s2).unionByName(s3)


# ---------------------------------------------------------------------------
# J3 — orphan purge as anti-join (reference $nin delete,
# api_service/main.py:220-223).
# ---------------------------------------------------------------------------


@register(
    "j3_anti_orphans",
    oracle="""
SELECT o.o_orderkey, o.o_custkey
FROM orders o
ANTI JOIN (SELECT c_custkey FROM customer WHERE c_nationkey < 20) k
  ON o.o_custkey = k.c_custkey
""",
    tags=("join", "anti"),
)
def j3_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facts whose key has no surviving dim row — left_anti join (at
    scale this replaces `$nin` with a broadcast/shuffle join, never a
    literal isin list)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    keep = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .select("c_custkey")
    )
    return o.join(F.broadcast(keep), o.o_custkey == keep.c_custkey, "left_anti")


# ---------------------------------------------------------------------------
# J4 — semi-join read path (resolve user → fetch their facts,
# api_service/main.py:326-338).
# ---------------------------------------------------------------------------


@register(
    "j4_semi_user_matches",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderstatus
FROM orders o
SEMI JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) u
  ON o.o_custkey = u.c_custkey
""",
    tags=("join", "semi"),
)
def j4_semi_user_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join: facts of resolved users, no dim columns copied."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    u = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    return o.join(F.broadcast(u), o.o_custkey == u.c_custkey, "left_semi")


# ---------------------------------------------------------------------------
# J5 — idempotent-ingest anti-join (exists-check before insert,
# extractor/main.py:413-428 + unique index :513). An "incoming" batch
# overlaps the "existing" table; only genuinely new keys survive.
# ---------------------------------------------------------------------------


@register(
    "j5_ingest_dedup",
    oracle="""
WITH existing AS (SELECT * FROM orders WHERE o_orderkey % 10 < 7),
incoming AS (SELECT * FROM orders WHERE o_orderkey % 10 >= 5)
SELECT i.o_orderkey, i.o_custkey, i.o_totalprice
FROM incoming i ANTI JOIN existing e ON i.o_orderkey = e.o_orderkey
""",
    tags=("join", "anti", "ingest"),
)
def j5_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-if-absent: incoming left_anti existing on the unique key —
    the Spark rewrite of the reference's pre-insert exists check."""
    orders = load_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 10 < 7)
    incoming = orders.filter(F.col("o_orderkey") % 10 >= 5)
    return incoming.join(existing, "o_orderkey", "left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# J6 — lookup-table join with default (queue-id→name with computed
# fallback, dashboard/app.py:191-196) as a left broadcast join.
# ---------------------------------------------------------------------------


@register(
    "j6_lookup_with_default",
    oracle="""
SELECT n.n_nationkey, n.n_name,
       coalesce(r.r_name, concat('Region ', CAST(n.n_regionkey AS VARCHAR))) AS region_name
FROM nation n
LEFT JOIN (SELECT * FROM region WHERE r_regionkey <> 2) r
  ON n.n_regionkey = r.r_regionkey
""",
    tags=("join", "lookup"),
)
def j6_lookup_with_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast left join against a lookup table, coalesce default for
    misses (one region withheld so the default branch carries rows)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_regionkey") != 2)
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left").select(
        "n_nationkey",
        "n_name",
        F.coalesce(
            F.col("r_name"),
            F.concat(F.lit("Region "), F.col("n_regionkey").cast("string")),
        ).alias("region_name"),
    )


# ---------------------------------------------------------------------------
# J7 — brute-force membership scan → hash semi-join (the reference
# nested-loops every league page looking for one puuid,
# extractor/main.py:294-318; a hash join replaces the O(n·m) scan).
# ---------------------------------------------------------------------------


@register(
    "j7_membership_scan",
    oracle="""
SELECT l.l_orderkey, l.l_suppkey, l.l_quantity
FROM lineitem l
SEMI JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 4500) s
  ON l.l_suppkey = s.s_suppkey
""",
    tags=("join", "semi"),
)
def j7_membership_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership via broadcast semi-join instead of a nested loop."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 4500)
        .select("s_suppkey")
    )
    return li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left_semi")


# ---------------------------------------------------------------------------
# As-of join — an operator Spark lacks natively (guide: "As-of / range
# join"), composed as union + per-key ordered window carry-forward
# (operators/joins.py). DuckDB has a native ASOF JOIN → exact oracle.
# ---------------------------------------------------------------------------


@register(
    "j_asof_join",
    oracle="""
SELECT l.event_id, l.user_id, epoch_ms(CAST(l.ts AS TIMESTAMP)) AS ts_ms,
       r.event_id AS asof_event_id, r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
    tags=("join", "asof"),
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent view at-or-
    before it. One shuffle on the key; no per-group materialization."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(left, right, on="ts", by="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("asof_event_id"),
        F.col("asof_value"),
    )


# ---------------------------------------------------------------------------
# Range join — banded equi-join composition (bucketize, probe own +
# previous bucket, exact residual). Oracle: plain inequality join.
# ---------------------------------------------------------------------------


@register(
    "j_range_join",
    oracle="""
SELECT l.event_id AS purchase_id, r.event_id AS click_id,
       epoch_ms(CAST(l.ts AS TIMESTAMP)) - epoch_ms(CAST(r.ts AS TIMESTAMP)) AS delta_ms
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON epoch_us(CAST(l.ts AS TIMESTAMP)) - epoch_us(CAST(r.ts AS TIMESTAMP)) >= 0
 AND epoch_us(CAST(l.ts AS TIMESTAMP)) - epoch_us(CAST(r.ts AS TIMESTAMP)) < 300000000
""",
    tags=("join", "range"),
)
def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases paired with any click in the preceding 5 minutes —
    the bucketed band join replaces the O(n·m) inequality scan."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("r_event_id"), F.col("ts").alias("r_ts")
    )
    joined = range_join_bucketed(
        purchases, clicks, "ts", "r_ts", interval_ms=300000
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        (F.unix_millis("ts") - F.unix_millis("r_ts")).alias("delta_ms"),
    )


# ---------------------------------------------------------------------------
# Salted skew join — event_type has only a handful of values, so a
# plain shuffle join on it is maximal skew (each key = one giant
# partition). The salted form spreads every hot key over N buckets
# deterministically; results are identical to the plain join, which
# is exactly what the oracle checks.
# ---------------------------------------------------------------------------


@register(
    "j_salted_skew_join",
    oracle="""
SELECT e.event_id, e.event_type,
       upper(e.event_type) AS display, e.value
FROM events e JOIN (SELECT DISTINCT event_type FROM events) d
  ON e.event_type = d.event_type
""",
    tags=("join", "skew"),
)
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join on a pathologically hot key (few-valued
    event_type): the big side is salted by full-row hash, the small
    side exploded across the salt range — the hot key's rows spread
    over 8 buckets instead of one straggler task. Same rows as the
    unsalted join (the oracle's plain-join check)."""
    from baronbatch_etl_spark.sources import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct()
    out = salted_join(
        ev.select("event_id", "event_type", "value"), dim, "event_type", 8
    )
    return out.select(
        "event_id",
        "event_type",
        F.upper("event_type").alias("display"),
        "value",
    )


# ---------------------------------------------------------------------------
# SCD2 dimension history — the warehouse-side twin of S7's dim upsert:
# compress a changelog into type-2 validity intervals.
# ---------------------------------------------------------------------------


@register(
    "j_scd2_history",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
),
changed AS (
    SELECT user_id, ts, event_id, event_type FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state,
       epoch_ms(CAST(ts AS TIMESTAMP)) AS valid_from_ms,
       epoch_ms(CAST(lead(ts) OVER w AS TIMESTAMP)) AS valid_to_ms,
       row_number() OVER w AS version,
       (lead(ts) OVER w IS NULL) AS is_current
FROM changed WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("join", "scd2", "dim"),
)
def j_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a changelog: per
    user, consecutive identical states collapse (lag change detection)
    and each surviving change opens a validity interval [valid_from,
    valid_to) closed by the NEXT change (lead), open-ended for the
    current state — the MERGE-free, set-based way to build dim history
    (reference keeps only latest state via upsert; this retains full
    history).

    Both windows share one (user_id)-keyed sort — Catalyst plans a
    single Exchange+Sort reused by lag, lead and row_number, so the
    whole operator is one shuffle at any scale; users are numerous and
    uniform, so no skew. Interval bounds surface as epoch ms (exact
    integers) for the cross-engine hash."""
    from baronbatch_etl_spark.operators.joins import scd2_intervals

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = scd2_intervals(
        ev, key="user_id", ts="ts", state="event_type", tiebreak="event_id"
    )
    return out.select(
        "user_id",
        "state",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
        "version",
        "is_current",
    )
