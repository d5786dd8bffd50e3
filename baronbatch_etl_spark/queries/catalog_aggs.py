"""Aggregation catalog — SURVEY §2.4 A1–A8, plus the approx/statistical
extras the reference lacks but Spark gives for free (§2.4 note).

Determinism: grouped double sums go through DECIMAL (exact,
order-independent across executors); collected lists are sort_array'd
so hashing is stable; ratios divide exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from baronbatch_etl_spark.functions.scalars import (
    cond_flag,
    round_half_up,
    sql_round,
)
from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.operators import ranking as R
from baronbatch_etl_spark.queries import register

# ---------------------------------------------------------------------------
# A1 — duplicate finder: group → count → HAVING count>1 → collect ids
# (the reference's one Mongo aggregate pipeline, api_service/main.py:225-229).
# lineitem's (l_orderkey) groups with >1 line stand in for duplicate
# matchIds; collected line numbers are sorted for stable hashing.
# ---------------------------------------------------------------------------


@register(
    "a1_dup_finder",
    oracle="""
SELECT l_orderkey, count(*) AS c,
       array_to_string(
           list_transform(list_sort(list(l_linenumber)),
                          x -> CAST(x AS VARCHAR)), ',') AS ids
FROM lineitem
GROUP BY l_orderkey
HAVING count(*) > 1
""",
    tags=("agg", "having", "collect"),
)
def a1_dup_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + count + collect_list + HAVING — dup detection shape.

    The id list is emitted as a comma-joined string (numeric sort
    first, then stringify) so downstream hashers that can't order
    array cells still get a scalar, hashable column.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("c"),
            F.sort_array(F.collect_list("l_linenumber")).alias("_ids"),
        )
        .filter(F.col("c") > 1)
        .select(
            "l_orderkey",
            "c",
            F.array_join(
                F.expr("transform(_ids, x -> cast(x AS string))"), ","
            ).alias("ids"),
        )
    )


# ---------------------------------------------------------------------------
# A2 — the incrementally-maintained (puuid × champion) aggregate
# ($inc upsert, transformer_loader/main.py:184-190) recomputed as a
# full grouped agg: games, wins, kda_sum per (user, category).
# ---------------------------------------------------------------------------


@register(
    "a2_grouped_rollup",
    oracle="""
SELECT user_id, event_type,
       count(*) AS games,
       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS wins,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM events
GROUP BY user_id, event_type
""",
    tags=("agg", "incremental"),
)
def a2_grouped_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(user, category) with count / conditional sum / metric sum
    — the batch recompute of the reference's `$inc` gold table (the
    streaming update-mode variant lives in catalog_streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("games"),
        F.sum(cond_flag(F.col("value") > 100)).cast("bigint").alias("wins"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# A3+A4 — per-champion rollup with derived metrics (api_service/
# main.py:340-358): games, wins, sums → avg_kda, winrate (rounded).
# ---------------------------------------------------------------------------


@register(
    "a3_champion_rollup",
    oracle=f"""
WITH g AS (
    SELECT o_orderpriority AS champion,
           count(*) AS games,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gold
    FROM orders GROUP BY o_orderpriority
)
SELECT champion, games, wins, gold,
       {sql_round("gold / greatest(1, games)", 2)} AS avg_gold,
       {sql_round("wins * 100.0 / games", 1)} AS winrate
FROM g
""",
    tags=("agg", "derived"),
)
def a3_champion_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category rollup + post-agg derived columns (A3, A4): safe-div
    average and percentage, both engine-portable rounded."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("champion")).agg(
        F.count("*").alias("games"),
        F.sum(cond_flag(F.col("o_orderstatus") == "F")).cast("bigint").alias("wins"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("gold"),
    )
    return g.select(
        "champion",
        "games",
        "wins",
        "gold",
        round_half_up(F.col("gold") / F.greatest(F.lit(1), F.col("games")), 2).alias(
            "avg_gold"
        ),
        round_half_up(F.col("wins") * 100.0 / F.col("games"), 1).alias("winrate"),
    )


# ---------------------------------------------------------------------------
# A5 — scalar aggregates: total games / conditional wins / win-rate
# (dashboard/app.py:405-407) as a single-row frame.
# ---------------------------------------------------------------------------


@register(
    "a5_scalar_aggs",
    oracle=f"""
SELECT count(*) AS total_games,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS total_wins,
       {sql_round("sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 100.0 / count(*)", 1)} AS winrate
FROM orders
""",
    tags=("agg", "scalar"),
)
def a5_scalar_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count, conditional count, ratio — one-row summary."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("total_games"),
        F.sum(cond_flag(F.col("o_orderstatus") == "F"))
        .cast("bigint")
        .alias("total_wins"),
        round_half_up(
            F.sum(cond_flag(F.col("o_orderstatus") == "F"))
            * 100.0
            / F.count("*"),
            1,
        ).alias("winrate"),
    )


# ---------------------------------------------------------------------------
# A6 — distinct (set() over names, api_service/main.py:101) + O3 sort.
# ---------------------------------------------------------------------------


@register(
    "a6_distinct_sorted",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    tags=("agg", "distinct"),
)
def a6_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct + lexicographic sort (A6/O3)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# A7 — per-collection counts (README.md:103-104 ops checks).
# ---------------------------------------------------------------------------


@register(
    "a7_table_counts",
    oracle="""
SELECT 'customer' AS tbl, count(*) AS n FROM customer
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'events', count(*) FROM events
""",
    tags=("agg", "count"),
)
def a7_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count per table, unioned into one frame."""
    parts = []
    for t in ("customer", "orders", "lineitem", "events"):
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("tbl"), F.count("*").alias("n")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# A8 — keep-first dedup (utils/clean_db.py:14-24): first-seen row wins.
# Deterministic version: earliest (ts, event_id) per user survives —
# dropDuplicates() alone is order-dependent, so the engine's canonical
# form is the row_number()==1 window (same plan shape, stable result).
# ---------------------------------------------------------------------------


@register(
    "a8_keep_first_dedup",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM (
    SELECT e.*, row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events e
) WHERE rn = 1
""",
    tags=("dedup", "window"),
)
def a8_keep_first_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-seen dedup per key via row_number()==1."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Extras the reference lacks (SURVEY §2.4 note): exact distinct counts,
# cube/rollup grouping sets — free in Spark, graded as engine surface.
# ---------------------------------------------------------------------------


@register(
    "a_count_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate (expand-based plan in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@register(
    "a_rollup_hierarchy",
    oracle="""
SELECT coalesce(r_name, '(all)') AS grp_region,
       coalesce(n_name, '(all)') AS grp_nation,
       count(*) AS n,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg", "rollup"),
)
def a_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy; grouping-level nulls
    normalized to '(all)' markers (dim names are never null) so the
    levels hash identically across engines."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("bal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("grp_region"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("grp_nation"),
            "n",
            "bal",
        )
    )


@register(
    "a_approx_quantiles",
    # GK sketches are engine-specific, so (like a_approx_distinct) the
    # oracle checks the sketch's own guarantee as an invariant: with
    # accuracy=1000 the rank error is <= n/1000, so the approximate
    # median must lie between the exact values at rank
    # floor(0.5·n) − slack and ceil(0.5·n) + slack (slack = 2× the
    # bound). The exact rank-selected bounds themselves hash-match.
    oracle="""
WITH r AS (
    SELECT l_returnflag, l_quantity,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY l_quantity) AS rn,
           count(*) OVER (PARTITION BY l_returnflag) AS n
    FROM lineitem
)
SELECT l_returnflag,
       max(n) AS n,
       max(CASE WHEN rn = greatest(
               1, CAST(floor(0.5 * n) AS BIGINT)
                  - 2 * greatest(1, CAST(ceil(n / 1000.0) AS BIGINT)))
           THEN l_quantity END) AS lo,
       max(CASE WHEN rn = least(
               n, CAST(ceil(0.5 * n) AS BIGINT)
                  + 2 * greatest(1, CAST(ceil(n / 1000.0) AS BIGINT)))
           THEN l_quantity END) AS hi,
       true AS approx_ok
FROM r GROUP BY l_returnflag
""",
    tags=("agg", "percentile", "approx"),
)
def a_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch) next to exact rank-selected
    bounds — the at-scale quantile path (one pass, bounded memory, no
    full sort), oracle-checked via the sketch's rank-error guarantee.

    The exact bounds use rank selection only to VERIFY; the
    production operator is the sketch aggregation alone, which is a
    partial-aggregable one-shuffle plan at any scale.

    Rank selection runs over the per-group VALUE HISTOGRAM, not the
    rows (r11): the value at rank r is the value whose cumulative
    count window [cum − cnt + 1, cum] contains r — identical to
    row_number selection (ties share a value, so the tiebreak never
    mattered), but the ordered window now moves |distinct values|
    rows per group instead of every fact row. The former per-group
    row sort was also the one 100 TB hazard here (a 3-partition
    WindowExec sorting the whole fact)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    hist = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("cnt")
    )
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wall = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "l_quantity",
        "cnt",
        F.sum("cnt").over(wq).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    slack = 2 * F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("n") / 1000.0)
    )
    lo_rn = F.greatest(
        F.lit(1).cast("long"),
        F.floor(0.5 * F.col("n")).cast("long") - slack,
    )
    hi_rn = F.least(
        F.col("n"), F.ceil(0.5 * F.col("n")).cast("long") + slack
    )

    def at_rank(r):
        return F.max(
            F.when(
                (F.col("cum") >= r) & (F.col("cum") - F.col("cnt") < r),
                F.col("l_quantity"),
            )
        )

    bounds = cum.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        at_rank(lo_rn).alias("lo"),
        at_rank(hi_rn).alias("hi"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(1000)).alias(
            "_approx"
        )
    )
    return bounds.join(approx, "l_returnflag").select(
        "l_returnflag",
        "n",
        "lo",
        "hi",
        (
            (F.col("_approx") >= F.col("lo"))
            & (F.col("_approx") <= F.col("hi"))
        ).alias("approx_ok"),
    )


@register(
    "a_value_histogram",
    oracle="""
WITH p AS (
    SELECT least(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19)
             AS bucket
    FROM orders
)
SELECT bucket,
       (bucket * 25000.0)::DOUBLE AS lo,
       ((bucket + 1) * 25000.0)::DOUBLE AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY bucket
""",
    tags=("agg", "histogram", "profiling"),
)
def a_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (20 × 25k buckets, tail
    clamped into the last) — the profiling shape behind every numeric
    distribution chart. Bucketing is a row-local floor division, the
    single exchange carries ≤ 20 groups after map-side partial
    counts, and bounds are exact double multiples — nothing summed,
    so engines agree trivially. Pairs with `a_approx_quantiles` (GK)
    for the quantile view of the same distribution.
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0).cast("long"), F.lit(19)
    )
    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 25000.0).alias("lo"),
            ((F.col("bucket") + 1) * 25000.0).alias("hi"),
            "n",
        )
    )


@register(
    "a_gini_concentration",
    oracle="""
WITH cust AS (
    SELECT o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                AS DECIMAL(38,0)) AS cents
    FROM orders GROUP BY o_custkey
),
rk AS (
    SELECT cents,
           CAST(row_number() OVER (ORDER BY cents, o_custkey)
                AS BIGINT) AS i
    FROM cust
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(i * cents) AS DECIMAL(38,0)) AS s1,
           CAST(sum(cents) AS DECIMAL(38,0)) AS tot
    FROM rk
)
SELECT n,
       CAST(CAST(2 * s1 - (n + 1) * tot AS DECIMAL(38,0)) AS DOUBLE)
         / CAST(CAST(n AS DECIMAL(38,0)) * tot AS DOUBLE) AS gini
FROM s
""",
    tags=("agg", "analytics", "concentration"),
)
def a_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the revenue-concentration
    gauge (0 = everyone spends alike, →1 = one whale). Exact order
    statistics: per-customer spend in integer cents (DECIMAL-exact),
    ranked ascending with a key tiebreak, and the closed form
    ``(2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`` computed entirely in
    DECIMAL(38,0) integers with ONE final IEEE division — engines
    agree bit-for-bit, and DECIMAL(38,0) holds Σ i·xᵢ far past the
    BIGINT overflow point (~sf1 customer counts). One fact exchange
    to the customer grain; the exact rank comes from the distributed
    global row number (operators/ranking.py — range partitions, not
    the r8 verdict's single-partition WindowExec over the customer
    grain), and Σ i·xᵢ / Σ xᵢ / n are plain partial aggregates over
    the ranked frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(38,0)")
        .alias("cents")
    )
    rk = R.global_row_number(
        cust, [F.col("cents"), F.col("o_custkey")], rank_name="i"
    ).select("cents", "i")
    s = rk.agg(
        F.count("*").alias("n"),
        F.sum(F.col("i") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum("cents").cast("decimal(38,0)").alias("tot"),
    )
    return s.select(
        "n",
        (
            (
                F.lit(2) * F.col("s1")
                - (F.col("n") + 1) * F.col("tot")
            )
            .cast("decimal(38,0)")
            .cast("double")
            / (F.col("n").cast("decimal(38,0)") * F.col("tot")).cast(
                "double"
            )
        ).alias("gini"),
    )


@register(
    "a_basket_pairs",
    oracle="""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem),
pc AS (
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS part_orders
    FROM op GROUP BY l_partkey
),
pairs AS (
    SELECT o1.l_partkey AS part_a, o2.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS pair_orders
    FROM op o1 JOIN op o2
      ON o1.l_orderkey = o2.l_orderkey
     AND o1.l_partkey < o2.l_partkey
    GROUP BY o1.l_partkey, o2.l_partkey
)
SELECT part_a, part_b, pair_orders,
       CAST(pair_orders * n_orders AS DOUBLE)
         / CAST(pa.part_orders * pb.part_orders AS DOUBLE) AS lift
FROM pairs
JOIN pc pa ON pa.l_partkey = part_a
JOIN pc pb ON pb.l_partkey = part_b
CROSS JOIN tot
ORDER BY pair_orders DESC, part_a, part_b
LIMIT 20
""",
    tags=("agg", "analytics", "basket"),
)
def a_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: the 20 part pairs most often bought in
    the same order, with their lift (observed co-rate over the
    independence expectation). The canonical co-occurrence shape —
    also how word co-occurrence / PMI tables are built for corpus
    analysis. Scale plan: ONE shuffle builds the per-order basket
    (``collect_set`` — dedupe happens inside the partial agg, and
    basket size is bounded by order width, never corpus-sized), then
    pair expansion is a map-side higher-order-function over the
    sorted array (``part_a < part_b`` by construction) feeding one
    partial-agg pair shuffle. The marginals and the order count fan
    out from the SAME basket subtree — identical plan fragments, so
    Spark reuses the exchange instead of re-shuffling — and the order
    count rides along as a broadcast 1-row frame, keeping the whole
    query a single job (the former self-join spent two extra
    exchanges plus a driver-side count). Lift math in exact BIGINTs
    with one IEEE division (``pair·N / (cnt_a·cnt_b)``), identical on
    both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    tot = baskets.agg(F.count("*").cast("long").alias("n_orders"))
    pc = (
        baskets.select(F.explode("parts").alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").cast("long").alias("part_orders"))
    )
    # all (i, j>i) pairs of the sorted basket: slice-from-i+1 under a
    # positional transform — pure column expressions, no UDF
    pair_structs = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + F.lit(2), F.size("parts")),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("pair_orders"))
        .orderBy(F.col("pair_orders").desc(), "part_a", "part_b")
        .limit(20)
    )
    pa = pc.withColumnsRenamed({"pk": "part_a", "part_orders": "orders_a"})
    pb = pc.withColumnsRenamed({"pk": "part_b", "part_orders": "orders_b"})
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "pair_orders",
            (
                (F.col("pair_orders") * F.col("n_orders")).cast("double")
                / (F.col("orders_a") * F.col("orders_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("pair_orders").desc(), "part_a", "part_b")
    )


@register(
    "a_correlation",
    oracle="""
WITH items AS (
    SELECT l_orderkey, CAST(count(*) AS HUGEINT) AS y
    FROM lineitem GROUP BY l_orderkey
),
xy AS (
    SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                AS HUGEINT) AS x,
           i.y
    FROM orders o JOIN items i ON o.o_orderkey = i.l_orderkey
),
m AS (
    SELECT CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x) AS HUGEINT) AS sx,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(x * y) AS HUGEINT) AS sxy,
           CAST(sum(x * x) AS HUGEINT) AS sxx,
           CAST(sum(y * y) AS HUGEINT) AS syy
    FROM xy
)
SELECT CAST(n AS BIGINT) AS n,
       floor((CAST(n * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS corr_r
FROM m
""",
    tags=("agg", "analytics", "statistics"),
)
def a_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between an order's total price and its
    line-item count — the canonical two-variable association readout,
    computed the deterministic way rather than via ``F.corr`` (whose
    streaming-update float accumulation is partition-order-dependent):
    prices become exact integer CENTS (the `a_gini_concentration`
    discipline), all five moments (Σx Σy Σxy Σx² Σy²) accumulate in
    DECIMAL(38,0) integers — associative, order-proof — and Pearson's
    closed form runs as THREE final IEEE ops (two casts' products, one
    division), rounded half-up at 1e-6. The oracle keeps the identical
    integers in HUGEINT. One orderkey join + one global rollup: the
    moments frame is a single row at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    items = li.groupBy("l_orderkey").agg(
        F.count("*").cast("decimal(38,0)").alias("y")
    )
    xy = orders.join(
        items, orders.o_orderkey == items.l_orderkey
    ).select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)")
        .alias("x"),
        "y",
    )
    m = xy.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        round_half_up(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                .cast("double")
            ),
            6,
        ).alias("corr_r"),
    )


@register(
    "a_linear_trend",
    oracle="""
WITH daily AS (
    SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01'
                AS HUGEINT) AS x,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                AS HUGEINT) AS y
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
),
m AS (
    SELECT CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x) AS HUGEINT) AS sx,
           CAST(sum(y) AS HUGEINT) AS sy,
           CAST(sum(x * y) AS HUGEINT) AS sxy,
           CAST(sum(x * x) AS HUGEINT) AS sxx
    FROM daily
)
SELECT CAST(n AS BIGINT) AS n_days,
       floor((CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS slope_cents_per_day,
       floor(((CAST(sy AS DOUBLE)
               - (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE))
                 * CAST(sx AS DOUBLE))
              / CAST(n AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS intercept_cents
FROM m
""",
    tags=("agg", "analytics", "statistics"),
)
def a_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares revenue trend: slope and intercept of
    daily revenue (integer cents) against the day index — the
    is-the-business-growing line every dashboard fits, and the same
    closed form DSPy/feature pipelines use for drift slopes. Moments
    accumulate as exact DECIMAL(38,0)/HUGEINT integers over the
    calendar-bounded daily rollup (one fact exchange, then ~2.4k
    rows); slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²) and the intercept derive
    with a FIXED IEEE expression order both engines spell
    identically, rounded half-up at 1e-6.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .alias("y")
        )
        .select(
            F.datediff(F.col("d"), F.lit("1995-01-01").cast("date"))
            .cast("decimal(38,0)")
            .alias("x"),
            "y",
        )
    )
    m = daily.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        round_half_up(slope, 6).alias("slope_cents_per_day"),
        round_half_up(
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            6,
        ).alias("intercept_cents"),
    )
