"""Spark SQL surface — the same engine through ``spark.sql`` over
registered views (io.register_views): correlated subqueries, grouping
sets, and the remaining window battery. Catalyst compiles these to
the same plans as the DataFrame API; the point is the SQL entry point
itself (subqueries especially have no direct DataFrame spelling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import register_views
from baronbatch_etl_spark.operators import ranking as R
from baronbatch_etl_spark.queries import register

# ---------------------------------------------------------------------------
# Correlated EXISTS — decorrelated by Catalyst into a semi join.
# ---------------------------------------------------------------------------

_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


@register("q_sql_exists", oracle=_EXISTS_SQL, tags=("sql", "subquery"))
def q_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through spark.sql (plans as left-semi)."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


# ---------------------------------------------------------------------------
# Scalar subquery + NOT IN — both decorrelated.
# ---------------------------------------------------------------------------

_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
  AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""


@register("q_sql_scalar_subquery", oracle=_SCALAR_SQL, tags=("sql", "subquery"))
def q_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery + NOT IN anti subquery.

    NB: avg() here is a single global double aggregate — identical
    accumulation order is not guaranteed across engines in general,
    but a *threshold* use only drifts hash results if a row sits
    within 1 ulp of the boundary; row values are 2-decimal prices, so
    the comparison is stable.
    """
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


# ---------------------------------------------------------------------------
# GROUPING SETS (beyond the rollup/cube queries).
# ---------------------------------------------------------------------------

_GSETS_SQL = """
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("q_sql_grouping_sets", oracle=_GSETS_SQL, tags=("sql", "groupingsets"))
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-status, per-priority, grand total."""
    register_views(spark, sf_dir)
    return spark.sql(_GSETS_SQL)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery — per-row top-k without a window pass.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 3
) t
"""


@register("q_sql_lateral", oracle=_LATERAL_SQL, tags=("sql", "lateral"))
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL subquery with per-group ORDER BY + LIMIT (top-3
    customers by balance per nation; unique tiebreaker keeps both
    engines identical). Catalyst plans the correlation as a join —
    the same result as a row_number window but expressed as SQL
    lateral, which the DataFrame API cannot spell."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Remaining window battery: ntile / percent_rank / cume_dist.
# ---------------------------------------------------------------------------

_NTILE_SQL = """
SELECT c_custkey,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""


@register("w_ntile_battery", oracle=_NTILE_SQL, tags=("sql", "window"))
def w_ntile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over a deterministic ordering
    (unique tiebreaker keeps ranks engine-identical).

    The oracle stays the literal SQL battery; the Spark side computes
    the identical exact statistics through the DISTRIBUTED global
    rank (operators/ranking.py) — the naive ``OVER (ORDER BY ...)``
    plan funnels the whole customer table through ONE task (the r8
    verdict's scale-killer class). rank→(ntile, percent_rank,
    cume_dist) is pure arithmetic; cume_dist = rank/n is exact here
    because the (c_acctbal, c_custkey) order is unique."""
    register_views(spark, sf_dir)
    cust = spark.table("customer").select("c_custkey", "c_acctbal")
    ranked = R.global_row_number(
        cust,
        [F.col("c_acctbal"), F.col("c_custkey")],
        rank_name="_r",
        total_name="_n",
    )
    return ranked.select(
        "c_custkey",
        R.ntile_from_rank("_r", "_n", 4).alias("quartile"),
        R.percent_rank_col("_r", "_n").alias("pr"),
        R.cume_dist_col("_r", "_n").alias("cd"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark ≥4.0): iterative SQL inside the engine — the
# hierarchy/graph-walk shape (the reference walks parent references in
# Python loops; dup-cluster closure does the same walk over pair
# graphs). Synthetic binary-heap hierarchy over supplier keys
# (parent = key DIV 2): acyclic, depth ⌈log2 n⌉, engine-terminated.
# ---------------------------------------------------------------------------

_RECURSIVE_SPARK = """
WITH RECURSIVE chain AS (
    SELECT s_suppkey AS key, s_suppkey AS anc, 0 AS depth FROM supplier
    UNION ALL
    SELECT key, anc DIV 2, depth + 1 FROM chain WHERE anc > 1
)
SELECT key AS s_suppkey,
       CAST(max(depth) AS BIGINT) AS chain_len,
       count(*) AS n_ancestors
FROM chain GROUP BY key
"""

_RECURSIVE_DUCK = """
WITH RECURSIVE chain AS (
    SELECT s_suppkey AS key, s_suppkey AS anc, 0 AS depth FROM supplier
    UNION ALL
    SELECT key, anc // 2, depth + 1 FROM chain WHERE anc > 1
)
SELECT key AS s_suppkey,
       CAST(max(depth) AS BIGINT) AS chain_len,
       count(*) AS n_ancestors
FROM chain GROUP BY key
"""


@register("q_sql_recursive", oracle=_RECURSIVE_DUCK, tags=("sql", "recursive"))
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE ancestor walk over a synthetic binary-heap
    hierarchy (parent = key DIV 2): per-key chain length to the root.
    Each recursion step is a distributed self-union — the SQL spelling
    of the iterative join loop in operators/dedup.connected_components."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPARK)
