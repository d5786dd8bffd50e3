"""grouped_median_exact: parity with Spark's exact built-in median
(which buffers whole groups) on every shape that has bitten a median
implementation before — odd/even groups, heavy ties, nulls, all-null
groups, negatives, singletons — plus a hypothesis differential and a
plan assertion that the band keeps the window frame off the data
grain."""

from __future__ import annotations

import statistics

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from baronbatch_etl_spark.io import load_table
from baronbatch_etl_spark.operators.stats import grouped_median_exact


def _spark_median(df, keys, col):
    rows = (
        df.groupBy(*keys)
        .agg(F.median(col).alias("m"))
        .collect()
    )
    return {tuple(r[k] for k in keys): r["m"] for r in rows}


def _ours(df, keys, col, **kw):
    out = grouped_median_exact(df, keys, col, **kw)
    rows = out.collect()
    return {tuple(r[k] for k in keys): r["median"] for r in rows}


def test_matches_builtin_on_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert _ours(docs, ["lang"], "n_chars") == _spark_median(
        docs, ["lang"], "n_chars"
    )


def test_edge_shapes(spark):
    rows = [
        # odd group
        ("odd", 1), ("odd", 5), ("odd", 3),
        # even group -> half-integer
        ("even", 1), ("even", 2), ("even", 3), ("even", 10),
        # massive ties: collapsed band must stay tiny and exact
        *[("ties", 7)] * 50, *[("ties", 9)] * 50,
        # nulls ignored
        ("nullmix", None), ("nullmix", 4), ("nullmix", None), ("nullmix", 8),
        # all-null group -> NULL median, group still present
        ("allnull", None), ("allnull", None),
        # singleton, negative values
        ("one", -42),
        ("neg", -5), ("neg", -1), ("neg", -9), ("neg", -1),
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = _ours(df, ["g"], "v")
    assert got == {
        ("odd",): 3.0,
        ("even",): 2.5,
        ("ties",): 8.0,
        ("nullmix",): 6.0,
        ("allnull",): None,
        ("one",): -42.0,
        ("neg",): -3.0,
    }


def test_global_median_and_empty(spark):
    df = spark.createDataFrame([(x,) for x in [9, 1, 5, 3]], "v long")
    got = grouped_median_exact(df, [], "v").collect()
    assert [r["median"] for r in got] == [4.0]
    empty = spark.createDataFrame([], "v long")
    assert grouped_median_exact(empty, [], "v").collect() == []
    allnull = spark.createDataFrame([(None,), (None,)], "v int")
    got = grouped_median_exact(allnull, [], "v").collect()
    assert [r["median"] for r in got] == [None]


def test_tiny_accuracy_widens_band_but_stays_exact(spark):
    # margin 2/a clamps the band to the full value range at a <= 4 —
    # degenerate but still exact (the collapse/selection does all the
    # work); also exercises the below-band counter at higher accuracy
    df = spark.createDataFrame(
        [("g", v) for v in range(101)], "g string, v long"
    )
    for acc in (1, 4, 10, 10_000):
        assert _ours(df, ["g"], "v", accuracy=acc) == {("g",): 50.0}


def test_doubles_and_null_group_key(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), (None, 3.25), (None, 4.75), (None, 100.0)],
        "g string, v double",
    )
    assert _ours(df, ["g"], "v") == {("a",): 2.0, (None,): 4.75}


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_hypothesis_differential(spark, rows):
    df = spark.createDataFrame(rows, "g int, v long")
    got = _ours(df, ["g"], "v", accuracy=50)
    by_g: dict[int, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    want = {(g,): float(statistics.median(vs)) for g, vs in by_g.items()}
    assert got == want


def test_plan_collapses_band_before_window(spark):
    # the WindowExec input must be the (group, value)-collapsed
    # aggregate, not the raw rows — that collapse IS the scale story
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    plan = grouped_median_exact(df, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
    win_at = plan.find("Window")
    assert win_at != -1
    below = plan[win_at:]
    assert "HashAggregate" in below, (
        "window must run over the collapsed (group, value) aggregate"
    )
