"""Graph analytics: PageRank invariants on hand-checkable graphs.

Small graphs where the fixed-point is known analytically pin the
random-walk arithmetic; the mass-conservation property pins the
no-dangling contract on the real order graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from baronbatch_etl_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is rank-symmetric: every node keeps exactly
    1/N at every iteration (contribution = rank/1 from one in-edge)."""
    n = 5
    cycle = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    rows = G.pagerank(cycle, iters=3).collect()
    assert len(rows) == n
    for r in rows:
        assert r.rank == pytest.approx(1.0 / n, abs=1e-8)


def test_pagerank_star_center_dominates(spark):
    """Undirected star: the hub collects mass from every spoke and
    must outrank all of them; spokes are symmetric → equal ranks."""
    spokes = [(0, i) for i in range(1, 6)]
    edges = G.undirected_edges(
        _edges(spark, spokes), "src", "dst"
    )
    rows = {r.node: r.rank for r in G.pagerank(edges, iters=3).collect()}
    hub, spoke_ranks = rows[0], [rows[i] for i in range(1, 6)]
    assert all(hub > s for s in spoke_ranks)
    assert max(spoke_ranks) - min(spoke_ranks) < 1e-12


def test_pagerank_mass_conserved(spark):
    """With every node having out-degree ≥ 1 (undirected closure),
    total rank mass stays 1 modulo the 1e-9 quantisation."""
    pairs = [(i, 10 + (i * 7) % 4) for i in range(10)]
    edges = G.undirected_edges(_edges(spark, pairs), "src", "dst")
    total = (
        G.pagerank(edges, iters=4)
        .agg(F.sum("rank").alias("s"))
        .first()
        .s
    )
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_rejects_dangling_sink(spark):
    """The no-dangling contract is ENFORCED, not documented (r9
    verdict #3): a directed graph with a sink node must raise instead
    of silently leaking the sink's inbound rank mass."""
    chain = _edges(spark, [(1, 2), (2, 3)])  # 3 is a sink
    with pytest.raises(ValueError, match="dangling"):
        G.pagerank(chain, iters=2)


def test_pagerank_dangling_check_optout_still_runs(spark):
    """check_dangling=False is the documented escape hatch for graphs
    that guarantee the contract by construction — same census result
    (and therefore identical ranks) on a contract-satisfying graph."""
    n = 5
    cycle = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    checked = {
        r.node: r.rank for r in G.pagerank(cycle, iters=2).collect()
    }
    unchecked = {
        r.node: r.rank
        for r in G.pagerank(cycle, iters=2, check_dangling=False).collect()
    }
    assert checked == unchecked


def test_pagerank_weight_filter_can_create_dangling(spark):
    """A node whose edges are ALL non-positive-weight loses them to
    the weight filter and becomes a sink — the census runs after the
    filter, so this must raise too."""
    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 1, 2), (1, 3, 1), (3, 1, 0)],
        "src long, dst long, w long",
    )
    with pytest.raises(ValueError, match="dangling"):
        G.pagerank(edges, iters=2, weight_col="w")


def test_pagerank_matches_dense_reference(spark):
    """Bit-for-bit-free sanity: the distributed ranks agree with a
    driver-side dense power iteration to float tolerance on an
    irregular graph."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 4)]
    edges = G.undirected_edges(_edges(spark, pairs), "src", "dst")
    edge_rows = [(r.src, r.dst) for r in edges.collect()]
    nodes = sorted({x for e in edge_rows for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = {v: sum(1 for s, _ in edge_rows if s == v) for v in nodes}
    ranks = [1.0 / n] * n
    for _ in range(3):
        nxt = [0.15 / n] * n
        for s, d in edge_rows:
            nxt[idx[d]] += 0.85 * ranks[idx[s]] / deg[s]
        ranks = nxt
    got = {r.node: r.rank for r in G.pagerank(edges, iters=3).collect()}
    for v in nodes:
        assert got[v] == pytest.approx(ranks[idx[v]], abs=1e-7)


def test_pagerank_rejects_zero_iters(spark):
    with pytest.raises(ValueError):
        G.pagerank(_edges(spark, [(0, 1), (1, 0)]), iters=0)


def test_undirected_edges_disjoint_skips_distinct(spark):
    """disjoint=True must produce exactly the doubled edge set when
    the precondition holds (distinct pairs, disjoint domains)."""
    pairs = _edges(spark, [(0, 1), (0, 3), (2, 1)])
    strict = G.undirected_edges(pairs, "src", "dst").collect()
    fast = G.undirected_edges(
        pairs, "src", "dst", disjoint=True
    ).collect()
    assert sorted(map(tuple, strict)) == sorted(map(tuple, fast))


def test_hits_hand_computed_bipartite(spark):
    """c1→{s1,s2}, c2→{s1}: a1=(2,1); h1=(3,2); a2=(5,3); h2=(8,5)."""
    pairs = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "c long, s long"
    )
    auth, hub = G.hits(pairs, iters=2)
    assert {(r.s, r.score) for r in auth.collect()} == {(10, 5), (20, 3)}
    assert {(r.c, r.score) for r in hub.collect()} == {(1, 8), (2, 5)}


def test_hits_scores_are_exact_integers(spark):
    pairs = spark.createDataFrame(
        [(c, s) for c in range(6) for s in range(10, 13) if (c + s) % 2],
        "c long, s long",
    )
    auth, hub = G.hits(pairs, iters=3)
    assert dict(auth.dtypes)["score"] == "bigint"
    assert dict(hub.dtypes)["score"] == "bigint"
    assert all(r.score > 0 for r in auth.collect())


def test_weighted_pagerank_unit_weights_match_unweighted(spark):
    """weight_col of all-1s must be bit-identical to the unweighted
    walk (rank·1/deg ≡ rank/deg in IEEE doubles)."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0)]
    edges = G.undirected_edges(_edges(spark, pairs), "src", "dst")
    plain = {
        r.node: r.rank for r in G.pagerank(edges, iters=3).collect()
    }
    unit = {
        r.node: r.rank
        for r in G.pagerank(
            edges.withColumn("w", F.lit(1).cast("long")),
            iters=3,
            weight_col="w",
        ).collect()
    }
    assert unit == plain


def test_weighted_pagerank_heavy_edge_pulls_rank(spark):
    """Star where one spoke carries 10x weight: that spoke must
    outrank the others (mass flows ∝ weight), and mass stays 1."""
    rows = [(0, i, 10 if i == 1 else 1) for i in range(1, 5)]
    fwd = spark.createDataFrame(rows, "src long, dst long, w long")
    rev = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    ranks = {
        r.node: r.rank
        for r in G.pagerank(
            fwd.unionByName(rev), iters=3, weight_col="w"
        ).collect()
    }
    assert ranks[1] > max(ranks[i] for i in (2, 3, 4))
    assert abs(sum(ranks.values()) - 1.0) < 1e-6


def test_weighted_pagerank_zero_weight_edges_dropped(spark):
    """A node whose out-edges ALL carry weight 0 must not emit null
    contributions (silently dropped rank mass) or ANSI-divide-crash:
    the positive-weight contract filters those edges up front and the
    node degrades to dangling (round-4 advice) — which the default
    census now REJECTS loudly (r9 verdict #3). The explicit opt-out
    preserves the old degrade-to-dangling arithmetic: no null/NaN
    ranks, the sink still receives mass as a dst."""
    rows = [(0, 1, 2), (1, 2, 1), (2, 0, 1), (2, 3, 1), (3, 0, 0)]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    with pytest.raises(ValueError, match="dangling"):
        G.pagerank(edges, iters=3, weight_col="w")
    got = G.pagerank(
        edges, iters=3, weight_col="w", check_dangling=False
    ).collect()
    ranks = {r.node: r.rank for r in got}
    assert all(r.rank is not None and r.rank == r.rank for r in got)
    assert 3 in ranks  # still receives mass as a dst of node 2
    assert all(r.rank > 0 for r in got)


def _canon(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_stats_k4(spark):
    """K4 analytically: 4 nodes of degree 3 → 6 edges, 12 wedges,
    4 triangles (clustering exactly 1)."""
    k4 = _canon(
        spark, [(a, b) for a in range(4) for b in range(a + 1, 4)]
    )
    row = G.triangle_stats(k4).first()
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        4, 6, 12, 4,
    )


def test_triangle_stats_path_has_none(spark):
    """A path graph is triangle-free but full of wedges."""
    path = _canon(spark, [(i, i + 1) for i in range(6)])
    row = G.triangle_stats(path).first()
    assert row.n_triangles == 0
    assert row.n_wedges == 5  # every interior node closes one wedge


def test_triangle_stats_star_hub(spark):
    """A star: the hub's quadratic wedge count must be counted but
    close zero triangles — the degree orientation points every edge
    AT the hub, so the wedge join never fans out from it."""
    star = _canon(spark, [(0, i) for i in range(1, 12)])
    row = G.triangle_stats(star).first()
    assert row.n_triangles == 0
    assert row.n_wedges == 55  # C(11, 2) at the hub


def test_triangle_stats_matches_bruteforce(spark):
    """Differential vs an itertools triple scan on a pseudorandom
    graph (deterministic seed)."""
    import itertools
    import random

    rng = random.Random(42)
    nodes = range(30)
    edges = sorted(
        {
            (a, b)
            for a in nodes
            for b in nodes
            if a < b and rng.random() < 0.2
        }
    )
    eset = set(edges)
    expected = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in eset and (y, z) in eset and (x, z) in eset
    )
    row = G.triangle_stats(_canon(spark, edges)).first()
    assert row.n_triangles == expected
    assert row.n_edges == len(edges)


def test_adamic_adar_hand_computed(spark):
    """Square 1-2-3-4-1: the two diagonals are the only distance-2
    pairs; each has two common neighbors of degree 2, so
    AA = 2/ln(2) for both."""
    import math

    square = _canon(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    rows = {(r.x, r.y): r.score for r in G.adamic_adar(square).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    expected = 2 * (math.floor(1.0 / math.log(2) * 1e9 + 0.5) / 1e9)
    for v in rows.values():
        assert v == pytest.approx(expected, abs=1e-9)


def test_adamic_adar_excludes_existing_edges(spark):
    """A triangle has common neighbors for every pair, but all pairs
    are already edges → no predictions."""
    tri = _canon(spark, [(1, 2), (1, 3), (2, 3)])
    assert G.adamic_adar(tri).count() == 0


def test_adamic_adar_degree_cap_drops_hub_centers(spark):
    """With the cap below the hub degree, wedges centered at the hub
    vanish: the star yields no predictions at all."""
    star = _canon(spark, [(0, i) for i in range(1, 8)])
    assert G.adamic_adar(star, max_degree=3).count() == 0
    # uncapped, every spoke pair is predicted through the hub
    assert G.adamic_adar(star).count() == 21  # C(7, 2)


def test_triangle_stats_empty_graph_zeroes(spark):
    """Empty edge list → all-zero census (not NULLs): sums over zero
    rows coalesce to 0 so the oracle's count(*)-based zeros match."""
    empty = spark.createDataFrame([], "a long, b long")
    row = G.triangle_stats(empty).first()
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        0, 0, 0, 0,
    )


def test_kcore_fixed_rounds_reach_fixpoint(spark, sf_dir):
    """g_kcore pins semantics to _KCORE_ROUNDS peel rounds; on the
    fixtures the peel must have CONVERGED inside that budget (one
    more round changes nothing), so the output is the true k-core,
    and every surviving node has degree >= k by definition."""
    from baronbatch_etl_spark.queries import catalog_graph as CG

    out = {
        (r.node, r.degree)
        for r in CG.g_kcore(spark, sf_dir).collect()
    }
    assert all(d >= CG._KCORE_K for _, d in out)
    # one extra round: same survivors, same degrees
    base = CG._frequent_copurchase_edges(spark, sf_dir)
    edges = base.select(
        F.col("a").alias("s"), F.col("b").alias("d")
    ).unionByName(base.select(F.col("b").alias("s"), F.col("a").alias("d")))
    for _ in range(CG._KCORE_ROUNDS + 1):
        alive = (
            edges.groupBy("s")
            .agg(F.count("*").alias("dg"))
            .filter(F.col("dg") >= CG._KCORE_K)
            .select("s")
        )
        edges = (
            edges.join(alive, "s", "left_semi")
            .join(alive.withColumnRenamed("s", "d"), "d", "left_semi")
            .select("s", "d")
            .localCheckpoint(eager=False)
        )
    more = {
        (r.node, r.degree)
        for r in edges.groupBy(F.col("s").alias("node"))
        .agg(F.count("*").cast("long").alias("degree"))
        .collect()
    }
    assert more == out
