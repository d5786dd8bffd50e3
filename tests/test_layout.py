"""Semantic tests for the layout/sketch additions: z-order clustering
actually bounds both dimensions per bucket, and HLL sketch unions
stay inside the error envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from baronbatch_etl_spark.queries import load_all

REG = load_all()


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    rows = REG["q_zorder_layout"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.z_bucket <= 15
        # top-4 z-bits pin the top 2 bits of EACH dimension: every
        # bucket's rectangle is at most 64×64 of the 256×256 space —
        # the property that makes file-level min/max stats prune scans
        # on either predicate column after a z-sorted write.
        assert r.cust_span <= 64
        assert r.day_span <= 64
    # exact quadrant check: bucket bits (3..0) = (day7, cust7, day6,
    # cust6) — each bucket's min/max must sit inside that 64×64 cell
    for r in rows:
        c_hi = ((r.z_bucket >> 1) & 2) | ((r.z_bucket >> 0) & 1)
        d_hi = ((r.z_bucket >> 2) & 2) | ((r.z_bucket >> 1) & 1)
        assert r.min_cust >> 6 == r.max_cust >> 6 == c_hi
        assert r.min_day >> 6 == r.max_day >> 6 == d_hi


def test_zorder_covers_all_rows(spark, sf_dir):
    out = REG["q_zorder_layout"].fn(spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    from baronbatch_etl_spark.io import load_table

    assert total == load_table(spark, sf_dir, "orders").count()


def test_hll_union_invariant(spark, sf_dir):
    r = REG["a_hll_union"].fn(spark, sf_dir).collect()[0]
    assert r.union_ok is True
    assert r.n_sketches >= 1 and r.exact_users >= 1
