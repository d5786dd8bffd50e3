"""Smoke tests: every registered query runs at sf0.001 and the
flagship produces a stable schema (the driver's t1 check)."""

from __future__ import annotations

import pytest

from baronbatch_etl_spark.queries import load_all

REGISTRY = load_all()


def test_flagship_runs_and_has_rows(spark, sf_dir):
    df = REGISTRY["flagship_player_stats"].fn(spark, sf_dir)
    assert df.columns == [
        "c_custkey",
        "c_name",
        "o_orderstatus",
        "games",
        "urgent",
        "total_spend",
        "avg_spend",
        "urgent_rate",
    ]
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    # schema resolves and the plan executes
    _ = df.schema
    _ = df.limit(5).collect()


def test_every_query_has_doc():
    for name, spec in REGISTRY.items():
        assert spec.doc, f"{name} lacks a docstring"
