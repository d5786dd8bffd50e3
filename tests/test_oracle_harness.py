"""Meta-tests: the oracle comparator itself must DETECT mismatches —
a vacuous verifier would silently bless every query."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "check_oracle", Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py"
)
co = importlib.util.module_from_spec(spec)
sys.modules.setdefault("check_oracle", co)
spec.loader.exec_module(co)


def test_hash_is_order_insensitive_but_value_sensitive():
    cols = ["a", "b"]
    rows = [(1, "x"), (2, "y")]
    assert co._hash_rows(cols, rows) == co._hash_rows(cols, list(reversed(rows)))
    assert co._hash_rows(cols, rows) != co._hash_rows(cols, [(1, "x"), (2, "z")])


def test_hash_is_column_name_keyed_not_position_keyed():
    # same values, columns presented in a different ORDER under the
    # same names → equal hash (the driver sorts columns by name)
    a = co._hash_rows(["a", "b"], [(1, "x")])
    b = co._hash_rows(["b", "a"], [("x", 1)])
    assert a == b
    # renaming a column changes which values align → caught by the
    # schema check upstream, but the hash must also not collide for
    # swapped values under the SAME names
    assert co._hash_rows(["a", "b"], [(1, "x")]) != co._hash_rows(
        ["a", "b"], [("x", 1)]
    )


def test_float_cells_compare_at_repr_exactness():
    assert co._norm_cell(0.1 + 0.2) != co._norm_cell(0.3)  # no tolerance
    assert co._norm_cell(float("nan")) == "NaN"
    assert co._norm_cell(None) == "NULL"
    assert co._norm_cell(True) == "true"  # not "1" — bool ≠ int


def test_list_cells_hash_without_crashing():
    h = co._hash_rows(["a"], [([1, 2],)])
    assert h != co._hash_rows(["a"], [([2, 1],)])  # order inside matters


# ---------------------------------------------------------------------------
# Registry-wide oracle output-type lint (round-5 verdict item 2).
#
# The driver's fetch path coerces DuckDB types the way fetchdf() does:
# HUGEINT (int128) and wide DECIMAL become float64, losing integer
# exactness above 2^53 — exactly what hash-failed mm_pixel_ahash and
# t_mixture_plan in round 5 while this repo's fetchall()-based gate
# stayed green. Every oracle projection must therefore resolve to a
# driver-safe type; anything outside the allowlist needs an explicit
# ::BIGINT / ::DOUBLE cast at the oracle's top-level SELECT.
# ---------------------------------------------------------------------------

_DRIVER_SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


def test_every_oracle_output_type_is_driver_safe(sf_dir):
    import duckdb

    from baronbatch_etl_spark.io import TABLES, table_path
    from baronbatch_etl_spark.queries import load_all

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    offenders = []
    for name, spec in load_all().items():
        sql = getattr(spec, "oracle", None)
        if not sql:
            continue
        for col, typ, *_ in con.execute(
            f"DESCRIBE SELECT * FROM ({sql}) _q"
        ).fetchall():
            if typ not in _DRIVER_SAFE_TYPES:
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle columns with driver-fragile DuckDB types (add an "
        f"explicit cast in the oracle SQL): {offenders}"
    )
