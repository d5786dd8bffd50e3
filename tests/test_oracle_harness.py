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
