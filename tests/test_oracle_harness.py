"""Regression tests for the check_oracle compare harness itself.

The round-6 flake: normalize() decided the string-canonicalization
branch from the UNSORTED frame's physical row 0, which on the Spark
side depends on nondeterministic partition arrival order. With a
nullable string column (asof_dir: 79% null at sf0.01), one engine's
frame could lead with a null and the other with a string, so only one
side ran astype(str) (mapping None -> 'None') — an always-green query
flaked a one-column value mismatch under concurrent load. The fix
decides the branch from the first NON-NULL value and keeps nulls None
on both sides."""

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_oracle import compare  # noqa: E402


def test_nullable_string_column_is_row_order_independent():
    a = pd.DataFrame({"id": [1, 2, 3], "dir": [None, "backward", "forward"]})
    b = pd.DataFrame({"id": [2, 3, 1], "dir": ["backward", "forward", None]})
    assert compare("t", a, b) == []
    assert compare("t", b, a) == []


def test_all_null_string_column_matches_itself():
    a = pd.DataFrame({"id": [1, 2], "dir": [None, None]})
    b = pd.DataFrame({"id": [2, 1], "dir": [None, None]})
    assert compare("t", a, b) == []


def test_genuine_string_difference_still_fails():
    a = pd.DataFrame({"id": [1, 2], "dir": ["backward", "forward"]})
    b = pd.DataFrame({"id": [1, 2], "dir": ["backward", "backward"]})
    assert any("dir" in p for p in compare("t", a, b))


def test_null_vs_value_still_fails():
    a = pd.DataFrame({"id": [1, 2], "dir": [None, "forward"]})
    b = pd.DataFrame({"id": [1, 2], "dir": ["backward", "forward"]})
    assert compare("t", a, b) != []


def test_dtype_strictness_preserved():
    a = pd.DataFrame({"id": [1, 2], "v": [3, 4]})
    b = pd.DataFrame({"id": [1, 2], "v": [3.0, 4.0]})
    assert any("dtype" in p for p in compare("t", a, b))
