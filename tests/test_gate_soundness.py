"""The oracle gate must have teeth: a comparator that never fails is
indistinguishable from one that always passes. These tests feed the
parity comparator (the in-repo replica of the driver's compare)
deliberately mutated frames and assert it REPORTS the defect — and
feed it legitimately reordered frames and assert it does not. This
pins the driver-compare semantics the whole correctness story rests
on: order-insensitivity, exact values, column-name matching, and the
int-vs-float formatted-hash distinction (DuckDB HUGEINT->float drift
must fail, not squeak through as numeric equality).
"""

from __future__ import annotations

import math

import pandas as pd

from tests.test_oracle_parity import frames_equal


def _base() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": ["a", "b", "c"],
            "n": [1, 2, 3],
            "v": [1.5, float("nan"), -2.0],
        }
    )


def test_identical_frames_pass():
    assert frames_equal(_base(), _base()) == []


def test_row_order_is_ignored():
    shuffled = _base().iloc[[2, 0, 1]].reset_index(drop=True)
    assert frames_equal(shuffled, _base()) == []


def test_column_order_is_ignored():
    reordered = _base()[["v", "k", "n"]]
    assert frames_equal(reordered, _base()) == []


def test_nan_equals_nan():
    assert frames_equal(_base(), _base().copy()) == []
    assert math.isnan(_base()["v"][1])  # the case is actually present


def test_single_value_mutation_fails():
    bad = _base()
    bad.loc[1, "n"] = 99
    assert frames_equal(bad, _base()) != []


def test_tiny_float_drift_fails():
    bad = _base()
    bad.loc[0, "v"] = 1.5 + 1e-12
    assert frames_equal(bad, _base()) != []


def test_dropped_row_fails():
    assert frames_equal(_base().iloc[:2], _base()) != []


def test_renamed_column_fails():
    assert frames_equal(_base().rename(columns={"n": "m"}), _base()) != []


def test_int_vs_equal_float_fails():
    """The driver hashes FORMATTED values: int 3 vs float 3.0 is a
    mismatch even though they compare numerically equal — the exact
    failure mode of a DuckDB HUGEINT aggregate silently widening to
    float64. The comparator must preserve that strictness."""
    as_float = _base()
    as_float["n"] = as_float["n"].astype(object)
    as_float.loc[2, "n"] = 3.0  # int everywhere else, float here
    assert frames_equal(as_float, _base()) != []


def test_sign_flip_fails():
    bad = _base()
    bad.loc[2, "v"] = 2.0
    assert frames_equal(bad, _base()) != []
