"""tools/driver_sim.py comparator units (r5/r6 verdict item: the
simulator must flag the failure classes the real driver flags —
verified here on deliberately-broken fixtures, not live queries)."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from driver_sim import canon_frame, frames_match  # noqa: E402


def test_int_vs_float_dtype_divergence_is_flagged():
    # the CORRECTNESS_r05 window-SUM class: same numbers, int64 vs
    # float64 — the driver's pandas hash mismatches, so must we
    a = pd.DataFrame({"s": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"s": pd.Series([1.0, 2.0], dtype="float64")})
    assert frames_match(canon_frame(a), canon_frame(b))


def test_complex_cells_raise_like_driver_error():
    # the CORRECTNESS_r01/r05 ARRAY-output class: unhashable cells are
    # a hard TypeError (the driver records a harness ERROR)
    a = pd.DataFrame({"v": [[1, 2], [3]]})
    with pytest.raises(TypeError):
        frames_match(canon_frame(a), canon_frame(a))


def test_no_float_rounding():
    # 12th-significant-digit drift must NOT be coerced away (the old
    # 8-digit rounding hid it)
    a = pd.DataFrame({"x": [1.000000000001]})
    b = pd.DataFrame({"x": [1.000000000002]})
    assert frames_match(canon_frame(a), canon_frame(b))


def test_matching_frames_pass_across_representations():
    # representation-only differences (Decimal vs float64, date object
    # vs datetime64, column order, row order) must match
    import datetime
    from decimal import Decimal

    a = pd.DataFrame(
        {
            "d": [datetime.date(2020, 1, 2), datetime.date(1401, 3, 1)],
            "m": [Decimal("1.50"), Decimal("2.25")],
            "n": pd.Series([7, 8], dtype="int32"),
        }
    )
    b = pd.DataFrame(
        {
            "n": pd.Series([8, 7], dtype="int64"),
            "m": pd.Series([2.25, 1.5], dtype="float64"),
            "d": pd.Series(
                [
                    datetime.datetime(1401, 3, 1),
                    datetime.datetime(2020, 1, 2),
                ]
            ).astype("datetime64[us]"),
        }
    )
    assert frames_match(canon_frame(a), canon_frame(b)) == []


def test_null_vs_empty_string_stays_distinct():
    # the r6 regress_array_literal_casts divergence: '' vs NULL is a
    # REAL semantic difference the comparator must keep visible
    a = pd.DataFrame({"s": [""]})
    b = pd.DataFrame({"s": [None]})
    assert frames_match(canon_frame(a), canon_frame(b))
