"""Vectorized normalize (tests/oracle.py) parity with the per-value
reference: the fast paths must produce the same multiset of normalized
rows as mapping _norm_value over everything — the compare's verdicts
must be unchanged by the speedup."""

from __future__ import annotations

import math
from datetime import date, datetime

import numpy as np
import pandas as pd

from tests.oracle import _norm_value, normalize, value_hash


def _reference_rows(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = ["\x1f".join(_norm_value(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def test_normalize_matches_per_value_reference():
    pdf = pd.DataFrame({
        "i": np.array([1, -7, 0, 2**40, 5], dtype="int64"),
        "f": [1.0, 2.345, float("nan"), -0.004, 2.5],
        "s": ["a", None, "x\x1fy", "", "NULL"],
        "d": [date(2024, 1, 1), date(1999, 12, 31), date(2024, 2, 29),
              date(2000, 1, 1), date(2001, 6, 15)],
        "t": pd.to_datetime(["2024-01-01", "2024-01-01 00:05:01.000001",
                             None, "1999-12-31 23:59:59",
                             "2024-06-01 12:00:00"], format="mixed"),
        "arr": [[1, 2], None, [], [3.5], [None, 1]],
    })
    got = list(normalize(pdf))
    want = _reference_rows(pdf)
    assert sorted(got) == sorted(want)


def test_value_hash_multiset_equality_and_inequality():
    a = pd.DataFrame({"k": [3, 1, 2], "v": [0.1, 0.2, 0.30000001]})
    b = pd.DataFrame({"k": [2, 3, 1], "v": [0.3, 0.1, 0.2]})
    assert value_hash(a) == value_hash(b)  # order-free, 2dp rounding
    c = pd.DataFrame({"k": [2, 3, 1], "v": [0.3, 0.1, 0.21]})
    assert value_hash(a) != value_hash(c)


def test_float_int_collapse_and_null():
    pdf = pd.DataFrame({"f": [2.0, 2.004, -3.0, float("nan")]})
    got = sorted(normalize(pdf))
    assert got == sorted(["2", "2", "-3", "NULL"])


def test_empty_and_single_column_frames():
    assert value_hash(pd.DataFrame({"x": []})) == \
        value_hash(pd.DataFrame({"x": []}))
    one = pd.DataFrame({"x": ["only"]})
    assert list(normalize(one)) == ["only"]


def test_nan_vs_value_not_conflated():
    a = pd.DataFrame({"f": [float("nan")]})
    b = pd.DataFrame({"f": [0.0]})
    assert value_hash(a) != value_hash(b)


def test_value_hash_cross_dtype_equivalence():
    """The collapses the string normalize performed must survive the
    numeric fast paths: int64 vs nullable-Int64 vs float64, date
    objects vs datetime64, bool vs 0/1 ints."""
    a = pd.DataFrame({"k": np.array([1, 2, 3], dtype="int64")})
    b = pd.DataFrame({"k": pd.array([1, 2, 3], dtype="Int64")})
    c = pd.DataFrame({"k": np.array([1.0, 2.0, 3.0])})
    assert value_hash(a) == value_hash(b) == value_hash(c)

    d1 = pd.DataFrame({"d": [date(2024, 1, 5), None, date(1999, 2, 3)]})
    d2 = pd.DataFrame({"d": pd.to_datetime(
        ["2024-01-05", None, "1999-02-03"])})
    assert value_hash(d1) == value_hash(d2)

    n1 = pd.DataFrame({"k": pd.array([1, None], dtype="Int64")})
    n2 = pd.DataFrame({"k": np.array([1.0, float("nan")])})
    assert value_hash(n1) == value_hash(n2)

    b1 = pd.DataFrame({"b": [True, False, True]})
    b2 = pd.DataFrame({"b": np.array([1, 0, 1], dtype="int64")})
    assert value_hash(b1) == value_hash(b2)

    t1 = pd.DataFrame({"t": pd.to_datetime(
        ["2024-01-01 00:05:01.000001"]).astype("datetime64[us]")})
    t2 = pd.DataFrame({"t": pd.to_datetime(
        ["2024-01-01 00:05:01.000001"]).astype("datetime64[ns]")})
    assert value_hash(t1) == value_hash(t2)


def test_value_hash_decimal_vs_float_collapse():
    """Spark DecimalType → toPandas object-of-Decimal must hash equal
    to the DuckDB float64 spelling of the same values (ADVICE r8: the
    object column took the string path while float64 took the uint64
    fast path)."""
    from decimal import Decimal
    dec = pd.DataFrame({"v": pd.Series(
        [Decimal("123"), Decimal("4.5"), Decimal("-0.004"), None],
        dtype=object)})
    flt = pd.DataFrame({"v": [123.0, 4.5, -0.004, float("nan")]})
    assert value_hash(dec) == value_hash(flt)
    # mixed int/Decimal object column (DuckDB HUGEINT fetch can yield
    # object-of-int) collapses the same way
    obj = pd.DataFrame({"v": pd.Series([123, 4.5, Decimal("-0.004"),
                                        None], dtype=object)})
    assert value_hash(obj) == value_hash(flt)
    # and close-but-different Decimals still distinguish
    assert value_hash(pd.DataFrame(
        {"v": pd.Series([Decimal("1.23")], dtype=object)})) != \
        value_hash(pd.DataFrame(
            {"v": pd.Series([Decimal("1.24")], dtype=object)}))


def test_value_hash_nullable_boolean_with_na():
    """Nullable BooleanDtype containing pd.NA must not crash and must
    collapse with int/float 1/0/NULL (ADVICE r8: to_numpy raised)."""
    b = pd.DataFrame({"b": pd.array([True, False, None],
                                    dtype="boolean")})
    i = pd.DataFrame({"b": pd.array([1, 0, None], dtype="Int64")})
    f = pd.DataFrame({"b": [1.0, 0.0, float("nan")]})
    assert value_hash(b) == value_hash(i) == value_hash(f)
    assert value_hash(b) != value_hash(pd.DataFrame(
        {"b": pd.array([True, True, None], dtype="boolean")}))


def test_huge_magnitude_floats_and_ints_agree():
    """|v| >= 2**62: _norm_series must fall back to the per-value form
    (str(int(r)), not '%.2f'), and int64 vs float64 vs object columns
    of the same representable huge value must hash equal (ADVICE r8)."""
    big = float(2**63)  # exactly representable in float64
    f = pd.DataFrame({"v": [big, 1.5]})
    o = pd.DataFrame({"v": pd.Series([big, 1.5], dtype=object)})
    assert list(normalize(f)) == list(normalize(o))
    assert _norm_value(big) in set(normalize(f))
    assert value_hash(f) == value_hash(o)
    i = pd.DataFrame({"v": np.array([2**63 - 2**10, 100], dtype="int64")})
    fi = pd.DataFrame({"v": [float(2**63 - 2**10), 100.0]})
    assert value_hash(i) == value_hash(fi)


def test_value_hash_distinguishes_close_values():
    assert value_hash(pd.DataFrame({"k": [100]})) != \
        value_hash(pd.DataFrame({"k": [1]}))  # *100 canon vs raw
    assert value_hash(pd.DataFrame({"f": [1.23]})) != \
        value_hash(pd.DataFrame({"f": [1.24]}))
    assert value_hash(pd.DataFrame({"s": ["ab"]})) != \
        value_hash(pd.DataFrame({"s": ["ac"]}))
    # column order must not matter, column NAMES must
    x = pd.DataFrame({"a": [1], "b": [2]})
    y = pd.DataFrame({"b": [2], "a": [1]})
    z = pd.DataFrame({"a": [2], "b": [1]})
    assert value_hash(x) == value_hash(y)
    assert value_hash(x) != value_hash(z)
