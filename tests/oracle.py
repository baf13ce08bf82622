"""DuckDB-differential oracle harness (SURVEY §5.2(1)).

Runs a Spark query and a DuckDB oracle SQL over the same parquet
tables and compares: row count, column names, and an order-insensitive
value hash after normalization (floats rounded to 2 dp, timestamps to
microseconds, columns sorted by name, rows sorted).
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

from hive_parse_lineage_spark.sources.loader import TABLES


def duckdb_conn(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if not isinstance(v, (list, tuple)) and type(v).__name__ != "ndarray" \
            and pd.isna(v):
        return "NULL"  # NaT and friends
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        # Spark DecimalType arrives as object-of-Decimal while DuckDB
        # widens to float64 — collapse both to the float normal form
        return _norm_value(float(v))
    if isinstance(v, float):
        r = round(v, 2)
        if r == int(r):
            return str(int(r))
        return f"{r:.2f}"
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        ts = ts.floor("us")
        # DuckDB's fetchdf widens DATE to datetime64 midnight; Spark returns
        # datetime.date — collapse both to the date form.
        if ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _norm_series(s: pd.Series) -> pd.Series:
    """Vectorized per-column normalization, value-identical to mapping
    :func:`_norm_value` (the int/float fast paths are what make 60M-row
    compares — q12 at sf1.0 — take ~1 minute instead of 10+); columns
    the fast paths don't cover fall back to the per-value function."""
    import numpy as np
    from pandas.api import types as pt
    if pt.is_integer_dtype(s):
        # covers numpy int64 AND nullable/Arrow-backed Int64 extension
        # columns (toPandas on a nullable column yields the latter —
        # per-value mapping there was 60M Python calls per column)
        mask = s.isna()
        if not mask.any():
            return s.astype("int64").astype(str)
        out = s.fillna(0).astype("int64").astype(str).astype(object)
        out[np.asarray(mask)] = "NULL"
        return out
    if pt.is_float_dtype(s) and not pt.is_extension_array_dtype(s):
        arr = s.to_numpy(dtype="float64")
        nan = np.isnan(arr)
        r = np.round(arr, 2)
        safe = np.where(nan, 0.0, r)
        if np.abs(safe).max(initial=0.0) >= 2**62:
            # int64 cast overflows there and the vectorized '%.2f' form
            # ('1e19.00') diverges from _norm_value's str(int(r)) — one
            # huge value sends the WHOLE column down the exact per-value
            # path (mirrors _col_u64's 9e16 string-path bail)
            return s.map(_norm_value)
        ints = safe.astype("int64")
        is_int = (~nan) & (safe == ints) & (np.abs(safe) < 2**62)
        out = np.where(is_int, ints.astype(str),
                       np.char.mod("%.2f", safe))
        out = np.where(nan, "NULL", out)
        return pd.Series(out, index=s.index)
    if pt.is_datetime64_any_dtype(s):
        s2 = s
        if getattr(s2.dt, "tz", None) is not None:
            s2 = s2.dt.tz_convert("UTC").dt.tz_localize(None)
        fl = s2.dt.floor("us")
        nat = fl.isna()
        midnight = (fl == fl.dt.normalize()) & ~nat
        has_us = (fl.dt.microsecond != 0) & ~nat
        date_str = fl.dt.strftime("%Y-%m-%d")
        base = fl.dt.strftime("%Y-%m-%dT%H:%M:%S")
        with_us = fl.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        out = np.where(midnight, date_str,
                       np.where(has_us, with_us, base))
        out = np.where(np.asarray(nat), "NULL", out)
        return pd.Series(out, index=s.index)
    if pt.is_object_dtype(s):
        mask = s.notna()
        vals = s[mask]
        if len(vals) and all(type(v) is str for v in vals.head(100)) \
                and all(type(v) is str for v in vals):
            out = pd.Series("NULL", index=s.index, dtype=object)
            out[mask] = vals
            return out.astype(str)
    return s.map(_norm_value)


def _joined_rows(pdf: pd.DataFrame) -> pd.Series:
    cols = sorted(pdf.columns)
    if not cols:
        return pd.Series([], dtype=object)
    series = [_norm_series(pdf[c]).astype(str) for c in cols]
    return series[0] if len(series) == 1 else \
        series[0].str.cat(series[1:], sep="\x1f")


def normalize(pdf: pd.DataFrame):
    """Sorted normalized row strings (columns joined with \\x1f) —
    kept for tests and debugging; value_hash itself no longer sorts."""
    import numpy as np
    return np.sort(_joined_rows(pdf).to_numpy())


_NULL_SENTINEL = 0x6E756C6C6E756C6C  # "nullnull"


def _mix64(x):
    """splitmix64 finalizer, vectorized on uint64 (wrap-around)."""
    import numpy as np
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _col_u64(s: pd.Series):
    """Canonical per-row uint64 for a column, CROSS-DTYPE STABLE under
    the same collapses as _norm_value: an int64 123, a nullable Int64
    123 and a float 123.0 (2-dp rounded) all canonicalize to 12300;
    timestamps to floor-us epoch; NULL/NaN/NaT to one sentinel.
    Numeric/datetime columns never touch Python objects — this is what
    makes a 60M-row compare take seconds. Columns outside the numeric
    fast paths hash their normalized STRINGS (C siphash per element)."""
    import numpy as np
    from pandas.api import types as pt
    n = len(s)
    if pt.is_bool_dtype(s) and not pt.is_object_dtype(s):
        # *100 like every numeric path: a bool column in one frame must
        # equal an int/float 0/1 column in the other (the string
        # normalize collapsed them too). Nullable BooleanDtype with
        # pd.NA cannot cast straight to uint64 — mask first.
        if pt.is_extension_array_dtype(s):
            mask = s.isna().to_numpy()
            canon = (s.fillna(False).to_numpy(dtype="bool")
                     .astype("uint64") * np.uint64(100))
            canon[mask] = _NULL_SENTINEL
            return canon
        return s.to_numpy(dtype="uint64") * np.uint64(100)
    if pt.is_integer_dtype(s):
        mask = s.isna().to_numpy() if pt.is_extension_array_dtype(s) \
            else np.zeros(n, dtype=bool)
        vals = s.fillna(0).astype("int64").to_numpy() if mask.any() \
            else s.astype("int64").to_numpy()
        if n and max(abs(int(vals.max())), abs(int(vals.min()))) >= 9e16:
            # beyond float64's exact-integer range the float column of
            # the same values bails to the string path — bail here too
            # so int64 vs float64 columns of equal huge values agree
            return None
        with np.errstate(over="ignore"):
            canon = (vals * 100).astype("uint64")
        canon[mask] = _NULL_SENTINEL
        return canon
    if pt.is_float_dtype(s) and not pt.is_extension_array_dtype(s):
        arr = s.to_numpy(dtype="float64")
        nan = np.isnan(arr)
        r = np.round(np.where(nan, 0.0, arr), 2)
        if np.abs(r).max(initial=0.0) >= 9.0e16:
            return None  # magnitude beyond exact *100 — string path
        canon = np.rint(r * 100.0).astype("int64").astype("uint64")
        canon[nan] = _NULL_SENTINEL
        return canon
    if pt.is_datetime64_any_dtype(s):
        s2 = s
        if getattr(s2.dt, "tz", None) is not None:
            s2 = s2.dt.tz_convert("UTC").dt.tz_localize(None)
        fl = s2.dt.floor("us")
        nat = fl.isna().to_numpy()
        epoch = (fl.fillna(pd.Timestamp(0)).astype("datetime64[us]")
                 .astype("int64").to_numpy().astype("uint64").copy())
        epoch[nat] = _NULL_SENTINEL
        return epoch
    if pt.is_object_dtype(s):
        vals = s.dropna()
        if len(vals) and all(isinstance(v, (date, datetime))
                             for v in vals.head(100)) \
                and all(isinstance(v, (date, datetime)) for v in vals):
            # Spark returns datetime.date objects where DuckDB returns
            # datetime64 — canonicalize both to floor-us epoch
            return _col_u64(pd.to_datetime(s))
        if len(vals) and all(isinstance(v, (int, float, Decimal))
                             and not isinstance(v, bool)
                             for v in vals.head(100)) \
                and all(isinstance(v, (int, float, Decimal))
                        and not isinstance(v, bool) for v in vals):
            # Spark DecimalType toPandas yields object-of-Decimal while
            # the DuckDB twin is float64 on the uint64 fast path —
            # canonicalize through the SAME float64 *100 scheme (its
            # 9e16 guard sends out-of-range columns to the string path,
            # where the Decimal clause in _norm_value keeps the two
            # sides' normal forms identical)
            return _col_u64(s.astype("float64"))
    return None


def value_hash(pdf: pd.DataFrame) -> str:
    """Order-free MULTISET hash of the normalized rows: per column, a
    canonical uint64 (numeric fast paths) or a per-element hash of the
    normalized string; columns fold into one mixed uint64 per row
    (sorted column order, splitmix64 between columns), and rows
    combine order-free via wrap-around SUM and XOR of two mixed
    projections plus the count. Equal multisets hash equal with NO
    60M-row sort or per-row Python (the old spelling made the
    q12-at-sf1.0 compare run 10+ minutes). Only WITHIN-run equality
    matters — hashes are never compared across harness versions."""
    import numpy as np
    cols = sorted(pdf.columns)
    n = len(pdf)
    acc = np.zeros(n, dtype="uint64")
    with np.errstate(over="ignore"):
        for c in cols:
            h = _col_u64(pdf[c])
            if h is None:
                h = pd.util.hash_pandas_object(
                    _norm_series(pdf[c]).astype(str),
                    index=False).to_numpy(dtype="uint64")
            acc = _mix64(acc ^ _mix64(np.asarray(h, dtype="uint64")))
        p1 = acc
        p2 = _mix64(acc ^ np.uint64(0xA5A5A5A55A5A5A5A))
    parts = [f"{n:x}"]
    for p in (p1, p2):
        s = int(np.sum(p, dtype="uint64")) if n else 0
        x = int(np.bitwise_xor.reduce(p)) if n else 0
        parts.append(f"{s:016x}{x:016x}")
    return "-".join(parts)


def compare(spark_df, oracle_sql: str, con) -> dict:
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(oracle_sql).fetchdf()
    result = {
        "spark_rows": len(spark_pdf),
        "duck_rows": len(duck_pdf),
        "spark_cols": sorted(spark_pdf.columns),
        "duck_cols": sorted(duck_pdf.columns),
    }
    result["rows_match"] = result["spark_rows"] == result["duck_rows"]
    result["cols_match"] = result["spark_cols"] == result["duck_cols"]
    result["hash_match"] = (result["rows_match"] and result["cols_match"]
                            and value_hash(spark_pdf) == value_hash(duck_pdf))
    return result
