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


def normalize(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_value(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in normalize(pdf):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


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
