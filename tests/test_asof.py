"""As-of join vs pandas.merge_asof oracle (SURVEY §2b excluded table)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = [(u, f"2024-01-01 00:{m:02d}:{s:02d}", float(100 + i))
              for i, (u, m, s) in enumerate(
                  [(1, 0, 30), (1, 5, 0), (1, 9, 59), (2, 1, 0), (2, 2, 0),
                   (3, 0, 0)])]
    quotes = [(u, f"2024-01-01 00:{m:02d}:{s:02d}", float(i))
              for i, (u, m, s) in enumerate(
                  [(1, 0, 0), (1, 4, 59), (1, 5, 0), (2, 1, 30), (4, 0, 0)])]
    t = (spark.createDataFrame(trades, "uid long, ts string, price double")
         .withColumn("ts", F.to_timestamp("ts")))
    q = (spark.createDataFrame(quotes, "uid long, ts string, quote double")
         .withColumn("ts", F.to_timestamp("ts")))
    return t, q


def _oracle(t, q, tolerance_seconds=None):
    tp = t.toPandas().sort_values("ts")
    qp = q.toPandas().sort_values("ts")
    tol = pd.Timedelta(seconds=tolerance_seconds) if tolerance_seconds else None
    m = pd.merge_asof(tp, qp.rename(columns={"quote": "quote_r"}),
                      on="ts", by="uid", tolerance=tol)
    return sorted(m[["uid", "ts", "price", "quote_r"]].itertuples(
        index=False, name=None),
        key=lambda r: (r[0], r[1]))


def _got(df):
    return sorted(((r["uid"], pd.Timestamp(r["ts"]), r["price"], r["quote_r"])
                   for r in df.collect()), key=lambda r: (r[0], r[1]))


def _eq(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        if pd.isna(w[3]):
            assert g[3] is None or pd.isna(g[3])
        else:
            assert g[3] == w[3]


def test_asof_join_matches_pandas(spark, quotes_trades):
    from hive_parse_lineage_spark.operators.asof import asof_join
    t, q = quotes_trades
    _eq(_got(asof_join(t, q, on="ts", by="uid")), _oracle(t, q))


def test_asof_join_tolerance(spark, quotes_trades):
    from hive_parse_lineage_spark.operators.asof import asof_join
    t, q = quotes_trades
    _eq(_got(asof_join(t, q, on="ts", by="uid", tolerance_seconds=60)),
        _oracle(t, q, tolerance_seconds=60))


def test_asof_join_pandas_matches_pandas(spark, quotes_trades):
    from hive_parse_lineage_spark.operators.asof import asof_join_pandas
    t, q = quotes_trades
    _eq(_got(asof_join_pandas(t, q, on="ts", by="uid")), _oracle(t, q))


def test_asof_on_events_table(spark, sf_dir):
    """Cross-check both implementations on real data: events joined
    as-of against themselves (purchases enriched with last prior view)."""
    from hive_parse_lineage_spark.operators.asof import asof_join, asof_join_pandas
    from hive_parse_lineage_spark.sources.loader import read_table
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", "ts", F.col("value").alias("vv")))
    a = asof_join(purchases, views, on="ts", by="user_id")
    b = asof_join_pandas(purchases, views, on="ts", by="user_id")
    ka = sorted((r["user_id"], pd.Timestamp(r["ts"]), r["vv_r"]) for r in a.collect())
    kb = sorted((r["user_id"], pd.Timestamp(r["ts"]), r["vv_r"]) for r in b.collect())
    assert ka == kb and len(ka) > 0
