"""Unit tests for the declared-but-not-oracle-checkable operator set
(SURVEY §2b excluded table): arrays, explode/lateral view, JSON,
approx distinct, bitwise, UDF/pandas-UDF/UDTF forms."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as Ty


def test_array_ops_vs_python(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4]), (1, [5, 6]), (2, [])], "id long, a array<bigint>")
    got = df.select(
        "id",
        # ANSI mode (Spark 4 default) throws on out-of-bounds access;
        # try_element_at is the NULL-tolerant form (1-based)
        F.try_element_at("a", F.lit(1)).alias("first"),
        # 0-based subscript (ref #35) — guard the empty array under ANSI
        F.when(F.size("a") > 0, F.expr("a[0]")).alias("idx0"),
        F.transform("a", lambda x: x * 2).alias("doubled"),
        F.aggregate("a", F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("s"),
        F.slice(F.col("a"), 1, 2).alias("sl"),
    ).collect()
    data = {0: [1, 2, 3, 4], 1: [5, 6], 2: []}
    for r in got:
        a = data[r["id"]]
        assert r["first"] == (a[0] if a else None)
        assert r["idx0"] == (a[0] if a else None)
        assert r["doubled"] == [x * 2 for x in a]
        assert r["s"] == sum(a)
        assert r["sl"] == a[:2]


def test_explode_lateral_view(spark):
    df = spark.createDataFrame([(0, "a b c"), (1, "d")], "id long, s string")
    got = (df.select("id", F.posexplode(F.split("s", " "))
                     .alias("pos", "tok")).collect())
    assert sorted((r["id"], r["pos"], r["tok"]) for r in got) == \
        [(0, 0, "a"), (0, 1, "b"), (0, 2, "c"), (1, 0, "d")]
    df.createOrReplaceTempView("lv")
    sql = spark.sql(
        "SELECT id, tok FROM lv LATERAL VIEW explode(split(s, ' ')) t AS tok")
    assert sql.count() == 4


def test_json_functions_vs_python(spark):
    rows = [(0, '{"k": 87, "tags": ["x", "y"], "nested": {"v": 1.5}}'),
            (1, '{"k": -3, "tags": [], "nested": {"v": 0.0}}')]
    df = spark.createDataFrame(rows, "id long, js string")
    got = df.select(
        "id",
        F.get_json_object("js", "$.k").alias("k"),
        F.get_json_object("js", "$.nested.v").alias("v"),
        F.from_json("js", "k int, tags array<string>").alias("parsed"),
    ).collect()
    for r in got:
        want = json.loads(dict(rows)[r["id"]])
        assert int(r["k"]) == want["k"]
        assert float(r["v"]) == want["nested"]["v"]
        assert r["parsed"]["k"] == want["k"]
        assert list(r["parsed"]["tags"]) == want["tags"]
    # events.props is JSON: engine-native extraction path of q43
    assert spark.sql("SELECT get_json_object('{\"k\": 5}', '$.k')").first()[0] == "5"


def test_approx_count_distinct_error_bound(spark, tables):
    exact = tables["orders"].select("o_custkey").distinct().count()
    approx = tables["orders"].agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("a")).first()["a"]
    assert abs(approx - exact) / exact < 0.05   # 5σ of the 1% rsd


def test_bitwise_vs_python(spark):
    df = spark.createDataFrame([(5, 3), (255, 128), (-1, 7)], "a long, b long")
    got = df.select(
        "a", "b",
        F.expr("a & b").alias("band"), F.expr("a | b").alias("bor"),
        F.expr("a ^ b").alias("bxor"), F.expr("~a").alias("bnot"),
        F.bit_count("a").alias("bc"),
    ).collect()
    for r in got:
        assert r["band"] == r["a"] & r["b"]
        assert r["bor"] == r["a"] | r["b"]
        assert r["bxor"] == r["a"] ^ r["b"]
        assert r["bnot"] == ~r["a"]
        assert r["bc"] == bin(r["a"] & ((1 << 64) - 1)).count("1")


def test_python_udf_and_pandas_udf(spark):
    @F.udf(Ty.DoubleType())
    def plain(x):
        return x * 1.1

    @F.pandas_udf(Ty.DoubleType())
    def vectorized(s: pd.Series) -> pd.Series:
        return s * 1.1

    df = spark.range(100).select(F.col("id").cast("double").alias("x"))
    a = [r[0] for r in df.select(plain("x")).collect()]
    b = [r[0] for r in df.select(vectorized("x")).collect()]
    assert a == pytest.approx(b)


def test_grouped_agg_pandas_udf(spark, tables):
    @F.pandas_udf(Ty.DoubleType())
    def p90(s: pd.Series) -> float:
        return float(s.quantile(0.9, interpolation="linear"))

    got = (tables["orders"].groupBy("o_orderstatus")
           .agg(p90("o_totalprice").alias("p90")).collect())
    want = (tables["orders"].toPandas().groupby("o_orderstatus")["o_totalprice"]
            .quantile(0.9))
    for r in got:
        assert r["p90"] == pytest.approx(want[r["o_orderstatus"]])


def test_python_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, s: str):
            for i, t in enumerate(s.split(" ")):
                yield i, t

    got = Tokenize(F.lit("a b c")).collect()
    assert [(r["pos"], r["tok"]) for r in got] == [(0, "a"), (1, "b"), (2, "c")]


def test_applyinpandas_group_map(spark, tables):
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["centered"] = pdf["o_totalprice"] - pdf["o_totalprice"].mean()
        return pdf[["o_orderstatus", "o_orderkey", "centered"]]

    got = (tables["orders"].groupBy("o_orderstatus")
           .applyInPandas(demean,
                          "o_orderstatus string, o_orderkey long, centered double"))
    sums = {r["o_orderstatus"]: r["s"] for r in
            got.groupBy("o_orderstatus").agg(F.sum("centered").alias("s")).collect()}
    for v in sums.values():
        assert v == pytest.approx(0.0, abs=1e-6)


def test_percentile_approx_error_bound(spark, tables):
    """percentile_approx vs exact percentile: bounded rank error."""
    import numpy as np
    vals = np.array([r["o_totalprice"] for r in
                     tables["orders"].select("o_totalprice").collect()])
    approx = tables["orders"].agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("m")).first()["m"]
    rank = (vals <= approx).mean()
    assert abs(rank - 0.5) < 0.01
