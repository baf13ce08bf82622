"""MERGE/SCD2 emulation tests against hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double")


def test_merge_upsert(spark, target):
    from hive_parse_lineage_spark.operators.merge import merge_upsert
    source = spark.createDataFrame(
        [(2, "B2", 22.0), (4, "d", 40.0)], "id long, name string, val double")
    got = sorted(map(tuple, merge_upsert(target, source, "id").collect()))
    assert got == [(1, "a", 10.0), (2, "B2", 22.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_merge_with_deletes(spark, target):
    from hive_parse_lineage_spark.operators.merge import merge_upsert
    source = spark.createDataFrame(
        [(1, None, None, True), (2, "B2", 22.0, False), (5, "e", 50.0, False)],
        "id long, name string, val double, deleted boolean")
    got = sorted(map(tuple, merge_upsert(target, source, "id",
                                         delete_col="deleted").collect()))
    assert got == [(2, "B2", 22.0), (3, "c", 30.0), (5, "e", 50.0)]


def test_scd2(spark):
    from hive_parse_lineage_spark.operators.merge import scd2_apply
    dim = (spark.createDataFrame(
        [(1, "x", "2024-01-01", None, True),
         (2, "y", "2024-01-01", None, True)],
        "id long, attr string, effective_from string, effective_to string, is_current boolean")
        .withColumn("effective_from", F.to_timestamp("effective_from"))
        .withColumn("effective_to", F.to_timestamp("effective_to")))
    updates = (spark.createDataFrame(
        [(1, "x2", "2024-06-01")], "id long, attr string, effective_from string")
        .withColumn("effective_from", F.to_timestamp("effective_from")))
    got = scd2_apply(dim, updates, "id")
    rows = {(r["id"], r["attr"]): (r["is_current"], r["effective_to"])
            for r in got.collect()}
    assert rows[(1, "x")][0] is False          # closed out
    assert rows[(1, "x")][1] is not None       # effective_to set to new start
    assert rows[(1, "x2")] == (True, None)     # new current version
    assert rows[(2, "y")] == (True, None)      # untouched key stays current
    assert got.filter(F.col("is_current")).groupBy("id").count() \
              .filter(F.col("count") > 1).count() == 0
