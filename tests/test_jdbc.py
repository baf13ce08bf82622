"""JDBC source/sink round-trip against the embedded Derby driver that
ships with Spark — the executable stand-in for the reference's dialect
SPI + pool layer (utils/DataSourceUtils.java, type/*; SURVEY §2a
#38-39). Same Spark code path serves MySQL/PostgreSQL/... by swapping
the URL."""

from __future__ import annotations

import pytest

from hive_parse_lineage_spark.sources.jdbc import (
    derby_url, jdbc_table_columns, read_jdbc, write_jdbc,
)


@pytest.fixture(scope="module")
def derby(tmp_path_factory):
    return derby_url(str(tmp_path_factory.mktemp("derby") / "db"))


def test_jdbc_roundtrip(spark, tables, derby):
    src = (tables["customer"]
           .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
           .filter("c_custkey <= 100"))
    write_jdbc(src, derby, "cust")
    back = read_jdbc(spark, derby, "cust")
    assert sorted(back.columns) == sorted(src.columns)
    assert sorted(back.collect()) == sorted(src.collect())


def test_jdbc_partitioned_read(spark, derby):
    back = read_jdbc(spark, derby, "cust", partition_column="c_custkey",
                     num_partitions=4, lower_bound=1, upper_bound=101)
    # one range predicate per partition → 4 parallel scans
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 101


def test_jdbc_filter_pushdown(spark, derby):
    df = read_jdbc(spark, derby, "cust").filter("c_custkey <= 10")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_custkey" in plan
    assert df.count() == 11


def test_jdbc_metadata_columns(spark, derby):
    # reference MetaDataQueryImpl.java:29-44: ordered column list
    assert jdbc_table_columns(spark, derby, "cust") == [
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"]
