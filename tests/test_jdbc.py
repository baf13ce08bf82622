"""JDBC source/sink round-trip against the embedded Derby driver that
ships with Spark — the executable stand-in for the reference's dialect
SPI + pool layer (utils/DataSourceUtils.java, type/*; SURVEY §2a
#38-39). Same Spark code path serves MySQL/PostgreSQL/... by swapping
the URL."""

from __future__ import annotations

import pytest

from hive_parse_lineage_spark.sources.jdbc import (
    DIALECTS, derby_url, jdbc_driver, jdbc_table_columns, jdbc_url,
    read_jdbc, write_jdbc,
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


def test_dialect_registry_covers_reference_dialects():
    """Reference DataSourceUtils.java:123-141 supports 7 dialects; the
    registry covers them all plus derby (the embedded test vehicle)."""
    for d in ("mysql", "mariadb", "postgresql", "opengauss", "oracle",
              "sqlserver", "h2", "derby"):
        assert d in DIALECTS
    assert jdbc_url("postgresql", "mydb") == \
        "jdbc:postgresql://localhost:5432/mydb"
    assert jdbc_url("mysql", "d", host="db1", port=3307) == \
        "jdbc:mysql://db1:3307/d"
    assert jdbc_url("sqlserver", "d").endswith(";databaseName=d")
    assert jdbc_driver("oracle") == "oracle.jdbc.driver.OracleDriver"


def _driver_on_classpath(spark, driver_class: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(driver_class)
        return True
    except Exception:
        return False


def test_second_embedded_engine_roundtrip(spark, tables):
    """Dialect-agnosticism smoke on a second embedded engine (H2, then
    HSQLDB). Spark ships only Derby jars in this container, so this
    documents the skip rather than faking coverage: the exercised code
    path (write_jdbc/read_jdbc with url+driver) is byte-identical for
    every dialect in the registry — only the option strings change."""
    candidates = [("h2", jdbc_url("h2", "t3st"), jdbc_driver("h2")),
                  ("hsqldb", "jdbc:hsqldb:mem:t3st", "org.hsqldb.jdbc.JDBCDriver")]
    avail = [(n, u, d) for n, u, d in candidates
             if _driver_on_classpath(spark, d)]
    if not avail:
        pytest.skip("no second embedded JDBC engine on the classpath "
                    "(Spark bundles only Derby); registry templates are "
                    "covered by test_dialect_registry_covers_reference_dialects")
    name, url, driver = avail[0]
    src = tables["region"].select("r_regionkey", "r_name")
    write_jdbc(src, url, "reg", driver=driver)
    back = read_jdbc(spark, url, "reg", driver=driver)
    assert sorted(back.collect()) == sorted(src.collect()), name
