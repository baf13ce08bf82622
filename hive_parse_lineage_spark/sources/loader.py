"""Parquet table loader for the testdata star schema.

Replaces the reference's entire metadata/datasource subsystem
(``conf/``, ``datasource/``, ``type/``, ``utils/DataSourceUtils.java`` —
~600 LoC of JDBC pool + dialect SPI plumbing): Spark *is* its own
catalog, so "register a table" is one ``createOrReplaceTempView``.

Scale note: these are plain parquet scans — Catalyst pushes filters and
prunes columns into the file source, so downstream queries only pay for
what they touch. At 100 TB the same loader works unchanged provided the
data is directory-partitioned; partition pruning then composes with the
pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_parse_lineage_spark.session import configure

#: the ten driver-generated tables (TESTDATA.md)
TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing types where needed.

    ``events.ts`` normalizes to session-zone TIMESTAMP whatever the
    file carries:

    - ``timestamp[ns]``: Spark 4 only reads it as BIGINT nanos (see
      session.RUNTIME_CONFS); converted via integer division —
      ``ts DIV 1000`` — NOT ``ts/1000`` (double division loses
      sub-microsecond precision at 1.7e18 ns).
    - ``timestamp[us]`` with isAdjustedToUTC=false: arrives as
      TIMESTAMP_NTZ, which watermarks/event-time ops reject; cast to
      TIMESTAMP (values unchanged — the session zone is UTC).
    """
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the DataFrames.

    Idempotent and cheap (schema comes from parquet footers; no data is
    read until a query runs).
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
