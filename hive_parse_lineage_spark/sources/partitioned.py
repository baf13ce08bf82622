"""Hive-style partitioned table layout: partitioned writes, partition
pruning, dynamic partition overwrite, and ORC round-trips.

The reference is a Hive lineage parser (`/root/reference/src/main/java/
com/complone/hiveparser/LineParser.java:83-99` walks HiveQL ASTs), and
the tables HiveQL runs against are directory-partitioned and very often
ORC. This module is the storage-layout counterpart on Spark:

- **Partitioned writes** (``partitionBy`` → ``col=value/`` directories,
  the Hive layout Spark reads and writes natively). At 100 TB the
  partition column IS the coarse index: a filter on it prunes entire
  directories at PLANNING time (``PartitionFilters`` in the scan node),
  so a day-scoped query over a years-long table reads one day's files —
  no footer, not even a file open, for the rest.
- **Dynamic partition overwrite** (``INSERT OVERWRITE`` one partition,
  Hive semantics): ``partitionOverwriteMode=dynamic`` replaces ONLY the
  partitions present in the incoming frame and leaves every other
  partition's files untouched — the daily-recompute primitive. The
  default STATIC mode would silently truncate the whole table; the
  writer here scopes the conf to the single write and restores it.
- **ORC** (ref: Hive's default storage format): Spark carries a native
  vectorized ORC reader/writer with the same predicate-pushdown and
  partition-pruning machinery as parquet — ``format="orc"`` everywhere
  below, round-tripped and plan-asserted in ``tests/test_sources.py``.

Everything here is the plain DataFrameWriter/Reader API — no custom
code in the scan path, so Catalyst's pruning, pushdown, and vectorized
readers apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet") -> None:
    """Write ``df`` as a Hive-layout table: one ``col=value`` directory
    per distinct partition-column tuple. Partition columns must be
    low-cardinality (each value is a directory — at 100 TB, date /
    source / hour class columns, never ids)."""
    (df.write.mode("overwrite").format(fmt)
       .partitionBy(*partition_cols).save(path))


def read_partitioned(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read a Hive-layout directory; partition columns come back as
    real columns reconstructed from the directory names, and filters
    on them prune directories at planning time."""
    return spark.read.format(fmt).load(path)


def overwrite_partitions(df: DataFrame, path: str,
                         partition_cols: list[str],
                         fmt: str = "parquet") -> None:
    """Hive ``INSERT OVERWRITE`` semantics for exactly the partitions
    present in ``df``: dynamic mode rewrites those directories and
    leaves all others' files byte-identical. Conf is scoped to this
    write and restored (the session default stays static so an
    unscoped overwrite can never truncate a table)."""
    spark = df.sparkSession
    old = spark.conf.get(_OVERWRITE_MODE_KEY, None)
    spark.conf.set(_OVERWRITE_MODE_KEY, "dynamic")
    try:
        (df.write.mode("overwrite").format(fmt)
           .partitionBy(*partition_cols).save(path))
    finally:
        if old is None:
            spark.conf.unset(_OVERWRITE_MODE_KEY)
        else:
            spark.conf.set(_OVERWRITE_MODE_KEY, old)
