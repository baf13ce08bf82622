"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Pre-bucketing the tables on the join key with the same
bucket count makes the bucket id a physical partitioning Catalyst
recognizes: the join plans as a sort-merge join with **no Exchange** on
either side — each task zips the matching bucket files. The reference
has no storage layer at all (it only parses SQL), so this is pure
new-engine surface; it corresponds to Hive's CLUSTERED BY ... INTO n
BUCKETS, which Spark's writer implements via ``bucketBy``.

Sizing rule of thumb at scale: ``n_buckets ≈ table_bytes / 128 MB``
rounded to a power of two shared by the joining tables (equal or
integer-multiple bucket counts keep the co-location property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 8, sort_cols: list[str] | None = None,
                   path: str | None = None, mode: str = "overwrite",
                   fmt: str = "parquet") -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    table. ``sort_cols`` pre-sorts each bucket file so the sort-merge
    join's per-task sort is also free."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str,
                  on: list[str] | str, how: str = "inner") -> DataFrame:
    """Join two bucketed tables on their bucket key. When both tables
    are bucketed on ``on`` with compatible bucket counts the physical
    plan contains no Exchange (verified in tests/test_plans.py)."""
    return spark.table(left).join(spark.table(right), on, how)
