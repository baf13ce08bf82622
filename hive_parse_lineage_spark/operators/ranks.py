"""Distributed global ranking.

A bare ``Window.orderBy(...)`` row_number is exact but single-partition
— the whole input sorts through one task, the classic 100-TB
scale-killer this repo's SNM/quantile entries document as a caveat.
This module is the caveat converted into code: the textbook
range-partition + offset spelling (the same scheme ``ORDER BY`` global
sorts use underneath), producing the EXACT same ranks with per-range
parallel sorts and a bounded (num_ranges-row) driver exchange.

Reference parity note: the reference engine (complone/hive-parse-lineage)
has no ranking operator at all — this exists for the repo's own
Sorted-Neighborhood / quantile entries, where the DuckDB gate demands
exact value-at-row ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["range_partitioned_row_number"]


def range_partitioned_row_number(df: DataFrame, order_cols,
                                 col_name: str = "rk",
                                 num_ranges: int | None = None) -> DataFrame:
    """Append an EXACT global ``row_number() over (order by
    order_cols)`` without a single-partition sort.

    ``order_cols`` must be a TOTAL order (include a unique tiebreaker,
    e.g. the primary key) — ``repartitionByRange`` may split ties
    across adjacent ranges, and only a total order makes per-range
    rank + offset equal the global rank regardless of where a tie
    landed.

    Physical shape: one range exchange (sampled boundaries, the same
    mechanism as a global ORDER BY), a localCheckpoint to pin the
    assignment (the per-range counts and the per-range sort MUST see
    the same split — range boundaries are sampled, so re-evaluation
    could re-draw them), ONE bounded collect of ``num_ranges`` counts
    (default: defaultParallelism — never data-proportional), and a
    per-range window sort. At 100 TB the deepest stage is a sort of
    |data|/num_ranges rows per task instead of |data| rows in one task.

    The checkpoint is LAZY: the counts collect is the first action and
    materializes the pin as a side effect, so pinning costs zero extra
    jobs — every later action reads the checkpointed blocks and can
    never re-draw the sampled boundaries.
    """
    spark = df.sparkSession
    n = int(num_ranges or spark.sparkContext.defaultParallelism)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    part = (df.repartitionByRange(n, *order_cols)
            .withColumn("_rpid", F.spark_partition_id())
            .localCheckpoint(eager=False))
    counts = {r["_rpid"]: r["n"]
              for r in part.groupBy("_rpid")
              .agg(F.count("*").alias("n")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off = spark.createDataFrame(offsets, "_rpid int, _rkoff bigint")
    w = Window.partitionBy("_rpid").orderBy(*order_cols)
    # int row_number + bigint offset widens to bigint — correct past
    # 2^31 rows, where a 100-TB global rank actually lives
    return (part.join(F.broadcast(off), "_rpid")
            .withColumn(col_name, F.row_number().over(w) + F.col("_rkoff"))
            .drop("_rpid", "_rkoff"))
