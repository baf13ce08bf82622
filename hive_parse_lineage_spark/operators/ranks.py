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

__all__ = ["range_partitioned_row_number", "ntile_from_rank",
           "bucket_start_offset", "range_partitioned_running_max",
           "range_partitioned_running_sum"]


def ntile_from_rank(rk: str, n_rows: int, buckets: int):
    """EXACT ``NTILE(buckets)`` computed from a 1-based global rank
    column over ``n_rows`` total rows — SQL NTILE semantics: the first
    ``n mod b`` buckets take ``ceil(n/b)`` rows, the rest ``floor``.
    Pure integer arithmetic on the rank, so pairing it with
    :func:`range_partitioned_row_number` yields values BIT-IDENTICAL
    to ``ntile(b) over (order by ...)`` with no single-partition sort.
    ``rk`` is a column NAME (the arithmetic is emitted as a SQL expr
    so the division stays integral at any rank magnitude)."""
    q, r = divmod(int(n_rows), int(buckets))
    if q == 0:  # fewer rows than buckets: NTILE gives bucket = rank
        return F.col(rk).cast("bigint")
    big = r * (q + 1)
    return F.expr(
        f"CAST(CASE WHEN {rk} <= {big} THEN ({rk} + {q}) DIV {q + 1} "
        f"ELSE {r} + ({rk} - {big} + {q - 1}) DIV {q} END AS BIGINT)")


def bucket_start_offset(bucket: str, n_rows: int, buckets: int):
    """Rows preceding ``bucket`` under the same NTILE split — turns a
    global rank into a WITHIN-bucket position (``rank - offset``)
    without any per-bucket aggregate or join: the split sizes are a
    closed form of (n_rows, buckets). ``bucket`` is a column name."""
    q, r = divmod(int(n_rows), int(buckets))
    return F.expr(f"CAST(({bucket} - 1) * {q} "
                  f"+ LEAST({bucket} - 1, {r}) AS BIGINT)")


def _spark_max_key(v):
    """Sort key matching Spark's MAX total order for numerics: NaN is
    greater than every other value (ties with itself). Keeps the
    driver-side prefix fold of :func:`range_partitioned_running_max`
    agreeing with the ``max() over (...)`` spelling when a float range
    maximum is NaN (Python's ``nan > x`` is always False and would
    silently drop it)."""
    import math
    if isinstance(v, float) and math.isnan(v):
        return (1, 0.0)
    return (0, v)


def range_partitioned_row_number(df: DataFrame, order_cols,
                                 col_name: str = "rk",
                                 num_ranges: int | None = None,
                                 return_total: bool = False):
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

    ``return_total=True`` returns ``(df, total_rows)`` — the total is
    the sum of the already-collected per-range counts, so callers that
    need |rows| (NTILE arithmetic) get it for free instead of paying a
    second full scan via ``df.count()``.
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
    out = (part.join(F.broadcast(off), "_rpid")
           .withColumn(col_name, F.row_number().over(w) + F.col("_rkoff"))
           .drop("_rpid", "_rkoff"))
    return (out, acc) if return_total else out


def range_partitioned_running_max(df: DataFrame, order_cols, value_col: str,
                                  col_name: str = "running_max",
                                  num_ranges: int | None = None) -> DataFrame:
    """Append an EXACT ``max(value_col) over (order by order_cols rows
    unbounded preceding)`` — the running-max spelling x187's watermark
    audit uses — without a single-partition sort.

    Same scheme as :func:`range_partitioned_row_number`: a range
    exchange pinned by a lazy localCheckpoint, a BOUNDED
    ``num_ranges``-row collect (here the per-range max instead of the
    per-range count), and a per-range window. The collected maxima
    fold into an EXCLUSIVE prefix max per range; each row's running
    max is then ``greatest(per-range running max, prefix max of all
    earlier ranges)``. ``order_cols`` must be a total order for the
    result to be deterministic under ties (same contract as the rank).
    NULL values never win a max (``F.greatest`` skips NULLs), matching
    the window spelling. Float/double NaN is folded with Spark's total
    order (NaN greater than every number — ``_spark_max_key``), so the
    prefix carry agrees with ``max() over (...)`` even when a range's
    maximum is NaN."""
    spark = df.sparkSession
    n = int(num_ranges or spark.sparkContext.defaultParallelism)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    part = (df.repartitionByRange(n, *order_cols)
            .withColumn("_rpid", F.spark_partition_id())
            .localCheckpoint(eager=False))
    maxes = {r["_rpid"]: r["m"]
             for r in part.groupBy("_rpid")
             .agg(F.max(value_col).alias("m")).collect()}
    vtype = df.schema[value_col].dataType.simpleString()
    prefix, acc = [], None
    for pid in sorted(maxes):
        prefix.append((pid, acc))
        m = maxes[pid]
        if m is not None and (acc is None
                              or _spark_max_key(m) > _spark_max_key(acc)):
            acc = m
    pre = spark.createDataFrame(prefix, f"_rpid int, _pmax {vtype}")
    w = (Window.partitionBy("_rpid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (part.join(F.broadcast(pre), "_rpid")
            .withColumn(col_name,
                        F.greatest(F.max(value_col).over(w), F.col("_pmax")))
            .drop("_rpid", "_pmax"))


def range_partitioned_running_sum(df: DataFrame, order_cols, value_col: str,
                                  col_name: str = "running_sum",
                                  num_ranges: int | None = None) -> DataFrame:
    """Append an EXACT ``sum(value_col) over (order by order_cols rows
    unbounded preceding)`` — the global prefix sum (x228's
    concat-and-chunk packing offset) — without a single-partition sort.

    Same scheme as :func:`range_partitioned_running_max` with SUM as
    the monoid: range exchange pinned by a lazy localCheckpoint, a
    BOUNDED ``num_ranges``-row collect of per-range sums, an EXCLUSIVE
    driver-side prefix fold (integer-exact — the contract is an
    integral ``value_col``; float addends would reorder rounding vs
    the window spelling), and a per-range running-sum window plus the
    broadcast prefix. ``order_cols`` must be a total order. NULL
    values contribute nothing on either path (SUM skips NULLs; the
    prefix fold skips None)."""
    spark = df.sparkSession
    n = int(num_ranges or spark.sparkContext.defaultParallelism)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    part = (df.repartitionByRange(n, *order_cols)
            .withColumn("_rpid", F.spark_partition_id())
            .localCheckpoint(eager=False))
    sums = {r["_rpid"]: r["s"]
            for r in part.groupBy("_rpid")
            .agg(F.sum(value_col).alias("s")).collect()}
    # NULL prefix = "no non-null addend in any earlier range": then the
    # per-range window sum (possibly NULL, matching a leading-NULL
    # global prefix) stands alone; a non-NULL prefix forces the row
    # non-NULL (the global window has seen a value), so the in-range
    # NULL sum coalesces to 0 before the carry is added.
    prefix, acc = [], None
    for pid in sorted(sums):
        prefix.append((pid, acc))
        if sums[pid] is not None:
            acc = (acc or 0) + sums[pid]
    pre = spark.createDataFrame(prefix, "_rpid int, _psum bigint")
    w = (Window.partitionBy("_rpid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    win = F.sum(value_col).over(w)
    return (part.join(F.broadcast(pre), "_rpid")
            .withColumn(col_name,
                        F.when(F.col("_psum").isNull(), win)
                        .otherwise(F.coalesce(win, F.lit(0))
                                   + F.col("_psum")))
            .drop("_rpid", "_psum"))
