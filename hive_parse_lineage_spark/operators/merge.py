"""MERGE INTO / CDC emulation without a table format.

Delta/Iceberg ship MERGE as a table-format operation; on plain
parquet-backed tables the same semantics compose from anti-join +
union (upsert) and window flagging (SCD2). These are the batch-CDC
primitives of a training-data pipeline (dataset versioning, incremental
refresh).

Scale: both operators cost one shuffle on the merge key (the join),
plus the rewrite of the target — which is inherent to copy-on-write
MERGE; partition the target by a stable key prefix so the rewrite can
be limited to touched partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str,
                 delete_col: str | None = None) -> DataFrame:
    """MERGE semantics: matched rows are replaced by source, unmatched
    source rows are inserted, and (optionally) source rows with
    ``delete_col = true`` delete the match.

    Returns the new target content (copy-on-write, like
    format-level MERGE).

    Divergence from format-level MERGE: duplicate source keys are kept
    as-is (Delta raises on multiple matches) — pre-dedup the source
    with ``dropDuplicates([key])`` when last-writer-wins is intended.
    """
    if delete_col is not None:
        deletes = source.filter(F.col(delete_col)).select(key)
        upserts = source.filter(~F.col(delete_col)).drop(delete_col)
        kept = target.join(F.broadcast(deletes), key, "left_anti")
    else:
        upserts = source
        kept = target
    untouched = kept.join(upserts.select(key), key, "left_anti")
    return untouched.unionByName(upserts.select(*untouched.columns))


def scd2_apply(dim: DataFrame, updates: DataFrame, key: str,
               ts_col: str = "effective_from",
               current_col: str = "is_current") -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows that
    have a newer update and append the new versions.

    ``dim`` carries (key, attrs..., effective_from, effective_to,
    is_current); ``updates`` carries (key, attrs..., effective_from).
    """
    upd = (updates
           .withColumn("effective_to", F.lit(None).cast("timestamp"))
           .withColumn(current_col, F.lit(True)))
    upd_keys = upd.select(key, F.col(ts_col).alias("_new_from"))
    closed = (dim.join(F.broadcast(upd_keys), key, "left")
              .withColumn(
                  "effective_to",
                  F.when(F.col(current_col) & F.col("_new_from").isNotNull(),
                         F.col("_new_from")).otherwise(F.col("effective_to")))
              .withColumn(
                  current_col,
                  F.when(F.col("_new_from").isNotNull(), F.lit(False))
                   .otherwise(F.col(current_col)))
              .drop("_new_from"))
    merged = closed.unionByName(upd.select(*closed.columns))
    # keep exactly one current row per key (the latest effective_from)
    w = W.partitionBy(key).orderBy(F.desc(ts_col))
    return (merged
            .withColumn("_rn", F.row_number().over(w))
            .withColumn(current_col,
                        F.when(F.col("_rn") == 1, F.col(current_col))
                         .otherwise(F.lit(False)))
            .drop("_rn"))
