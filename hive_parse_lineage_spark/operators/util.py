"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Ensure a compute-bound projection/explode gets >= one partition
    per core.

    ``maxPartitionBytes`` sizes scan partitions for IO, so a small
    parquet file arrives as ONE partition — and a CPU-heavy stage
    (signature hashing, shingle explosion) then runs on one core
    regardless of cluster size. Round-robin repartition is free
    relative to the work it unblocks; at 100 TB the input already has
    more partitions than cores and this is a no-op (no shuffle added).
    """
    if df.isStreaming:
        # Streaming plans have no RDD to probe, and micro-batch sizing is
        # the source's job (maxFilesPerTrigger etc.) — pass through.
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
