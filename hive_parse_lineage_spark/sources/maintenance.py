"""Table maintenance: small-file compaction + sorted writes + file stats.

The reference has no storage layer (it only parses SQL); these are the
operational pieces a 100 TB Spark deployment actually needs around the
parquet tables the engine reads:

- **Small-file compaction.** Streaming sinks and over-parallel writers
  leave thousands of KB-scale files; every downstream scan then pays
  per-file open/footer costs and the driver pays listing. Compaction
  rewrites a directory to ~``target_file_bytes`` files. This is the
  no-table-format spelling of ``OPTIMIZE``/``rewrite_data_files``.
- **Sorted writes.** Sorting within partitions by a filter column
  before writing tightens each file's parquet min/max footer stats, so
  later scans with a predicate on that column prune whole files/row
  groups (poor man's Z-order for the single-column case).
- **File stats.** Per-file row counts and per-column min/max straight
  from parquet footers (no data read) — the input to "is this table
  compacted/sorted enough" decisions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def dir_file_sizes(path: str) -> list[int]:
    """Sizes of the parquet part-files under ``path`` (local fs)."""
    return sorted(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", ".")))


def compact_parquet_dir(spark: SparkSession, path: str, out_path: str,
                        target_file_bytes: int = 128 * 1024 * 1024,
                        sort_cols: list[str] | None = None) -> int:
    """Rewrite a parquet directory to ~``target_file_bytes`` files;
    returns the output file count.

    File count = ceil(current_total_bytes / target). ``coalesce`` (not
    ``repartition``) when shrinking — no shuffle, each output task
    concatenates input splits; with ``sort_cols`` a shuffle-free
    ``sortWithinPartitions`` runs per output file so footer min/max
    stats stay useful for data-skipping. Writes to ``out_path`` then
    the caller swaps directories — same move-into-place discipline an
    OPTIMIZE job uses so readers never see a half-written table.
    """
    sizes = dir_file_sizes(path)
    if not sizes:
        raise ValueError(
            f"no top-level parquet files under {path!r} — partitioned "
            "(partitionBy) layouts must be compacted per partition "
            "directory, not flattened through a whole-table rewrite")
    total = sum(sizes)
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    if n_out < (len(sizes) or 1):
        df = df.coalesce(n_out)
    else:
        df = df.repartition(n_out)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode("overwrite").parquet(out_path)
    return len(dir_file_sizes(out_path))


def write_sorted_parquet(df: DataFrame, path: str, sort_cols: list[str],
                         n_files: int | None = None) -> None:
    """Write ``df`` with rows range-clustered on ``sort_cols``:
    ``repartitionByRange`` (files own disjoint key ranges — file-level
    pruning) then ``sortWithinPartitions`` (row-group-level pruning
    within each file)."""
    if n_files:
        df = df.repartitionByRange(n_files, *sort_cols)
    else:
        df = df.repartitionByRange(*sort_cols)
    df.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key column over numeric ``cols``.

    Each column is min/max-normalized to a ``bits``-bit integer (one
    tiny agg computes the bounds), then the bit planes are interleaved
    — a pure codegen expression. ``bits`` is capped at
    ``62 // len(cols)`` so the key fits a signed long (16-bit planes
    for 2-3 columns, 15-bit for 4, and so on). Sorting by this key clusters rows so
    EVERY participating column's per-file min/max range shrinks by
    roughly n_files^(1/k), which single-column sorting only gives the
    leading column. Returns (key_column, bounds_row) so callers can
    log the bounds used.
    """
    from pyspark.sql import functions as F

    # the interleaved key must fit a signed long: bits * n_cols <= 62
    bits = min(bits, 62 // max(1, len(cols)))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    bounds = df.agg(*aggs).first()
    scaled = []
    for c in cols:
        if bounds[f"mn_{c}"] is None or bounds[f"mx_{c}"] is None:
            raise ValueError(
                f"zorder column {c!r} has no non-NULL values "
                "(empty input?) — nothing to cluster")
        lo = float(bounds[f"mn_{c}"])
        hi = float(bounds[f"mx_{c}"])
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
                    * F.lit(1 << bits)).cast("long"))
        scaled.append(F.greatest(F.lit(0), q))
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + i).cast("long"))
    return key, bounds


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 8, bits: int = 16) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition + sort by
    the Morton key, drop it, write parquet. Files then carry tight
    footer min/max stats on EVERY zorder column — multi-dimensional
    data skipping from plain parquet, no table format."""
    key, _ = zorder_key(df, cols, bits)
    (df.withColumn("_zkey", key)
       .repartitionByRange(n_files, "_zkey")
       .sortWithinPartitions("_zkey")
       .drop("_zkey")
       .write.mode("overwrite").parquet(path))


def parquet_file_stats(path: str, columns: list[str] | None = None) -> list[dict]:
    """Per-file row counts and per-column (min, max) from parquet
    footers — metadata only, no data pages read."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet") or f.startswith(("_", ".")):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        stats: dict = {"file": f, "rows": md.num_rows, "columns": {}}
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for ci, name in enumerate(names):
            if columns is not None and name not in columns:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(ci).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            stats["columns"][name] = (lo, hi)
        out.append(stats)
    return out
