"""JSONL ingestion/export — the wire format LLM corpora arrive in.

Web-scrape and vendor deliveries are (gzipped) JSON-lines with a long
tail of malformed rows; losing them silently corrupts counts, failing
the whole read loses the batch. ``read_jsonl`` therefore reads
PERMISSIVE with an explicit schema + a corrupt-record column: bad
lines land in quarantine instead of either failing the job or
vanishing. The export side writes sharded JSONL sized for downstream
trainers.

Both sides are plain Spark readers/writers — splittable, predicate-
prunable after the parquet conversion this module is the front door
for. At 100 TB the pattern is: read_jsonl -> validate/quarantine ->
write parquet (sorted, compacted — see sources/maintenance.py) once,
query forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-first JSONL read with corrupt-line capture.

    ``schema`` is a DDL string WITHOUT the corrupt column — it is
    appended here. Malformed lines yield a row with the raw line in
    ``_corrupt_record`` and nulls elsewhere; well-formed lines have it
    null. An explicit schema (never inference) keeps the read one pass
    and deterministic — inference at 100 TB is a full extra scan.
    """
    full = f"{schema}, {CORRUPT_COL} string"
    return (spark.read
            .schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_corrupt_column, quarantine_rows).

    Two parser quirks shape the quarantine projection:

    - Spark refuses queries whose referenced columns are ONLY the
      corrupt record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN; the
      usual workaround is ``.cache()``, a non-starter at scale).
    - The CSV parser decides corruptness per REFERENCED column set: if
      pruning drops the malformed field, the row silently counts as
      clean in that projection.

    Coalescing the corrupt column with a concat of EVERY data column
    solves both: all columns are referenced (no pruning, consistent
    corrupt detection), the plan stays lazy, and the value is always
    the raw line (the corrupt column is non-null on every quarantined
    row).
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    others = [c for c in df.columns if c != CORRUPT_COL]
    raw = (F.coalesce(F.col(CORRUPT_COL),
                      F.concat_ws(",", *[F.col(c).cast("string")
                                         for c in others]))
           if others else F.col(CORRUPT_COL))
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()) \
            .select(raw.alias("raw_line"))
    return clean, bad


def read_csv_clean(spark: SparkSession, path: str, schema: str,
                   header: bool = True, **options) -> DataFrame:
    """Schema-first CSV read with the same corrupt-line capture as
    :func:`read_jsonl` (vendor CSVs carry the same malformed tail).
    Extra reader options (sep, quote, multiLine, ...) pass through."""
    full = f"{schema}, {CORRUPT_COL} string"
    reader = (spark.read.schema(full)
              .option("header", str(header).lower())
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", CORRUPT_COL))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_jsonl_shards(df: DataFrame, path: str,
                       rows_per_shard: int | None = None,
                       compression: str | None = "gzip") -> None:
    """Sharded JSONL export (training-data hand-off format).

    ``rows_per_shard`` sizes shards via a count + repartition —
    round-robin, so shards are even regardless of input skew; omit it
    to keep the current partitioning (no extra job)."""
    if rows_per_shard:
        n = df.count()
        df = df.repartition(max(1, -(-n // rows_per_shard)))
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
