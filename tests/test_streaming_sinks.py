"""Streaming sink coverage (SURVEY §2b excluded table: foreachBatch
sinks; §7 M3): parquet file sink with checkpoint, and foreachBatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_parse_lineage_spark.streaming.windows import (
    run_stream_foreach_batch, run_stream_to_files,
)


@pytest.fixture(scope="module")
def events(spark):
    from hive_parse_lineage_spark.sources.loader import read_table
    return read_table(spark, "/root/testdata/sf0.001", "events")


def test_file_sink_append_equals_batch(spark, events, tmp_path):
    def xf(df):
        return (df.filter(F.col("event_type") == "click")
                  .select("event_id", "user_id", "value"))

    out = run_stream_to_files(spark, events, xf,
                              str(tmp_path / "out"), str(tmp_path / "ckpt"))
    expected = xf(events)
    assert sorted(out.collect()) == sorted(expected.collect())
    # checkpoint materialized (restart would resume, not reprocess)
    assert (tmp_path / "ckpt" / "offsets").exists()


def test_foreach_batch_upsert(spark, events, tmp_path):
    """foreachBatch as a MERGE-style sink: per-batch aggregation merged
    into a driver-side store keyed by epoch (idempotent on replay)."""
    seen_epochs: dict[int, int] = {}
    totals: dict[str, int] = {}

    def sink(df, epoch_id):
        if epoch_id in seen_epochs:  # replay guard
            return
        rows = df.collect()
        seen_epochs[epoch_id] = len(rows)
        for r in rows:
            totals[r["event_type"]] = r["n"]

    def xf(df):
        return df.groupBy("event_type").agg(F.count("*").alias("n"))

    run_stream_foreach_batch(spark, events, xf, sink)
    expected = {r["event_type"]: r["n"]
                for r in xf(events).collect()}
    assert totals == expected
    assert len(seen_epochs) >= 1
