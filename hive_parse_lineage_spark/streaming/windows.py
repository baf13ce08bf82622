"""Structured-Streaming window operators (SURVEY §7 M3).

The reference understands stream-shaped SQL only as text; here the
event-time operators actually run, and the same transformation
functions work in batch and streaming (the DataFrame API is mode
agnostic) — which is exactly how the batch-vs-stream equivalence tests
verify them (SURVEY §5.2(4)).

Scale notes: windowed aggregation state is partitioned by (key,
window); the watermark bounds state size. At 100 TB/day the dominant
knobs are watermark delay (state retention) and shuffle partitions
(state store parallelism); nothing here holds per-key state beyond the
aggregation itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_agg(events: DataFrame, ts_col: str = "ts",
                 keys: tuple[str, ...] = ("event_type",),
                 window: str = "1 hour",
                 watermark: str | None = "10 minutes") -> DataFrame:
    """Tumbling-window count+sum (Q39 shape). Works batch or stream."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(ts_col, window).alias("w"), *keys)
              .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
              .select(F.col("w.start").alias("w"), *keys, "n", "sv"))


def sliding_agg(events: DataFrame, ts_col: str = "ts",
                keys: tuple[str, ...] = ("event_type",),
                window: str = "10 minutes", slide: str = "5 minutes",
                watermark: str | None = "10 minutes") -> DataFrame:
    """Sliding-window aggregation; each event lands in window/slide panes."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
              .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
              .select(F.col("w.start").alias("w"), *keys, "n", "sv"))


def session_agg(events: DataFrame, ts_col: str = "ts",
                keys: tuple[str, ...] = ("user_id",),
                gap: str = "30 minutes",
                watermark: str | None = "10 minutes") -> DataFrame:
    """Session windows: events within ``gap`` of each other merge."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
              .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
              .select(F.col("w.start").alias("session_start"),
                      F.col("w.end").alias("session_end"), *keys, "n", "sv"))


def sessionize_batch(events: DataFrame, ts_col: str = "ts",
                     key: str = "user_id", gap_minutes: int = 30) -> DataFrame:
    """Batch-mode sessionization via the lag/cumsum window trick — the
    oracle for ``session_agg`` (session_window has no batch analogue in
    other engines). One shuffle on the key; no per-session state."""
    from pyspark.sql import Window as W
    w = W.partitionBy(key).orderBy(ts_col)
    gap = F.when(
        (F.unix_timestamp(ts_col)
         - F.unix_timestamp(F.lag(ts_col).over(w))) > gap_minutes * 60, 1
    ).otherwise(0)
    with_sess = (events
                 .withColumn("_new_sess", F.coalesce(gap, F.lit(1)))
                 .withColumn("_sess_id", F.sum("_new_sess").over(
                     w.rowsBetween(W.unboundedPreceding, 0))))
    return (with_sess.groupBy(key, "_sess_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sv")))


def running_count_stateful(events: DataFrame, key: str = "event_type"):
    """Custom stateful operator: cumulative per-key count across
    micro-batches via applyInPandasWithState (the
    flatMapGroupsWithState surface from Python)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def update(key_tuple, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"key": [key_tuple[0]], "total": [total]})

    return (events.groupBy(F.col(key))
            .applyInPandasWithState(
                update,
                outputStructType="key string, total long",
                stateStructType="total long",
                outputMode="update",
                timeoutConf="NoTimeout"))


def streaming_dedup(events: DataFrame, keys: tuple[str, ...] = ("event_id",),
                    ts_col: str = "ts",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes — the streaming twin of the batch
    ``exact_dedup`` (state does not grow with the stream at 100 TB/day).
    Batch mode falls back to plain dropDuplicates (same result set).
    """
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(list(keys)))
    return events.dropDuplicates(list(keys))


def run_stream_to_files(spark, batch_df: DataFrame, transform,
                        out_dir: str, checkpoint_dir: str) -> DataFrame:
    """File sink: parquet source → transform → parquet ``writeStream``
    with a checkpoint (exactly-once via WAL + file-manifest commit
    protocol). Append mode — the 100 TB landing-zone pattern; the
    checkpoint makes restarts resume, not reprocess. Returns the
    sink read back as a batch DataFrame."""
    import shutil
    import tempfile

    # Staged source copy is deleted once the query stops (the result
    # lives in out_dir) — replays must not leak parquet copies in /tmp.
    tmp = tempfile.mkdtemp(prefix="stream_src_")
    try:
        batch_df.write.mode("overwrite").parquet(tmp)
        src = (spark.readStream.schema(batch_df.schema)
               .option("maxFilesPerTrigger", 1).parquet(tmp))
        q = (transform(src).writeStream.outputMode("append")
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", checkpoint_dir).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(out_dir)


def run_stream_foreach_batch(spark, batch_df: DataFrame, transform,
                             batch_fn) -> None:
    """foreachBatch sink: each micro-batch DataFrame is handed to
    ``batch_fn(df, epoch_id)`` — the escape hatch for sinks without a
    native streaming writer (JDBC upsert, MERGE into a warehouse
    table). ``batch_fn`` must be idempotent on ``epoch_id`` because a
    batch can be replayed after failure."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="stream_src_")
    try:
        batch_df.write.mode("overwrite").parquet(tmp)
        src = (spark.readStream.schema(batch_df.schema)
               .option("maxFilesPerTrigger", 1).parquet(tmp))
        q = (transform(src).writeStream.outputMode("update")
             .foreachBatch(batch_fn).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_stream_over_batch(spark, batch_df: DataFrame, transform,
                          query_name: str = "stream_out",
                          output_mode: str = "complete") -> DataFrame:
    """Drive a batch DataFrame through a real Structured-Streaming query
    (parquet file source → transform → memory sink), synchronously.

    Test utility: proves the transformation is streaming-legal and lets
    batch-vs-stream equivalence tests compare final results.
    """
    import shutil
    import tempfile

    # The memory sink holds the result rows driver-side, so the staged
    # source copy can be deleted as soon as the query stops.
    tmp = tempfile.mkdtemp(prefix="stream_src_")
    try:
        batch_df.write.mode("overwrite").parquet(tmp)
        src = (spark.readStream.schema(batch_df.schema)
               .option("maxFilesPerTrigger", 1).parquet(tmp))
        q = (transform(src).writeStream.outputMode(output_mode)
             .format("memory").queryName(query_name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # Pin the sink rows, then drop the view: uuid-named sinks from
    # repeated gate/robustness sweeps would otherwise accumulate their
    # collected row sets driver-side for the life of the session.
    out = spark.table(query_name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(query_name)
    return out


def running_stats_tws(events: DataFrame, key: str = "event_type",
                      value_col: str = "value") -> DataFrame:
    """Custom stateful operator on the Spark 4 ``transformWithState``
    API: per-key running SUM/COUNT held in ValueState across
    micro-batches. Successor to applyInPandasWithState (above): typed
    state handles, timers, and TTL come from the handle instead of one
    opaque state tuple — state is per-key and bounded, so executors
    hold O(keys), never O(events).

    Requires ``protobuf`` (the API's Python<->JVM state protocol is
    protobuf-encoded; see README "Optional dependencies"). Detected
    here so callers get an actionable error at the operator boundary
    instead of a mid-stream worker crash.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "running_stats_tws needs the 'protobuf' package "
            "(pip install protobuf): Spark's transformWithState "
            "Python API encodes its state protocol with it. "
            "applyInPandasWithState (running_stats, above) provides "
            "the same running aggregate without the dependency."
        ) from exc
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "total double, n bigint")

        def handleInputRows(self, key_tuple, rows, timer_values):
            total, n = self._agg.get() if self._agg.exists() else (0.0, 0)
            for pdf in rows:
                total += float(pdf[value_col].sum())
                n += len(pdf)
            self._agg.update((total, n))
            yield pd.DataFrame({key: [key_tuple[0]],
                                "total": [round(total, 2)], "n": [n]})

        def close(self) -> None:
            pass

    return (events.groupBy(F.col(key))
            .transformWithStateInPandas(
                statefulProcessor=RunningStats(),
                outputStructType=f"{key} string, total double, n bigint",
                outputMode="Update",
                timeMode="None"))


def running_cents_state(events: DataFrame, key: str = "event_type",
                        cents_col: str = "cents") -> DataFrame:
    """Custom stateful running SUM/COUNT in integer cents via
    applyInPandasWithState — the dependency-free custom-state API
    (protobuf-free, unlike :func:`running_cents_tws` below), and the
    spelling the x178 exact gate runs: integer addition is order-free,
    so the final per-key update equals the batch aggregate under any
    micro-batching. State is one (total, n) pair per key — O(keys) on
    the executors at any stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def update(key_tuple, pdf_iter, state: GroupState):
        total, n = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            total += int(pdf[cents_col].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame({key: [key_tuple[0]],
                            "total_cents": [total], "n": [n]})

    return (events.groupBy(F.col(key))
            .applyInPandasWithState(
                update,
                outputStructType=f"{key} string, total_cents long, n long",
                stateStructType="total_cents long, n long",
                outputMode="update",
                timeoutConf="NoTimeout"))


def running_cents_tws(events: DataFrame, key: str = "event_type",
                      cents_col: str = "cents") -> DataFrame:
    """Integer-cents variant of :func:`running_stats_tws`, built for
    the EXACT hash gate: per-key running SUM/COUNT in ValueState as
    BIGINTs — addition of integers is order-free, so the final per-key
    update equals the batch aggregate no matter how the stream was
    micro-batched (the double variant above inherits IEEE accumulation
    order and can only be approximately gated). State is one
    (total, n) pair per key: O(keys) on the executors at any stream
    length."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "running_cents_tws needs the 'protobuf' package: Spark's "
            "transformWithState Python API encodes its state protocol "
            "with it."
        ) from exc
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningCents(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "total_cents bigint, n bigint")

        def handleInputRows(self, key_tuple, rows, timer_values):
            total, n = (self._agg.get() if self._agg.exists()
                        else (0, 0))
            for pdf in rows:
                total += int(pdf[cents_col].sum())
                n += len(pdf)
            self._agg.update((total, n))
            yield pd.DataFrame({key: [key_tuple[0]],
                                "total_cents": [total], "n": [n]})

        def close(self) -> None:
            pass

    return (events.groupBy(F.col(key))
            .transformWithStateInPandas(
                statefulProcessor=RunningCents(),
                outputStructType=f"{key} string, total_cents bigint, "
                                 "n bigint",
                outputMode="Update",
                timeMode="None"))


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key="user_id", ts_left: str = "ts",
                         ts_right: str = "ts_r",
                         delay: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner interval join: right-side events within
    ``[left.ts, left.ts + delay]`` for the same key (the
    click-to-conversion / impression-attribution shape).

    Both sides carry a watermark and the join condition carries the
    time bound, so Spark's symmetric hash join can EVICT state once
    the watermark passes ``ts + delay`` — without the interval bound
    a stream-stream join buffers both streams forever. Inner-join
    matches emit as soon as both sides arrive (emission is not gated
    on the watermark; only state cleanup is), so batch equivalence
    holds exactly. Works identically on batch frames (watermark is a
    streaming-only no-op there), which is what the equivalence test
    exploits.
    """
    l = left.withWatermark(ts_left, watermark) if left.isStreaming else left
    r = (right.withWatermark(ts_right, watermark)
         if right.isStreaming else right)
    lk, rk = key if isinstance(key, tuple) else (key, key)
    cond = ((l[lk] == r[rk])
            & (r[ts_right] >= l[ts_left])
            & (r[ts_right] <= l[ts_left] + F.expr(f"INTERVAL {delay}")))
    return l.join(r, cond, "inner")


def run_two_streams_over_batch(spark, left_df: DataFrame,
                               right_df: DataFrame, transform2,
                               query_name: str = "stream2_out",
                               output_mode: str = "append") -> DataFrame:
    """Two-source variant of :func:`run_stream_over_batch` for
    stream-stream joins: both batch frames become file streams,
    ``transform2(left_stream, right_stream)`` builds the joined
    stream, results land in a memory sink.

    Each side is staged as ONE file. A watermarked stream-stream join
    only reproduces the batch join when input arrives in event-time
    order: with ``maxFilesPerTrigger=1`` and a hash-partitioned
    multi-file staging (which the loader's scan-parallelism guard now
    produces for ``events``), files replay in arbitrary time order and
    the watermark correctly drops the "late" rows — correct streaming
    semantics, but not the equivalence contract these harness runs
    exist to check. One file per side = one micro-batch per side = no
    cross-batch watermark drops. ``repartition(1)`` (not ``coalesce``)
    so the upstream transform keeps its parallelism; only the final
    write is single-task.
    """
    import shutil
    import tempfile

    ltmp = tempfile.mkdtemp(prefix="stream_l_")
    rtmp = tempfile.mkdtemp(prefix="stream_r_")
    try:
        left_df.repartition(1).write.mode("overwrite").parquet(ltmp)
        right_df.repartition(1).write.mode("overwrite").parquet(rtmp)
        lsrc = (spark.readStream.schema(left_df.schema)
                .option("maxFilesPerTrigger", 1).parquet(ltmp))
        rsrc = (spark.readStream.schema(right_df.schema)
                .option("maxFilesPerTrigger", 1).parquet(rtmp))
        q = (transform2(lsrc, rsrc).writeStream.outputMode(output_mode)
             .format("memory").queryName(query_name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(ltmp, ignore_errors=True)
        shutil.rmtree(rtmp, ignore_errors=True)
    out = spark.table(query_name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(query_name)
    return out
