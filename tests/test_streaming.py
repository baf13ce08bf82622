"""Streaming tests: batch-vs-stream equivalence (SURVEY §5.2(4)),
late/out-of-order data, session windows, custom stateful op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from hive_parse_lineage_spark.sources.loader import read_table
    # keep the streaming tests light: first 2000 events
    return read_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, events):
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, tumbling_agg)
    batch = tumbling_agg(events)
    stream = run_stream_over_batch(
        spark, events, lambda s: tumbling_agg(s), query_name="t_tumble")
    cols = ["w", "event_type", "n", "sv"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_sliding_stream_equals_batch(spark, events):
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, sliding_agg)
    batch = sliding_agg(events)
    stream = run_stream_over_batch(
        spark, events, lambda s: sliding_agg(s), query_name="t_slide")
    cols = ["w", "event_type", "n", "sv"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_out_of_order_arrival_converges(spark, events):
    """Shuffled arrival order (descending event time across files) must
    converge to the same final aggregate in complete mode."""
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, tumbling_agg)
    reversed_events = events.orderBy(F.desc("ts")).repartition(4)
    stream = run_stream_over_batch(
        spark, reversed_events, lambda s: tumbling_agg(s), query_name="t_ooo")
    cols = ["w", "event_type", "n", "sv"]
    assert _rows(stream, cols) == _rows(tumbling_agg(events), cols)


def test_session_window_stream_vs_batch_oracle(spark):
    """session_window (streaming-native) vs the batch lag/cumsum
    sessionization oracle on a synthetic trace with known gaps."""
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, session_agg, sessionize_batch)
    rows = [
        (1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:10:00", 2.0),
        (1, "2024-01-01 01:30:00", 3.0),  # > 30 min gap → new session
        (2, "2024-01-01 00:05:00", 4.0),
        (2, "2024-01-01 02:00:00", 5.0), (2, "2024-01-01 02:20:00", 6.0),
    ]
    df = (spark.createDataFrame(rows, "user_id long, ts string, value double")
          .withColumn("ts", F.to_timestamp("ts")))
    # single file → single micro-batch: arrival order of multi-file sources
    # is nondeterministic and a high watermark would (correctly) drop the
    # early session as late data — that path is covered by the append test
    stream = run_stream_over_batch(
        spark, df.coalesce(1), lambda s: session_agg(s, gap="30 minutes"),
        query_name="t_sess")
    batch_oracle = sessionize_batch(df, gap_minutes=30)
    got = _rows(stream, ["user_id", "session_start", "n", "sv"])
    want = _rows(batch_oracle, ["user_id", "session_start", "n", "sv"])
    assert got == want
    assert len(got) == 4  # 2 sessions per user


def test_stateful_running_count(spark, events):
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, running_count_stateful)
    stream = run_stream_over_batch(
        spark, events, running_count_stateful,
        query_name="t_state", output_mode="update")
    # final total per key (last update row) must equal the batch count
    final = (stream.groupBy("key").agg(F.max("total").alias("total")))
    want = {r["event_type"]: r["n"] for r in
            events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    got = {r["key"]: r["total"] for r in final.collect()}
    assert got == want


def test_watermark_append_mode_emits_closed_windows(spark, events):
    """Append mode with a watermark only emits windows the watermark has
    passed — the late-data contract."""
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, tumbling_agg)
    stream = run_stream_over_batch(
        spark, events.orderBy("ts").coalesce(1),
        lambda s: tumbling_agg(s, watermark="1 minute"),
        query_name="t_append", output_mode="append")
    batch = tumbling_agg(events)
    # every emitted row matches the batch result exactly...
    got = _rows(stream, ["w", "event_type", "n", "sv"])
    want = {t: t for t in _rows(batch, ["w", "event_type", "n", "sv"])}
    assert all(t in want for t in got)
    # ...and only the final (max-event-time) windows may be withheld
    max_w = max(r[0] for r in _rows(batch, ["w", "event_type", "n", "sv"]))
    missing = [t for t in want if t not in set(got)]
    assert all(t[0] == max_w for t in missing)


def test_streaming_dedup_within_watermark(spark, events):
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, streaming_dedup)
    # duplicate every event, then dedup on event_id in the stream
    doubled = events.unionByName(events)
    out = run_stream_over_batch(
        spark, doubled.coalesce(1), lambda s: streaming_dedup(s),
        query_name="t_dedup", output_mode="append")
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()


def test_stream_static_decontamination(spark, tables):
    """Decontamination as a stream-static join: the flagged-shingle set
    is a static (batch) table broadcast against a streaming document
    source — the shape a 100 TB ingest pipeline uses (boilerplate list
    refreshed offline, applied on the stream). Aggregate runs in
    complete mode; result must equal the batch plan."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    from hive_parse_lineage_spark.operators.corpus import common_shingles
    from hive_parse_lineage_spark.streaming.windows import run_stream_over_batch

    docs = tables["documents"].select("doc_id", "text").limit(200)
    flagged = common_shingles(docs, n=5, min_docs=2).select("shingle")

    def tf(df):
        per = df.select("doc_id",
                        F.explode(word_shingles("text", 5)).alias("shingle"))
        return (per.join(F.broadcast(flagged), "shingle")
                .groupBy("doc_id").agg(F.count("*").alias("n_flagged")))

    batch = _rows(tf(docs), ["doc_id", "n_flagged"])
    streamed = _rows(run_stream_over_batch(
        spark, docs, tf, query_name="decontam", output_mode="complete"),
        ["doc_id", "n_flagged"])
    assert batch == streamed and len(batch) > 0


def test_pii_redaction_is_streaming_legal(spark, tables):
    """PII scrubbing is a stateless projection — append mode, no state,
    identical output streamed or batch."""
    from hive_parse_lineage_spark.corpus_queries import EMAIL_RE
    from hive_parse_lineage_spark.streaming.windows import run_stream_over_batch

    docs = (tables["documents"].select("doc_id", "text").limit(50)
            .withColumn("text", F.concat(
                F.lit("u"), F.col("doc_id").cast("string"),
                F.lit("@x.org "), F.col("text"))))

    def tf(df):
        return df.select(
            "doc_id",
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>").alias("red"),
            F.regexp_count("text", F.lit(EMAIL_RE)).alias("n"))

    batch = _rows(tf(docs), ["doc_id", "red", "n"])
    streamed = _rows(run_stream_over_batch(
        spark, docs, tf, query_name="pii", output_mode="append"),
        ["doc_id", "red", "n"])
    assert batch == streamed and all(r[2] == 1 for r in batch)


def test_pipeline_ops_are_streaming_legal(spark, tables):
    """The LLM-pipeline projections (hash split, quality-filter flag)
    are stateless column transforms, so the same function must produce
    identical results driven through a real streaming query."""
    from hive_parse_lineage_spark.functions import text as T
    from hive_parse_lineage_spark.operators.sampling import hash_split
    from hive_parse_lineage_spark.streaming.windows import run_stream_over_batch
    from pyspark.sql import functions as F

    docs = tables["documents"].select("doc_id", "text").limit(200)

    def tf(df):
        out = hash_split(df, salt="v1")
        n = F.size(T.tokens("text"))
        return out.select("doc_id", "bucket", "split",
                          (n >= 20).cast("int").alias("long_enough"))

    batch = {tuple(r) for r in tf(docs).collect()}
    streamed = {tuple(r) for r in run_stream_over_batch(
        spark, docs, tf, query_name="pipe_ops", output_mode="append").collect()}
    assert batch == streamed and len(batch) == 200


def test_spread_for_compute_passes_streaming_through(spark):
    """spread_for_compute probes df.rdd, which raises on streaming
    plans — it must pass streaming DataFrames through untouched
    (ADVICE r3), keeping minhash/simhash usable in append streams."""
    from hive_parse_lineage_spark.operators.util import spread_for_compute
    sdf = spark.readStream.format("rate").load()
    assert spread_for_compute(sdf) is sdf


def test_minhash_signature_streams_append_mode(spark, events):
    """minhash_signature (projection variant) must run inside an
    append-mode stream — the use the r3 advice fix unblocks: the
    spread_for_compute partition probe no longer touches df.rdd on
    streaming plans. Signatures must equal the batch run's."""
    from hive_parse_lineage_spark.operators.dedup import minhash_signature
    from hive_parse_lineage_spark.streaming.windows import run_stream_over_batch

    docs = events.select(
        F.col("event_id").alias("doc_id"),
        F.concat_ws(" ", "event_type", "props").alias("text")).limit(50)
    batch = {r["doc_id"]: r["minhash"]
             for r in minhash_signature(docs, n_hashes=8).collect()}
    streamed = run_stream_over_batch(
        spark, docs, lambda s: minhash_signature(s, n_hashes=8),
        query_name="t_mh", output_mode="append")
    got = {r["doc_id"]: r["minhash"] for r in streamed.collect()}
    assert got == batch


def test_streaming_incremental_near_dup_flags(spark, events):
    """Streaming ingestion dedup: new docs arrive as a stream, band
    into LSH buckets with the PROJECTION minhash (no aggregation — no
    watermark needed in append mode), and stream-static join against
    the standing corpus's buckets. Flags must equal the batch run."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import (
        _band_buckets, minhash_signature)
    from hive_parse_lineage_spark.streaming.windows import run_stream_over_batch

    docs = events.select(
        F.col("event_id").alias("doc_id"),
        F.concat_ws(" ", "event_type", "props").alias("text")).limit(120)
    corpus = docs.filter("doc_id < 60")
    new = docs.filter("doc_id >= 60")
    corpus_buckets = (_band_buckets(
        minhash_signature(corpus, n_hashes=8, hasher=portable_hash64)
        .select("doc_id", "minhash"), "doc_id", 8, 4, None)
        .withColumnRenamed("doc_id", "corpus_id").drop("minhash"))

    def flag(batch_or_stream):
        sig = (minhash_signature(batch_or_stream, n_hashes=8,
                                 hasher=portable_hash64)
               .select("doc_id", "minhash"))
        buckets = _band_buckets(sig, "doc_id", 8, 4, None).drop("minhash")
        return buckets.join(corpus_buckets, ["band", "band_hash"]) \
                      .select("doc_id", "corpus_id")

    batch_flags = {(r["doc_id"], r["corpus_id"]) for r in flag(new).collect()}
    streamed = run_stream_over_batch(spark, new, flag, query_name="t_inc",
                                     output_mode="append")
    stream_flags = {(r["doc_id"], r["corpus_id"]) for r in streamed.collect()}
    assert stream_flags == batch_flags
    assert batch_flags  # the fixture must actually produce candidates


def test_transform_with_state_running_stats(spark, events):
    """transformWithState (Spark 4 stateful API): the final per-key
    running SUM/COUNT after all micro-batches equals the batch
    aggregate. Needs (a) google.protobuf for the state protocol —
    skip when no importable copy exists (README documents the
    PYTHONPATH recipe for a pure-Python protobuf; the
    applyInPandasWithState test above covers the stateful contract
    either way) — and (b) the RocksDB state store, because the
    HDFS-backed default doesn't support the API's multiple column
    families; the provider conf is per-query, set here and
    restored."""
    pytest.importorskip("google.protobuf.descriptor",
                        reason="transformWithState needs protobuf")
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, running_stats_tws)
    small = events.limit(500)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key,
                   "org.apache.spark.sql.execution.streaming.state."
                   "RocksDBStateStoreProvider")
    try:
        streamed = run_stream_over_batch(
            spark, small, lambda s: running_stats_tws(s),
            query_name="t_tws", output_mode="update")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    # update mode emits one row per key per micro-batch: keep the last
    last = {}
    for r in streamed.collect():
        last[r["event_type"]] = (r["total"], r["n"])
    batch = {r["event_type"]: (r["total"], r["n"])
             for r in small.groupBy("event_type")
             .agg(F.round(F.sum("value"), 2).alias("total"),
                  F.count("*").alias("n")).collect()}
    # rounding happens per micro-batch in the stream; compare at 1dp
    assert set(last) == set(batch)
    for k in batch:
        assert abs(last[k][0] - batch[k][0]) < 0.1 and last[k][1] == batch[k][1]


def test_stream_stream_interval_join_equals_batch(spark, events):
    """Stream-stream inner interval join (watermarks on both sides,
    time-bounded state) must produce exactly the batch join's rows:
    even-id events join odd-id events of the same user arriving within
    the next 10 minutes."""
    from hive_parse_lineage_spark.streaming.windows import (
        interval_join_stream, run_two_streams_over_batch)
    left = (events.filter(F.col("event_id") % 2 == 0)
            .select(F.col("event_id").alias("l_id"),
                    F.col("user_id").alias("user_l"), "ts"))
    right = (events.filter(F.col("event_id") % 2 == 1)
             .select(F.col("event_id").alias("r_id"),
                     F.col("user_id").alias("user_r"),
                     F.col("ts").alias("ts_r")))

    def joined(l, r):
        return interval_join_stream(
            l, r, key=("user_l", "user_r"), ts_left="ts",
            ts_right="ts_r").select("l_id", "r_id")

    stream = run_two_streams_over_batch(
        spark, left, right, joined, query_name="t_ssj")
    batch = joined(left, right)
    got = sorted((r["l_id"], r["r_id"]) for r in stream.collect())
    want = sorted((r["l_id"], r["r_id"]) for r in batch.collect())
    assert got and got == want


def test_stream_near_dup_operator_equals_batch_cross_lsh(spark, tables):
    """streaming/neardup.py operator: a micro-batched stream of new
    docs (20 verbatim copies of corpus docs + 30 fresh ones) against
    the static corpus buckets must flag exactly the batch
    lsh_cross_pairs set at the same threshold — and every copied doc
    must be caught (est_jaccard 1.0 for identical text)."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import lsh_cross_pairs
    from hive_parse_lineage_spark.operators.dedup import minhash_signature_agg
    from hive_parse_lineage_spark.streaming.neardup import (
        corpus_band_buckets, stream_near_dup_matches)
    from hive_parse_lineage_spark.streaming.windows import run_stream_over_batch

    docs = tables["documents"]
    corpus = docs.filter("doc_id < 400").select("doc_id", "text")
    copies = (docs.filter("doc_id < 20")
              .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
    fresh = (docs.filter("doc_id >= 400 and doc_id < 430")
             .select((F.col("doc_id") + 20_000).alias("doc_id"), "text"))
    new = copies.unionByName(fresh)

    cb = corpus_band_buckets(corpus, n_hashes=16, bands=8,
                             hasher=portable_hash64)
    streamed = run_stream_over_batch(
        spark, new,
        lambda s: stream_near_dup_matches(s, cb, threshold=0.9,
                                          n_hashes=16, bands=8,
                                          hasher=portable_hash64),
        query_name="t_neardup", output_mode="append")
    got = {(r["new_id"], r["corpus_id"], r["est_jaccard"])
           for r in streamed.collect()}

    sig_new = minhash_signature_agg(new, n_hashes=16,
                                    hasher=portable_hash64)
    sig_corpus = minhash_signature_agg(corpus, n_hashes=16,
                                       hasher=portable_hash64)
    exp = {(r["new_id"], r["corpus_id"], r["est_jaccard"])
           for r in lsh_cross_pairs(sig_new, sig_corpus, n_hashes=16,
                                    bands=8).collect()
           if r["est_jaccard"] >= 0.9}
    assert got == exp
    # every verbatim copy is flagged against its source at 1.0
    for i in range(20):
        assert (10_000 + i, i, 1.0) in got


def test_running_cents_state_matches_batch_exactly(spark, events):
    """x178's operator: the final per-key update of the integer-cents
    GroupState aggregate equals the batch GROUP BY EXACTLY (no
    tolerance — integer addition is order-free across micro-batches)."""
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, running_cents_state)
    small = (events.limit(500)
             .select("event_type",
                     F.expr("CAST(FLOOR(value * 100) AS BIGINT)")
                     .alias("cents")))
    streamed = run_stream_over_batch(
        spark, small.coalesce(4), running_cents_state,
        query_name="t_cents_state", output_mode="update")
    last = {}
    for r in sorted(streamed.collect(), key=lambda r: r["n"]):
        last[r["event_type"]] = (r["total_cents"], r["n"])
    batch = {r["event_type"]: (r["tc"], r["n"])
             for r in small.groupBy("event_type")
             .agg(F.sum("cents").alias("tc"), F.count("*").alias("n"))
             .collect()}
    assert last == batch


def test_running_cents_tws_matches_batch_exactly(spark, events):
    """transformWithState twin of the x178 operator: same integer-cents
    state, exact equality (needs protobuf + RocksDB state store, like
    the running_stats_tws test above)."""
    pytest.importorskip("google.protobuf.descriptor",
                        reason="transformWithState needs protobuf")
    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch, running_cents_tws)
    small = (events.limit(500)
             .select("event_type",
                     F.expr("CAST(FLOOR(value * 100) AS BIGINT)")
                     .alias("cents")))
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key,
                   "org.apache.spark.sql.execution.streaming.state."
                   "RocksDBStateStoreProvider")
    try:
        streamed = run_stream_over_batch(
            spark, small.coalesce(4), running_cents_tws,
            query_name="t_cents_tws", output_mode="update")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    last = {}
    for r in sorted(streamed.collect(), key=lambda r: r["n"]):
        last[r["event_type"]] = (r["total_cents"], r["n"])
    batch = {r["event_type"]: (r["tc"], r["n"])
             for r in small.groupBy("event_type")
             .agg(F.sum("cents").alias("tc"), F.count("*").alias("n"))
             .collect()}
    assert last == batch
