"""Training-pipeline query surface x88-x107: lexical retrieval (BM25),
importance-weighted data selection, segment-level dedup with document
reconstruction, exact length quantiles, PMI collocations, the corpus
novelty curve, packing-efficiency report, quality-vs-dup calibration,
language confusion matrix, cross-modal integrity audit, Zipf frequency
spectrum, metadata-inconsistency audit, fixed-point PageRank over the
dup graph, the training-run manifest, and the streaming near-dup
filter executed through a real Structured Streaming query, plus
time-window conversion attribution.

Every entry has an exact DuckDB oracle (same playbook as
corpus_queries: integer surrogates where libm would diverge, identical
IEEE expression trees where doubles are unavoidable, and explicit
deterministic tie-breaks everywhere a rank appears).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hive_parse_lineage_spark.sources.loader import load_tables

BM25_TERMS = ["spark", "table", "hash", "merge"]
SEG_TOKENS = 16


def _q(fn: Callable[[SparkSession, dict], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables = load_tables(spark, sf_dir)
        return fn(spark, tables)
    return run


# ---------------------------------------------------------------------------
# Spark implementations
# ---------------------------------------------------------------------------

def _x88_bm25_topk(spark, tables):
    """BM25 top-10 per query term (log-free rational idf so the
    ranking function is IEEE-reproducible under the hash gate). One
    filtered explode + one equi-join; df and corpus stats broadcast."""
    from hive_parse_lineage_spark.operators.retrieval import bm25_term_topk
    return (bm25_term_topk(tables["documents"], BM25_TERMS, k=10)
            .orderBy("term", "rank"))


def _x89_importance_weights(spark, tables):
    """DSIR-style importance scoring for data selection: the target
    distribution is the English slice; a document's weight is the
    permille of its token OCCURRENCES whose token is over-represented
    in the target (c_en * T_all > c_all * T_en — all-integer, the
    cross-multiplied form of p_target > p_raw). Two token-count
    aggregates (map-side combined) joined back onto one explode; no
    per-row Python. The unigram-count joins are plain shuffle
    equi-joins on tok — the vocabulary is unbounded at 100 TB (1e8+
    distinct tokens), so a forced broadcast would be a driver-memory
    hazard; AQE converts them to broadcast when the vocab is actually
    small. Only the single-row ``totals`` is broadcast."""
    from hive_parse_lineage_spark.functions.text import tokens
    docs = tables["documents"]
    tk = docs.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
    c_all = tk.groupBy("tok").agg(F.count("*").alias("c_all"))
    c_en = (tk.filter(F.col("lang") == "en")
            .groupBy("tok").agg(F.count("*").alias("c_en")))
    totals = (c_all.agg(F.sum("c_all").alias("t_all"))
              .crossJoin(c_en.agg(F.sum("c_en").alias("t_en"))))
    j = (tk.join(c_all, "tok")
         .join(c_en, "tok", "left")
         .crossJoin(F.broadcast(totals))
         .withColumn("c_en", F.coalesce("c_en", F.lit(0))))
    over = (F.col("c_en") * F.col("t_all")
            > F.col("c_all") * F.col("t_en")).cast("long")
    return (j.groupBy("doc_id", "lang")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(over).alias("n_over"))
            .withColumn("over_permille",
                        F.expr("n_over * 1000 div n_tokens"))
            .select("doc_id", "lang", "n_tokens", "over_permille")
            .orderBy("doc_id"))


def _x90_segment_dedup_rebuild(spark, tables):
    """Segment-level dedup with document reconstruction: cut every
    document into non-overlapping 16-token segments, keep only the
    globally FIRST occurrence of each distinct segment (by doc_id,
    then position), and rebuild each document's surviving text — the
    'clean the corpus, keep the prose readable' operator. One shuffle
    on the segment text, one per-doc aggregate (operator:
    operators/dedup.py segment_dedup_rebuild, property-tested against
    a pure-Python reference)."""
    from hive_parse_lineage_spark.operators.dedup import segment_dedup_rebuild
    return (segment_dedup_rebuild(tables["documents"], seg_tokens=SEG_TOKENS)
            .orderBy("doc_id"))


def _x91_length_quantiles(spark, tables):
    """Exact per-language length quantiles (discrete: the value at row
    ceil(q*n), all-integer row arithmetic — no interpolation, so no
    float divergence) plus outlier counts outside [p10, p90]. One sort
    per language partition + a broadcast join of the 5-row quantile
    table back onto the corpus. 100 TB note: exact value-at-row is the
    oracle-replayable gate spelling; at scale the boundaries come from
    approx_percentile (x28/x81 pattern) and the sort disappears."""
    docs = tables["documents"]
    byl = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "lang", "n_chars", "doc_id",
        F.row_number().over(byl).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"))
    q = (ranked.groupBy("lang")
         .agg(F.max("n").alias("n_docs"),
              F.max(F.when(F.expr("rn = (n + 9) div 10"),
                           F.col("n_chars"))).alias("p10"),
              F.max(F.when(F.expr("rn = (n + 1) div 2"),
                           F.col("n_chars"))).alias("p50"),
              F.max(F.when(F.expr("rn = (9 * n + 9) div 10"),
                           F.col("n_chars"))).alias("p90")))
    j = docs.join(F.broadcast(q), "lang")
    return (j.groupBy("lang", "n_docs", "p10", "p50", "p90")
            .agg(F.sum((F.col("n_chars") < F.col("p10")).cast("long"))
                 .alias("n_below"),
                 F.sum((F.col("n_chars") > F.col("p90")).cast("long"))
                 .alias("n_above"))
            .orderBy("lang"))


def _x92_pmi_collocations(spark, tables):
    """Collocation mining: top-20 adjacent-token bigrams by lift
    = p(x,y) / (p(x)p(y)), computed as c_xy * T/c_x * T/c_y / T_bi
    * 1000 in DOUBLE with one fixed left-associated expression tree
    (multiply/divide are exactly rounded in IEEE-754, no libm — both
    engines produce bit-identical doubles; the x88 BM25 pattern). The
    earlier all-integer cross-multiplied spelling overflowed int64 at
    ~37M corpus tokens (c_xy * T^2 * 1000 > 2^63 whenever c_xy > 6),
    silently wrapping in non-ANSI Spark while DuckDB raised — the
    double form has no overflow below 1e300. Min-support floor of 5;
    the unigram-count joins are plain shuffle equi-joins on the token
    (vocab is unbounded at 100 TB — never force-broadcast it; AQE
    broadcasts when actually small); two explode→count shuffles."""
    from hive_parse_lineage_spark.functions.text import tokens
    docs = tables["documents"]
    base = docs.select("doc_id", tokens("text").alias("w"))
    uni = (base.select(F.explode("w").alias("tok"))
           .groupBy("tok").agg(F.count("*").alias("c")))
    bi = (base.filter(F.size("w") >= 2)
          .select(F.explode(F.expr(
            "transform(sequence(1, size(w) - 1), "
            "i -> struct(w[i-1] as x, w[i] as y))")).alias("p"))
          .select("p.x", "p.y")
          .groupBy("x", "y").agg(F.count("*").alias("c_xy"))
          .filter(F.col("c_xy") >= 5))
    tot = (uni.agg(F.sum("c").alias("t_all"))
           .crossJoin(bi.agg(F.sum("c_xy").alias("t_bi"))))
    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    j = (bi.join(ux, "x").join(uy, "y")
         .crossJoin(F.broadcast(tot)))
    lift = F.expr("cast(c_xy as double) * t_all / c_x * t_all / c_y "
                  "/ t_bi * 1000")
    scored = j.select("x", "y", "c_xy", lift.alias("lift_permille"))
    # top-20 via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, no global window); the rank window then runs over 20 rows
    top = scored.orderBy(F.desc("lift_permille"), F.desc("c_xy"),
                         "x", "y").limit(20)
    w = Window.orderBy(F.desc("lift_permille"), F.desc("c_xy"), "x", "y")
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "x", "y", "c_xy", "lift_permille"))


def _x93_novelty_curve(spark, tables):
    """Corpus novelty curve: split the corpus into 10 ingestion
    buckets (id-range deciles — the stand-in for a crawl-date column
    at scale) and measure, per bucket, what permille of its distinct
    per-doc 3-gram instances were already seen in an earlier bucket.
    The curve is how corpus curators decide when a crawl stops adding
    information.

    Scale shape: the bucket is ``(doc_id * 10) div (max_id + 1) + 1``
    — a codegen projection against one broadcast scalar. The first
    spelling used ``ntile(10) OVER (ORDER BY doc_id)``, which funnels
    the whole corpus through ONE partition: the scale sweep measured
    it 19× slower at 10× rows (500k docs: 310 s → ~minutes of global
    sort). The full gram-instance stream then shuffles ONCE — into the
    (g, bucket) count aggregate (map-side combined); the first-seen
    window runs over the aggregated rows (≤10 per gram) and the final
    rollup is 10 rows."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    docs = tables["documents"]
    mx = docs.agg(F.max("doc_id").alias("_mx"))
    inst = (docs.crossJoin(F.broadcast(mx))
            .select(
        F.expr("doc_id * 10 div (_mx + 1) + 1").alias("bucket"),
        F.explode(F.array_distinct(word_shingles("text", 3))).alias("g")))
    gb = inst.groupBy("g", "bucket").agg(F.count("*").alias("c"))
    per = gb.withColumn(
        "first_b", F.min("bucket").over(Window.partitionBy("g")))
    return (per.groupBy("bucket")
            .agg(F.sum("c").alias("n_grams"),
                 F.sum(F.when(F.col("first_b") < F.col("bucket"),
                              F.col("c")).otherwise(F.lit(0)))
                 .alias("n_rep"))
            .withColumn("repeated_permille",
                        F.expr("n_rep * 1000 div n_grams"))
            .select("bucket", "n_grams", "repeated_permille")
            .orderBy("bucket"))


def _x94_packing_efficiency(spark, tables):
    """Packing-efficiency report over x40's shard-local sequence
    packing: per shard, pack count, padding waste (permille of
    capacity left empty by the final partial pack) and the number of
    documents straddling a pack boundary (the ones a trainer must
    re-read across sequences). The report is what decides budget and
    shard count before a 100 TB packing run; cost = x40's one shard
    shuffle + a 4-row aggregate."""
    from hive_parse_lineage_spark.functions.text import token_count
    from hive_parse_lineage_spark.operators.sampling import pack_sequences
    budget = 512
    docs = tables["documents"].select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens"))
    packed = pack_sequences(docs, "n_tokens", budget=budget, n_shards=4,
                            shard_salt="p1")
    straddle = (F.expr(f"start_offset div {budget}")
                != F.expr(f"(start_offset + n_tokens - 1) div {budget}"))
    per = (packed.groupBy("shard")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.sum(straddle.cast("long")).alias("n_straddles")))
    return (per
            .withColumn("n_packs",
                        F.expr(f"(total_tokens + {budget - 1}) div {budget}"))
            .withColumn("waste_permille",
                        F.expr(f"(n_packs * {budget} - total_tokens) * 1000 "
                               f"div (n_packs * {budget})"))
            .select("shard", "n_docs", "total_tokens", "n_packs",
                    "n_straddles", "waste_permille")
            .orderBy("shard"))


def _x95_quality_dup_calibration(spark, tables):
    """Does the cheap quality score actually separate duplicated
    boilerplate? Per quality decile (ntile over the x03 score,
    doc_id tiebreak): rate of docs sharing their 8-token PREFIX with
    another doc (boilerplate starts — the signal exists at every SF,
    unlike whole-text exact dups, which the sf0.01 gate data doesn't
    contain). One window on the prefix, one global ntile, one
    aggregate. 100 TB note: the exact global ntile is the oracle-
    replayable spelling for the gate; the AT-SCALE path is code —
    ``SPARK_GRAFT_APPROX_QUANTILES=1`` swaps it for the
    range-partitioned exact rank + closed-form ``ntile_from_rank``
    (operators/ranks.py), VALUE-IDENTICAL and tested equal."""
    import os

    from hive_parse_lineage_spark.functions.text import quality_score
    pre = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    docs = tables["documents"].select(
        "doc_id", pre.alias("pre"), quality_score("text").alias("q"))
    dup_n = F.count("*").over(Window.partitionBy("pre"))
    base = (docs.withColumn("is_boiler", (dup_n > 1).cast("long"))
            .select("doc_id", "q", "is_boiler"))
    if os.environ.get("SPARK_GRAFT_APPROX_QUANTILES", "") == "1":
        from hive_parse_lineage_spark.operators.ranks import (
            ntile_from_rank, range_partitioned_row_number)
        scored, n_total = range_partitioned_row_number(
            base, ["q", "doc_id"], "_rk", return_total=True)
        scored = (scored
                  .withColumn("decile",
                              ntile_from_rank("_rk", n_total, 10)
                              .cast("int"))
                  .drop("_rk"))
    else:
        scored = base.select(
            "doc_id", "q", "is_boiler",
            F.ntile(10).over(Window.orderBy("q", "doc_id"))
            .alias("decile"))
    return (scored.groupBy("decile")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("is_boiler").alias("n_boiler"))
            .withColumn("boiler_permille",
                        F.expr("n_boiler * 1000 div n_docs"))
            .orderBy("decile"))


def _x97_integrity_audit(spark, tables):
    """Cross-modal dataset integrity audit: documents vs their
    embedding rows (a training shard is only usable when text and
    vectors line up). The testdata is perfectly aligned, so the audit
    perturbs in-query (drop 2% of each side by hash — SF-independent,
    both engines replay it) and must account for every id: matched /
    doc-without-embedding / embedding-without-doc. One full outer
    join on the id."""
    docs = (tables["documents"].select("doc_id")
            .filter(F.expr("doc_id % 50 != 3")))
    embs = (tables["embeddings"].select(F.col("vec_id").alias("doc_id"))
            .filter(F.expr("doc_id % 50 != 7")))
    j = (docs.withColumn("has_doc", F.lit(1))
         .join(embs.withColumn("has_emb", F.lit(1)), "doc_id", "full_outer"))
    status = (F.when(F.col("has_doc").isNull(), F.lit("embedding_without_doc"))
              .when(F.col("has_emb").isNull(), F.lit("doc_without_embedding"))
              .otherwise(F.lit("matched")))
    return (j.select(status.alias("status"))
            .groupBy("status").agg(F.count("*").alias("n"))
            .orderBy("status"))


def _x98_frequency_spectrum(spark, tables):
    """Zipf spectrum of the token distribution: frequency at ranks
    1, 2, 4, ..., 4096 plus rank*freq (constant under a perfect Zipf
    law — how vocab size and tokenizer budgets get picked). One
    count aggregate; the rank runs over only the top-4096 vocab rows
    (TakeOrderedAndProject — the max rank the spectrum reads), never a
    global window over the full vocabulary, which at web scale is
    10^8+ distinct tokens through one partition."""
    from hive_parse_lineage_spark.functions.text import tokens
    ranks = [2 ** i for i in range(13)]
    freq = (tables["documents"]
            .select(F.explode(tokens("text")).alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("freq")))
    top = freq.orderBy(F.desc("freq"), "tok").limit(max(ranks))
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("freq"), "tok")))
    return (ranked.filter(F.col("rank").isin(ranks))
            .select("rank", "tok", "freq",
                    F.expr("rank * freq").alias("rank_x_freq"))
            .orderBy("rank"))


def _x99_metadata_inconsistency(spark, tables):
    """Metadata-inconsistency audit: groups of documents sharing an
    8-token prefix (same boilerplate start) but labeled with more
    than one lang or source — the signature of mislabeled scrapes
    that poison per-language mixing. One shuffle on the prefix."""
    pre = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    return (tables["documents"]
            .select(pre.alias("pre"), "lang", "source")
            .groupBy("pre")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.countDistinct("source").alias("n_sources"))
            .filter((F.col("n_docs") > 1)
                    & ((F.col("n_langs") > 1) | (F.col("n_sources") > 1)))
            .orderBy("pre"))


def _x96_lang_confusion(spark, tables):
    """Confusion matrix of the declared lang label vs the x02
    stopword-heuristic language ID — the curation QA table that says
    which language pairs the cheap filter confuses. Pure codegen
    projection + one small aggregate."""
    from hive_parse_lineage_spark.functions.text import language_id
    return (tables["documents"]
            .select("lang", language_id("text").alias("pred_lang"))
            .groupBy("lang", "pred_lang")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("lang", "pred_lang"))


def _x100_dup_pagerank(spark, tables):
    """Fixed-point PageRank over the near-dup graph (x46's edges):
    ranks the boilerplate HUBS — documents whose text radiates through
    the most duplication mass, the first ones a curator inspects.
    Integer ppm arithmetic, 2 synchronous rounds; the oracle unrolls
    the identical rounds over the identical LSH edge oracle."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    from hive_parse_lineage_spark.operators.graph import pagerank_fixed_point
    docs = tables["documents"]
    edges = (minhash_near_dups(docs, threshold=0.3, n_hashes=64, bands=16,
                               shingle_k=2, hasher=portable_hash64,
                               max_bucket_size=None)
             .select("id_a", "id_b"))
    vertices = docs.select(F.col("doc_id").alias("vertex"))
    return (pagerank_fixed_point(edges, vertices, rounds=2)
            .orderBy("vertex"))


def _x101_training_manifest(spark, tables):
    """The training-run manifest: per (split, source), document and
    token counts plus each source's permille share of its split's
    tokens — the provenance record shipped next to every assembled
    corpus (x39's deterministic hash split; zero-shuffle split
    assignment, one rollup, one 3-partition window over the tiny
    aggregate)."""
    from hive_parse_lineage_spark.functions.text import token_count
    from hive_parse_lineage_spark.operators.sampling import hash_split
    docs = hash_split(tables["documents"], id_col="doc_id", salt="v1")
    per = (docs.select("split", "source",
                       token_count("text").cast("long").alias("n_tok"))
           .groupBy("split", "source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tok").alias("n_tokens")))
    tot = F.sum("n_tokens").over(Window.partitionBy("split"))
    return (per.withColumn("_t", tot)
            .withColumn("share_permille",
                        F.expr("n_tokens * 1000 div _t"))
            .select("split", "source", "n_docs", "n_tokens",
                    "share_permille")
            .orderBy("split", "source"))


def _x102_stream_neardup(spark, tables):
    """The streaming surface under the exact hash gate: the arriving
    batch (doc_id >= 400, 4 micro-batches through a REAL Structured
    Streaming query — parquet source, memory sink) is near-dup-matched
    against the static corpus's LSH buckets via the stateless
    stream-static join (streaming/neardup.py), and the streamed output
    must hash-match the batch SQL oracle (the x07 LSH oracle filtered
    to cross pairs). Band-collision duplicate rows are deduped batch-
    side on the sink table — exactly where an idempotent production
    sink would. Each micro-batch is repartitioned to the session's
    default parallelism before signing (result-identical — see
    stream_near_dup_matches: without it the collision-verify stage
    runs on the arriving file's 1-2 splits and the sf1.0 replay blows
    the 300 s watchdog; with it the same replay takes ~77 s)."""
    import uuid

    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.streaming.neardup import (
        corpus_band_buckets, stream_near_dup_matches)
    from hive_parse_lineage_spark.streaming.windows import run_stream_over_batch
    docs = tables["documents"]
    corpus = docs.filter(F.col("doc_id") < 400).select("doc_id", "text")
    new = (docs.filter(F.col("doc_id") >= 400).select("doc_id", "text")
           .coalesce(4))
    cb = corpus_band_buckets(corpus, n_hashes=64, bands=16, shingle_k=2,
                             hasher=portable_hash64, max_bucket_size=None)
    par = spark.sparkContext.defaultParallelism
    sink = run_stream_over_batch(
        spark, new,
        lambda s: stream_near_dup_matches(s, cb, threshold=0.5, n_hashes=64,
                                          bands=16, shingle_k=2,
                                          hasher=portable_hash64,
                                          repartition=par),
        query_name=f"x102_{uuid.uuid4().hex[:8]}", output_mode="append")
    return (sink.dropDuplicates(["new_id", "corpus_id"])
            .orderBy("new_id", "corpus_id"))


def _x103_conversion_window(spark, tables):
    """Time-constrained conversion funnel: per user, the FIRST view
    whose next purchase lands within 1 hour, rolled up per view-day
    with integer average latency. Unlike x48's order-only funnel this
    is the time-window attribution semantic.

    Scale shape: NO view×purchase join — one per-user window pass
    (ORDER BY ts DESC: running MIN over purchase timestamps =
    'earliest purchase at-or-after me' for every view), then a
    keep-first window and a tiny per-day rollup. Total order
    (ts, event_id) makes the frame engine-exact."""
    e = (tables["events"]
         .filter(F.col("event_type").isin("view", "purchase"))
         .select("user_id", "event_id", "ts", "event_type"))
    w_next = (Window.partitionBy("user_id")
              .orderBy(F.desc("ts"), F.desc("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    nxt = F.min(F.when(F.col("event_type") == "purchase",
                       F.col("ts"))).over(w_next)
    tagged = e.withColumn("p_ts", nxt)
    conv = (tagged.filter(F.col("event_type") == "view")
            .filter(F.col("p_ts").isNotNull())
            .withColumn("lat_us", F.unix_micros("p_ts") - F.unix_micros("ts"))
            .filter(F.col("lat_us") <= 3_600_000_000))
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (conv.withColumn("_rn", F.row_number().over(w_first))
             .filter(F.col("_rn") == 1))
    return (first.select(F.to_date("ts").alias("day"), "lat_us")
            .groupBy("day")
            .agg(F.count("*").alias("n_conversions"),
                 F.expr("sum(lat_us) div count(*) div 1000000")
                 .alias("avg_latency_sec"))
            .orderBy("day"))


CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_PROBES = ["spark", "table", "hash", "merge", "the", "a",
              "window", "batch", "scan", "slow"]


def _x104_cms_heavy_hitters(spark, tables):
    """Count-Min sketch over the token stream, with per-probe error
    accounting against exact counts. The sketch is the fixed-size
    (depth×width = 1024 cells) map-side-combinable counting structure
    a 100 TB pipeline uses when per-key exact counts don't fit — and
    because CMS is DETERMINISTIC given its hash functions (portable
    salted hash mod width), the whole estimate sits under the value
    hash gate, unlike HLL whose register layout is engine-private.
    One aggregate to 1024 cells (broadcast), probes join the sketch;
    est >= exact always (CMS never undercounts)."""
    from hive_parse_lineage_spark.functions.text import portable_hash64, tokens
    docs = tables["documents"]
    tok = docs.select(F.explode(tokens("text")).alias("tok"))
    rows = tok.select("tok", F.explode(F.array(
        *[F.lit(j) for j in range(CMS_DEPTH)])).alias("j"))
    cell = F.pmod(portable_hash64(
        F.concat(F.col("j").cast("string"), F.lit("#"), F.col("tok"))),
        F.lit(CMS_WIDTH))
    cms = (rows.select("j", cell.alias("cell"))
           .groupBy("j", "cell").agg(F.count("*").alias("c")))
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES],
                                   "tok string")
    pj = probes.select("tok", F.explode(F.array(
        *[F.lit(j) for j in range(CMS_DEPTH)])).alias("j"))
    pcell = F.pmod(portable_hash64(
        F.concat(F.col("j").cast("string"), F.lit("#"), F.col("tok"))),
        F.lit(CMS_WIDTH))
    est = (pj.select("tok", "j", pcell.alias("cell"))
           .join(F.broadcast(cms), ["j", "cell"], "left")
           .withColumn("c", F.coalesce("c", F.lit(0)))
           .groupBy("tok").agg(F.min("c").alias("est")))
    exact = (tok.groupBy("tok").agg(F.count("*").alias("exact"))
             .filter(F.col("tok").isin(CMS_PROBES)))
    return (est.join(exact, "tok", "left")
            .withColumn("exact", F.coalesce("exact", F.lit(0)))
            .withColumn("overcount", F.col("est") - F.col("exact"))
            .select("tok", "est", "exact", "overcount")
            .orderBy("tok"))


PP_T_NUM, PP_T_DEN = 3, 5      # Jaccard threshold 0.6 as a rational


def _x105_ppjoin_exact(spark, tables):
    """EXACT set-similarity self-join (3-shingle Jaccard >= 0.6) via
    PPJoin-style prefix filtering — the no-false-negative counterpart
    to MinHash-LSH (x07): candidates must share an element among each
    document's RAREST p = n - ceil(t*n) + 1 distinct shingles
    (global-frequency order, tie-broken by hashed-shingle value —
    portable), pruned by PPJoin's positional filter (earliest shared
    prefix token bounds the reachable overlap), then exact
    verification by all-integer cross-multiplication
    (DEN*|∩| >= NUM*(n_a + n_b - |∩|)). Where LSH trades recall for
    speed, prefix + positional filtering is exact: every qualifying
    pair survives.

    Shingles are folded to 60-bit ``portable_hash64`` BIGINTs at the
    explode (the oracle replays the same fold): every downstream
    stage — the df groupBy, the frequency-order sort, the prefix
    equi-join, and the array_intersect verify — then compares 8-byte
    ints instead of ~25-byte shingle strings, which halved the sf0.1
    wall (6.2 s -> ~3.2 s). Set semantics are over hashed shingles
    (a within-doc 60-bit collision could merge two shingles; at
    n~10^4 distinct shingles/doc the probability is ~1e-10, and the
    oracle sees the identical sets either way).

    Scale shape: the join key is prefix shingles only — rare by
    construction, so candidate fanout stays bounded where a full
    shingle join would explode on boilerplate; verification is one
    count aggregate over the candidate pairs' shared distinct
    shingles. The shingle-frequency table and the per-doc size tables
    are shuffle equi-joins, NOT forced broadcasts — freq is
    shingle-vocabulary-sized and na/nb are |docs|-sized, both
    corpus-proportional at 100 TB; AQE broadcasts them when they are
    genuinely small. The shingle stream ``dt`` and the
    frequency-ordered per-doc lists are each MATERIALIZED once
    (localCheckpoint): ``dt`` feeds the frequency table and the
    ordered lists, the ordered lists feed prefix generation and both
    verification probes, and Spark only reuses identical *exchanges*,
    not scan+explode subtrees — unmaterialized, the explode ran 4x
    (7.3 s vs ~3 s at sf0.1). Every published distributed PPJoin
    makes the same call: the ordered prefix lists are the index you
    build once and probe; at cluster scale the same two
    materializations are DISK_ONLY persists, corpus-linear in size."""
    from hive_parse_lineage_spark.functions.text import (
        portable_hash64, word_shingles)
    # The sf* documents parquet is a single small file — without the
    # repartition the explode/checkpoint runs on 1 core (the scan's
    # one split); at 100 TB the scan is already thousands of splits
    # and the repartition is a no-op cost-wise.
    docs = tables["documents"].repartition(
        spark.sparkContext.defaultParallelism)
    dt = (docs.select("doc_id",
                      F.explode(F.array_distinct(F.transform(
                          word_shingles("text", 3),
                          lambda s: portable_hash64(s)))).alias("tok"))
          .localCheckpoint())
    freq = dt.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (dt.join(freq, "tok")
               .groupBy("doc_id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("df", "tok"))),
                   lambda s: s.tok).alias("toks"))
               .withColumn("n", F.size("toks").cast("bigint"))
               .localCheckpoint())
    # p = n - ceil(t*n) + 1 ; ceil(t*n) = (NUM*n + DEN - 1) div DEN.
    # posexplode keeps each prefix token's 0-based POSITION in the
    # frequency-ordered list for the positional filter below.
    prefix = (ordered
              .select("doc_id", "n",
                      F.posexplode(F.slice(
                          "toks", 1,
                          F.expr(f"n - ((({PP_T_NUM} * n + {PP_T_DEN - 1}) "
                                 f"div {PP_T_DEN})) + 1").cast("int"))))
              .withColumnsRenamed({"pos": "p", "col": "tok"}))
    # Length filter (lossless): Jaccard >= t forces t*max(n) <= min(n).
    # PPJoin POSITIONAL filter (also lossless): both lists share the
    # one global (df, tok) order, so a pair's earliest common token is
    # the match minimizing both positions (any earlier common token
    # would itself be a prefix-join match), and total overlap is
    # bounded by 1 + min(tokens after it on each side). Jaccard >= t
    # needs i*(DEN+NUM) >= NUM*(n_a+n_b); pairs whose bound can't
    # reach that are pruned BEFORE the verify joins — on the sf0.1
    # corpus this cuts candidates 193k -> 69k and the wall ~5 s ->
    # ~3 s (the dedup groupBy replaces the old distinct(): same one
    # shuffle, plus the per-pair min-position aggregate for free).
    cand = (prefix.alias("a")
            .join(prefix.alias("b"),
                  (F.col("a.tok") == F.col("b.tok"))
                  & (F.col("a.doc_id") < F.col("b.doc_id"))
                  & (F.lit(PP_T_DEN) * F.col("a.n")
                     >= F.lit(PP_T_NUM) * F.col("b.n"))
                  & (F.lit(PP_T_DEN) * F.col("b.n")
                     >= F.lit(PP_T_NUM) * F.col("a.n")))
            .groupBy(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
            .agg(F.min("a.p").alias("pa"), F.min("b.p").alias("pb"),
                 F.first("a.n").alias("na"), F.first("b.n").alias("nb"))
            .filter(F.expr(
                f"(1 + least(na - 1 - pa, nb - 1 - pb)) "
                f"* {PP_T_DEN + PP_T_NUM} >= {PP_T_NUM} * (na + nb)"))
            .select("id_a", "id_b"))
    # Verification: |∩| as array_intersect on the per-doc DISTINCT
    # shingle arrays — two doc-keyed equi-joins of the (small)
    # candidate set against the already-materialized ordered lists,
    # instead of re-shuffling the whole token stream twice and
    # count-aggregating it (the r6 spelling's residual cost: three
    # chained shingle-stream shuffles, 6.97 s at sf0.1; this one is
    # candidate-proportional and runs ~2x faster). AQE broadcasts the
    # candidate side when it is genuinely small; per-pair cost is
    # O(n_a + n_b) inside codegen.
    verified = (cand
                .join(ordered.select(F.col("doc_id").alias("id_a"),
                                     F.col("toks").alias("toks_a"),
                                     F.col("n").alias("n_a")), "id_a")
                .join(ordered.select(F.col("doc_id").alias("id_b"),
                                     F.col("toks").alias("toks_b"),
                                     F.col("n").alias("n_b")), "id_b")
                .withColumn("i", F.size(F.array_intersect(
                    "toks_a", "toks_b")).cast("bigint")))
    return (verified
            .filter(F.expr(f"{PP_T_DEN} * i >= {PP_T_NUM} * (n_a + n_b - i)"))
            .withColumn("jaccard_permille",
                        F.expr("i * 1000 div (n_a + n_b - i)"))
            .select("id_a", "id_b", "i", "n_a", "n_b", "jaccard_permille")
            .orderBy("id_a", "id_b"))


def _x106_event_transitions(spark, tables):
    """Per-user event-type transition counts (the first-order Markov
    prior a session model trains against): for every consecutive
    event pair in each user's (ts, event_id)-ordered stream, count
    (from_type, to_type) corpus-wide, with permille share of each
    from_type's outgoing mass. One LEAD window over the user
    partitioning + one small aggregate."""
    e = tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    pairs = (e.select("user_id", "ts", "event_id", "event_type")
             .withColumn("to_type", nxt)
             .filter(F.col("to_type").isNotNull())
             .groupBy(F.col("event_type").alias("from_type"), "to_type")
             .agg(F.count("*").alias("n")))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return (pairs.withColumn("_t", tot)
            .select("from_type", "to_type", "n",
                    F.expr("n * 1000 div _t").alias("share_permille"))
            .orderBy("from_type", "to_type"))


def _x107_langid_kappa(spark, tables):
    """Cohen's kappa between the declared lang label and the x02
    heuristic prediction — agreement beyond chance, as an ALL-INTEGER
    permille: kappa = (po - pe) / (1 - pe) cross-multiplied to
    (diag*N - sum_i(row_i*col_i)) * 1000 div (N*N - sum_i(row_i*col_i)).
    Degenerate guard: when labels and predictions each collapse to a
    single identical class, pe_num = N^2 and the denominator is zero —
    kappa is undefined; both engines return 0 via an explicit CASE
    (Spark div would yield NULL while DuckDB // errors, so the guard
    keeps the engines aligned). Overflow bound: the N*N term caps the
    all-integer spelling at N <= ~3e9 docs; beyond that compute kappa
    in double (the x92 pattern). The one-number QA gate for the cheap
    filter; a confusion-matrix aggregate plus driver-free integer
    arithmetic over 5 classes."""
    from hive_parse_lineage_spark.functions.text import language_id
    m = (tables["documents"]
         .select("lang", language_id("text").alias("pred"))
         .groupBy("lang", "pred").agg(F.count("*").alias("c")))
    diag = F.sum(F.when(F.col("lang") == F.col("pred"), F.col("c"))
                 .otherwise(F.lit(0))).alias("diag")
    n = F.sum("c").alias("n")
    rows_ = m.groupBy("lang").agg(F.sum("c").alias("r"))
    cols_ = m.groupBy("pred").agg(F.sum("c").alias("col"))
    pe_num = (rows_.join(cols_, rows_["lang"] == cols_["pred"])
              .agg(F.sum(F.col("r") * F.col("col")).alias("pe_num")))
    base = m.agg(diag, n)
    return (base.crossJoin(F.broadcast(pe_num))
            .withColumn("pe_num", F.coalesce("pe_num", F.lit(0)))
            .select("n", "diag", "pe_num",
                    F.expr("CASE WHEN n * n = pe_num THEN CAST(0 AS BIGINT) "
                           "ELSE (diag * n - pe_num) * 1000 "
                           "div (n * n - pe_num) END").alias("kappa_permille")))


def _x111_stream_hourly_rollup(spark, tables):
    """STATEFUL streaming aggregation under the exact hash gate
    (x102's stream-static join is stateless; this is the other half of
    the streaming story): the event stream runs through a REAL
    Structured Streaming query — parquet source in 4 micro-batches,
    tumbling 1-hour event-time windows per event_type, complete-mode
    memory sink — and the final sink table must hash-match the batch
    GROUP BY oracle. Complete mode makes the final table equal the
    batch aggregate by definition, so the gate checks the cross-
    micro-batch state merging, not watermark-closure timing. Sums
    stay order-free by aggregating the integer surrogate
    floor(value*100) — a double SUM's addition order differs between
    a 4-micro-batch state merge and a batch scan, an IEEE divergence
    the gate would catch. State is O(windows × event_types) — bounded
    by time span and type cardinality, never by event count."""
    import uuid

    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch)
    e = tables["events"].select("ts", "event_type", "value").coalesce(4)

    def agg(s):
        return (s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count("*").alias("n"),
                     F.sum(F.floor(F.col("value") * 100).cast("long"))
                     .alias("sv100"))
                .select(F.col("w.start").alias("w"), "event_type",
                        "n", "sv100"))

    sink = run_stream_over_batch(
        spark, e, agg, query_name=f"x111_{uuid.uuid4().hex[:8]}",
        output_mode="complete")
    return sink.orderBy("w", "event_type")


def _x112_stream_dedup_admission(spark, tables):
    """Streaming exact-dedup admission under the hash gate: the event
    stream (4 real micro-batches) passes through streaming
    ``dropDuplicates`` on (user_id, event_type) with an append-mode
    memory sink — each key's FIRST arrival is admitted, every later
    one is dropped mid-stream — and the admitted key set must
    hash-match batch SELECT DISTINCT. Projecting the output to the
    dedup keys themselves makes the result arrival-order-free. State
    is O(distinct keys) — bounded by key-domain cardinality
    (users × 5 types), never by stream length; for an UNBOUNDED key
    domain the production swap is dropDuplicatesWithinWatermark
    (bounded state, at-most-once per watermark span), which this gate
    spelling can't use because re-admission timing isn't
    batch-replayable."""
    import uuid

    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch)
    e = tables["events"].select("ts", "user_id", "event_type").coalesce(4)

    def dedup(s):
        return (s.dropDuplicates(["user_id", "event_type"])
                .select("user_id", "event_type"))

    sink = run_stream_over_batch(
        spark, e, dedup, query_name=f"x112_{uuid.uuid4().hex[:8]}",
        output_mode="append")
    return sink.orderBy("user_id", "event_type")


def _x113_split_ks_drift(spark, tables):
    """Two-sample Kolmogorov-Smirnov statistic between the train and
    val splits' length distributions — 'did the hash split produce
    distribution-identical partitions?', the QA gate a split ships
    with (x84 checks content leakage; this checks covariate drift).
    ALL-INTEGER: D = max_v |F_train(v) - F_val(v)| cross-multiplied to
    max |cum_a*n_b - cum_b*n_a| * 1000 div (n_a*n_b); a double CDF
    would hit libm-free but order-sensitive accumulation. The
    running-total window runs over the n_chars HISTOGRAM (value
    cardinality, never corpus rows — the x93 audit rule); one
    histogram aggregate + one single-row total, broadcast. Overflow:
    cum*n caps the integer spelling at ~3e9 rows per split (x107
    note); beyond that, doubles (x92 pattern)."""
    from hive_parse_lineage_spark.operators.sampling import hash_split
    two = (hash_split(tables["documents"], salt="v1")
           .filter(F.col("split").isin("train", "val")))
    hist = (two.groupBy("n_chars")
            .agg(F.sum((F.col("split") == "train").cast("long")).alias("a"),
                 F.sum((F.col("split") == "val").cast("long")).alias("b")))
    w = (Window.partitionBy().orderBy("n_chars")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = hist.select(F.sum("a").over(w).alias("ca"),
                      F.sum("b").over(w).alias("cb"))
    tot = hist.agg(F.sum("a").alias("n_a"), F.sum("b").alias("n_b"))
    return (cum.crossJoin(F.broadcast(tot))
            .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
                 F.max(F.abs(F.col("ca") * F.col("n_b")
                             - F.col("cb") * F.col("n_a"))).alias("d_num"))
            .select("n_a", "n_b",
                    F.expr("CASE WHEN n_a = 0 OR n_b = 0 "
                           "THEN CAST(1000 AS BIGINT) "
                           "ELSE d_num * 1000 div (n_a * n_b) END")
                    .alias("ks_permille")))


KMV_K = 64
KMV_M = 1 << 60          # portable_hash64 range: [0, 2^60)


def _x108_kmv_distinct(spark, tables):
    """Per-source distinct-token cardinality via a K-Minimum-Values
    sketch (Bar-Yossef et al.) with exact error accounting — the
    distinct-count sketch family's HASH-GATE-CHECKABLE member, the way
    x104's Count-Min is for frequency (Spark's approx_count_distinct
    HLL is engine-private and can never be oracled). Estimator: with
    h_k = the k-th smallest distinct 60-bit portable hash of the
    source's tokens, est = (k-1) * 2^60 / h_k, computed in DOUBLE with
    one fixed multiply-then-divide tree (exactly rounded IEEE ops —
    bit-identical across engines; the all-integer form overflows int64
    when h_k is small). Sources with fewer than k distinct hashes ARE
    the exact set (est = n_hashes). Estimate is over distinct HASHES
    on both engines, exact count over distinct tokens, so hash
    collisions land in the measured error, not in a gate divergence.

    Scale shape: one distinct-pair aggregate, then rn <= k under a
    per-source window — Spark's WindowGroupLimit pushes the rank
    filter below the shuffle, so each map task ships at most k hashes
    per source: a per-partition top-k merge, exactly how a production
    KMV union works. Nothing vocabulary-sized is sorted, collected,
    or broadcast."""
    from hive_parse_lineage_spark.functions.text import (
        portable_hash64, tokens)
    docs = tables["documents"]
    dt = (docs.select("source", F.explode(tokens("text")).alias("tok"))
          .distinct())
    hashes = (dt.select("source", portable_hash64(F.col("tok")).alias("h"))
              .distinct())
    w = Window.partitionBy("source").orderBy("h")
    topk = (hashes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .groupBy("source")
            .agg(F.count("*").alias("n_h"),
                 F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("hk")))
    exact = dt.groupBy("source").agg(F.count("*").alias("exact_distinct"))
    est = F.expr(f"CASE WHEN hk IS NULL THEN CAST(n_h AS DOUBLE) "
                 f"ELSE CAST({KMV_K - 1} AS DOUBLE) * {KMV_M} / hk END")
    return (topk.join(exact, "source")
            .withColumn("est", est)
            .select("source", "exact_distinct", "est",
                    F.expr("abs(est - exact_distinct) * 1000 "
                           "/ exact_distinct").alias("err_permille"))
            .orderBy("source"))


def _x109_key_skew_report(spark, tables):
    """Pre-flight shuffle-skew diagnosis for a prospective groupBy/join
    key: per key column (events.event_type, documents.source), the key
    count, row total, the hottest key's load share, and an all-integer
    Gini coefficient of the per-key load distribution — the one-table
    answer to 'will this key need the x52/x70 salting path?'. Gini
    over ascending per-key counts c_1..c_n (ties broken by key text):
    G = (2*sum(i*c_i) - (n+1)*sum(c_i)) * 1000 div (n * sum(c_i)).
    Plan: one per-key count aggregate per dimension (map-side
    combined), then a window + final aggregate over the KEY table
    (n_keys rows, not corpus rows) — the corpus is scanned once per
    dimension and never reshuffled."""
    def report(df, col, dim):
        counts = (df.groupBy(F.col(col).alias("key"))
                  .agg(F.count("*").alias("c")))
        w = Window.partitionBy().orderBy("c", "key")
        ranked = counts.select(
            "c", F.row_number().over(w).alias("i"))
        return (ranked.agg(
            F.lit(dim).alias("dim"),
            F.count("*").alias("n_keys"),
            F.sum("c").alias("total_rows"),
            F.max("c").alias("top1_rows"),
            F.sum(F.col("i") * F.col("c")).alias("_ic"))
            .select(
                "dim", "n_keys", "total_rows",
                F.expr("top1_rows * 1000 div total_rows")
                .alias("top1_share_permille"),
                F.expr("(2 * _ic - (n_keys + 1) * total_rows) * 1000 "
                       "div (n_keys * total_rows)").alias("gini_permille")))
    return (report(tables["events"], "event_type", "events.event_type")
            .unionByName(report(tables["documents"], "source",
                                "documents.source"))
            .orderBy("dim"))


def _x110_quality_auc(spark, tables):
    """Exact ROC-AUC of a cheap score against a pipeline label via the
    Mann-Whitney rank-sum, ALL-INTEGER including tie handling — here:
    does document length (n_chars) predict exact-duplicate membership
    (md5-text appears >= 2 times)? The one-number companion to x95's
    calibration deciles. Tie-averaged ranks stay integral by working
    in doubled ranks: every row with score s has
    2*rank = 2*(#rows below s) + (#rows at s) + 1, so
    sum_pos(2*rank) = sum_s pos_s * (2*cum_s + cnt_s + 1) and
    auc_permille = (sum_pos2rank - n_pos*(n_pos+1)) * 1000
    div (2 * n_pos * n_neg). CASE-guards return 500 (chance) when
    either class is empty (x107 lesson: guard the degenerate
    denominator identically on both engines). Overflow bound:
    doubled ranks cap the integer spelling at ~2e9 rows; beyond that
    compute the ratio in double (x92 pattern).

    Plan: one md5 count aggregate for the label, one per-SCORE-VALUE
    aggregate, then the running-total window runs over the score
    HISTOGRAM (distinct n_chars values — bounded by value cardinality,
    never corpus rows; the x93 global-window audit rule)."""
    docs = tables["documents"]
    dup = (docs.withColumn("h", F.md5("text"))
           .withColumn("n_copies",
                       F.count("*").over(Window.partitionBy("h")))
           .select("n_chars",
                   (F.col("n_copies") >= 2).cast("long").alias("pos")))
    hist = (dup.groupBy("n_chars")
            .agg(F.count("*").alias("cnt"), F.sum("pos").alias("pos")))
    w = (Window.partitionBy().orderBy("n_chars")
         .rowsBetween(Window.unboundedPreceding, -1))
    scored = hist.select(
        "cnt", "pos",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum"))
    agg = scored.agg(
        F.sum(F.col("pos") * (2 * F.col("cum") + F.col("cnt") + 1))
        .alias("pos2rank"),
        F.sum("pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).alias("n_neg"))
    return agg.select(
        "n_pos", "n_neg",
        F.expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(500 AS BIGINT) "
               "ELSE (pos2rank - n_pos * (n_pos + 1)) * 1000 "
               "div (2 * n_pos * n_neg) END").alias("auc_permille"))


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_IMPORTANCE_ORACLE = """
WITH tk AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
), c_all AS (
  SELECT tok, COUNT(*) AS c_all FROM tk GROUP BY tok
), c_en AS (
  SELECT tok, COUNT(*) AS c_en FROM tk WHERE lang = 'en' GROUP BY tok
), tot AS (
  SELECT (SELECT CAST(SUM(c_all) AS BIGINT) FROM c_all) AS t_all,
         (SELECT CAST(SUM(c_en) AS BIGINT) FROM c_en) AS t_en
)
SELECT tk.doc_id, tk.lang, COUNT(*) AS n_tokens,
       (CAST(SUM(CASE WHEN COALESCE(c_en.c_en, 0) * tot.t_all
                           > c_all.c_all * tot.t_en
                      THEN 1 ELSE 0 END) AS BIGINT) * 1000)
           // COUNT(*) AS over_permille
FROM tk JOIN c_all USING (tok) LEFT JOIN c_en USING (tok) CROSS JOIN tot
GROUP BY tk.doc_id, tk.lang
ORDER BY tk.doc_id
"""

_SEGMENT_REBUILD_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), segs AS (
  SELECT doc_id,
         unnest(range(0, (len(w) + {SEG_TOKENS - 1}) // {SEG_TOKENS}))
             AS seg_idx,
         unnest(list_transform(
             range(0, (len(w) + {SEG_TOKENS - 1}) // {SEG_TOKENS}),
             i -> array_to_string(
                 list_slice(w, CAST(i AS INT) * {SEG_TOKENS} + 1,
                            CAST(i AS INT) * {SEG_TOKENS} + {SEG_TOKENS}),
                 ' '))) AS seg
  FROM w
), kept AS (
  SELECT doc_id, seg_idx, seg,
         ROW_NUMBER() OVER (PARTITION BY seg
                            ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id, COUNT(*) AS n_kept,
       string_agg(seg, ' ' ORDER BY seg_idx) AS rebuilt
FROM kept WHERE rn = 1
GROUP BY doc_id ORDER BY doc_id
"""

_LENGTH_QUANTILES_ORACLE = """
WITH ranked AS (
  SELECT lang, n_chars, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
), q AS (
  SELECT lang, MAX(n) AS n_docs,
         MAX(CASE WHEN rn = (n + 9) // 10 THEN n_chars END) AS p10,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50,
         MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90
  FROM ranked GROUP BY lang
)
SELECT d.lang, q.n_docs, q.p10, q.p50, q.p90,
       CAST(SUM(CASE WHEN d.n_chars < q.p10 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_below,
       CAST(SUM(CASE WHEN d.n_chars > q.p90 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above
FROM documents d JOIN q USING (lang)
GROUP BY d.lang, q.n_docs, q.p10, q.p50, q.p90
ORDER BY d.lang
"""

_PMI_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), uni AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT unnest(w) AS tok FROM w) GROUP BY tok
), bi AS (
  SELECT x, y, COUNT(*) AS c_xy FROM (
    SELECT unnest(list_slice(w, 1, len(w) - 1)) AS x,
           unnest(list_slice(w, 2, len(w))) AS y
    FROM w WHERE len(w) >= 2
  )
  GROUP BY x, y HAVING COUNT(*) >= 5
), tot AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS t_all,
         (SELECT CAST(SUM(c_xy) AS BIGINT) FROM bi) AS t_bi
), scored AS (
  SELECT bi.x, bi.y, bi.c_xy,
         CAST(bi.c_xy AS DOUBLE) * tot.t_all / ux.c * tot.t_all / uy.c
             / tot.t_bi * 1000 AS lift_permille
  FROM bi JOIN uni ux ON bi.x = ux.tok JOIN uni uy ON bi.y = uy.tok
  CROSS JOIN tot
)
SELECT ROW_NUMBER() OVER (ORDER BY lift_permille DESC, c_xy DESC, x, y)
           AS rank,
       x, y, c_xy, lift_permille
FROM scored
ORDER BY lift_permille DESC, c_xy DESC, x, y
LIMIT 20
"""


def _packing_efficiency_oracle_sql(budget: int = 512, n_shards: int = 4,
                                   salt: str = "p1") -> str:
    """x94: the x40 packing replay (same hash shard, same running
    sum), then per-shard capacity/waste/straddle arithmetic."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql(f"'{salt}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         {h} % {n_shards} AS shard
  FROM documents
), c AS (
  SELECT doc_id, n_tokens, shard,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS start_offset
  FROM d
), per AS (
  SELECT shard, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN start_offset // {budget}
                       != (start_offset + n_tokens - 1) // {budget}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_straddles
  FROM c GROUP BY shard
)
SELECT shard, n_docs, total_tokens,
       (total_tokens + {budget - 1}) // {budget} AS n_packs,
       n_straddles,
       (((total_tokens + {budget - 1}) // {budget}) * {budget}
            - total_tokens) * 1000
           // (((total_tokens + {budget - 1}) // {budget}) * {budget})
           AS waste_permille
FROM per ORDER BY shard
"""


_QUALITY_DUP_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         array_to_string(list_slice(toks, 1, 8), ' ') AS pre,
         len(toks) AS n,
         len(list_distinct(toks)) AS nd,
         list_aggregate(list_transform(toks, x -> length(x)), 'sum')
             AS total_len
  FROM t
), q AS (
  SELECT doc_id, pre,
         ROUND( (nd / n) * 0.5
              + (CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 ELSE 0.5 END) * 0.25
              + (CASE WHEN total_len / n >= 2.0 AND total_len / n <= 12.0
                      THEN 1.0 ELSE 0.5 END) * 0.25, 4) AS q
  FROM m
), s AS (
  SELECT doc_id, q,
         CASE WHEN COUNT(*) OVER (PARTITION BY pre) > 1
              THEN 1 ELSE 0 END AS is_boiler,
         NTILE(10) OVER (ORDER BY q, doc_id) AS decile
  FROM q
)
SELECT decile, COUNT(*) AS n_docs,
       CAST(SUM(is_boiler) AS BIGINT) AS n_boiler,
       (CAST(SUM(is_boiler) AS BIGINT) * 1000) // COUNT(*) AS boiler_permille
FROM s GROUP BY decile ORDER BY decile
"""


_INTEGRITY_ORACLE = """
WITH d AS (
  SELECT doc_id, 1 AS has_doc FROM documents WHERE doc_id % 50 != 3
), e AS (
  SELECT vec_id AS doc_id, 1 AS has_emb FROM embeddings
  WHERE vec_id % 50 != 7
), j AS (
  SELECT CASE WHEN d.has_doc IS NULL THEN 'embedding_without_doc'
              WHEN e.has_emb IS NULL THEN 'doc_without_embedding'
              ELSE 'matched' END AS status
  FROM d FULL OUTER JOIN e USING (doc_id)
)
SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status
"""


_SPECTRUM_ORACLE = f"""
WITH f AS (
  SELECT tok, COUNT(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
), r AS (
  SELECT tok, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank
  FROM f
)
SELECT rank, tok, freq, rank * freq AS rank_x_freq
FROM r WHERE rank IN ({", ".join(str(2 ** i) for i in range(13))})
ORDER BY rank
"""


_METADATA_INCONSISTENCY_ORACLE = """
SELECT array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS pre,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY pre
HAVING COUNT(*) > 1
   AND (COUNT(DISTINCT lang) > 1 OR COUNT(DISTINCT source) > 1)
ORDER BY pre
"""


def _lang_confusion_oracle_sql() -> str:
    from hive_parse_lineage_spark.extra_queries import _SW
    return f"""
WITH s AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), sc AS (
  SELECT lang,
         len(list_intersect(toks, [{_SW['de']}])) AS s_de,
         len(list_intersect(toks, [{_SW['en']}])) AS s_en,
         len(list_intersect(toks, [{_SW['es']}])) AS s_es,
         len(list_intersect(toks, [{_SW['fr']}])) AS s_fr,
         len(list_intersect(toks, [{_SW['zh']}])) AS s_zh
  FROM s
), p AS (
  SELECT lang,
         CASE WHEN s_de >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_en >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
              WHEN s_es >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
              WHEN s_fr >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
              ELSE 'zh' END AS pred_lang
  FROM sc
)
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


_EVENT_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY event_type, to_type
)
SELECT from_type, to_type, n,
       (n * 1000) // SUM(n) OVER (PARTITION BY from_type)
           AS share_permille
FROM pairs ORDER BY from_type, to_type
"""


def _kmv_distinct_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("tok")
    return f"""
WITH dt AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
), hs AS (
  SELECT DISTINCT source, {h} AS h FROM dt
), r AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hs
), topk AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS hk
  FROM r WHERE rn <= {KMV_K} GROUP BY source
), ex AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM dt GROUP BY source
)
SELECT t.source, ex.exact_distinct,
       CASE WHEN t.hk IS NULL THEN CAST(t.n_h AS DOUBLE)
            ELSE CAST({KMV_K - 1} AS DOUBLE) * {KMV_M} / t.hk END AS est,
       abs(CASE WHEN t.hk IS NULL THEN CAST(t.n_h AS DOUBLE)
            ELSE CAST({KMV_K - 1} AS DOUBLE) * {KMV_M} / t.hk END
           - ex.exact_distinct) * 1000 / ex.exact_distinct AS err_permille
FROM topk t JOIN ex USING (source)
ORDER BY t.source
"""


_KEY_SKEW_ORACLE = """
WITH ec AS (
  SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type
), er AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, key) AS i FROM ec
), e AS (
  SELECT 'events.event_type' AS dim,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS total_rows,
         CAST(MAX(c) AS BIGINT) AS top1_rows,
         CAST(SUM(i * c) AS BIGINT) AS ic
  FROM er
), dc AS (
  SELECT source AS key, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source
), dr AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, key) AS i FROM dc
), d AS (
  SELECT 'documents.source' AS dim,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS total_rows,
         CAST(MAX(c) AS BIGINT) AS top1_rows,
         CAST(SUM(i * c) AS BIGINT) AS ic
  FROM dr
), u AS (SELECT * FROM e UNION ALL SELECT * FROM d)
SELECT dim, n_keys, total_rows,
       (top1_rows * 1000) // total_rows AS top1_share_permille,
       ((2 * ic - (n_keys + 1) * total_rows) * 1000)
           // (n_keys * total_rows) AS gini_permille
FROM u ORDER BY dim
"""


def _split_ks_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("'v1' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH b AS (
  SELECT n_chars, ({h}) % 100 AS bucket FROM documents
), hist AS (
  SELECT n_chars,
         CAST(SUM(CASE WHEN bucket < 80 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN bucket >= 80 AND bucket < 90 THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM b WHERE bucket < 90 GROUP BY n_chars
), cum AS (
  SELECT CAST(SUM(a) OVER (ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS ca,
         CAST(SUM(b) OVER (ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cb
  FROM hist
), tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
  FROM hist
)
SELECT tot.n_a, tot.n_b,
       CASE WHEN tot.n_a = 0 OR tot.n_b = 0 THEN CAST(1000 AS BIGINT)
            ELSE CAST(MAX(ABS(ca * tot.n_b - cb * tot.n_a)) AS BIGINT)
                 * 1000 // (tot.n_a * tot.n_b) END AS ks_permille
FROM cum CROSS JOIN tot
GROUP BY tot.n_a, tot.n_b
"""


_STREAM_HOURLY_ORACLE = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sv100
FROM events
GROUP BY CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP), event_type
ORDER BY w, event_type
"""


_STREAM_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
ORDER BY user_id, event_type
"""


_QUALITY_AUC_ORACLE = """
WITH lab AS (
  SELECT n_chars,
         CASE WHEN COUNT(*) OVER (PARTITION BY md5(text)) >= 2
              THEN 1 ELSE 0 END AS pos
  FROM documents
), hist AS (
  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS pos
  FROM lab GROUP BY n_chars
), scored AS (
  SELECT cnt, pos,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum
  FROM hist
), agg AS (
  SELECT CAST(SUM(pos * (2 * cum + cnt + 1)) AS BIGINT) AS pos2rank,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg
  FROM scored
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(500 AS BIGINT)
            ELSE ((pos2rank - n_pos * (n_pos + 1)) * 1000)
                 // (2 * n_pos * n_neg) END AS auc_permille
FROM agg
"""


def _langid_kappa_oracle_sql() -> str:
    from hive_parse_lineage_spark.extra_queries import _SW
    return f"""
WITH s AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), sc AS (
  SELECT lang,
         len(list_intersect(toks, [{_SW['de']}])) AS s_de,
         len(list_intersect(toks, [{_SW['en']}])) AS s_en,
         len(list_intersect(toks, [{_SW['es']}])) AS s_es,
         len(list_intersect(toks, [{_SW['fr']}])) AS s_fr,
         len(list_intersect(toks, [{_SW['zh']}])) AS s_zh
  FROM s
), m AS (
  SELECT lang,
         CASE WHEN s_de >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_en >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
              WHEN s_es >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
              WHEN s_fr >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
              ELSE 'zh' END AS pred,
         COUNT(*) AS c
  FROM sc GROUP BY lang, pred
), rows_ AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS r FROM m GROUP BY lang),
cols_ AS (SELECT pred, CAST(SUM(c) AS BIGINT) AS col FROM m GROUP BY pred),
pe AS (
  SELECT CAST(COALESCE(SUM(rows_.r * cols_.col), 0) AS BIGINT) AS pe_num
  FROM rows_ JOIN cols_ ON rows_.lang = cols_.pred
), base AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN lang = pred THEN c ELSE 0 END) AS BIGINT) AS diag
  FROM m
)
SELECT n, diag, pe.pe_num,
       CASE WHEN n * n = pe.pe_num THEN CAST(0 AS BIGINT)
            ELSE ((diag * n - pe.pe_num) * 1000) // (n * n - pe.pe_num)
            END AS kappa_permille
FROM base CROSS JOIN pe
"""


def _ppjoin_oracle_sql() -> str:
    from hive_parse_lineage_spark.corpus_queries import _shingle_list_sql
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("s")
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w, text FROM documents
), dt AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform({_shingle_list_sql(3)}, s -> {h})) AS tok
  FROM w
), freq AS (
  SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM dt GROUP BY doc_id
), pref AS (
  SELECT doc_id, tok, n FROM (
    SELECT d.doc_id, d.tok, s.n,
           ROW_NUMBER() OVER (PARTITION BY d.doc_id
                              ORDER BY f.df, d.tok) AS rn
    FROM dt d JOIN freq f USING (tok) JOIN sizes s USING (doc_id)
  ) WHERE rn <= n - (({PP_T_NUM} * n + {PP_T_DEN - 1}) // {PP_T_DEN}) + 1
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
   AND {PP_T_DEN} * a.n >= {PP_T_NUM} * b.n
   AND {PP_T_DEN} * b.n >= {PP_T_NUM} * a.n
), inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS i
  FROM cand c
  JOIN dt x ON x.doc_id = c.id_a
  JOIN dt y ON y.doc_id = c.id_b AND y.tok = x.tok
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b, CAST(i.i AS BIGINT) AS i,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       (i.i * 1000) // (sa.n + sb.n - i.i) AS jaccard_permille
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE {PP_T_DEN} * i.i >= {PP_T_NUM} * (sa.n + sb.n - i.i)
ORDER BY id_a, id_b
"""


def _cms_oracle_sql() -> str:
    """x104: identical CMS — same salted portable hash per depth row,
    same width, same min-over-rows estimate."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("CAST(j AS VARCHAR) || '#' || tok")
    hp = portable_hash64_sql("CAST(r.j AS VARCHAR) || '#' || p.tok")
    probe_list = ", ".join(f"('{t}')" for t in CMS_PROBES)
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), rows_ AS (
  SELECT tok, j FROM tok, range(0, {CMS_DEPTH}) AS r(j)
), cms AS (
  SELECT j, {h} % {CMS_WIDTH} AS cell, COUNT(*) AS c
  FROM rows_ GROUP BY j, {h} % {CMS_WIDTH}
), probes(tok) AS (
  VALUES {probe_list}
), pj AS (
  SELECT p.tok, r.j, {hp} % {CMS_WIDTH} AS cell
  FROM probes p, range(0, {CMS_DEPTH}) AS r(j)
), est AS (
  SELECT pj.tok, MIN(COALESCE(cms.c, 0)) AS est
  FROM pj LEFT JOIN cms ON cms.j = pj.j AND cms.cell = pj.cell
  GROUP BY pj.tok
), exact AS (
  SELECT tok, COUNT(*) AS exact FROM tok
  WHERE tok IN (SELECT tok FROM probes) GROUP BY tok
)
SELECT est.tok, CAST(est.est AS BIGINT) AS est,
       CAST(COALESCE(exact.exact, 0) AS BIGINT) AS exact,
       CAST(est.est - COALESCE(exact.exact, 0) AS BIGINT) AS overcount
FROM est LEFT JOIN exact ON est.tok = exact.tok
ORDER BY est.tok
"""


_CONVERSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type FROM events
  WHERE event_type IN ('view', 'purchase')
), tagged AS (
  SELECT user_id, event_id, ts, event_type,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_ts
  FROM e
), conv AS (
  SELECT user_id, event_id, ts,
         epoch_us(p_ts) - epoch_us(ts) AS lat_us
  FROM tagged
  WHERE event_type = 'view' AND p_ts IS NOT NULL
    AND epoch_us(p_ts) - epoch_us(ts) <= 3600000000
), first AS (
  SELECT user_id, ts, lat_us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM conv
)
SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_conversions,
       (CAST(SUM(lat_us) AS BIGINT) // COUNT(*)) // 1000000
           AS avg_latency_sec
FROM first WHERE rn = 1
GROUP BY CAST(ts AS DATE) ORDER BY day
"""


def _stream_neardup_oracle_sql() -> str:
    """x102: the x07 self-join LSH oracle restricted to cross pairs —
    corpus ids all sort below new ids, so (corpus, new) pairs are
    exactly the id_a < 400 <= id_b slice."""
    from hive_parse_lineage_spark.extra_queries import _minhash_oracle_sql
    mh = _minhash_oracle_sql(n_hashes=64, bands=16, shingle_k=2,
                             threshold=0.5)
    return f"""
WITH mh AS (
{mh}
)
SELECT id_b AS new_id, id_a AS corpus_id, est_jaccard
FROM mh WHERE id_a < 400 AND id_b >= 400
ORDER BY new_id, corpus_id
"""


def _pr_round(prev: str, cur: str) -> str:
    """One unrolled fixed-point PageRank round (mirrors
    operators/graph.py: per-edge integer division, then the damped
    integer update)."""
    return (f"{cur} AS (SELECT n.vertex, "
            f"150000 + (850000 * COALESCE(SUM(p.r // deg.deg), 0)) "
            f"// 1000000 AS r "
            f"FROM {prev} n "
            f"LEFT JOIN adj a ON a.u = n.vertex "
            f"LEFT JOIN {prev} p ON p.vertex = a.v "
            f"LEFT JOIN deg ON deg.v = a.v "
            f"GROUP BY n.vertex)")


def _dup_pagerank_oracle_sql() -> str:
    from hive_parse_lineage_spark.corpus_queries import _cc_edges_sql
    return f"""
WITH {_cc_edges_sql()},
deg AS (SELECT v, COUNT(*) AS deg FROM adj GROUP BY v),
r0 AS (SELECT doc_id AS vertex, CAST(1000000 AS BIGINT) AS r
       FROM documents),
{_pr_round('r0', 'r1')},
{_pr_round('r1', 'r2')}
SELECT vertex, CAST(r AS BIGINT) AS rank_ppm FROM r2 ORDER BY vertex
"""


def _training_manifest_oracle_sql(salt: str = "v1",
                                  n_buckets: int = 100) -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql(f"'{salt}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH b AS (
  SELECT source, len(string_split(text, ' ')) AS n_tok,
         CASE WHEN {h} % {n_buckets} < 80 THEN 'train'
              WHEN {h} % {n_buckets} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), per AS (
  SELECT split, source, COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens
  FROM b GROUP BY split, source
)
SELECT split, source, n_docs, n_tokens,
       (n_tokens * 1000)
           // SUM(n_tokens) OVER (PARTITION BY split) AS share_permille
FROM per ORDER BY split, source
"""


def _novelty_oracle_sql() -> str:
    from hive_parse_lineage_spark.corpus_queries import _shingle_list_sql
    return f"""
WITH mx AS (
  SELECT MAX(doc_id) AS mx FROM documents
), w AS (
  SELECT doc_id, string_split(text, ' ') AS w, text,
         (doc_id * 10) // (mx.mx + 1) + 1 AS bucket
  FROM documents, mx
), g AS (
  SELECT DISTINCT doc_id, bucket, unnest({_shingle_list_sql(3)}) AS g
  FROM w
), firsts AS (
  SELECT g, MIN(bucket) AS first_b FROM g GROUP BY g
)
SELECT bucket, COUNT(*) AS n_grams,
       (CAST(SUM(CASE WHEN first_b < bucket THEN 1 ELSE 0 END) AS BIGINT)
           * 1000) // COUNT(*) AS repeated_permille
FROM g JOIN firsts USING (g)
GROUP BY bucket ORDER BY bucket
"""


PHRASES = ["table hash", "merge group", "customer join window",
           "table hash agg"]
RRF_TERMS = ["spark", "table", "hash", "merge"]


def _x114_rrf_hybrid(spark, tables):
    """Hybrid retrieval: BM25 and QL term-density rankers fused with
    Reciprocal Rank Fusion (top-10 per term from two top-20 pools).
    The fused double is two single divisions of small integers plus a
    fixed-order add — identical IEEE tree in the oracle. Both rankers
    derive from one shared filtered explode; every window is bounded
    by |terms| * pool, never corpus rows (the x93 audit rule)."""
    from hive_parse_lineage_spark.operators.retrieval import hybrid_rrf_topk
    return hybrid_rrf_topk(tables["documents"], RRF_TERMS, k=10, pool=20)


def _x115_phrase_match(spark, tables):
    """Multi-phrase exact matching via the anchor-bigram broadcast
    join (operators/phrasematch.py): ONE tokenization pass emitting a
    fixed-width context window per position, a K-row phrase table
    broadcast onto the anchor equi-join (bounded by the request — a
    legitimate hint under the repo's broadcast policy), token-boundary
    exact. The phrase list includes two phrases sharing an anchor
    ('table hash' / 'table hash agg') to exercise the join fanout."""
    from hive_parse_lineage_spark.operators.phrasematch import phrase_match
    return phrase_match(spark, tables["documents"], PHRASES)


def _x116_tokenizer_fertility(spark, tables):
    """Tokenizer-fertility report per language: docs, whitespace
    tokens, UTF-8 bytes, bytes-per-token and tokens-per-doc in
    permille — the go/no-go table for choosing a tokenizer's
    vocabulary against a multilingual corpus. All-integer (div), so
    hash-stable at every SF; one map-side-combinable aggregate over a
    codegen projection, zero joins."""
    d = tables["documents"]
    agg = (d.select("lang",
                    F.size(F.split("text", " ")).alias("nt"),
                    F.octet_length("text").alias("nb"))
           .groupBy("lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum("nt").alias("n_tokens"),
                F.sum("nb").alias("n_bytes")))
    return (agg.select(
        "lang", "n_docs", "n_tokens", "n_bytes",
        F.expr("n_bytes * 1000 div n_tokens").alias("bytes_per_tok_milli"),
        F.expr("n_tokens * 1000 div n_docs").alias("toks_per_doc_milli"))
        .orderBy("lang"))


def _x117_incident_bin_join(spark, tables):
    """Interval-overlap join via time-bin bucketing — the scalable
    spelling of a range join with NO equi key. Incident windows are
    the error-heavy hours (hourly error count >= 2x the hourly
    average — integer cross-multiplied, scale-free) extended to 90
    minutes; the ask is every non-error event falling inside any
    window. The naive plan (the oracle's spelling) is a theta join
    ts BETWEEN start AND end — O(incidents x events) row comparisons
    and a BroadcastNestedLoopJoin at scale. The engine manufactures
    the missing equi key: each interval explodes into the hour bins
    it covers (sequence(start, end, 1 hour) — 2 rows per 90-minute
    window), each point maps to its hour bin, and the match becomes a
    bin equi-join plus a residual range filter. A point's bin matches
    at most one exploded row per interval, so no post-join dedup.
    Incidents are the top-12 hottest error hours (row_number over the
    HOURLY table — time-bounded, the x93 audit rule — with an h0
    tiebreak; a relative >= 2x-average threshold goes empty at large
    SF as Poisson noise concentrates), so the broadcast side is a
    FIXED 12-interval / 24-bin table — legitimate under the hint
    policy."""
    e = tables["events"]
    hourly = (e.filter(F.col("event_type") == "error")
              .groupBy(F.date_trunc("hour", "ts").alias("h0"))
              .agg(F.count("*").alias("n_err")))
    wtop = Window.partitionBy().orderBy(F.desc("n_err"), F.col("h0"))
    inc = (hourly.withColumn("rn", F.row_number().over(wtop))
           .filter(F.col("rn") <= 12)
           .select(F.col("h0").alias("win_start"),
                   (F.col("h0") + F.expr("INTERVAL 90 MINUTES"))
                   .alias("win_end"),
                   "n_err"))
    bins = inc.select(
        "win_start", "win_end", "n_err",
        F.explode(F.expr("sequence(win_start, win_end, interval 1 hour)"))
        .alias("bin"))
    pts = (e.filter(F.col("event_type") != "error")
           .select("ts", "event_type",
                   F.date_trunc("hour", "ts").alias("bin")))
    j = (pts.join(F.broadcast(bins), "bin")
         .filter((F.col("ts") >= F.col("win_start"))
                 & (F.col("ts") < F.col("win_end"))))
    return (j.groupBy("win_start", "win_end", "n_err")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("event_type").alias("n_types"))
            .orderBy("win_start"))


def _x118_stream_session_windows(spark, tables):
    """Streaming SESSION windows under the exact hash gate — the
    third stateful streaming shape next to x111's tumbling windows
    and x112's dedup state: per-user 30-minute-gap sessions computed
    by a REAL Structured Streaming query (parquet source, 4
    micro-batches, complete-mode memory sink). Session state MERGES
    across micro-batches (a session spanning a batch boundary must
    fuse two open windows), which is exactly what the gate checks:
    the sink must hash-match the batch gaps-and-islands oracle
    (lag/cumsum spelling, break at gap >= 30 min — Spark's session
    windows are [start, last_ts + gap), so a gap of exactly the
    timeout starts a new session). State is O(open sessions), bounded
    by active users, never event count; counts are integral so no
    order-sensitive double SUM crosses the state merge."""
    import uuid

    from hive_parse_lineage_spark.streaming.windows import (
        run_stream_over_batch)
    e = tables["events"].select("ts", "user_id").coalesce(4)

    def agg(s):
        return (s.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                          "user_id")
                .agg(F.count("*").alias("n"))
                .select("user_id", F.col("w.start").alias("s_start"),
                        F.col("w.end").alias("s_end"), "n"))

    sink = run_stream_over_batch(
        spark, e, agg, query_name=f"x118_{uuid.uuid4().hex[:8]}",
        output_mode="complete")
    return sink.orderBy("user_id", "s_start")


def _x119_minhash_calibration(spark, tables):
    """Calibration audit of the MinHash estimator against EXACT
    Jaccard on the LSH candidate pairs — the dedup stack's QA dial:
    per estimate-decile (m*10 div 64 over the 64 matching signature
    positions), how far off is the estimate really? Per-pair error is
    the all-integer ppm |m*uni - inter*64| * 1e6 div (64*uni), so the
    bucket MAE is an integer SUM div COUNT — order-free under the
    hash gate (an AVG of per-pair doubles would not be). Exact
    inter/union come from distinct 2-shingle sets joined onto the
    candidate pairs (pair-bounded work: LSH candidates, never all
    pairs). Signatures use the portable md5-fold hash so the DuckDB
    oracle replays them exactly (x07 playbook).

    One tokenization (the x125/x196 rule): the distinct-shingle table
    feeds BOTH the signatures (MIN is idempotent over duplicates) and
    the exact verifier; the signature table is pinned eagerly because
    three consumers (band explode + both pair joins) would otherwise
    re-run the 64-min aggregate — its checkpoint job also materializes
    the lazy shingle pin, so the whole entry is two jobs."""
    from hive_parse_lineage_spark.functions import text as T
    from hive_parse_lineage_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signature_from_shingles)
    docs = tables["documents"]
    sh = (docs.select(
        "doc_id",
        F.array_distinct(T.word_shingles("text", 2)).alias("ds"))
        .localCheckpoint(eager=False))
    sig = (minhash_signature_from_shingles(sh, "ds",
                                           hasher=T.portable_hash64)
           .localCheckpoint(eager=True))
    pairs = (lsh_candidate_pairs(sig, max_bucket_size=None)
             .select("id_a", "id_b"))
    j = (pairs
         .join(sig.select(F.col("doc_id").alias("id_a"),
                          F.col("minhash").alias("ma")), "id_a")
         .join(sig.select(F.col("doc_id").alias("id_b"),
                          F.col("minhash").alias("mb")), "id_b")
         .join(sh.select(F.col("doc_id").alias("id_a"),
                         F.col("ds").alias("sa")), "id_a")
         .join(sh.select(F.col("doc_id").alias("id_b"),
                         F.col("ds").alias("sb")), "id_b"))
    # bigint from the start: size() is int32 and m*uni*1e6 overflows it
    per = j.select(
        F.expr("cast(size(filter(zip_with(ma, mb, (x, y) -> x = y), "
               "v -> v)) as bigint)").alias("m"),
        F.expr("cast(size(array_intersect(sa, sb)) as bigint)")
        .alias("inter"),
        (F.size("sa") + F.size("sb")).cast("long").alias("ab"))
    e = per.select(
        F.expr("m * 10 div 64").alias("bucket"),
        F.expr("abs(m * (ab - inter) * 1000000 - inter * 64 * 1000000) "
               "div (64 * (ab - inter))").alias("err_ppm"))
    return (e.groupBy("bucket")
            .agg(F.count("*").alias("n_pairs"),
                 F.expr("sum(err_ppm) div count(*)").alias("mae_ppm"),
                 F.max("err_ppm").alias("max_err_ppm"))
            .orderBy("bucket"))


def _minhash_calibration_oracle_sql(n_hashes: int = 64, bands: int = 16,
                                    shingle_k: int = 2,
                                    seed: int = 42) -> str:
    """DuckDB twin of x119: replays the exact portable signatures and
    banding (same constants as the x07 oracle), then the same
    all-integer per-pair error and bucket aggregate."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    from hive_parse_lineage_spark.operators.dedup import _P, _perm_params
    k, n = shingle_k, n_hashes
    rows = n_hashes // bands
    h = portable_hash64_sql("s")
    mins = ",\n    ".join(
        f"list_min(list_transform(hs, x -> ({a}*x + {b}) % {_P}))"
        for a, b in _perm_params(n_hashes, seed))
    return f"""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {k}
              THEN list_transform(range(1, len(t) - {k} + 2),
                                  i -> array_to_string(
                                      list_slice(t, i, i + {k} - 1), ' '))
              ELSE [text] END AS shingles
  FROM toks
), dsh AS (
  SELECT doc_id, list_distinct(shingles) AS ds FROM sh
), hashed AS (
  SELECT doc_id, list_transform(shingles, s -> {h} % {_P}) AS hs FROM sh
), sigs AS (
  SELECT doc_id, [{mins}] AS sig FROM hashed
), bk AS (
  SELECT doc_id, sig, r.range AS band,
         list_slice(sig, r.range*{rows} + 1, r.range*{rows} + {rows}) AS bv
  FROM sigs, range({bands}) r
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.sig AS sa_sig, b.sig AS sb_sig
  FROM bk a JOIN bk b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
), per AS (
  SELECT len(list_filter(range(1, {n + 1}), i -> sa_sig[i] = sb_sig[i]))
             AS m,
         len(list_filter(da.ds, x -> list_contains(db.ds, x))) AS inter,
         len(da.ds) + len(db.ds) AS ab
  FROM pairs JOIN dsh da ON pairs.id_a = da.doc_id
             JOIN dsh db ON pairs.id_b = db.doc_id
), e AS (
  SELECT m * 10 // {n} AS bucket,
         abs(m * (ab - inter) * 1000000 - inter * {n} * 1000000)
             // ({n} * (ab - inter)) AS err_ppm
  FROM per
)
SELECT bucket, COUNT(*) AS n_pairs,
       CAST(SUM(err_ppm) AS BIGINT) // COUNT(*) AS mae_ppm,
       MAX(err_ppm) AS max_err_ppm
FROM e GROUP BY bucket ORDER BY bucket
"""


def _x120_temperature_mix(spark, tables):
    """Temperature-scaled multilingual sampling proportions (the
    p^alpha rebalancing of multilingual pretraining, alpha = 1/2):
    per-language adjusted share sqrt(n_tokens)/sum(sqrt(n_tokens))
    and the implied boost factor over raw proportional sampling.

    Float determinism: sqrt is CORRECTLY ROUNDED by IEEE-754 (unlike
    ln/pow, which is why alpha is 1/2 and not 0.7), and the weight
    sum — the one order-sensitive reduction — is an explicitly
    ORDERED fold: collect_list of (lang, w) structs, array_sort, then
    aggregate(...) left-to-right; the oracle folds array_agg(w ORDER
    BY lang) with list_reduce, and 0+w1 == w1 in IEEE so the trees
    agree bit-for-bit. |langs| rows — the single-row totals cross
    join is the only broadcast."""
    d = tables["documents"]
    a = (d.select("lang", F.size(F.split("text", " ")).alias("nt0"))
         .groupBy("lang").agg(F.sum("nt0").alias("nt")))
    w = a.select("lang", "nt",
                 F.sqrt(F.col("nt").cast("double")).alias("w"))
    tot = w.agg(
        F.expr("aggregate(array_sort(collect_list(struct(lang, w))), "
               "cast(0 as double), (acc, s) -> acc + s.w)").alias("tw"),
        F.sum("nt").alias("tnt"))
    return (w.crossJoin(F.broadcast(tot))
            .select("lang", F.col("nt").alias("n_tokens"),
                    F.expr("nt * 1000 div tnt").alias("raw_permille"),
                    (F.col("w") / F.col("tw")).alias("adj_share"),
                    ((F.col("w") / F.col("tw"))
                     * (F.col("tnt").cast("double") / F.col("nt")))
                    .alias("boost"))
            .orderBy("lang"))


def _x121_lang_length_regression(spark, tables):
    """Per-language OLS fit of chars-on-tokens (slope ~ mean word
    length + 1, r^2 ~ how homogeneous the language slice is — a
    mislabeled-slice detector next to x96/x99): the regression is
    computed from EXACT INTEGER MOMENTS (n, Sx, Sy, Sxx, Sxy, Syy —
    map-side-combinable integer SUMs, so nothing order-sensitive
    crosses the shuffle, unlike builtin regr_slope/corr whose double
    accumulation order x22 documents as the boundary class), with
    slope/intercept/r2 emitted through single identical IEEE division
    trees. Degenerate slices (constant x) CASE-guard to NULL on both
    engines (the r2 guard is two separate sign checks — their int
    PRODUCT would itself overflow first). Overflow bound: Sx^2 at
    ~1e8 total tokens per lang stays inside int64; beyond that the
    moments need the double path."""
    d = tables["documents"]
    m = (d.select("lang",
                  F.size(F.split("text", " ")).cast("long").alias("x"),
                  F.col("n_chars").alias("y"))
         .groupBy("lang")
         .agg(F.count("*").alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("y") * F.col("y")).alias("syy")))
    return (m.select(
        "lang", "n",
        F.expr("CASE WHEN n * sxx - sx * sx > 0 THEN "
               "CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) "
               "END").alias("slope"),
        F.expr("CASE WHEN n * sxx - sx * sx > 0 THEN "
               "(CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) "
               "/ (n * sxx - sx * sx)) * sx) / n END").alias("intercept"),
        F.expr("CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 "
               "THEN CAST(n * sxy - sx * sy AS DOUBLE) "
               "* CAST(n * sxy - sx * sy AS DOUBLE) "
               "/ (CAST(n * sxx - sx * sx AS DOUBLE) "
               "* CAST(n * syy - sy * sy AS DOUBLE)) END").alias("r2"))
        .orderBy("lang"))


def _x122_quantized_recall(spark, tables):
    """Recall@10 of int8-QUANTIZED similarity search against the exact
    float-cosine top-k — the storage/recall dial for shipping a 4x
    smaller ANN shard (x51's codes actually searched, not just
    stored). The approximate ranking is the INTEGER dot product of the
    symmetric-int8 codes (exact arithmetic, order-free — the
    approximation error is all in the quantizer, none in the engine),
    the exact side is x09's broadcast cosine; both sides rank with a
    vec_id tiebreak, and recall is an all-integer permille. Plan: 8
    query rows broadcast twice onto one corpus scan each — the corpus
    never shuffles; the final intersection join is k-bounded."""
    from hive_parse_lineage_spark.functions.vector import (
        cosine, quantize_int8)
    e = tables["embeddings"]
    q = e.filter(F.col("vec_id") < 8)
    codes, _ = quantize_int8("embedding")
    ec = e.select("vec_id", codes.alias("c"))
    qc = q.select(F.col("vec_id").alias("query_id"), codes.alias("qc"))
    idot = F.expr("aggregate(zip_with(qc, c, (x, y) -> x * y), "
                  "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    wa = Window.partitionBy("query_id").orderBy(F.desc("iscore"),
                                                F.col("vec_id"))
    approx = (ec.crossJoin(F.broadcast(qc))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id", idot.alias("iscore"))
              .withColumn("rn", F.row_number().over(wa))
              .filter(F.col("rn") <= 10).select("query_id", "vec_id"))
    qe = q.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv"))
    cos = cosine(F.col("qv"), F.col("embedding"))
    we = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                                F.col("vec_id"))
    exact = (e.crossJoin(F.broadcast(qe))
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id", cos.alias("cos"))
             .withColumn("rn", F.row_number().over(we))
             .filter(F.col("rn") <= 10).select("query_id", "vec_id"))
    hits = (approx.join(exact, ["query_id", "vec_id"])
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    return (qe.select("query_id")
            .join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.expr("coalesce(n_hits, 0) * 1000 div 10")
                    .alias("recall_permille"))
            .orderBy("query_id"))


def _x123_weighted_jaccard(spark, tables):
    """Rarity-weighted Jaccard near-dup pairs — two docs sharing the
    rare half of their vocabulary are nearer duplicates than two
    sharing only stopwords, which plain Jaccard (x05) can't see.
    Presence weights are x44's integer rarity surrogate
    (w_t = n_docs div df_t), so wJ = IW / (Wa + Wb - IW) is an
    all-integer permille. The size-ratio block stays LOSSLESS under
    weighting: IW <= min(Wa, Wb) implies wJ <= min/max, so
    5*least(Wa, Wb) >= 4*greatest(Wa, Wb) is necessary for wJ >= 0.8 —
    evaluated as a join predicate, it prunes the posting self-join's
    pair stream before the aggregate, exactly like the unweighted
    block in x05. Weight lookup and per-doc sums are plain shuffle
    equi-joins (vocab unbounded at scale — never a forced broadcast);
    only the single-row n_docs broadcasts. Bounded id space like x05
    (the unbounded path is LSH, x07/x72)."""
    docs = tables["documents"].filter(F.col("doc_id") < 250)
    tk = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
    dfq = tk.groupBy("tok").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("nd"))
    # no broadcast hint even on the single-row nd: the weight subtree
    # is duplicated 6x through the self-join, so one hint would count
    # 6x against the plan budget; AQE broadcasts a 1-row side anyway
    w = (dfq.crossJoin(nd)
         .select("tok", F.expr("nd div df").alias("w")))
    tw = tk.join(w, "tok")
    wa = tw.groupBy("doc_id").agg(F.sum("w").alias("ws"),
                                  F.count("*").alias("nt"))
    twx = tw.join(wa, "doc_id")
    a, b = twx.alias("a"), twx.alias("b")
    pairs = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                    & (5 * F.least(F.col("a.ws"), F.col("b.ws"))
                       >= 4 * F.greatest(F.col("a.ws"), F.col("b.ws"))))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.sum(F.col("a.w")).alias("iw"),
                  F.count("*").alias("ni")))
    j = (pairs
         .join(wa.select(F.col("doc_id").alias("id_a"),
                         F.col("ws").alias("wsa"),
                         F.col("nt").alias("na")), "id_a")
         .join(wa.select(F.col("doc_id").alias("id_b"),
                         F.col("ws").alias("wsb"),
                         F.col("nt").alias("nb")), "id_b"))
    return (j.filter(1000 * F.col("iw")
                     >= 800 * (F.col("wsa") + F.col("wsb") - F.col("iw")))
            .select("id_a", "id_b",
                    F.expr("iw * 1000 div (wsa + wsb - iw)")
                    .alias("wj_permille"),
                    F.expr("ni * 1000 div (na + nb - ni)")
                    .alias("j_permille"))
            .orderBy("id_a", "id_b"))


def _x124_code_switch_audit(spark, tables):
    """Code-switching / mixed-language audit: a document whose tokens
    hit >= 3 stopwords from EACH of two different languages is either
    genuinely code-switched or a concatenation artifact — both matter
    to a monolingual training slice (x02 assigns exactly one language
    and can't see this; x96/x99 audit labels, not content). The five
    per-language hit counts are fixed codegen array expressions over
    one tokenization (size(filter(w, array_contains(...))) — no join,
    no shuffle before the per-language report), so the whole audit is
    a projection plus one small aggregate. All-integer."""
    from hive_parse_lineage_spark.functions.text import STOPWORDS
    d = tables["documents"]
    w = d.select("lang", F.split("text", " ").alias("w"))
    hit_cols = []
    for lg in sorted(STOPWORDS):
        arr = ", ".join(f"'{t}'" for t in STOPWORDS[lg])
        hit_cols.append(
            F.expr(f"size(filter(w, t -> array_contains(array({arr}), t)))")
            .alias(f"h_{lg}"))
    h = w.select("lang", *hit_cols)
    n_langs = sum((F.col(f"h_{lg}") >= 3).cast("long")
                  for lg in sorted(STOPWORDS))
    flagged = h.select("lang", n_langs.alias("nl"))
    return (flagged.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("nl") >= 2).cast("long")).alias("n_multi"))
            .select("lang", "n_docs", "n_multi",
                    F.expr("n_multi * 1000 div n_docs")
                    .alias("multi_permille"))
            .orderBy("lang"))


def _code_switch_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import STOPWORDS
    hits = []
    for lg in sorted(STOPWORDS):
        arr = ", ".join(f"'{t}'" for t in STOPWORDS[lg])
        hits.append(f"len(list_filter(w, t -> list_contains([{arr}], t)))"
                    f" AS h_{lg}")
    nl = " + ".join(
        f"CASE WHEN h_{lg} >= 3 THEN 1 ELSE 0 END" for lg in sorted(STOPWORDS))
    cols = ",\n         ".join(hits)
    return f"""
WITH w AS (
  SELECT lang, string_split(text, ' ') AS w FROM documents
), h AS (
  SELECT lang,
         {cols}
  FROM w
), f AS (
  SELECT lang, ({nl}) AS nl FROM h
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN nl >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
       CAST(SUM(CASE WHEN nl >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000
           // COUNT(*) AS multi_permille
FROM f GROUP BY lang ORDER BY lang
"""


def _x125_lsh_pair_recall(spark, tables):
    """The LSH banding S-curve measured empirically — per TRUE-Jaccard
    decile, what fraction of truly-similar pairs does (16 bands x 4
    rows) banding actually catch? x79 audits the ANN path and x119 the
    ESTIMATOR; this audits the CANDIDATE GENERATOR itself, which is
    the recall floor of every LSH dedup pass (x07/x72). Ground truth
    is the exact token-set Jaccard of every co-token pair in a bounded
    id space (posting self-join — J>0 pairs only, which is every pair
    banding could ever catch and every pair with nonzero recall mass);
    candidates are the uncapped portable-hash banding pairs on the
    SAME token sets (shingle_k=1). All-integer permille per decile.
    Expected shape: ~0 below the (1/16)^(1/4) ~ 0.5 knee, ~1000 above
    — the curve that justifies the threshold choices in x07.

    One tokenization: the distinct (doc, token) stream is
    localCheckpointed and feeds all three consumers (posting-join
    truth, per-doc set sizes, AND the minhash signatures — shingle_k=1
    shingles ARE tokens, and permutation MINIMA are repeat-insensitive,
    so the distinct stream yields byte-identical signatures to the
    raw one minhash_signature_agg would re-tokenize for)."""
    from hive_parse_lineage_spark.functions import text as T
    from hive_parse_lineage_spark.operators.dedup import (
        _P, _perm_params, lsh_candidate_pairs)
    docs = tables["documents"].filter(F.col("doc_id") < 250)
    # lazy pin: the single final action materializes the token stream
    # once for all three consumers — an EAGER checkpoint here would
    # serialize an extra job in front of a fixed-250-doc audit whose
    # wall is pure stage floor
    tk = (docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
        .localCheckpoint(eager=False))
    na = tk.groupBy("doc_id").agg(F.count("*").alias("nt"))
    a, b = tk.alias("a"), tk.alias("b")
    inter = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.count("*").alias("ni")))
    truth = (inter
             .join(na.select(F.col("doc_id").alias("id_a"),
                             F.col("nt").alias("na")), "id_a")
             .join(na.select(F.col("doc_id").alias("id_b"),
                             F.col("nt").alias("nb")), "id_b")
             .select("id_a", "id_b",
                     F.expr("ni * 1000 div (na + nb - ni)")
                     .alias("jp")))
    hashed = tk.select(
        "doc_id",
        F.pmod(T.portable_hash64(F.col("tok")), F.lit(_P)).alias("_h"))
    from hive_parse_lineage_spark.operators.dedup import _min_register_aggs
    sig = _min_register_aggs(hashed, "doc_id", _perm_params(64, 42))
    cand = (lsh_candidate_pairs(sig, max_bucket_size=None)
            .select("id_a", "id_b", F.lit(1).alias("hit")))
    j = truth.join(cand, ["id_a", "id_b"], "left")
    return (j.groupBy(F.expr("jp div 100").alias("decile"))
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(F.coalesce("hit", F.lit(0))).alias("n_caught"))
            .select("decile", "n_pairs", "n_caught",
                    F.expr("n_caught * 1000 div n_pairs")
                    .alias("recall_permille"))
            .orderBy("decile"))


def _lsh_pair_recall_oracle_sql(n_hashes: int = 64, bands: int = 16,
                                seed: int = 42) -> str:
    """DuckDB twin of x125: posting-join truth + the x119-style
    portable-signature banding, shingle_k=1 (token sets)."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    from hive_parse_lineage_spark.operators.dedup import _P, _perm_params
    rows = n_hashes // bands
    h = portable_hash64_sql("s")
    mins = ",\n    ".join(
        f"list_min(list_transform(hs, x -> ({a}*x + {b}) % {_P}))"
        for a, b in _perm_params(n_hashes, seed))
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 250
), tk AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM docs
), na AS (
  SELECT doc_id, COUNT(*) AS nt FROM tk GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
  FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), truth AS (
  SELECT id_a, id_b, ni * 1000 // (wa.nt + wb.nt - ni) AS jp
  FROM inter JOIN na wa ON inter.id_a = wa.doc_id
             JOIN na wb ON inter.id_b = wb.doc_id
), toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM docs
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 1 THEN t ELSE [text] END AS shingles
  FROM toks
), hashed AS (
  SELECT doc_id, list_transform(shingles, s -> {h} % {_P}) AS hs FROM sh
), sigs AS (
  SELECT doc_id, [{mins}] AS sig FROM hashed
), bk AS (
  SELECT doc_id, r.range AS band,
         list_slice(sig, r.range*{rows} + 1, r.range*{rows} + {rows}) AS bv
  FROM sigs, range({bands}) r
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk a JOIN bk b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
), j AS (
  SELECT truth.jp, CASE WHEN cand.id_a IS NULL THEN 0 ELSE 1 END AS hit
  FROM truth LEFT JOIN cand USING (id_a, id_b)
)
SELECT jp // 100 AS decile, COUNT(*) AS n_pairs,
       CAST(SUM(hit) AS BIGINT) AS n_caught,
       CAST(SUM(hit) AS BIGINT) * 1000 // COUNT(*) AS recall_permille
FROM j GROUP BY jp // 100 ORDER BY decile
"""


def _x126_dedup_bias_audit(spark, tables):
    """Survivor-bias audit of exact dedup — does dropping duplicate
    copies disproportionately remove one language's data? (Boilerplate
    concentrates unevenly across languages, so dedup silently reshapes
    the mix x120 then samples from.) Survivors keep the lowest doc_id
    per md5(text); per language the report carries docs before/after,
    removal permille, and the mix share before/after in permille —
    all-integer. One hash shuffle (the same uniform md5 exchange as
    x11) plus one small aggregate."""
    d = tables["documents"]
    ranked = d.select(
        "lang", "doc_id",
        F.row_number().over(
            Window.partitionBy(F.md5("text")).orderBy("doc_id"))
        .alias("rn"))
    per = (ranked.groupBy("lang")
           .agg(F.count("*").alias("n_before"),
                F.sum((F.col("rn") == 1).cast("long")).alias("n_after")))
    tot = per.agg(F.sum("n_before").alias("tb"),
                  F.sum("n_after").alias("ta"))
    return (per.crossJoin(F.broadcast(tot))
            .select("lang", "n_before", "n_after",
                    F.expr("(n_before - n_after) * 1000 div n_before")
                    .alias("removed_permille"),
                    F.expr("n_before * 1000 div tb")
                    .alias("share_before_permille"),
                    F.expr("n_after * 1000 div ta")
                    .alias("share_after_permille"))
            .orderBy("lang"))


def _x128_arrow_doc_stats(spark, tables):
    """The Arrow batch path itself under the exact hash gate: per-doc
    token stats computed in a ``mapInPandas`` stage (pandas str ops
    over Arrow record batches) and hash-matched against plain SQL.
    Every other Python-side operator in the repo (multimodal decode,
    NumPy similarity) rides this exact contract — schema'd Arrow
    batches in, schema'd Arrow batches out, batch boundaries invisible
    to the result — so the gate here certifies the TRANSPORT, with
    deliberately SQL-checkable integer payloads (token count, distinct
    count, longest token). Partition-parallel, no shuffle before the
    final sort; bounded id space only to keep the oracle's row set
    small."""
    import pandas as pd
    docs = (tables["documents"].filter(F.col("doc_id") < 300)
            .select("doc_id", "text"))

    def stats(batches):
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_tokens": toks.map(len),
                "n_distinct": toks.map(lambda t: len(set(t))),
                "max_tok_len": toks.map(
                    lambda t: max(len(w) for w in t) if len(t) else 0),
            })

    schema = ("doc_id bigint, n_tokens bigint, n_distinct bigint, "
              "max_tok_len bigint")
    return docs.mapInPandas(stats, schema).orderBy("doc_id")


_ARROW_DOC_STATS_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id < 300
)
SELECT doc_id, len(w) AS n_tokens,
       len(list_distinct(w)) AS n_distinct,
       list_max(list_transform(w, t -> strlen(t))) AS max_tok_len
FROM w ORDER BY doc_id
"""


_DEDUP_BIAS_ORACLE = """
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
), per AS (
  SELECT lang, COUNT(*) AS n_before,
         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after
  FROM ranked GROUP BY lang
), tot AS (
  SELECT CAST(SUM(n_before) AS BIGINT) AS tb,
         CAST(SUM(n_after) AS BIGINT) AS ta
  FROM per
)
SELECT lang, n_before, n_after,
       (n_before - n_after) * 1000 // n_before AS removed_permille,
       n_before * 1000 // tb AS share_before_permille,
       n_after * 1000 // ta AS share_after_permille
FROM per CROSS JOIN tot ORDER BY lang
"""


def _x127_shard_balance(spark, tables):
    """Shard-assignment balance audit: hash documents into 16 shards
    (portable md5-fold of the doc id, the x39 split family's hash) and
    report each shard's doc/token load plus its deviation from the
    perfect-balance mean in permille — the pre-flight check before a
    16-way bucketed write (sources/bucketing.py), where one hot shard
    becomes the straggler task of every downstream stage. All-integer;
    one map-side-combinable aggregate; the single-row total broadcasts
    back onto 16 rows."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    d = tables["documents"]
    per = (d.select(
        F.pmod(portable_hash64(F.col("doc_id").cast("string")),
               F.lit(16)).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("nt"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens")))
    tot = per.agg(F.sum("n_tokens").alias("tt"))
    return (per.crossJoin(F.broadcast(tot))
            .select("shard", "n_docs", "n_tokens",
                    F.expr("(n_tokens * 16 - tt) * 1000 div tt")
                    .alias("dev_permille"))
            .orderBy("shard"))


def _shard_balance_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH per AS (
  SELECT {h} % 16 AS shard, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM per
)
SELECT shard, n_docs, n_tokens,
       (n_tokens * 16 - tt) * 1000 // tt AS dev_permille
FROM per CROSS JOIN tot ORDER BY shard
"""


_WEIGHTED_JACCARD_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 250
), tk AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM docs
), dfq AS (
  SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok
), nd AS (
  SELECT COUNT(*) AS nd FROM docs
), w AS (
  SELECT tok, nd // df AS w FROM dfq CROSS JOIN nd
), tw AS (
  SELECT tk.doc_id, tk.tok, w.w FROM tk JOIN w USING (tok)
), wa AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS ws, COUNT(*) AS nt
  FROM tw GROUP BY doc_id
), twx AS (
  SELECT tw.doc_id, tw.tok, tw.w, wa.ws FROM tw JOIN wa USING (doc_id)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.w) AS BIGINT) AS iw, COUNT(*) AS ni
  FROM twx a JOIN twx b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
   AND 5 * least(a.ws, b.ws) >= 4 * greatest(a.ws, b.ws)
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       iw * 1000 // (wsa.ws + wsb.ws - iw) AS wj_permille,
       ni * 1000 // (wsa.nt + wsb.nt - ni) AS j_permille
FROM pairs
JOIN wa wsa ON pairs.id_a = wsa.doc_id
JOIN wa wsb ON pairs.id_b = wsb.doc_id
WHERE 1000 * iw >= 800 * (wsa.ws + wsb.ws - iw)
ORDER BY id_a, id_b
"""


_QUANTIZED_RECALL_ORACLE = """
WITH d AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), codes AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(FLOOR(x * 127.0 /
             greatest(list_max(list_transform(e, v -> abs(v))), 1e-30))
             AS BIGINT)) AS c
  FROM d
), qc AS (
  SELECT vec_id AS query_id, c AS qc FROM codes WHERE vec_id < 8
), ap AS (
  SELECT qc.query_id, codes.vec_id,
         ROW_NUMBER() OVER (PARTITION BY qc.query_id ORDER BY
             list_reduce(list_transform(range(1, len(qc.qc) + 1),
                         i -> qc.qc[i] * codes.c[i]),
                         (a, b) -> a + b) DESC, codes.vec_id) AS rn
  FROM qc, codes WHERE codes.vec_id <> qc.query_id
), approx AS (
  SELECT query_id, vec_id FROM ap WHERE rn <= 10
), qe AS (
  SELECT vec_id AS query_id, e AS qv FROM d WHERE vec_id < 8
), ex AS (
  SELECT qe.query_id, d.vec_id,
         ROW_NUMBER() OVER (PARTITION BY qe.query_id ORDER BY
             list_cosine_similarity(qe.qv, d.e) DESC, d.vec_id) AS rn
  FROM qe, d WHERE d.vec_id <> qe.query_id
), exact AS (
  SELECT query_id, vec_id FROM ex WHERE rn <= 10
), hits AS (
  SELECT query_id, COUNT(*) AS n_hits
  FROM approx JOIN exact USING (query_id, vec_id)
  GROUP BY query_id
)
SELECT qe.query_id, COALESCE(hits.n_hits, 0) AS n_hits,
       COALESCE(hits.n_hits, 0) * 1000 // 10 AS recall_permille
FROM qe LEFT JOIN hits USING (query_id) ORDER BY qe.query_id
"""


_LANG_REGRESSION_ORACLE = """
WITH m AS (
  SELECT lang, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               n_chars AS y
        FROM documents)
  GROUP BY lang
)
SELECT lang, n,
       CASE WHEN n * sxx - sx * sx > 0 THEN
            CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
       END AS slope,
       CASE WHEN n * sxx - sx * sx > 0 THEN
            (CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx)) * sx) / n END AS intercept,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
            CAST(n * sxy - sx * sy AS DOUBLE)
            * CAST(n * sxy - sx * sy AS DOUBLE)
            / (CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
FROM m ORDER BY lang
"""


_TEMPERATURE_MIX_ORACLE = """
WITH a AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS nt
  FROM documents GROUP BY lang
), w AS (
  SELECT lang, nt, sqrt(CAST(nt AS DOUBLE)) AS w FROM a
), t AS (
  SELECT list_reduce(array_agg(w ORDER BY lang), (x, y) -> x + y) AS tw,
         CAST(SUM(nt) AS BIGINT) AS tnt
  FROM w
)
SELECT lang, nt AS n_tokens, nt * 1000 // tnt AS raw_permille,
       w / tw AS adj_share,
       (w / tw) * (CAST(tnt AS DOUBLE) / nt) AS boost
FROM w CROSS JOIN t ORDER BY lang
"""


_INCIDENT_BIN_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h0, COUNT(*) AS n_err
  FROM events WHERE event_type = 'error' GROUP BY 1
), ranked AS (
  SELECT h0, n_err,
         ROW_NUMBER() OVER (ORDER BY n_err DESC, h0) AS rn
  FROM hourly
), inc AS (
  SELECT h0 AS win_start, h0 + INTERVAL 90 MINUTE AS win_end, n_err
  FROM ranked WHERE rn <= 12
)
SELECT i.win_start, i.win_end, i.n_err,
       COUNT(*) AS n_events, COUNT(DISTINCT e.event_type) AS n_types
FROM inc i JOIN events e
  ON e.event_type <> 'error' AND e.ts >= i.win_start AND e.ts < i.win_end
GROUP BY 1, 2, 3 ORDER BY 1
"""

_STREAM_SESSION_ORACLE = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
), g AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM d
)
SELECT user_id, MIN(ts) AS s_start,
       MAX(ts) + INTERVAL 30 MINUTE AS s_end,
       COUNT(*) AS n
FROM g GROUP BY user_id, grp ORDER BY user_id, s_start
"""


_FERTILITY_ORACLE = """
WITH a AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_tokens, n_bytes,
       n_bytes * 1000 // n_tokens AS bytes_per_tok_milli,
       n_tokens * 1000 // n_docs AS toks_per_doc_milli
FROM a ORDER BY lang
"""


def _x129_source_overlap(spark, tables):
    """Cross-source contamination matrix: for every source pair, how
    many DISTINCT 5-gram shingles do the two sources share, and what
    permille of the smaller source's shingle vocabulary is that? The
    mixture-weight audit x86/x101 can't see — if two crawl feeds carry
    the same boilerplate, their combined weight double-counts it.

    Scale shape: the per-(source, shingle) DISTINCT projection runs
    FIRST, then ONE groupBy(g) builds each shingle's sorted source
    set — so the pair fanout per shingle is C(|sources on g|, 2),
    metadata-bounded, never document-bounded, and there is NO
    self-join of the shingle stream (the first spelling self-joined
    the distinct projection and recomputed it three times: 4.9 s vs
    ~1.5 s at sf0.1). Diagonal cells (s, s) and upper-triangle pairs
    (a < b) come out of the SAME codegen explode, so one count
    aggregate yields both the per-source totals and the shared
    counts; that matrix is at most |sources|^2 rows and is
    localCheckpointed so the split/rejoin below reads RAM instead of
    recomputing the shingle census. Output is C(|sources|, 2) rows."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    d = tables["documents"]
    ss = (d.select("source",
                   F.explode(F.array_distinct(word_shingles("text", 5)))
                   .alias("g"))
          .distinct())
    sl = ss.groupBy("g").agg(
        F.sort_array(F.collect_set("source")).alias("sl"))
    cells = sl.select(F.explode(F.expr(
        "concat("
        " transform(sl, x -> struct(x AS a, x AS b)),"
        " flatten(transform(sl, (x, i) ->"
        "  transform(slice(sl, i + 2, size(sl)),"
        "            y -> struct(x AS a, y AS b)))))"
    )).alias("c")).select("c.*")
    counts = (cells.groupBy("a", "b").agg(F.count("*").alias("n"))
              .localCheckpoint())
    per = counts.filter("a = b").select(F.col("a").alias("s"),
                                        F.col("n").alias("ns"))
    pairs = counts.filter("a < b")
    return (pairs
            .join(per.select(F.col("s").alias("a"),
                             F.col("ns").alias("na")), "a")
            .join(per.select(F.col("s").alias("b"),
                             F.col("ns").alias("nb")), "b")
            .select(F.col("a").alias("src_a"), F.col("b").alias("src_b"),
                    F.col("n").alias("n_shared"),
                    F.expr("n * 1000 div least(na, nb)")
                    .alias("overlap_permille"))
            .orderBy("src_a", "src_b"))


def _source_overlap_oracle_sql() -> str:
    from hive_parse_lineage_spark.corpus_queries import _shingle_list_sql
    return f"""
WITH w AS (
  SELECT source, string_split(text, ' ') AS w, text FROM documents
), s AS (
  SELECT DISTINCT source, unnest({_shingle_list_sql(5)}) AS g FROM w
), per AS (
  SELECT source, COUNT(*) AS ns FROM s GROUP BY source
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
  FROM s a JOIN s b ON a.g = b.g AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, n_shared,
       n_shared * 1000 // least(pa.ns, pb.ns) AS overlap_permille
FROM pairs JOIN per pa ON pairs.src_a = pa.source
           JOIN per pb ON pairs.src_b = pb.source
ORDER BY src_a, src_b
"""


def _x130_lexical_concentration(spark, tables):
    """Per-document Simpson concentration (repeated-token probability
    mass, sum(c^2)*1000 div n^2 — the collision probability of drawing
    the same token twice), rolled up per language: mean, max, and the
    count of degenerate docs (conc >= 250, a "the the the"-style
    generation-loop artifact x36's SHINGLE repetition ratio undercounts
    because every repeated unigram instance makes a distinct shingle).
    All-integer; one token shuffle into the per-(doc, tok) count, then
    two map-side-combinable aggregates, no joins at all."""
    d = tables["documents"]
    tk = d.select("doc_id", "lang",
                  F.explode(F.split("text", " ")).alias("tok"))
    c = tk.groupBy("doc_id", "lang", "tok").agg(F.count("*").alias("c"))
    doc = (c.groupBy("doc_id", "lang")
           .agg(F.sum(F.expr("c * c")).alias("s2"),
                F.sum("c").alias("n"))
           .withColumn("conc", F.expr("s2 * 1000 div (n * n)")))
    return (doc.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.expr("sum(conc) div count(*)")
                 .alias("mean_conc_permille"),
                 F.max("conc").alias("max_conc_permille"),
                 F.sum((F.col("conc") >= 250).cast("long"))
                 .alias("n_concentrated"))
            .orderBy("lang"))


_LEXICAL_CONCENTRATION_ORACLE = """
WITH tk AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, lang, tok, COUNT(*) AS c FROM tk GROUP BY 1, 2, 3
), doc AS (
  SELECT doc_id, lang, CAST(SUM(c * c) AS BIGINT) AS s2,
         CAST(SUM(c) AS BIGINT) AS n
  FROM c GROUP BY 1, 2
), conc AS (
  SELECT lang, s2 * 1000 // (n * n) AS conc FROM doc
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(conc) AS BIGINT) // COUNT(*) AS mean_conc_permille,
       MAX(conc) AS max_conc_permille,
       CAST(SUM(CASE WHEN conc >= 250 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_concentrated
FROM conc GROUP BY lang ORDER BY lang
"""


def _x131_histogram_quantile_sketch(spark, tables):
    """Fixed-256-bin equi-width histogram quantile ESTIMATE with exact
    per-quantile error accounting — the mergeable-sketch family's
    quantile member next to x104 (Count-Min) and x108 (KMV). The
    histogram is one map-side-combinable (source, bin) count — the
    shape that merges across shards/days for free — and each quantile
    estimate is the upper edge of the first bin whose cumulative count
    reaches ceil(q*n/1000). The exact value at the same rank (x91's
    discrete row arithmetic) joins back on, so the report carries the
    estimate, the truth, and the bias in permille: the 'is 256 bins
    enough for this column' dial.

    Scale shape: the per-source cumulative window runs over <=256 rows
    per source; the exact side is the only corpus-ranked window and
    exists purely to measure the sketch (at 100 TB you'd ship the
    histogram alone). Hints: single-row min/max, the 3-row quantile
    literal, and the |sources|x3 target table — all bounded."""
    d = tables["documents"].select("source", "n_chars", "doc_id")
    stats = d.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    binned = (d.crossJoin(F.broadcast(stats))
              .withColumn("width", F.expr("(mx - mn) div 256 + 1"))
              .withColumn("bin", F.expr("(n_chars - mn) div width")))
    hist = (binned.groupBy("source", "bin")
            .agg(F.count("*").alias("c"), F.min("mn").alias("mn"),
                 F.min("width").alias("width")))
    wcum = (Window.partitionBy("source").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = (hist.withColumn("cum", F.sum("c").over(wcum))
           .withColumn("n", F.sum("c").over(Window.partitionBy("source"))))
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(500), F.lit(900), F.lit(990))).alias("q"))
    cand = (cum.join(F.broadcast(qs))
            .withColumn("pos", F.expr("(q * n + 999) div 1000"))
            .filter(F.col("cum") >= F.col("pos")))
    est = (cand.groupBy("source", "q")
           .agg(F.min("bin").alias("qb"), F.min("mn").alias("mn"),
                F.min("width").alias("width"), F.min("pos").alias("pos"))
           .select(F.col("source").alias("src"), "q", "pos",
                   F.expr("mn + (qb + 1) * width - 1").alias("est")))
    ranked = d.select(
        "source", "n_chars",
        F.row_number().over(
            Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("rn"))
    return (ranked.join(F.broadcast(est),
                        (F.col("source") == F.col("src"))
                        & (F.col("rn") == F.col("pos")))
            .select("source", "q", "est",
                    F.col("n_chars").alias("exact_v"),
                    F.expr("(est - n_chars) * 1000 div greatest(n_chars, 1)")
                    .alias("err_permille"))
            .orderBy("source", "q"))


_HISTOGRAM_QUANTILE_ORACLE = """
WITH stats AS (
  SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents
), b AS (
  SELECT source, n_chars, mn, (mx - mn) // 256 + 1 AS width,
         (n_chars - mn) // ((mx - mn) // 256 + 1) AS bin
  FROM documents, stats
), hist AS (
  SELECT source, bin, COUNT(*) AS c, MIN(mn) AS mn, MIN(width) AS width
  FROM b GROUP BY source, bin
), cum AS (
  SELECT source, bin, mn, width,
         CAST(SUM(c) OVER (PARTITION BY source ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM hist
), qs AS (
  SELECT unnest([500, 900, 990]) AS q
), cand AS (
  SELECT source, q, bin, mn, width, (q * n + 999) // 1000 AS pos
  FROM cum CROSS JOIN qs WHERE cum >= (q * n + 999) // 1000
), est AS (
  SELECT source, q, MIN(pos) AS pos,
         MIN(mn) + (MIN(bin) + 1) * MIN(width) - 1 AS est
  FROM cand GROUP BY source, q
), ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rn
  FROM documents
)
SELECT r.source, e.q, e.est, r.n_chars AS exact_v,
       (e.est - r.n_chars) * 1000 // greatest(r.n_chars, 1)
           AS err_permille
FROM ranked r JOIN est e ON r.source = e.source AND r.rn = e.pos
ORDER BY r.source, e.q
"""


def _x132_vocab_growth(spark, tables):
    """Heaps-law vocabulary growth across ingestion deciles: per
    id-range bucket (x93's crawl-date stand-in), how many NEVER-SEEN
    bigram TYPES does the bucket introduce, against its total bigram
    instances — cumulative types, cumulative instances, and types per
    million instances. x93 measures repeated INSTANCE mass; this
    measures the TYPE frontier, which is what sizes a tokenizer vocab
    and tells a curator when new crawl stops growing the vocabulary.

    Scale shape: bucket is a codegen projection against one broadcast
    scalar (never ntile); r10 rewrite — ONE corpus scan and ONE real
    shuffle: per gram TYPE, a single map-side-combined aggregate
    carries the first-seen bucket AND ten conditional instance
    counters; a global 1-row combine (20 partial-aggregable sums)
    then explodes back into the 10 bucket rows. The former spelling
    exploded the bigram stream twice (AQE defeated the exchange
    reuse); this one cannot — there is only one exchange. The
    cumulative window runs over exactly 10 rows."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    d = tables["documents"]
    mx = d.agg(F.max("doc_id").alias("_mx"))
    tk = (d.crossJoin(F.broadcast(mx))
          .select(F.expr("doc_id * 10 div (_mx + 1) + 1").alias("bucket"),
                  F.explode(word_shingles("text", 2)).alias("g")))
    # r13: parsed-SQL spellings — one py4j call per aggregate (and one
    # for the whole explode) instead of a 4-6 call Column tree each;
    # identical expressions after parsing (the r12 _min_register_aggs
    # fusion pattern applied to the build tail).
    per_g = tk.groupBy("g").agg(
        F.expr("min(bucket) AS fb"),
        *[F.expr(f"sum(CAST((bucket = {i}) AS BIGINT)) AS c{i}")
          for i in range(1, 11)])
    row = per_g.agg(
        *[F.expr(f"sum(CAST((fb = {i}) AS BIGINT)) AS nt{i}")
          for i in range(1, 11)],
        *[F.expr(f"sum(c{i}) AS ng{i}") for i in range(1, 11)])
    long = row.select(F.expr("explode(array(" + ", ".join(
        f"named_struct('bucket', {i}, 'new_types', nt{i}, "
        f"'n_grams', ng{i})" for i in range(1, 11)) + ")) AS s")
    ).select("s.*")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (long.filter(F.col("n_grams") > 0)
            .withColumn("cum_types", F.sum("new_types").over(w))
            .withColumn("cum_grams", F.sum("n_grams").over(w))
            .withColumn("types_per_mgram",
                        F.expr("cum_types * 1000000 div cum_grams"))
            .orderBy("bucket"))


def _vocab_growth_oracle_sql() -> str:
    from hive_parse_lineage_spark.corpus_queries import _shingle_list_sql
    return f"""
WITH mx AS (
  SELECT MAX(doc_id) AS mx FROM documents
), w AS (
  SELECT doc_id, string_split(text, ' ') AS w, text,
         (doc_id * 10) // (mx.mx + 1) + 1 AS bucket
  FROM documents, mx
), g AS (
  SELECT bucket, unnest({_shingle_list_sql(2)}) AS g FROM w
), newt AS (
  SELECT bucket, COUNT(*) AS new_types
  FROM (SELECT g, MIN(bucket) AS bucket FROM g GROUP BY g)
  GROUP BY bucket
), toks AS (
  SELECT bucket, COUNT(*) AS n_grams FROM g GROUP BY bucket
), base AS (
  SELECT t.bucket, COALESCE(n.new_types, 0) AS new_types, t.n_grams
  FROM toks t LEFT JOIN newt n USING (bucket)
), c AS (
  SELECT bucket, new_types, n_grams,
         CAST(SUM(new_types) OVER (ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_types,
         CAST(SUM(n_grams) OVER (ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_grams
  FROM base
)
SELECT bucket, new_types, n_grams, cum_types, cum_grams,
       cum_types * 1000000 // cum_grams AS types_per_mgram
FROM c ORDER BY bucket
"""


def _x133_winnowing_fingerprints(spark, tables):
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    selection rule): hash every 5-gram, keep a hash only where it is
    the minimum of its 4-position window — guaranteeing at least one
    fingerprint per window while storing a small position-robust
    subset — then count shared fingerprints per document pair. The
    overlap-detection family's third member: x07 trades recall for
    bounded candidates (MinHash), x105 is exact on whole sets
    (PPJoin); winnowing localizes WHERE documents overlap and is the
    standard plagiarism/code-clone fingerprint.

    Scale shape: the window min is per-doc (partition-local, no global
    sort); fingerprints with document frequency > 32 are dropped
    before the pair join (the x72 hot-bucket cap's exact analogue —
    ubiquitous boilerplate fingerprints carry no pair information and
    are what makes the join quadratic), so per-key fanout is capped at
    32 docs. The df filter replays identically in the oracle."""
    from hive_parse_lineage_spark.functions.text import (portable_hash64,
                                                         word_shingles)
    d = tables["documents"]
    ph = (d.select("doc_id",
                   F.posexplode(word_shingles("text", 5))
                   .alias("pos", "g"))
          .select("doc_id", "pos", portable_hash64(F.col("g")).alias("h")))
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    fp = (ph.withColumn("wmin", F.min("h").over(w))
          .filter(F.col("h") == F.col("wmin"))
          .select("doc_id", "h").distinct())
    dfc = fp.groupBy("h").agg(F.count("*").alias("dfc"))
    rare = (fp.join(dfc, "h").filter(F.col("dfc") <= 32)
            .select("doc_id", "h"))
    a, b = rare.alias("a"), rare.alias("b")
    return (a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= 2)
            .orderBy("id_a", "id_b"))


def _winnowing_oracle_sql() -> str:
    from hive_parse_lineage_spark.corpus_queries import _shingle_list_sql
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("s.g")
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w, text FROM documents
), sh AS (
  SELECT doc_id, {_shingle_list_sql(5)} AS l FROM w
), pos AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l) + 1),
                i -> struct_pack(pos := i, g := l[i]))) AS s
  FROM sh
), ph AS (
  SELECT doc_id, s.pos AS pos, {h} AS h FROM pos
), wm AS (
  SELECT doc_id, h,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM ph
), fp AS (
  SELECT DISTINCT doc_id, h FROM wm WHERE h = wmin
), dfc AS (
  SELECT h, COUNT(*) AS dfc FROM fp GROUP BY h
), rare AS (
  SELECT fp.doc_id, fp.h FROM fp JOIN dfc USING (h) WHERE dfc <= 32
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_shared FROM pairs
WHERE n_shared >= 2 ORDER BY id_a, id_b
"""


def _x134_label_centroid_drift(spark, tables):
    """Per-label embedding-centroid drift: the L1 distance (in
    milli-units) between each label's component-wise mean embedding
    and the corpus-wide mean — x86's token-distribution drift audit
    transposed into embedding space, where it catches semantic shift a
    unigram TV-distance can't (same words, different contexts). Means
    are computed on the floor(v*1000) integer surrogate so the sums
    are order-free under the hash gate (a float SUM's addition order
    differs between engines); the integer-milli precision loss is the
    documented at-scale trade, exactly x111's playbook.

    Scale shape: one posexplode into a map-side-combinable
    (label, pos) SUM — dim x |labels| rows out of any corpus size; the
    dim-row global centroid broadcasts back. No corpus pair joins."""
    e = tables["embeddings"]
    comp = (e.select("label", F.posexplode("embedding").alias("pos", "v"))
            .select("label", "pos",
                    F.floor(F.col("v").cast("double") * 1000)
                    .cast("long").alias("iv")))
    per = comp.groupBy("label", "pos").agg(F.sum("iv").alias("s"),
                                           F.count("*").alias("n"))
    glob = comp.groupBy("pos").agg(F.sum("iv").alias("gs"),
                                   F.count("*").alias("gn"))
    return (per.join(F.broadcast(glob), "pos")
            .groupBy("label")
            .agg(F.max("n").alias("n_vecs"),
                 F.sum(F.abs(F.expr("s div n - gs div gn")))
                 .alias("l1_drift_milli"))
            .orderBy("label"))


_LABEL_CENTROID_DRIFT_ORACLE = """
WITH d AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), comp AS (
  SELECT label,
         unnest(list_transform(range(1, len(e) + 1),
                i -> struct_pack(pos := i,
                                 iv := CAST(FLOOR(e[i] * 1000) AS BIGINT))))
             AS s
  FROM d
), c AS (
  SELECT label, s.pos AS pos, s.iv AS iv FROM comp
), per AS (
  SELECT label, pos, CAST(SUM(iv) AS BIGINT) AS s, COUNT(*) AS n
  FROM c GROUP BY label, pos
), gcent AS (
  SELECT pos, CAST(SUM(iv) AS BIGINT) AS gs, COUNT(*) AS gn
  FROM c GROUP BY pos
)
SELECT label, MAX(n) AS n_vecs,
       CAST(SUM(abs(s // n - gs // gn)) AS BIGINT) AS l1_drift_milli
FROM per JOIN gcent USING (pos) GROUP BY label ORDER BY label
"""


def _x135_stream_stream_join(spark, tables):
    """STREAM-STREAM inner join under the exact hash gate — the last
    streaming join family member (x102 is stream-static): the view
    stream joins the purchase stream on user with an event-time range
    (purchase within 1 h of the view), both sides REAL file-source
    streams processed one file per micro-batch, append-mode memory
    sink. Inner stream-stream join emits each matching pair exactly
    once regardless of which micro-batch each side arrives in, so the
    final sink table equals the batch join by construction — the gate
    checks the cross-batch state bookkeeping (buffered unmatched rows)
    that makes that true. Latency is exact integer microseconds
    (x103's epoch_us spelling). The 365-day watermark keeps every row
    in state so out-of-order file arrival can never drop a match —
    the GATE spelling; production uses the real delay bound, and state
    is then O(rows within the watermark horizon x range span), the
    documented swap."""
    import shutil
    import tempfile
    import uuid
    e = tables["events"].select("event_id", "ts", "user_id", "event_type")
    views = e.filter(F.col("event_type") == "view").coalesce(2)
    buys = e.filter(F.col("event_type") == "purchase").coalesce(2)
    # Staged source files are deleted once the query stops — the memory
    # sink holds the result, and leaking full events-table copies per
    # replay accumulates multi-GB orphans in /tmp at sf1.0.
    tv = tempfile.mkdtemp(prefix="x135_v_")
    tp = tempfile.mkdtemp(prefix="x135_p_")
    try:
        views.write.mode("overwrite").parquet(tv)
        buys.write.mode("overwrite").parquet(tp)
        sv = (spark.readStream.schema(views.schema)
              .option("maxFilesPerTrigger", 1).parquet(tv)
              .withWatermark("ts", "365 days").alias("v"))
        sp = (spark.readStream.schema(buys.schema)
              .option("maxFilesPerTrigger", 1).parquet(tp)
              .withWatermark("ts", "365 days").alias("p"))
        joined = (sv.join(
            sp,
            (F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("v.ts"))
            & (F.col("p.ts") < F.col("v.ts") + F.expr("INTERVAL 1 HOUR")))
            .select(F.col("v.user_id").alias("user_id"),
                    F.col("v.event_id").alias("view_id"),
                    F.col("p.event_id").alias("purchase_id"),
                    (F.unix_micros(F.col("p.ts"))
                     - F.unix_micros(F.col("v.ts"))).alias("latency_us")))
        name = f"x135_{uuid.uuid4().hex[:8]}"
        q = (joined.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tv, ignore_errors=True)
        shutil.rmtree(tp, ignore_errors=True)
    out = (spark.table(name).orderBy("view_id", "purchase_id")
           .localCheckpoint(eager=True))
    spark.catalog.dropTempView(name)
    return out


_STREAM_STREAM_JOIN_ORACLE = """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS latency_us
FROM events v JOIN events p
  ON v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.user_id = p.user_id
 AND epoch_us(p.ts) - epoch_us(v.ts) >= 0
 AND epoch_us(p.ts) - epoch_us(v.ts) < 3600000000
ORDER BY view_id, purchase_id
"""


#: x136's profiled columns — types whose CAST-to-string is identical
#: across engines (int/string/date; decimals excluded on purpose,
#: their rendered scale differs).
PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderdate", "o_orderpriority")


def _x136_column_profile(spark, tables):
    """Table profiler — the warehouse ANALYZE/profile surface as one
    query: per column, null count, exact distinct count, and min/max.
    The body lives in :func:`operators.profile.column_profile` (exact
    two-scan spelling; its docstring carries the plan rationale), and
    is SHARED with bench.py's scale-sweep exact/approx variants so the
    gate entry and the sweep measurements can never drift. At-scale
    swap: ``approx=True`` folds the distincts into the single wide
    aggregate via approx_count_distinct (~2% error, one scan) —
    measured against this exact spelling by the sweep."""
    from hive_parse_lineage_spark.operators.profile import column_profile
    return column_profile(tables["orders"], PROFILE_COLS, approx=False)


def _column_profile_oracle_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS col,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_s,
       CAST(MAX({c}) AS VARCHAR) AS max_s
FROM orders"""
        for c in PROFILE_COLS]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col"


def _x137_snapshot_diff(spark, tables):
    """Snapshot CDC diff — the incremental-ingestion change feed
    derived from two full snapshots (the thing MERGE consumes,
    operators/merge.py; here it's the DIFF side): snapshot A drops
    keys ≡3 (mod 4), snapshot B drops keys ≡1 (mod 4) and rewrites
    the price of keys ≡0 (mod 5) — so the full-outer join on the key
    classifies every key as insert (B only), delete (A only), update
    (both, payload changed) or unchanged. Payload compare is the
    FLOOR-then-cast integer-cents surrogate of the double price —
    the q24/x111 convention (plain CAST(double AS BIGINT) ROUNDS in
    DuckDB but TRUNCATES in Spark, so the halves must floor first to
    agree cross-engine). One shuffle on the key — the canonical snapshot-diff
    shape; output is the 4-row summary with min/max affected key, the
    report an incremental pipeline logs per day."""
    o = tables["orders"].select("o_orderkey", "o_totalprice")
    snap_a = (o.filter(F.expr("o_orderkey % 4 != 3"))
              .select("o_orderkey",
                      F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")
                      .alias("cents_a")))
    snap_b = (o.filter(F.expr("o_orderkey % 4 != 1"))
              .select("o_orderkey",
                      F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT) * "
                             "CASE WHEN o_orderkey % 5 = 0 "
                             "THEN 2 ELSE 1 END").alias("cents_b")))
    j = snap_a.join(snap_b, "o_orderkey", "full_outer")
    tagged = j.select(
        "o_orderkey",
        F.when(F.col("cents_a").isNull(), F.lit("insert"))
        .when(F.col("cents_b").isNull(), F.lit("delete"))
        .when(F.col("cents_a") != F.col("cents_b"), F.lit("update"))
        .otherwise(F.lit("unchanged")).alias("change_type"))
    return (tagged.groupBy("change_type")
            .agg(F.count("*").alias("n_keys"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key"))
            .orderBy("change_type"))


_SNAPSHOT_DIFF_ORACLE = """
WITH snap_a AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents_a
  FROM orders WHERE o_orderkey % 4 != 3
), snap_b AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT)
             * CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS cents_b
  FROM orders WHERE o_orderkey % 4 != 1
), j AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         a.cents_a, b.cents_b
  FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
), tagged AS (
  SELECT o_orderkey,
         CASE WHEN cents_a IS NULL THEN 'insert'
              WHEN cents_b IS NULL THEN 'delete'
              WHEN cents_a != cents_b THEN 'update'
              ELSE 'unchanged' END AS change_type
  FROM j
)
SELECT change_type, COUNT(*) AS n_keys,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM tagged GROUP BY change_type ORDER BY change_type
"""


def _x138_borda_quality_blend(spark, tables):
    """Rank-normalized quality blend: two cheap signals (token count,
    distinct-token permille) are each RANKED within the source and the
    rank sum (Borda count) picks the top-5 per source — the standard
    way to combine incommensurable quality scores without calibrating
    either (a rank is scale-free where x37's threshold blend isn't).
    All-integer; explicit doc_id tie-breaks under every rank.

    Scale shape: both rank windows partition by source — parallel
    across sources, and the per-source global sort is the documented
    cost (the at-scale swap is bucketed approximate ranks via x131's
    histogram, same report shape). Top-5 is a per-source
    WindowGroupLimit, never a global sort."""
    d = tables["documents"]
    base = d.select(
        "source", "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("nt"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long").alias("nd"))
    sig = base.withColumn("dp", F.expr("nd * 1000 div nt"))
    r1 = Window.partitionBy("source").orderBy(F.desc("nt"), "doc_id")
    r2 = Window.partitionBy("source").orderBy(F.desc("dp"), "doc_id")
    ranked = (sig.withColumn("r_len", F.rank().over(r1))
              .withColumn("r_div", F.rank().over(r2))
              .withColumn("borda", F.expr("r_len + r_div")))
    top = Window.partitionBy("source").orderBy("borda", "doc_id")
    return (ranked.withColumn("rn", F.row_number().over(top))
            .filter(F.col("rn") <= 5)
            .select("source", "doc_id", "r_len", "r_div", "borda",
                    F.col("rn").alias("rank"))
            .orderBy("source", "rank"))


_BORDA_BLEND_ORACLE = """
WITH base AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS nd
  FROM documents
), sig AS (
  SELECT source, doc_id, nt, nd, nd * 1000 // nt AS dp FROM base
), ranked AS (
  SELECT source, doc_id,
         RANK() OVER (PARTITION BY source
                      ORDER BY nt DESC, doc_id) AS r_len,
         RANK() OVER (PARTITION BY source
                      ORDER BY dp DESC, doc_id) AS r_div
  FROM sig
), borda AS (
  SELECT source, doc_id, r_len, r_div, r_len + r_div AS borda,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY r_len + r_div, doc_id) AS rn
  FROM ranked
)
SELECT source, doc_id, r_len, r_div, borda, rn AS rank
FROM borda WHERE rn <= 5 ORDER BY source, rank
"""


def _x139_decay_mix_schedule(spark, tables):
    """Recency-decayed mixing schedule: ingestion deciles (x93's
    id-range stand-in for crawl date) get half-life weights —
    weight_permille = 1000 div 2^age, age = 9 - bucket + 1 buckets
    back from the newest — and the report carries each decile's raw
    and weighted token mass plus its share of the weighted total: the
    'how much does old crawl actually contribute' schedule a mixer
    (x74) consumes. All-integer (powers of two); two aggregates and a
    single-row total."""
    d = tables["documents"]
    mx = d.agg(F.max("doc_id").alias("_mx"))
    per = (d.crossJoin(F.broadcast(mx))
           .select(F.expr("doc_id * 10 div (_mx + 1) + 1").alias("bucket"),
                   F.size(F.split("text", " ")).cast("long").alias("nt"))
           .groupBy("bucket")
           .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
           .withColumn("weight_permille",
                       F.expr("1000 div cast(pow(2, 10 - bucket) as bigint)"))
           .withColumn("weighted_tokens",
                       F.expr("n_tokens * weight_permille div 1000")))
    tot = per.agg(F.sum("weighted_tokens").alias("wt"))
    return (per.crossJoin(F.broadcast(tot))
            .select("bucket", "n_docs", "n_tokens", "weight_permille",
                    "weighted_tokens",
                    F.expr("weighted_tokens * 1000 div wt")
                    .alias("share_permille"))
            .orderBy("bucket"))


_DECAY_MIX_ORACLE = """
WITH mx AS (
  SELECT MAX(doc_id) AS mx FROM documents
), per AS (
  SELECT (doc_id * 10) // (mx.mx + 1) + 1 AS bucket,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents, mx GROUP BY 1
), w AS (
  SELECT bucket, n_docs, n_tokens,
         1000 // CAST(2 ** (10 - bucket) AS BIGINT) AS weight_permille,
         n_tokens * (1000 // CAST(2 ** (10 - bucket) AS BIGINT)) // 1000
             AS weighted_tokens
  FROM per
), tot AS (
  SELECT CAST(SUM(weighted_tokens) AS BIGINT) AS wt FROM w
)
SELECT bucket, n_docs, n_tokens, weight_permille, weighted_tokens,
       weighted_tokens * 1000 // wt AS share_permille
FROM w CROSS JOIN tot ORDER BY bucket
"""


def _x140_token_burstiness(spark, tables):
    """Adjacent-repetition (burstiness) audit: the longest same-token
    RUN per document via the gaps-and-islands trick (new-run flag →
    running sum → per-run counts), rolled up per language with the
    count of degenerate docs (a run >= 3 — the "the the the"
    generation-loop signature x130's GLOBAL concentration can blur
    when the doc is long). All-integer; the run windows are per-doc
    partition-local (never a global sort), then two aggregates."""
    d = tables["documents"]
    tk = d.select("doc_id", "lang",
                  F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = (tk.withColumn(
        "brk", F.when(F.col("tok") == F.lag("tok").over(wd), F.lit(0))
        .otherwise(F.lit(1)))
        .withColumn("run_id", F.sum("brk").over(
            wd.rowsBetween(Window.unboundedPreceding, 0))))
    run_len = (runs.groupBy("doc_id", "lang", "run_id")
               .agg(F.count("*").alias("rl")))
    per_doc = (run_len.groupBy("doc_id", "lang")
               .agg(F.max("rl").alias("max_run")))
    return (per_doc.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.max("max_run").alias("longest_run"),
                 F.sum((F.col("max_run") >= 3).cast("long"))
                 .alias("n_bursty"))
            .orderBy("lang"))


_BURSTINESS_ORACLE = """
WITH tk AS (
  SELECT doc_id, lang, s.pos AS pos, s.tok AS tok
  FROM (SELECT doc_id, lang,
               unnest(list_transform(range(1, len(w) + 1),
                      i -> struct_pack(pos := i, tok := w[i]))) AS s
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
              FROM documents))
), runs AS (
  SELECT doc_id, lang, pos,
         CASE WHEN tok = lag(tok) OVER (PARTITION BY doc_id
                                        ORDER BY pos)
              THEN 0 ELSE 1 END AS brk
  FROM tk
), rid AS (
  SELECT doc_id, lang,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs
), run_len AS (
  SELECT doc_id, lang, run_id, COUNT(*) AS rl
  FROM rid GROUP BY doc_id, lang, run_id
), per_doc AS (
  SELECT doc_id, lang, MAX(rl) AS max_run
  FROM run_len GROUP BY doc_id, lang
)
SELECT lang, COUNT(*) AS n_docs, MAX(max_run) AS longest_run,
       CAST(SUM(CASE WHEN max_run >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bursty
FROM per_doc GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def pipeline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "x88_bm25_topk": _q(_x88_bm25_topk),
        "x89_importance_weights": _q(_x89_importance_weights),
        "x90_segment_dedup_rebuild": _q(_x90_segment_dedup_rebuild),
        "x91_length_quantiles": _q(_x91_length_quantiles),
        "x92_pmi_collocations": _q(_x92_pmi_collocations),
        "x93_novelty_curve": _q(_x93_novelty_curve),
        "x94_packing_efficiency": _q(_x94_packing_efficiency),
        "x95_quality_dup_calibration": _q(_x95_quality_dup_calibration),
        "x96_lang_confusion": _q(_x96_lang_confusion),
        "x97_integrity_audit": _q(_x97_integrity_audit),
        "x98_frequency_spectrum": _q(_x98_frequency_spectrum),
        "x99_metadata_inconsistency": _q(_x99_metadata_inconsistency),
        "x100_dup_pagerank": _q(_x100_dup_pagerank),
        "x101_training_manifest": _q(_x101_training_manifest),
        "x102_stream_neardup": _q(_x102_stream_neardup),
        "x103_conversion_window": _q(_x103_conversion_window),
        "x104_cms_heavy_hitters": _q(_x104_cms_heavy_hitters),
        "x105_ppjoin_exact": _q(_x105_ppjoin_exact),
        "x106_event_transitions": _q(_x106_event_transitions),
        "x107_langid_kappa": _q(_x107_langid_kappa),
        "x108_kmv_distinct": _q(_x108_kmv_distinct),
        "x109_key_skew_report": _q(_x109_key_skew_report),
        "x110_quality_auc": _q(_x110_quality_auc),
        "x111_stream_hourly_rollup": _q(_x111_stream_hourly_rollup),
        "x112_stream_dedup_admission": _q(_x112_stream_dedup_admission),
        "x113_split_ks_drift": _q(_x113_split_ks_drift),
        "x114_rrf_hybrid": _q(_x114_rrf_hybrid),
        "x115_phrase_match": _q(_x115_phrase_match),
        "x116_tokenizer_fertility": _q(_x116_tokenizer_fertility),
        "x117_incident_bin_join": _q(_x117_incident_bin_join),
        "x118_stream_session_windows": _q(_x118_stream_session_windows),
        "x119_minhash_calibration": _q(_x119_minhash_calibration),
        "x120_temperature_mix": _q(_x120_temperature_mix),
        "x121_lang_length_regression": _q(_x121_lang_length_regression),
        "x122_quantized_recall": _q(_x122_quantized_recall),
        "x123_weighted_jaccard": _q(_x123_weighted_jaccard),
        "x124_code_switch_audit": _q(_x124_code_switch_audit),
        "x125_lsh_pair_recall": _q(_x125_lsh_pair_recall),
        "x126_dedup_bias_audit": _q(_x126_dedup_bias_audit),
        "x127_shard_balance": _q(_x127_shard_balance),
        "x128_arrow_doc_stats": _q(_x128_arrow_doc_stats),
        "x129_source_overlap": _q(_x129_source_overlap),
        "x130_lexical_concentration": _q(_x130_lexical_concentration),
        "x131_histogram_quantiles": _q(_x131_histogram_quantile_sketch),
        "x132_vocab_growth": _q(_x132_vocab_growth),
        "x133_winnowing_fingerprints": _q(_x133_winnowing_fingerprints),
        "x134_label_centroid_drift": _q(_x134_label_centroid_drift),
        "x135_stream_stream_join": _q(_x135_stream_stream_join),
        "x136_column_profile": _q(_x136_column_profile),
        "x137_snapshot_diff": _q(_x137_snapshot_diff),
        "x138_borda_quality_blend": _q(_x138_borda_quality_blend),
        "x139_decay_mix_schedule": _q(_x139_decay_mix_schedule),
        "x140_token_burstiness": _q(_x140_token_burstiness),
    }


def _rrf_oracle() -> str:
    from hive_parse_lineage_spark.operators.retrieval import rrf_oracle_sql
    return rrf_oracle_sql(RRF_TERMS, k=10, pool=20)


def _phrase_oracle() -> str:
    from hive_parse_lineage_spark.operators.phrasematch import (
        phrase_match_oracle_sql)
    return phrase_match_oracle_sql(PHRASES)


def pipeline_oracle_sql() -> dict[str, str]:
    from hive_parse_lineage_spark.operators.retrieval import bm25_oracle_sql
    return {
        "x88_bm25_topk": bm25_oracle_sql(BM25_TERMS, k=10),
        "x89_importance_weights": _IMPORTANCE_ORACLE,
        "x90_segment_dedup_rebuild": _SEGMENT_REBUILD_ORACLE,
        "x91_length_quantiles": _LENGTH_QUANTILES_ORACLE,
        "x92_pmi_collocations": _PMI_ORACLE,
        "x93_novelty_curve": _novelty_oracle_sql(),
        "x94_packing_efficiency": _packing_efficiency_oracle_sql(),
        "x95_quality_dup_calibration": _QUALITY_DUP_ORACLE,
        "x96_lang_confusion": _lang_confusion_oracle_sql(),
        "x97_integrity_audit": _INTEGRITY_ORACLE,
        "x98_frequency_spectrum": _SPECTRUM_ORACLE,
        "x99_metadata_inconsistency": _METADATA_INCONSISTENCY_ORACLE,
        "x100_dup_pagerank": _dup_pagerank_oracle_sql(),
        "x101_training_manifest": _training_manifest_oracle_sql(),
        "x102_stream_neardup": _stream_neardup_oracle_sql(),
        "x103_conversion_window": _CONVERSION_WINDOW_ORACLE,
        "x104_cms_heavy_hitters": _cms_oracle_sql(),
        "x105_ppjoin_exact": _ppjoin_oracle_sql(),
        "x106_event_transitions": _EVENT_TRANSITIONS_ORACLE,
        "x107_langid_kappa": _langid_kappa_oracle_sql(),
        "x108_kmv_distinct": _kmv_distinct_oracle_sql(),
        "x109_key_skew_report": _KEY_SKEW_ORACLE,
        "x110_quality_auc": _QUALITY_AUC_ORACLE,
        "x111_stream_hourly_rollup": _STREAM_HOURLY_ORACLE,
        "x112_stream_dedup_admission": _STREAM_DEDUP_ORACLE,
        "x113_split_ks_drift": _split_ks_oracle_sql(),
        "x114_rrf_hybrid": _rrf_oracle(),
        "x115_phrase_match": _phrase_oracle(),
        "x116_tokenizer_fertility": _FERTILITY_ORACLE,
        "x117_incident_bin_join": _INCIDENT_BIN_ORACLE,
        "x118_stream_session_windows": _STREAM_SESSION_ORACLE,
        "x119_minhash_calibration": _minhash_calibration_oracle_sql(),
        "x120_temperature_mix": _TEMPERATURE_MIX_ORACLE,
        "x121_lang_length_regression": _LANG_REGRESSION_ORACLE,
        "x122_quantized_recall": _QUANTIZED_RECALL_ORACLE,
        "x123_weighted_jaccard": _WEIGHTED_JACCARD_ORACLE,
        "x124_code_switch_audit": _code_switch_oracle_sql(),
        "x125_lsh_pair_recall": _lsh_pair_recall_oracle_sql(),
        "x126_dedup_bias_audit": _DEDUP_BIAS_ORACLE,
        "x127_shard_balance": _shard_balance_oracle_sql(),
        "x128_arrow_doc_stats": _ARROW_DOC_STATS_ORACLE,
        "x129_source_overlap": _source_overlap_oracle_sql(),
        "x130_lexical_concentration": _LEXICAL_CONCENTRATION_ORACLE,
        "x131_histogram_quantiles": _HISTOGRAM_QUANTILE_ORACLE,
        "x132_vocab_growth": _vocab_growth_oracle_sql(),
        "x133_winnowing_fingerprints": _winnowing_oracle_sql(),
        "x134_label_centroid_drift": _LABEL_CENTROID_DRIFT_ORACLE,
        "x135_stream_stream_join": _STREAM_STREAM_JOIN_ORACLE,
        "x136_column_profile": _column_profile_oracle_sql(),
        "x137_snapshot_diff": _SNAPSHOT_DIFF_ORACLE,
        "x138_borda_quality_blend": _BORDA_BLEND_ORACLE,
        "x139_decay_mix_schedule": _DECAY_MIX_ORACLE,
        "x140_token_burstiness": _BURSTINESS_ORACLE,
    }
