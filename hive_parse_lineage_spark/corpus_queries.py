"""Corpus/analytics query surface x41-x57: contamination n-grams,
decontamination scoring, inverted index, TF-IDF, n-gram LM counts,
duplicate-cluster connected components, cohort retention, funnels,
time-series gap-fill, PII redaction, int8 embedding quantization,
salted aggregation, chunking, MERGE/SCD2, the end-to-end training
pipeline, and per-source mix capping.

Every entry has an exact DuckDB oracle. Cross-engine determinism
tactics (same playbook as extra_queries):
- integer surrogates where a float would be libm/rounding-dependent
  (TF-IDF score ``tf * (N - df)``, contamination percent compare);
- raw doubles (no SQL-side rounding) where both engines read the same
  parquet value and the harness rounds (gap-fill MAX);
- bounded-iteration algorithms replayed as unrolled SQL CTEs
  (connected components, 4 rounds — near-dup graphs are near-cliques,
  diameter << 4; the operator itself also offers run-to-convergence);
- shared character-class-only regexes (valid and identical under both
  Java regex and RE2; DuckDB needs the explicit ``'g'`` flag to match
  Spark's replace-all).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hive_parse_lineage_spark.sources.loader import load_tables

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\d{3}-\\d{4}"


def _q(fn: Callable[[SparkSession, dict], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables = load_tables(spark, sf_dir)
        return fn(spark, tables)
    return run


# ---------------------------------------------------------------------------
# Spark implementations
# ---------------------------------------------------------------------------

def _x41_common_shingles(spark, tables):
    """Boilerplate / benchmark-contamination candidates: 5-gram
    shingles shared by >= 3 documents. One shuffle on the shingle."""
    from hive_parse_lineage_spark.operators.corpus import common_shingles
    return (common_shingles(tables["documents"], n=5, min_docs=3)
            .orderBy(F.col("n_docs").desc(), "shingle"))


def _x42_decontaminate(spark, tables):
    """Per-document decontamination verdict against the x41 flagged
    set (keep iff <= 5% of the doc's distinct shingles are flagged).
    Flagged set broadcasts; the corpus side never reshuffles. The
    (doc, shingle) stream is shingled ONCE and localCheckpointed —
    both the flagged-set aggregate and the per-doc verdict read the
    materialized stream instead of re-tokenizing the corpus (Catalyst
    does not share subtrees across the two plan branches)."""
    from hive_parse_lineage_spark.operators.corpus import (
        common_shingles, contamination_score, doc_shingles)
    docs = tables["documents"]
    pairs = doc_shingles(docs, n=5).localCheckpoint(eager=True)
    flagged = common_shingles(docs, n=5, min_docs=3, pairs=pairs)
    return (contamination_score(docs, flagged, n=5, max_flagged_pct=5,
                                pairs=pairs)
            .orderBy("doc_id"))


def _x43_inverted_index(spark, tables):
    from hive_parse_lineage_spark.operators.corpus import inverted_index
    return inverted_index(tables["documents"]).orderBy("token")


def _x44_tfidf_topk(spark, tables):
    from hive_parse_lineage_spark.operators.corpus import tf_idf_topk
    return tf_idf_topk(tables["documents"], k=3).orderBy("doc_id", "rnk")


def _x45_bigram_counts(spark, tables):
    """Corpus bigram LM counts, Zipf head (top 100)."""
    from hive_parse_lineage_spark.operators.corpus import ngram_counts
    return (ngram_counts(tables["documents"], n=2)
            .orderBy(F.col("n").desc(), "ngram").limit(100))


def _x46_dup_clusters(spark, tables):
    """Near-dup pairs -> transitive duplicate clusters, end to end on
    the scale path: edges come from MinHash-LSH banding (the x07
    pipeline — no all-pairs comparison at any size), components from
    4 rounds of min-label propagation — the bounded variant so the SQL
    oracle can unroll identical rounds. 4 >> the diameter of
    near-clique duplicate graphs."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.components import connected_components
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    docs = tables["documents"]
    edges = (minhash_near_dups(docs, threshold=0.3, n_hashes=64, bands=16,
                               shingle_k=2, hasher=portable_hash64,
                               max_bucket_size=None)
             .select("id_a", "id_b"))
    vertices = docs.select(F.col("doc_id").alias("vertex"))
    return (connected_components(edges, vertices=vertices, max_iter=4)
            .orderBy("vertex"))


def _x47_retention(spark, tables):
    """Weekly cohort retention over the events stream: cohort = ISO
    week of first activity, offset in whole weeks. countDistinct is
    the only expand; both date_truncs are codegen projections."""
    e = tables["events"]
    first = (e.groupBy("user_id")
             .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")))
    active = (e.select("user_id",
                       F.date_trunc("week", F.col("ts")).cast("date").alias("wk"))
              .distinct())
    return (active.join(first, "user_id")
            .withColumn("week_offset",
                        (F.datediff("wk", "cohort") / 7).cast("bigint"))
            .groupBy("cohort", "week_offset")
            .agg(F.countDistinct("user_id").alias("n_users"))
            .orderBy("cohort", "week_offset"))


def _x48_funnel(spark, tables):
    """Strictly-ordered 3-stage funnel (signup -> view/click -> purchase),
    each stage's event strictly after the previous stage's first event.
    Three shuffles on user_id that all reuse one partitioning."""
    e = tables["events"]
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("ts0")))
    v = (e.filter(F.col("event_type").isin("view", "click"))
         .join(s, "user_id").filter(F.col("ts") > F.col("ts0"))
         .groupBy("user_id").agg(F.min("ts").alias("ts1")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(v, "user_id").filter(F.col("ts") > F.col("ts1"))
         .groupBy("user_id").agg(F.min("ts").alias("ts2")))

    def stage(df, n, name):
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(n).alias("stage"), F.lit(name).alias("step"), "n_users")

    return (stage(s, 1, "signup")
            .unionAll(stage(v, 2, "engage"))
            .unionAll(stage(p, 3, "purchase"))
            .orderBy("stage"))


def _x49_gapfill(spark, tables):
    """Per-series daily gap-fill with forward fill: calendar x series
    left-joined to sparse observations, then last-non-null carry over a
    window PARTITIONED by the series key — no global window, so the
    fill scales out with the number of series."""
    e = tables["events"]
    days = spark.sql(
        "SELECT explode(sequence(DATE'2024-01-01', DATE'2024-01-30', "
        "interval 1 day)) AS d")
    types = e.select("event_type").distinct()
    cal = types.crossJoin(F.broadcast(days))
    obs = (e.filter(F.col("value") >= 250)
           .groupBy("event_type", F.col("ts").cast("date").alias("d"))
           .agg(F.max("value").alias("mx")))
    w = (Window.partitionBy("event_type").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (cal.join(obs, ["event_type", "d"], "left")
            .select("event_type", "d",
                    F.last("mx", ignorenulls=True).over(w).alias("filled"),
                    F.col("mx").isNull().alias("was_gap"))
            .orderBy("event_type", "d"))


def _x50_pii_redact(spark, tables):
    """PII scrubbing: deterministic synthetic contact block appended to
    each doc (the corpus is synthetic and PII-free), then email/phone
    regex redaction + per-doc match counts. Character-class-only
    patterns, identical under Java regex and RE2; pure codegen."""
    alt = F.when(F.col("doc_id") % 3 == 0,
                 F.concat(F.lit(" alt b"), F.col("doc_id").cast("string"),
                          F.lit("@y.io"))).otherwise(F.lit(""))
    synth = F.concat(
        F.lit("contact u"), F.col("doc_id").cast("string"),
        F.lit("@example.com ph 555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        alt, F.lit(" "), F.substring("text", 1, 80))
    red = F.regexp_replace(
        F.regexp_replace(synth, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    return (tables["documents"]
            .select("doc_id", red.alias("redacted"),
                    F.regexp_count(synth, F.lit(EMAIL_RE)).alias("n_emails"),
                    F.regexp_count(synth, F.lit(PHONE_RE)).alias("n_phones"))
            .orderBy("doc_id"))


def _x51_embedding_quantize(spark, tables):
    """Symmetric int8 quantization of the embedding column — the 4x
    storage cut before sharding an ANN index. floor-based codes so the
    oracle replays exactly; scale is the raw double (harness rounds)."""
    from hive_parse_lineage_spark.functions.vector import quantize_int8
    codes, scale = quantize_int8("embedding")
    return (tables["embeddings"]
            .select("vec_id", codes.alias("codes"), scale.alias("scale"))
            .orderBy("vec_id"))


def _x52_salted_agg(spark, tables):
    """Skew-proof two-stage aggregation (explicit salt fan-out) over
    the low-cardinality event_type key — exact for COUNT/SUM, so the
    oracle is the plain GROUP BY."""
    from hive_parse_lineage_spark.operators.skew import salted_agg
    return (salted_agg(tables["events"], ["event_type"], sums=["value"])
            .orderBy("event_type"))


def _x53_chunking(spark, tables):
    """Overlapping 64-token windows with stride 48 — the RAG /
    training-context chunking step. Explode-only plan, no shuffle."""
    from hive_parse_lineage_spark.operators.corpus import chunk_documents
    return (chunk_documents(tables["documents"], chunk_tokens=64, stride=48)
            .orderBy("doc_id", "chunk_id"))


def _x54_merge_upsert(spark, tables):
    """Format-free MERGE (anti-join + union) brought into the checked
    surface: orders < 1000 is the target; keys 500-1499 arrive as
    updates (doubled price), keys divisible by 10 as deletes."""
    from hive_parse_lineage_spark.operators.merge import merge_upsert
    o = tables["orders"]
    target = (o.filter(F.col("o_orderkey") < 1000)
              .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    source = (o.filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1500))
              .select("o_orderkey", "o_orderstatus",
                      (F.col("o_totalprice") * 2).alias("o_totalprice"),
                      (F.col("o_orderkey") % 10 == 0).alias("is_delete")))
    return (merge_upsert(target, source, "o_orderkey", delete_col="is_delete")
            .orderBy("o_orderkey"))


def _x55_scd2(spark, tables):
    """SCD type-2 dimension maintenance: every 5th customer gets a new
    version; old versions are closed out, exactly one current row per
    key survives."""
    from hive_parse_lineage_spark.operators.merge import scd2_apply
    c = tables["customer"]
    dim = c.select(
        "c_custkey", "c_acctbal",
        F.lit("2024-01-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"))
    updates = (c.filter(F.col("c_custkey") % 5 == 0)
               .select("c_custkey",
                       (F.col("c_acctbal") + 100).alias("c_acctbal"),
                       F.lit("2024-06-01").cast("timestamp")
                       .alias("effective_from")))
    return (scd2_apply(dim, updates, "c_custkey")
            .orderBy("c_custkey", "effective_from"))


def _x56_training_pipeline(spark, tables):
    """The whole training-data pipeline as ONE lazy plan: C4-style
    quality filter -> decontamination against corpus boilerplate ->
    exact-dup survivor selection -> deterministic train/val/test split.
    Composes the x37/x42/x11/x39 operators; Catalyst fuses the filters
    and the only shuffles are the shingle count, the dup groupBy and
    the broadcast-backed joins. The corpus is shingled ONCE
    (localCheckpoint) — the boilerplate aggregate and the per-doc
    contamination verdict both read the materialized (doc, shingle)
    stream; the verdict is computed per doc independently, so scoring
    every doc and intersecting with the quality-pass set afterwards is
    semantically identical to scoring only the quality survivors."""
    from hive_parse_lineage_spark.functions import text as T
    from hive_parse_lineage_spark.operators.corpus import (
        common_shingles, contamination_score, doc_shingles)
    from hive_parse_lineage_spark.operators.dedup import exact_dedup
    from hive_parse_lineage_spark.operators.sampling import hash_split
    docs = tables["documents"]
    t = T.tokens("text")
    n, nd = F.size(t), F.size(F.array_distinct(t))
    total = T.total_token_chars("text")
    keep_q = ((n >= 20) & (n <= 1000)
              & (total >= 2 * n) & (total <= 12 * n)
              & (nd * 10 >= 3 * n))
    q = docs.filter(keep_q)
    pairs = doc_shingles(docs, n=5).localCheckpoint(eager=True)
    flagged = common_shingles(docs, n=5, min_docs=3, pairs=pairs)
    clean_ids = (contamination_score(docs, flagged, n=5,
                                     max_flagged_pct=5, pairs=pairs)
                 .filter("keep").select("doc_id"))
    # clean_ids / keep_ids are survivor-id sets — corpus-proportional,
    # so plain shuffle joins (a forced broadcast would materialize the
    # whole id set on the driver at 100 TB; AQE still broadcasts them
    # when actually small)
    clean = q.join(clean_ids, "doc_id")
    keep_ids = exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))
    survivors = clean.join(keep_ids, "doc_id")
    return (hash_split(survivors, salt="v1")
            .select("doc_id", "bucket", "split", F.size(T.tokens("text"))
                    .alias("n_tokens"))
            .orderBy("doc_id"))


def _x57_source_cap(spark, tables):
    """Training-mix rebalancing: cap every source at 15 docs, selected
    in deterministic hash order (a reproducible uniform sample of each
    over-represented source)."""
    from hive_parse_lineage_spark.operators.sampling import cap_per_group
    return (cap_per_group(tables["documents"], "source", cap=15, salt="mix1")
            .select("doc_id", "source", "pick_rank")
            .orderBy("source", "pick_rank"))


def _x58_cumulative_uniques(spark, tables):
    """Cumulative unique users per event type by day via the
    first-touch transform: distinct-over-an-expanding-window is O(n^2)
    state, but 'users whose FIRST day <= d' is a groupBy + running sum
    — the scalable spelling. The running sum is PARTITIONED by the
    series key and runs over the tiny per-day aggregate, not raw
    events."""
    e = tables["events"]
    first = (e.groupBy("event_type", "user_id")
             .agg(F.min(F.col("ts").cast("date")).alias("day")))
    daily = (first.groupBy("event_type", "day")
             .agg(F.count("*").alias("new_users")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (daily.select("event_type", "day", "new_users",
                         F.sum("new_users").over(w).alias("cum_users"))
            .orderBy("event_type", "day"))


def _x59_dedup_keep_one(spark, tables):
    """The dedup pipeline's actual deliverable: the SURVIVING corpus
    after near-dup removal. x46's clusters (MinHash-LSH edges + bounded
    min-label propagation) filtered to cluster representatives — a doc
    survives iff it IS its component's min label (singletons trivially
    are). Pure filter over the x46 plan: no extra shuffle."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.components import connected_components
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    docs = tables["documents"]
    edges = (minhash_near_dups(docs, threshold=0.3, n_hashes=64, bands=16,
                               shingle_k=2, hasher=portable_hash64,
                               max_bucket_size=None)
             .select("id_a", "id_b"))
    vertices = docs.select(F.col("doc_id").alias("vertex"))
    comp = connected_components(edges, vertices=vertices, max_iter=4)
    return (comp.filter(F.col("vertex") == F.col("component"))
            .select(F.col("vertex").alias("doc_id")).orderBy("doc_id"))


def _x60_ngram_containment(spark, tables):
    """Directional containment pairs over a bounded id space — catches
    a doc quoted whole inside a larger one (near-1 containment, low
    Jaccard). Size blocking is lossless: C(A in B) >= t needs
    |sh(B)| >= t|sh(A)|. Unbounded corpora go through LSH first."""
    from hive_parse_lineage_spark.operators.dedup import ngram_containment_pairs
    docs = tables["documents"].filter(F.col("doc_id") < 250)
    return (ngram_containment_pairs(docs, shingle_k=3, threshold=0.8,
                                    blocked=True)
            .orderBy("id_a", "id_b"))


def _x61_stratified_sample(spark, tables):
    """Deterministic stratified sampling for corpus mixture control:
    keep 50% of English docs, 20% of everything else, decided by a
    portable salted hash of the doc id — reproducible across engines
    and runs, unlike Bernoulli ``sampleBy``. One codegen projection +
    filter; no shuffle, no state."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    d = tables["documents"]
    h = F.pmod(portable_hash64(
        F.concat(F.lit("s61|"), F.col("doc_id").cast("string"))), F.lit(10000))
    rate_bp = F.when(F.col("lang") == "en", F.lit(5000)).otherwise(F.lit(2000))
    return (d.filter(h < rate_bp)
            .select("doc_id", "lang", "source").orderBy("doc_id"))


def _x62_embedding_centroids(spark, tables):
    """Per-label centroids of L2-normalized embeddings, emitted as
    (label, dim_idx, centroid) rows: posexplode + one hash aggregate —
    the row spelling avoids engine-specific array aggregation and
    shuffles once on (label, dim_idx). The norm is a codegen
    ``aggregate`` fold over the vector; zero vectors drop out via
    NULLIF rather than dividing by zero."""
    e = tables["embeddings"]
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))
    # r13: bind the O(dim) norm once per row (one-element outer
    # transform) — referencing it inside the per-element lambda would
    # re-run the fold per element, O(dim^2)/row (the x51 bug).
    unit = F.flatten(F.transform(
        F.array(F.nullif(norm, F.lit(0.0))),
        lambda nv: F.transform("embedding",
                               lambda x: x.cast("double") / nv)))
    return (e.select("label", F.posexplode(unit).alias("dim_idx", "v"))
            .groupBy("label", "dim_idx")
            .agg(F.round(F.avg("v"), 4).alias("centroid"))
            .orderBy("label", "dim_idx"))


def _x63_lm_score(spark, tables):
    """LM-frequency quality proxy (the KenLM-filter shape without the
    model): score each doc by the average corpus frequency of its
    bigrams. Rare-bigram-heavy docs (garbled text, boilerplate noise)
    score low. The corpus count attaches via a COUNT window partitioned
    by ngram — ONE explode and two shuffles (ngram, then doc), instead
    of the aggregate+self-join spelling that scans and explodes the
    corpus twice (measured ~2x faster at sf0.1)."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    docs = tables["documents"]
    grams = docs.select("doc_id",
                        F.explode(word_shingles("text", 2)).alias("ngram"))
    w = Window.partitionBy("ngram")
    return (grams.withColumn("n", F.count(F.lit(1)).over(w))
            .groupBy("doc_id")
            .agg(F.round(F.avg("n"), 4).alias("avg_bigram_freq"),
                 F.count(F.lit(1)).alias("n_bigrams"))
            .orderBy("doc_id"))


def _x64_incremental_dedup(spark, tables, cutoff=400):
    """Incremental-ingestion dedup: a 'new batch' (doc_id >= 400)
    checked against the standing corpus (doc_id < 400) — survivors are
    new docs that are neither an exact copy (md5 anti-join) nor a
    near-dup (cross-LSH, est_jaccard >= 0.5) of any corpus doc. The
    cross-LSH shape never joins corpus-to-corpus, so daily cost scales
    with the batch (operators/dedup.py lsh_cross_pairs).

    Exact-dup prefilter scale shape: everything broadcast is
    BATCH-scaled, never corpus-scaled. The batch's md5 set (bounded by
    assumption — it's one ingestion batch) broadcasts into a semi-join
    that filters the standing corpus's hashes map-side, so the corpus
    is scanned (one projected column) but never shuffled and never
    materialized on the driver; the surviving hit set (<= batch size)
    then broadcasts into the anti-join. The earlier spelling broadcast
    the CORPUS's distinct md5 set — a driver OOM at 100 TB. For a
    cheaper corpus pass still, a fixed-size bloom over the batch
    hashes (operators/corpus.py decontamination pattern) can prefilter
    the scan before the exact confirm."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import (
        lsh_cross_pairs, minhash_signature_agg)
    docs = tables["documents"]
    corpus = docs.filter(F.col("doc_id") < cutoff)
    new = docs.filter(F.col("doc_id") >= cutoff)
    batch = new.withColumn("h", F.md5("text"))
    batch_hashes = batch.select("h").distinct()
    hit_hashes = (corpus.select(F.md5("text").alias("h"))
                  .join(F.broadcast(batch_hashes), "h", "left_semi")
                  .distinct())
    no_exact = batch.join(F.broadcast(hit_hashes), "h", "left_anti")
    # signatures are per-doc: one pass over ALL docs, split afterwards
    # (two separate minhash_signature_agg calls would scan and explode
    # the corpus twice for identical values)
    sig = minhash_signature_agg(docs, n_hashes=64, shingle_k=2,
                                hasher=portable_hash64)
    sig_new = sig.filter(F.col("doc_id") >= cutoff)
    sig_corpus = sig.filter(F.col("doc_id") < cutoff)
    near = (lsh_cross_pairs(sig_new, sig_corpus, n_hashes=64, bands=16,
                            max_bucket_size=None)
            .filter(F.col("est_jaccard") >= 0.5)
            .select(F.col("new_id").alias("doc_id")).distinct())
    return (no_exact.join(near, "doc_id", "left_anti")
            .select("doc_id").orderBy("doc_id"))


def _x65_rolling_zscore(spark, tables):
    """Windowed anomaly detection over the event stream: per-series
    daily totals, trailing mean/stddev over the 7 most recent OBSERVED
    days (a ROWS frame excluding the current day — with gaps in the
    series the lookback spans more than 7 calendar days; x69 is the
    calendar-correct RANGE INTERVAL spelling), |z| > 2 flags. One
    shuffle to the daily aggregate; the window runs per series over
    ~days rows — scales with series count, not event count.

    r6 respelling, fully order-free: daily totals accumulate as
    INTEGER CENTS (floor(value*100), the x111 surrogate — a double
    SUM's order differs across engines/partitionings), the |z| > 2
    flag is the cross-multiplied integer inequality
    (c·x − S)² > 4·(c·Q − S²) over the frame's exact moment sums
    (population-stddev semantics, no float in the decision at all),
    and the emitted total/mu7 doubles come from single identical
    division trees over exact integers — bit-identical on both
    engines at every SF (the earlier builtin stddev_pop/ROUND
    spelling straddled a 2 dp boundary at sf0.001; SURVEY §5.2).
    Overflow bound: daily cent totals up to ~1e9 keep the squared
    moments inside int64; beyond that the x22-class float path."""
    e = tables["events"]
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.floor(F.col("value") * 100).cast("long"))
                  .alias("tc")))
    w = (Window.partitionBy("event_type").orderBy("d")
         .rowsBetween(-7, -1))
    s = F.sum("tc").over(w)
    q = F.sum(F.col("tc") * F.col("tc")).over(w)
    c = F.count("tc").over(w)
    return (daily.select(
                "event_type", "d", "tc",
                s.alias("s"), q.alias("q"), c.alias("c"))
            .filter(F.col("c") >= 1)
            .select(
                "event_type", "d",
                F.expr("cast(tc as double) / 100").alias("total"),
                F.expr("cast(s as double) / c / 100").alias("mu7"),
                F.expr("CASE WHEN c * q - s * s > 0 THEN "
                       "(c * tc - s) * (c * tc - s) "
                       "> 4 * (c * q - s * s) END").alias("anomaly"))
            .orderBy("event_type", "d"))


def _x66_recursive_cte(spark, tables):
    """WITH RECURSIVE (Spark 4 operator, UnionLoop execution): a
    recursive date spine left-joined to daily event counts — the
    iterate-until-done SQL surface the reference's Hive dialect never
    had. Recursion depth is the spine length (30), independent of data
    volume; the join is one shuffle on the date key."""
    return spark.sql("""
WITH RECURSIVE days(d) AS (
  SELECT DATE'2024-01-01' AS d
  UNION ALL
  SELECT date_add(d, 1) FROM days WHERE d < DATE'2024-01-30'
)
SELECT d, COUNT(e.ts) AS n_events
FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = d
GROUP BY d ORDER BY d
""")


_LATERAL_TOPN_SQL = """
SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
ORDER BY c.c_custkey, price DESC, o.o_orderkey
"""


def _x67_lateral_topn(spark, tables):
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the
    top-N-per-group spelling SQL users reach for first). Catalyst
    decorrelates it into a window/join plan — same physical shape as
    the explicit row_number() query (q40), no per-row re-execution."""
    return spark.sql(_LATERAL_TOPN_SQL)


def _x68_distribute_sort_by(spark, tables):
    """Hive-dialect DISTRIBUTE BY / SORT BY (partition-then-local-sort,
    the pre-window Hive idiom a reference user writes daily). Spark
    executes both natively; the result SET is order-independent, so the
    oracle is the plain projection — what the harness's row-sorted
    hash checks is exactly the clauses' contract (same rows, engine-
    chosen global order)."""
    return spark.sql(
        "SELECT doc_id, lang, n_chars FROM documents "
        "DISTRIBUTE BY lang SORT BY doc_id")


def _x69_interval_range_frame(spark, tables):
    """RANGE frame with a calendar INTERVAL bound: trailing-7-day
    moving sum over per-day totals — value-based frames (gaps widen
    the lookback correctly) vs q27's row-count frames. One shuffle to
    the daily aggregate; the window orders within each series."""
    return spark.sql("""
SELECT event_type, CAST(ts AS DATE) AS d, ROUND(SUM(value), 2) AS total,
       ROUND(SUM(SUM(value)) OVER (PARTITION BY event_type
             ORDER BY CAST(ts AS DATE)
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 2)
         AS total_7d
FROM events GROUP BY event_type, CAST(ts AS DATE)
ORDER BY event_type, d
""")


def _x70_hot_key_split_join(spark, tables):
    """Skew-mitigation two-path join under the correctness gate: keys
    above the hot threshold broadcast-join, the tail shuffle-joins,
    union. The oracle is the PLAIN join — the split is a physical
    strategy, invisible in the result, and the hash check proves it
    (any row lost or duplicated at the hot/tail boundary fails)."""
    from hive_parse_lineage_spark.operators.skew import hot_key_split_join
    e = tables["events"]
    dim = (e.groupBy("event_type")
           .agg(F.round(F.avg("value"), 2).alias("avg_v")))
    joined = hot_key_split_join(e.select("event_id", "event_type"), dim,
                                "event_type", hot_threshold=3000)
    return joined.select("event_id", "event_type", "avg_v") \
                 .orderBy("event_id")


def _x71_bucket_sample(spark, tables):
    """Deterministic ``TABLESAMPLE (BUCKET 1 OUT OF 10 ON o_orderkey)``:
    the reference's only worked end-to-end example is a TABLESAMPLE scan
    (LineParser.java:794-805). Spark's native TABLESAMPLE is a
    seeded-random Bernoulli sample (not replayable cross-engine), so the
    engine's bucket_sample keys the bucket on the portable hash — the
    same sampled set on every engine and re-run, and the predicate is a
    plain codegen filter that composes with pushdown/pruning.

    No ORDER BY on the Spark side (r10): the gate's value hash is
    order-insensitive and a sample feeding downstream stages has no
    consumer for a global sort — at sf1.0 the sort alone cost ~0.45 s
    on the 150k-row result (half of x71's former 2.9x gate excess).
    The DuckDB twin KEEPS its ORDER BY: measured A/B at sf1.0, the
    unordered SELECT goes through DuckDB's streaming result collector
    effectively single-threaded (~7 s) while the sort is a pipeline
    breaker that keeps the md5 filter parallel (~0.9 s; bare
    COUNT(*) over the same filter is 0.7 s) — each engine runs its
    best spelling of the same unordered-set semantics."""
    from hive_parse_lineage_spark.operators.sampling import bucket_sample
    return (bucket_sample(tables["orders"], "o_orderkey",
                          bucket=1, out_of=10)
            .select("o_orderkey", "o_custkey",
                    F.round("o_totalprice", 2).alias("price")))


_X72_BOILER = "terms of service apply to every page of this corpus"


def _x72_capped_lsh(spark, tables):
    """MinHash-LSH with the hot-bucket cap ACTIVE, under the hash gate:
    20 synthesized boilerplate clones (identical text, built by both
    engines in-query, so the fixture is SF-independent) flood every
    band bucket past max_bucket_size=10 and are dropped BEFORE the
    self-join — the DuckDB oracle replays the cap rule itself (window
    count per bucket, drop oversized), so any row the cap wrongly
    keeps or drops at the boundary fails the value hash. x07 stays the
    uncapped twin; this is the production posture's gate."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    docs = tables["documents"].select("doc_id", "text")
    clones = (spark.range(1, 21)
              .select((F.lit(9_000_000) + F.col("id")).alias("doc_id"),
                      F.lit(_X72_BOILER).alias("text")))
    return (minhash_near_dups(docs.unionByName(clones), threshold=0.3,
                              n_hashes=16, bands=4, shingle_k=2,
                              hasher=portable_hash64,
                              max_bucket_size=10)
            .orderBy("id_a", "id_b"))


_X74_WEIGHTS = {"src0": 2.5, "src1": 0.3, "src2": 2.0, "src3": 0.0}


def _x73_dup_span_fraction(spark, tables):
    """Substring-level duplication accounting (Lee et al.-style span
    dedup signal): per document, the count and integer permille of
    token positions covered by a 10-gram occurring in >= 2 documents.
    Doc-level dedup (x07/x11) misses partially-copied documents; this
    is the span-level metric that catches them. All-integer output,
    replayed exactly by the DuckDB oracle."""
    from hive_parse_lineage_spark.operators.corpus import duplicate_span_stats
    return (duplicate_span_stats(tables["documents"], n=10, min_docs=2)
            .orderBy("doc_id"))


def _x74_weighted_sample(spark, tables):
    """Deterministic epoch-weighted training mix: src0 upsampled 2.5x
    (2 full epochs + a hash-chosen half), src2 2x, src1 kept at 30%,
    src3 dropped, everything else 1x. The copy index is 1-based so
    downstream packing treats copies as distinct docs. Pure function
    of doc_id — the oracle replays the exact mix."""
    from hive_parse_lineage_spark.operators.sampling import weighted_mix
    return (weighted_mix(tables["documents"].select("doc_id", "source"),
                         _X74_WEIGHTS, salt="mix")
            .orderBy("doc_id", "copy"))


def _x75_chunk_dedup(spark, tables):
    """Chunk-granularity exact dedup (the unit that must be unique in
    an assembled training corpus is the chunk, not the document):
    x53's 64/48 overlapping windows, one survivor per distinct chunk
    text with the corpus-wide copy count. One uniform md5 shuffle."""
    from hive_parse_lineage_spark.operators.dedup import chunk_dedup
    return (chunk_dedup(tables["documents"], chunk_tokens=64, stride=48)
            .orderBy("doc_id", "chunk_id"))


def _x77_bloom_decontaminate(spark, tables):
    """Bloom-prefiltered benchmark decontamination: the eval set (every
    25th doc) hashes into a 256-word bloom; each corpus shingle is
    membership-tested via two broadcast word lookups + codegen bit
    tests, then exactly confirmed. Output counts per doc expose the
    prefilter's false-positive cost (`false_pos = bloom - exact`). The
    oracle replays the identical double-hash bit pattern, so a single
    misplaced bit anywhere in the filter fails the hash gate."""
    from hive_parse_lineage_spark.operators.corpus import bloom_decontaminate
    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    return (bloom_decontaminate(docs, bench, n=5, n_words=256)
            .orderBy("doc_id"))


def _x78_semdedup(spark, tables):
    """SemDeDup over the embeddings table: every 100th vector is a seed
    centroid, each vector joins its most-similar seed's cluster, and
    within a cluster any vector with a lower-id cell-mate at cosine
    >= 0.2 is dropped. The cluster assignment bounds the pair join —
    the all-pairs cosine never materializes at any corpus size."""
    from hive_parse_lineage_spark.operators.dedup import semdedup
    e = tables["embeddings"]
    seeds = (e.filter(F.col("vec_id") % 100 == 0)
             .select(F.col("vec_id").alias("seed_id"), "embedding"))
    return semdedup(e, seeds, threshold=0.2).orderBy("vec_id")


def _x79_ann_recall(spark, tables):
    """Recall@5 of the x10 hyperplane-LSH path vs the x09 exact top-k,
    per query (self-hits excluded on both sides). The quality dial for
    the ANN scale path, measured inside the engine — integer permille
    so the oracle replays it exactly."""
    from hive_parse_lineage_spark.operators.similarity import ann_recall
    e = tables["embeddings"]
    q = (e.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    return ann_recall(e, q, k=5, n_bits=8).orderBy("query_id")


def _x80_mmr_diversify(spark, tables):
    """MMR-diversified retrieval: per query (vec_id < 5), 3 picks from
    a 10-candidate cosine pool, each round re-scored as 0.7*sim(q,c) -
    0.3*max-sim-to-already-selected. Bounded driver rounds over
    pool-sized DataFrames; the oracle unrolls the identical 3 rounds
    as CTEs, so every pick (and its score) is hash-gated."""
    from hive_parse_lineage_spark.operators.similarity import mmr_topk
    e = tables["embeddings"]
    q = (e.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    return mmr_topk(e, q, k=3, pool=10, lam=0.7).orderBy("query_id", "rank")


def _x81_quality_threshold(spark, tables):
    """Adaptive quality gating: keep a document iff its x03 quality
    score clears its own language's median — the dynamic-threshold
    variant of C4/Gopher-style filtering (a fixed global cutoff
    over/under-filters whole languages). Exact median here for the
    oracle; at 100 TB the same plan swaps in ``approx_percentile``
    (sketch-mergeable, one pass). The per-language median table is
    broadcast back, so the corpus side stays a projection + filter."""
    from hive_parse_lineage_spark.functions.text import quality_score
    docs = tables["documents"].select(
        "doc_id", "lang", quality_score("text").alias("score"))
    med = docs.groupBy("lang").agg(F.median("score").alias("med"))
    return (docs.join(F.broadcast(med), "lang")
            .select("doc_id", "lang", "score",
                    F.round("med", 4).alias("lang_median"),
                    (F.col("score") >= F.col("med")).cast("int").alias("keep"))
            .orderBy("doc_id"))


def _x82_oov_rate(spark, tables):
    """Tokenizer-vocabulary coverage: build the top-100 BPE-ish-token
    vocabulary from the corpus itself (count desc, token asc — exact
    and replayable), broadcast it back, and report each document's
    out-of-vocabulary token count and integer permille. The diagnostic
    run before freezing a tokenizer: one token-count shuffle + a
    TakeOrdered top-k; the per-doc pass is explode + broadcast lookup
    + one count aggregate — no corpus-sized join key anywhere."""
    from hive_parse_lineage_spark.functions.text import bpe_ish_tokens
    docs = tables["documents"]
    toks = docs.select("doc_id", F.explode(bpe_ish_tokens("text")).alias("tok"))
    vocab = (toks.groupBy("tok").agg(F.count("*").alias("n"))
             .orderBy(F.col("n").desc(), "tok").limit(100)
             .select("tok", F.lit(1).alias("_v")))
    return (toks.join(F.broadcast(vocab), "tok", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 (F.count("*") - F.count("_v")).alias("n_oov"))
            .withColumn("oov_permille",
                        F.expr("(n_oov * 1000) div n_tokens"))
            .orderBy("doc_id"))


def _x83_cluster_representatives(spark, tables):
    """Quality-aware cluster representatives: assign embeddings to the
    x78 seed clusters, join each vector's document (doc_id == vec_id
    in the testdata), and keep the highest-quality member per cluster
    — the curation move that keeps the BEST member of each semantic
    group instead of an arbitrary survivor. Cross-table (documents +
    embeddings); the per-cell argmax is one window over the cell key."""
    from hive_parse_lineage_spark.functions.text import quality_score
    from hive_parse_lineage_spark.operators.dedup import seed_assign
    e = tables["embeddings"]
    seeds = (e.filter(F.col("vec_id") % 100 == 0)
             .select(F.col("vec_id").alias("seed_id"), "embedding"))
    asg = seed_assign(e, seeds).select("vec_id", "cell")
    q = tables["documents"].select(
        F.col("doc_id"), quality_score("text").alias("score"))
    joined = asg.join(q, asg["vec_id"] == q["doc_id"]).select(
        "cell", "doc_id", "score")
    w = Window.partitionBy("cell").orderBy(F.col("score").desc(), "doc_id")
    wc = Window.partitionBy("cell")
    return (joined
            .withColumn("n_members", F.count("*").over(wc))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("cell", "doc_id", F.col("score").alias("rep_score"),
                    "n_members")
            .orderBy("cell"))


def _x84_split_leakage(spark, tables):
    """Train->test leakage audit over the x39 hash split itself: train
    documents that share at least one 8-gram with ANY test document
    (near-dups straddling the split boundary silently leak eval data
    into training). One shuffle on the shingle key; the test-side
    shingle set is distinct-reduced first, and AQE broadcasts it when
    it fits. Output: leaking train docs with their shared-gram count.
    The corpus is shingled ONCE with the split label carried through
    (localCheckpoint); train and test pair streams are filters over
    the one materialized stream — one scan + one distinct shuffle
    instead of a scan/explode/distinct per side."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    from hive_parse_lineage_spark.operators.sampling import hash_split
    from hive_parse_lineage_spark.operators.util import spread_for_compute
    split = hash_split(tables["documents"], salt="v1")
    pairs = (spread_for_compute(split)
             .select("doc_id", "split",
                     F.explode(F.array_distinct(word_shingles("text", 8)))
                     .alias("shingle"))
             .localCheckpoint(eager=True))
    tr = pairs.filter(F.col("split") == "train").select("doc_id", "shingle")
    te = (pairs.filter(F.col("split") == "test")
          .select("shingle").distinct())
    return (tr.join(te, "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared_grams"))
            .orderBy("doc_id"))


def _x85_user_sequences(spark, tables):
    """Behavior-sequence assembly: each user's first 20 events (by
    time, ties by event id) flattened to an ordered event-type string
    — the training-example constructor for session/recommendation
    models. One window shuffle on user_id, then sort_array over
    collected structs (deterministic — a bare collect_list would be
    partition-order dependent)."""
    e = tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (e.select("user_id", "ts", "event_id", "event_type")
             .withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= 20))
    seq = F.concat_ws(
        ",", F.transform(
            F.sort_array(F.collect_list(
                F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"]))
    return (first.groupBy("user_id")
            .agg(F.count("*").alias("n_events"), seq.alias("seq"))
            .orderBy("user_id"))


def _x86_source_drift(spark, tables):
    """Per-source token-distribution drift: total-variation distance
    (integer permille) between each source's token distribution and
    the whole-corpus distribution — the mix-curation diagnostic that
    flags a source whose language shifted. All-integer arithmetic:
    TV = sum_t |c_st*T - c_t*T_s| / (2*T_s*T), with the absent-token
    tail folded in CLOSED FORM ((T - sum_present c_t) * T_s) so the
    per-source sum runs only over tokens the source actually contains
    — never vocabulary x sources."""
    from hive_parse_lineage_spark.functions.text import tokens
    toks = (tables["documents"]
            .select("source", F.explode(tokens("text")).alias("tok")))
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    ct = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    ts_ = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    total = ts_.select(F.sum("t_s").alias("t_all"))
    j = (st.join(ct, "tok")
         .join(F.broadcast(ts_), "source")
         .crossJoin(F.broadcast(total)))
    per_src = (j.groupBy("source", "t_s", "t_all")
               .agg(F.sum(F.abs(F.col("c_st") * F.col("t_all")
                                - F.col("c_t") * F.col("t_s")))
                    .alias("present_num"),
                    F.sum("c_t").alias("present_ct")))
    num = (F.col("present_num")
           + (F.col("t_all") - F.col("present_ct")) * F.col("t_s"))
    return (per_src
            .select("source", F.col("t_s").alias("n_tokens"),
                    F.col("t_all").alias("_t_all"),
                    num.alias("_num"))
            .withColumn("tv_permille",
                        F.expr("(_num * 1000) div (2 * n_tokens * _t_all)"))
            .select("source", "n_tokens", "tv_permille")
            .orderBy("source"))


def _x87_cluster_size_histogram(spark, tables):
    """The dedup report: distribution of duplicate-cluster sizes over
    the x46 components (how much of the corpus sits in 2-clusters vs
    giant boilerplate blobs — the number that decides cap and survivor
    policy). Two cheap aggregations after the component labels: size
    per component, then cluster count + total docs per size."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.components import connected_components
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    docs = tables["documents"]
    edges = (minhash_near_dups(docs, threshold=0.3, n_hashes=64, bands=16,
                               shingle_k=2, hasher=portable_hash64,
                               max_bucket_size=None)
             .select("id_a", "id_b"))
    vertices = docs.select(F.col("doc_id").alias("vertex"))
    comp = connected_components(edges, vertices=vertices, max_iter=4)
    sizes = comp.groupBy("component").agg(F.count("*").alias("size"))
    return (sizes.groupBy("size")
            .agg(F.count("*").alias("n_clusters"),
                 F.sum("size").alias("n_docs"))
            .orderBy("size"))


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# word_shingles(k): docs shorter than k tokens collapse to one whole-doc
# shingle — the CASE mirrors hive_parse_lineage_spark/functions/text.py.
def _shingle_list_sql(k: int) -> str:
    return (f"CASE WHEN len(w) >= {k} THEN list_transform("
            f"range(1, len(w) - {k - 2}), i -> "
            f"array_to_string(list_slice(w, i, i + {k - 1}), ' ')) "
            "ELSE [text] END")


_DOC_SHINGLES_5 = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS w, text FROM documents),
s AS (SELECT DISTINCT doc_id, unnest({_shingle_list_sql(5)}) AS shingle FROM w)
"""

def _cc_edges_sql() -> str:
    """Edge CTEs for x46: the exact x07 MinHash-LSH oracle embedded as
    a subquery (nested WITH), symmetrized into an adjacency list."""
    from hive_parse_lineage_spark.extra_queries import _minhash_oracle_sql
    mh = _minhash_oracle_sql(n_hashes=64, bands=16, shingle_k=2,
                             threshold=0.3)
    return f"""
mh AS (
{mh}
),
adj AS (SELECT id_a AS v, id_b AS u FROM mh
        UNION ALL SELECT id_b AS v, id_a AS u FROM mh)
"""


def _cc_round(prev: str, cur: str) -> str:
    return (f"{cur} AS (SELECT n.vertex, "
            "MIN(LEAST(n.component, COALESCE(m.component, n.component))) AS component "
            f"FROM {prev} n LEFT JOIN adj a ON a.v = n.vertex "
            f"LEFT JOIN {prev} m ON m.vertex = a.u GROUP BY n.vertex)")


_ORACLES: dict[str, str] = {
    "x41_common_shingles": f"""
WITH {_DOC_SHINGLES_5}
SELECT shingle, COUNT(doc_id) AS n_docs FROM s
GROUP BY shingle HAVING COUNT(doc_id) >= 3
ORDER BY n_docs DESC, shingle
""",
    "x42_decontaminate": f"""
WITH {_DOC_SHINGLES_5},
f AS (SELECT shingle FROM s GROUP BY shingle HAVING COUNT(doc_id) >= 3)
SELECT s.doc_id, COUNT(*) AS n_shingles, COUNT(f.shingle) AS n_flagged,
       COUNT(f.shingle) * 100 <= 5 * COUNT(*) AS keep
FROM s LEFT JOIN f USING (shingle)
GROUP BY s.doc_id ORDER BY s.doc_id
""",
    "x43_inverted_index": """
WITH t AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, COUNT(doc_id) AS df,
       array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
FROM t GROUP BY token ORDER BY token
""",
    "x44_tfidf_topk": """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, tf, df, score, rnk FROM (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * (n.n_docs - df.df) AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
             ORDER BY tf.tf * (n.n_docs - df.df) DESC, tf.token) AS rnk
  FROM tf JOIN df USING (token), n
) WHERE rnk <= 3 ORDER BY doc_id, rnk
""",
    "x45_bigram_counts": """
WITH w AS (SELECT string_split(text, ' ') AS w, text FROM documents),
g AS (SELECT unnest(CASE WHEN len(w) >= 2 THEN list_transform(
          range(1, len(w)), i -> array_to_string(list_slice(w, i, i + 1), ' '))
        ELSE [text] END) AS ngram FROM w)
SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram
ORDER BY n DESC, ngram LIMIT 100
""",
    "x46_dup_clusters": f"""
WITH {_cc_edges_sql()},
l0 AS (SELECT doc_id AS vertex, doc_id AS component FROM documents),
{_cc_round('l0', 'l1')},
{_cc_round('l1', 'l2')},
{_cc_round('l2', 'l3')},
{_cc_round('l3', 'l4')}
SELECT vertex, component FROM l4 ORDER BY vertex
""",
    "x47_retention": """
WITH f AS (
  SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort
  FROM events GROUP BY user_id
),
a AS (SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk FROM events)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
    "x48_funnel": """
WITH s AS (
  SELECT user_id, MIN(ts) AS ts0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
  SELECT e.user_id, MIN(e.ts) AS ts1 FROM events e JOIN s USING (user_id)
  WHERE e.event_type IN ('view', 'click') AND e.ts > s.ts0 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.ts1 GROUP BY e.user_id
)
SELECT 1 AS stage, 'signup' AS step, COUNT(*) AS n_users FROM s
UNION ALL SELECT 2, 'engage', COUNT(*) FROM v
UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p
ORDER BY stage
""",
    "x49_gapfill": """
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                     INTERVAL 1 DAY)) AS DATE) AS d
),
types AS (SELECT DISTINCT event_type FROM events),
cal AS (SELECT event_type, d FROM types, days),
obs AS (
  SELECT event_type, CAST(ts AS DATE) AS d, MAX(value) AS mx
  FROM events WHERE value >= 250 GROUP BY 1, 2
)
SELECT c.event_type, c.d,
       last_value(o.mx IGNORE NULLS) OVER (
         PARTITION BY c.event_type ORDER BY c.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       o.mx IS NULL AS was_gap
FROM cal c LEFT JOIN obs o ON o.event_type = c.event_type AND o.d = c.d
ORDER BY c.event_type, c.d
""",
    "x50_pii_redact": f"""
WITH synth AS (
  SELECT doc_id,
         'contact u' || CAST(doc_id AS VARCHAR) || '@example.com ph 555-' ||
         lpad(CAST(doc_id AS VARCHAR), 4, '0') ||
         CASE WHEN doc_id % 3 = 0
              THEN ' alt b' || CAST(doc_id AS VARCHAR) || '@y.io'
              ELSE '' END ||
         ' ' || substr(text, 1, 80) AS s
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(s, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(s, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(s, '{PHONE_RE}')) AS n_phones
FROM synth ORDER BY doc_id
""",
    "x51_embedding_quantize": """
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT vec_id, e,
             greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) AS scale
      FROM d)
SELECT vec_id,
       list_transform(e, x -> CAST(FLOOR(x * 127.0 / scale) AS BIGINT)) AS codes,
       scale
FROM s ORDER BY vec_id
""",
    "x52_salted_agg": """
SELECT event_type, COUNT(*) AS n, SUM(value) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
""",
    "x53_chunking": """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), c AS (
  SELECT doc_id, w,
         unnest(range(0, CAST(1 + FLOOR((greatest(len(w) - 64, 0) + 47) / 48.0)
                              AS BIGINT))) AS chunk_id
  FROM w
)
SELECT doc_id, chunk_id,
       len(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS n_tokens,
       array_to_string(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64),
                       ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id
""",
    "x54_merge_upsert": """
WITH target AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey < 1000
),
src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
         o_orderkey % 10 = 0 AS is_delete
  FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1500
),
kept AS (
  SELECT t.* FROM target t
  WHERE NOT EXISTS (SELECT 1 FROM src s
                    WHERE s.is_delete AND s.o_orderkey = t.o_orderkey)
),
upserts AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM src WHERE NOT is_delete),
untouched AS (
  SELECT k.* FROM kept k
  WHERE NOT EXISTS (SELECT 1 FROM upserts u WHERE u.o_orderkey = k.o_orderkey)
)
SELECT * FROM untouched UNION ALL SELECT * FROM upserts ORDER BY o_orderkey
""",
    "x55_scd2": """
WITH dim AS (
  SELECT c_custkey, c_acctbal,
         CAST('2024-01-01' AS TIMESTAMP) AS effective_from,
         CAST(NULL AS TIMESTAMP) AS effective_to,
         TRUE AS is_current
  FROM customer
),
upd AS (
  SELECT c_custkey, c_acctbal + 100 AS c_acctbal,
         CAST('2024-06-01' AS TIMESTAMP) AS effective_from,
         CAST(NULL AS TIMESTAMP) AS effective_to,
         TRUE AS is_current
  FROM customer WHERE c_custkey % 5 = 0
),
closed AS (
  SELECT d.c_custkey, d.c_acctbal, d.effective_from,
         CASE WHEN d.is_current AND u.nf IS NOT NULL THEN u.nf
              ELSE d.effective_to END AS effective_to,
         CASE WHEN u.nf IS NOT NULL THEN FALSE ELSE d.is_current END AS is_current
  FROM dim d LEFT JOIN (SELECT c_custkey, effective_from AS nf FROM upd) u
  USING (c_custkey)
),
merged AS (SELECT * FROM closed UNION ALL SELECT * FROM upd),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                               ORDER BY effective_from DESC) AS rn
  FROM merged
)
SELECT c_custkey, c_acctbal, effective_from, effective_to,
       CASE WHEN rn = 1 THEN is_current ELSE FALSE END AS is_current
FROM ranked ORDER BY c_custkey, effective_from
""",
}


_ORACLES["x58_cumulative_uniques"] = """
WITH first AS (
  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS day
  FROM events GROUP BY event_type, user_id
),
daily AS (
  SELECT event_type, day, COUNT(*) AS new_users
  FROM first GROUP BY event_type, day
)
SELECT event_type, day, new_users,
       CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM daily ORDER BY event_type, day
"""

_ORACLES["x59_dedup_keep_one"] = f"""
WITH {_cc_edges_sql()},
l0 AS (SELECT doc_id AS vertex, doc_id AS component FROM documents),
{_cc_round('l0', 'l1')},
{_cc_round('l1', 'l2')},
{_cc_round('l2', 'l3')},
{_cc_round('l3', 'l4')}
SELECT vertex AS doc_id FROM l4 WHERE vertex = component ORDER BY doc_id
"""

_ORACLES["x60_ngram_containment"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w, text
           FROM documents WHERE doc_id < 250),
t AS (SELECT doc_id,
             list_distinct({_shingle_list_sql(3)}) AS toks
      FROM w)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks), 4)
         AS containment
FROM t a, t b
WHERE a.doc_id != b.doc_id
  AND len(b.toks) >= len(a.toks) * 0.8
  AND len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks) >= 0.8
ORDER BY id_a, id_b
"""


def _stratified_sample_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("'s61|' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE ({h}) % 10000 < CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END
ORDER BY doc_id
"""


_ORACLES["x67_lateral_topn"] = _LATERAL_TOPN_SQL

_ORACLES["x70_hot_key_split_join"] = """
WITH dim AS (
  SELECT event_type, ROUND(AVG(value), 2) AS avg_v
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, d.avg_v
FROM events e JOIN dim d USING (event_type)
ORDER BY e.event_id
"""

_ORACLES["x68_distribute_sort_by"] = """
SELECT doc_id, lang, n_chars FROM documents
"""

_ORACLES["x69_interval_range_frame"] = """
SELECT event_type, CAST(ts AS DATE) AS d, ROUND(SUM(value), 2) AS total,
       ROUND(SUM(SUM(value)) OVER (PARTITION BY event_type
             ORDER BY CAST(ts AS DATE)
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW), 2)
         AS total_7d
FROM events GROUP BY event_type, CAST(ts AS DATE)
ORDER BY event_type, d
"""

_ORACLES["x66_recursive_cte"] = """
WITH RECURSIVE days(d) AS (
  SELECT DATE '2024-01-01' AS d
  UNION ALL
  SELECT d + 1 FROM days WHERE d < DATE '2024-01-30'
)
SELECT d, COUNT(e.ts) AS n_events
FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = d
GROUP BY d ORDER BY d
"""

_ORACLES["x65_rolling_zscore"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS tc
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
win AS (
  SELECT event_type, d, tc,
         CAST(SUM(tc) OVER w AS BIGINT) AS s,
         CAST(SUM(tc * tc) OVER w AS BIGINT) AS q,
         CAST(COUNT(tc) OVER w AS BIGINT) AS c
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, d,
       CAST(tc AS DOUBLE) / 100 AS total,
       CAST(s AS DOUBLE) / c / 100 AS mu7,
       CASE WHEN c * q - s * s > 0 THEN
            (c * tc - s) * (c * tc - s) > 4 * (c * q - s * s) END AS anomaly
FROM win WHERE c >= 1 ORDER BY event_type, d
"""

_ORACLES["x63_lm_score"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w, text FROM documents),
g AS (SELECT doc_id, unnest({_shingle_list_sql(2)}) AS ngram FROM w),
lm AS (SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram)
SELECT g.doc_id, ROUND(AVG(lm.n), 4) AS avg_bigram_freq,
       COUNT(*) AS n_bigrams
FROM g JOIN lm USING (ngram)
GROUP BY g.doc_id ORDER BY g.doc_id
"""


def _incremental_dedup_oracle_sql() -> str:
    from hive_parse_lineage_spark.extra_queries import _minhash_oracle_sql
    mh = _minhash_oracle_sql(n_hashes=64, bands=16, shingle_k=2,
                             threshold=0.5)
    return f"""
WITH mh AS (
{mh}
),
near_new AS (
  SELECT DISTINCT id_b AS doc_id FROM mh WHERE id_a < 400 AND id_b >= 400
),
exact_dup AS (
  SELECT DISTINCT n.doc_id
  FROM documents n JOIN documents c ON md5(n.text) = md5(c.text)
  WHERE n.doc_id >= 400 AND c.doc_id < 400
)
SELECT doc_id FROM documents
WHERE doc_id >= 400
  AND doc_id NOT IN (SELECT doc_id FROM near_new)
  AND doc_id NOT IN (SELECT doc_id FROM exact_dup)
ORDER BY doc_id
"""


_ORACLES["x62_embedding_centroids"] = """
WITH n AS (
  SELECT label, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
),
u AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim_idx,
         unnest(embedding) / NULLIF(nrm, 0) AS v
  FROM n
)
SELECT label, dim_idx, ROUND(AVG(v), 4) AS centroid
FROM u GROUP BY label, dim_idx ORDER BY label, dim_idx
"""


def _source_cap_oracle_sql(cap: int = 15, salt: str = "mix1") -> str:
    """DuckDB replay of x57: same portable hash, same tie-break."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql(f"'{salt}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {h} ASC, doc_id ASC) AS pick_rank
  FROM documents
)
SELECT doc_id, source, pick_rank FROM r WHERE pick_rank <= {cap}
ORDER BY source, pick_rank
"""


def _training_pipeline_oracle_sql() -> str:
    """Chained-CTE replay of x56: quality -> decontaminate -> exact-dup
    survivors -> portable-hash split (same 80/90 bounds as x39)."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("'v1' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH m AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
),
st AS (
  SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd,
         list_aggregate(list_transform(t, x -> length(x)), 'sum') AS total
  FROM m
),
q AS (
  SELECT doc_id FROM st
  WHERE n >= 20 AND n <= 1000 AND total >= 2*n AND total <= 12*n
    AND nd*10 >= 3*n
),
{_DOC_SHINGLES_5.strip().rstrip()},
f AS (SELECT shingle FROM s GROUP BY shingle HAVING COUNT(doc_id) >= 3),
c AS (
  SELECT s.doc_id, COUNT(*) AS ns, COUNT(f.shingle) AS nf
  FROM s JOIN q USING (doc_id) LEFT JOIN f USING (shingle)
  GROUP BY s.doc_id
),
clean AS (SELECT doc_id FROM c WHERE nf * 100 <= 5 * ns),
dd AS (
  SELECT MIN(m.doc_id) AS doc_id
  FROM m JOIN clean USING (doc_id)
  GROUP BY md5(m.text)
)
SELECT m.doc_id, {h} % 100 AS bucket,
       CASE WHEN {h} % 100 < 80 THEN 'train'
            WHEN {h} % 100 < 90 THEN 'val' ELSE 'test' END AS split,
       st.n AS n_tokens
FROM m JOIN dd USING (doc_id) JOIN st USING (doc_id)
ORDER BY m.doc_id
"""


def corpus_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "x41_common_shingles": _q(_x41_common_shingles),
        "x42_decontaminate": _q(_x42_decontaminate),
        "x43_inverted_index": _q(_x43_inverted_index),
        "x44_tfidf_topk": _q(_x44_tfidf_topk),
        "x45_bigram_counts": _q(_x45_bigram_counts),
        "x46_dup_clusters": _q(_x46_dup_clusters),
        "x47_retention": _q(_x47_retention),
        "x48_funnel": _q(_x48_funnel),
        "x49_gapfill": _q(_x49_gapfill),
        "x50_pii_redact": _q(_x50_pii_redact),
        "x51_embedding_quantize": _q(_x51_embedding_quantize),
        "x52_salted_agg": _q(_x52_salted_agg),
        "x53_chunking": _q(_x53_chunking),
        "x54_merge_upsert": _q(_x54_merge_upsert),
        "x55_scd2": _q(_x55_scd2),
        "x56_training_pipeline": _q(_x56_training_pipeline),
        "x57_source_cap": _q(_x57_source_cap),
        "x58_cumulative_uniques": _q(_x58_cumulative_uniques),
        "x59_dedup_keep_one": _q(_x59_dedup_keep_one),
        "x60_ngram_containment": _q(_x60_ngram_containment),
        "x61_stratified_sample": _q(_x61_stratified_sample),
        "x62_embedding_centroids": _q(_x62_embedding_centroids),
        "x63_lm_score": _q(_x63_lm_score),
        "x64_incremental_dedup": _q(_x64_incremental_dedup),
        "x65_rolling_zscore": _q(_x65_rolling_zscore),
        "x66_recursive_cte": _q(_x66_recursive_cte),
        "x67_lateral_topn": _q(_x67_lateral_topn),
        "x68_distribute_sort_by": _q(_x68_distribute_sort_by),
        "x69_interval_range_frame": _q(_x69_interval_range_frame),
        "x70_hot_key_split_join": _q(_x70_hot_key_split_join),
        "x71_bucket_sample": _q(_x71_bucket_sample),
        "x72_capped_lsh": _q(_x72_capped_lsh),
        "x73_dup_span_fraction": _q(_x73_dup_span_fraction),
        "x74_weighted_sample": _q(_x74_weighted_sample),
        "x75_chunk_dedup": _q(_x75_chunk_dedup),
        "x77_bloom_decontaminate": _q(_x77_bloom_decontaminate),
        "x78_semdedup": _q(_x78_semdedup),
        "x79_ann_recall": _q(_x79_ann_recall),
        "x80_mmr_diversify": _q(_x80_mmr_diversify),
        "x81_quality_threshold": _q(_x81_quality_threshold),
        "x82_oov_rate": _q(_x82_oov_rate),
        "x83_cluster_representatives": _q(_x83_cluster_representatives),
        "x84_split_leakage": _q(_x84_split_leakage),
        "x85_user_sequences": _q(_x85_user_sequences),
        "x86_source_drift": _q(_x86_source_drift),
        "x87_cluster_size_histogram": _q(_x87_cluster_size_histogram),
    }


def _bucket_sample_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("CAST(o_orderkey AS VARCHAR)")
    # ORDER BY kept on the oracle side only: a DuckDB pipeline breaker
    # that keeps the md5 filter parallel — without it the streaming
    # result collector serializes the scan (~7 s vs ~0.9 s at sf1.0).
    # The gate hash is order-insensitive; see _x71_bucket_sample.
    return f"""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
FROM orders WHERE {h} % 10 = 0
ORDER BY o_orderkey
"""


def _capped_lsh_oracle_sql() -> str:
    from hive_parse_lineage_spark.extra_queries import _minhash_oracle_sql
    src = ("(SELECT doc_id, text FROM documents UNION ALL "
           f"SELECT 9000000 + r.range AS doc_id, '{_X72_BOILER}' AS text "
           "FROM range(1, 21) r) src")
    return _minhash_oracle_sql(n_hashes=16, bands=4, shingle_k=2,
                               threshold=0.3, source=src,
                               max_bucket_size=10)


_DUP_SPAN_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w, text FROM documents),
s AS (SELECT doc_id, len(w) AS n_tokens,
        CASE WHEN len(w) >= 10 THEN list_transform(range(1, len(w) - 8),
               i -> {'pos': i - 1,
                     'shingle': array_to_string(list_slice(w, i, i + 9), ' ')})
             ELSE [{'pos': 0, 'shingle': text}] END AS occs
      FROM w),
occ AS (SELECT doc_id, n_tokens, unnest(occs, recursive := true) FROM s),
dup AS (SELECT shingle FROM occ GROUP BY shingle
        HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (SELECT o.doc_id,
               unnest(range(o.pos, CASE WHEN o.n_tokens >= 10
                                        THEN o.pos + 10
                                        ELSE o.n_tokens END)) AS tokpos
        FROM occ o JOIN dup d USING (shingle)),
agg AS (SELECT doc_id, COUNT(DISTINCT tokpos) AS dup_tokens
        FROM cov GROUP BY doc_id)
SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_tokens,
       COALESCE(a.dup_tokens, 0) AS dup_tokens,
       (COALESCE(a.dup_tokens, 0) * 1000)
           // len(string_split(d.text, ' ')) AS dup_permille
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def _weighted_sample_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("'mix' || CAST(doc_id AS VARCHAR)")
    cases = " ".join(f"WHEN '{s}' THEN {w}"
                     for s, w in _X74_WEIGHTS.items())
    return f"""
WITH wt AS (SELECT doc_id, source,
                   CASE source {cases} ELSE 1.0 END AS w
            FROM documents),
nc AS (SELECT doc_id, source,
              CAST(FLOOR(w) AS INT)
              + CASE WHEN ({h}) % 1000
                          < CAST(ROUND((w - FLOOR(w)) * 1000) AS INT)
                     THEN 1 ELSE 0 END AS n_copies
       FROM wt)
SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy
FROM nc WHERE n_copies >= 1
ORDER BY doc_id, copy
"""


_CHUNK_DEDUP_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), c AS (
  SELECT doc_id, w,
         unnest(range(0, CAST(1 + FLOOR((greatest(len(w) - 64, 0) + 47) / 48.0)
                              AS BIGINT))) AS chunk_id
  FROM w
), ch AS (
  SELECT doc_id, chunk_id,
         len(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS n_tokens,
         md5(array_to_string(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64),
                             ' ')) AS h
  FROM c
)
SELECT doc_id, chunk_id, n_tokens,
       COUNT(*) OVER (PARTITION BY h) AS n_copies
FROM ch
QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_id) = 1
ORDER BY doc_id, chunk_id
"""


def _bloom_decontaminate_oracle_sql(n_words: int = 256) -> str:
    """Replays x77's exact bloom bit pattern: same md5-fold double
    hashing, same 62-bit words, same broadcast-word lookups spelled as
    LEFT JOINs on the word index."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    m = n_words * 62
    h1 = portable_hash64_sql("shingle")
    h2 = portable_hash64_sql("'b#' || shingle")
    return f"""
WITH {_DOC_SHINGLES_5},
bs AS (SELECT DISTINCT shingle FROM s WHERE doc_id % 25 = 0),
bh AS (SELECT shingle, {h1} AS h1, {h2} AS h2 FROM bs),
be AS (SELECT (h1 % {m}) AS bit FROM bh
       UNION ALL SELECT ((h1 + h2) % {m}) FROM bh),
bw AS (SELECT bit // 62 AS word,
              bit_or(1::BIGINT << CAST(bit % 62 AS INTEGER)) AS bits
       FROM be GROUP BY 1),
ch AS (SELECT doc_id, shingle, {h1} AS h1, {h2} AS h2 FROM s),
cp AS (SELECT doc_id, shingle, (h1 % {m}) AS b0, ((h1 + h2) % {m}) AS b1
       FROM ch),
j AS (SELECT cp.doc_id,
             (w0.bits IS NOT NULL
              AND (w0.bits & (1::BIGINT << CAST(cp.b0 % 62 AS INTEGER))) <> 0
              AND w1.bits IS NOT NULL
              AND (w1.bits & (1::BIGINT << CAST(cp.b1 % 62 AS INTEGER))) <> 0)
                 AS bloom_hit,
             (e.shingle IS NOT NULL) AS exact_hit
      FROM cp LEFT JOIN bw w0 ON w0.word = cp.b0 // 62
              LEFT JOIN bw w1 ON w1.word = cp.b1 // 62
              LEFT JOIN bs e ON e.shingle = cp.shingle)
SELECT doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits,
       CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS exact_hits,
       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END)
            - SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS false_pos
FROM j GROUP BY doc_id ORDER BY doc_id
"""


# x78: same assignment argmax (cos DESC, seed ASC) and same keep rule
# (lowest id in a >=threshold pair survives) as operators/dedup.semdedup.
_SEMDEDUP_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sd AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id % 100 = 0),
sc AS (SELECT e.vec_id, e.v, sd.cell,
              list_cosine_similarity(e.v, sd.sv) AS cos FROM e, sd),
asg AS (SELECT vec_id, v, cell, cos FROM sc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos DESC, cell) = 1),
drp AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.2)
SELECT g.vec_id, g.cell, ROUND(g.cos, 4) AS cos_to_cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM asg g LEFT JOIN drp d ON d.vec_id = g.vec_id
ORDER BY g.vec_id
"""


def _ann_recall_oracle_sql(k: int = 5, n_bits: int = 8, dim: int = 64,
                           seed: int = 42, n_queries: int = 10) -> str:
    """Replays x79: the x09 exact top-k and the x10 LSH-bucket top-k
    (identical hyperplane signatures), self-excluded, then per-query
    overlap counting in integer permille."""
    from hive_parse_lineage_spark.extra_queries import _hyperplane_sig_terms
    sig_terms = _hyperplane_sig_terms(n_bits, dim, seed)
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id) AS rnk
    FROM base q JOIN base c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {n_queries}
  ) WHERE rnk <= {k}
), sigs AS (
  SELECT vec_id, e, ({sig_terms}) AS sg FROM base
), ann AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id) AS rnk
    FROM sigs q JOIN sigs c ON q.sg = c.sg AND q.vec_id <> c.vec_id
    WHERE q.vec_id < {n_queries}
  ) WHERE rnk <= {k}
), eg AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY 1),
ag AS (SELECT query_id, COUNT(*) AS n_ann FROM ann GROUP BY 1),
ov AS (SELECT e.query_id, COUNT(*) AS n_overlap
       FROM exact e JOIN ann a USING (query_id, vec_id) GROUP BY 1)
SELECT eg.query_id, eg.n_exact,
       COALESCE(ag.n_ann, 0) AS n_ann,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       (COALESCE(ov.n_overlap, 0) * 1000) // eg.n_exact AS recall_permille
FROM eg LEFT JOIN ag USING (query_id) LEFT JOIN ov USING (query_id)
ORDER BY eg.query_id
"""


# x80: the 3 MMR rounds unrolled. Round 1 scores 0.7*simq; rounds 2-3
# subtract 0.3 * the max pairwise cosine to the already-selected set —
# identical double arithmetic to operators/similarity.mmr_topk.
_MMR_ORACLE = """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM base WHERE vec_id < 5),
cand AS (
  SELECT query_id, vec_id, e, simq FROM (
    SELECT q.query_id, c.vec_id, c.e,
           list_cosine_similarity(q.qe, c.e) AS simq,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qe, c.e) DESC, c.vec_id) AS rnk
    FROM q JOIN base c ON c.vec_id <> q.query_id)
  WHERE rnk <= 10),
pairs AS (SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
                 list_cosine_similarity(a.e, b.e) AS s
          FROM cand a JOIN cand b
          ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
sel1 AS (SELECT query_id, vec_id, 0.7 * simq AS score FROM cand
         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY 0.7 * simq DESC, vec_id) = 1),
rem2 AS (SELECT c.* FROM cand c LEFT JOIN sel1 s
         ON s.query_id = c.query_id AND s.vec_id = c.vec_id
         WHERE s.vec_id IS NULL),
sc2 AS (SELECT r.query_id, r.vec_id,
               0.7 * r.simq - 0.3 * MAX(p.s) AS score
        FROM rem2 r
        JOIN pairs p ON p.query_id = r.query_id AND p.va = r.vec_id
        JOIN sel1 s ON s.query_id = p.query_id AND s.vec_id = p.vb
        GROUP BY r.query_id, r.vec_id, r.simq),
sel2 AS (SELECT query_id, vec_id, score FROM sc2
         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id) = 1),
sel12 AS (SELECT query_id, vec_id FROM sel1
          UNION ALL SELECT query_id, vec_id FROM sel2),
rem3 AS (SELECT c.* FROM cand c LEFT JOIN sel12 s
         ON s.query_id = c.query_id AND s.vec_id = c.vec_id
         WHERE s.vec_id IS NULL),
sc3 AS (SELECT r.query_id, r.vec_id,
               0.7 * r.simq - 0.3 * MAX(p.s) AS score
        FROM rem3 r
        JOIN pairs p ON p.query_id = r.query_id AND p.va = r.vec_id
        JOIN sel12 s ON s.query_id = p.query_id AND s.vec_id = p.vb
        GROUP BY r.query_id, r.vec_id, r.simq),
sel3 AS (SELECT query_id, vec_id, score FROM sc3
         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score DESC, vec_id) = 1)
SELECT query_id, 1 AS rank, vec_id, ROUND(score, 4) AS score FROM sel1
UNION ALL
SELECT query_id, 2 AS rank, vec_id, ROUND(score, 4) AS score FROM sel2
UNION ALL
SELECT query_id, 3 AS rank, vec_id, ROUND(score, 4) AS score FROM sel3
ORDER BY query_id, rank
"""


# x81: the x03 quality score per doc, per-language exact median
# (quantile_cont = Spark's interpolated median), keep iff score >= med.
_QUALITY_THRESHOLD_ORACLE = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, lang, len(toks) AS n,
         len(list_distinct(toks)) AS nd,
         list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS total_len
  FROM t
), sc AS (
  SELECT doc_id, lang,
         ROUND( (nd / n) * 0.5
              + (CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 ELSE 0.5 END) * 0.25
              + (CASE WHEN total_len / n >= 2.0 AND total_len / n <= 12.0
                      THEN 1.0 ELSE 0.5 END) * 0.25, 4) AS score
  FROM m
), md AS (
  SELECT lang, quantile_cont(score, 0.5) AS med FROM sc GROUP BY lang
)
SELECT sc.doc_id, sc.lang, sc.score, ROUND(md.med, 4) AS lang_median,
       CASE WHEN sc.score >= md.med THEN 1 ELSE 0 END AS keep
FROM sc JOIN md USING (lang) ORDER BY sc.doc_id
"""


# x82: top-100 BPE-ish-token vocabulary (count DESC, token ASC), then
# per-doc OOV counting — identical tokenization to x38's oracle.
_OOV_RATE_ORACLE = """
WITH tk AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS tok
  FROM documents
), vocab AS (
  SELECT tok FROM tk GROUP BY tok
  ORDER BY COUNT(*) DESC, tok LIMIT 100
)
SELECT tk.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       (CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
           // COUNT(*) AS oov_permille
FROM tk LEFT JOIN vocab v ON v.tok = tk.tok
GROUP BY tk.doc_id ORDER BY tk.doc_id
"""


# x83: the x78 seed-cluster assignment joined to the x03 quality
# score (doc_id == vec_id), best-quality member per cluster.
_CLUSTER_REPS_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sd AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id % 100 = 0),
scj AS (SELECT e.vec_id, sd.cell,
               list_cosine_similarity(e.v, sd.sv) AS cos FROM e, sd),
asg AS (SELECT vec_id, cell FROM scj
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos DESC, cell) = 1),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
m AS (SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
             list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                 AS total_len
      FROM t),
q AS (SELECT doc_id,
             ROUND( (nd / n) * 0.5
                  + (CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 ELSE 0.5 END) * 0.25
                  + (CASE WHEN total_len / n >= 2.0 AND total_len / n <= 12.0
                          THEN 1.0 ELSE 0.5 END) * 0.25, 4) AS score
      FROM m),
j AS (SELECT a.cell, q.doc_id, q.score FROM asg a
      JOIN q ON q.doc_id = a.vec_id)
SELECT cell, doc_id, score AS rep_score, n_members FROM (
  SELECT cell, doc_id, score,
         COUNT(*) OVER (PARTITION BY cell) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY cell
                            ORDER BY score DESC, doc_id) AS rn
  FROM j)
WHERE rn = 1 ORDER BY cell
"""


def _split_leakage_oracle_sql() -> str:
    """Replays x84: the x39 hash split (salt v1), 8-gram shingles,
    train semi-joined to the distinct test shingle set."""
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    h = portable_hash64_sql("'v1' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH b AS (
  SELECT doc_id, text, {h} % 100 AS bucket FROM documents
), w AS (
  SELECT doc_id, bucket, string_split(text, ' ') AS w, text FROM b
), s AS (
  SELECT DISTINCT doc_id, bucket, unnest({_shingle_list_sql(8)}) AS shingle
  FROM w
), te AS (
  SELECT DISTINCT shingle FROM s WHERE bucket >= 90
)
SELECT s.doc_id, COUNT(*) AS n_shared_grams
FROM s JOIN te USING (shingle)
WHERE s.bucket < 80
GROUP BY s.doc_id ORDER BY s.doc_id
"""


_USER_SEQUENCES_ORACLE = """
WITH r AS (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
FROM r WHERE rn <= 20
GROUP BY user_id ORDER BY user_id
"""


# x86: all-integer total-variation distance; the absent-token tail is
# the closed form (T - sum_present c_t) * T_s, so the sum never runs
# over vocabulary x sources.
_SOURCE_DRIFT_ORACLE = """
WITH tk AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), st AS (
  SELECT source, tok, COUNT(*) AS c_st FROM tk GROUP BY source, tok
), ct AS (
  SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok
), ts_ AS (
  SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM st GROUP BY source
), tt AS (
  SELECT CAST(SUM(t_s) AS BIGINT) AS t_all FROM ts_
), agg AS (
  SELECT st.source, ts_.t_s, tt.t_all,
         CAST(SUM(ABS(st.c_st * tt.t_all - ct.c_t * ts_.t_s)) AS BIGINT)
             AS present_num,
         CAST(SUM(ct.c_t) AS BIGINT) AS present_ct
  FROM st JOIN ct USING (tok) JOIN ts_ USING (source) CROSS JOIN tt
  GROUP BY st.source, ts_.t_s, tt.t_all
)
SELECT source, t_s AS n_tokens,
       ((present_num + (t_all - present_ct) * t_s) * 1000)
           // (2 * t_s * t_all) AS tv_permille
FROM agg ORDER BY source
"""


def corpus_oracle_sql() -> dict[str, str]:
    out = dict(_ORACLES)
    out["x56_training_pipeline"] = _training_pipeline_oracle_sql()
    out["x57_source_cap"] = _source_cap_oracle_sql()
    out["x61_stratified_sample"] = _stratified_sample_oracle_sql()
    out["x64_incremental_dedup"] = _incremental_dedup_oracle_sql()
    out["x71_bucket_sample"] = _bucket_sample_oracle_sql()
    out["x72_capped_lsh"] = _capped_lsh_oracle_sql()
    out["x73_dup_span_fraction"] = _DUP_SPAN_ORACLE
    out["x74_weighted_sample"] = _weighted_sample_oracle_sql()
    out["x75_chunk_dedup"] = _CHUNK_DEDUP_ORACLE
    out["x77_bloom_decontaminate"] = _bloom_decontaminate_oracle_sql()
    out["x78_semdedup"] = _SEMDEDUP_ORACLE
    out["x79_ann_recall"] = _ann_recall_oracle_sql()
    out["x80_mmr_diversify"] = _MMR_ORACLE
    out["x81_quality_threshold"] = _QUALITY_THRESHOLD_ORACLE
    out["x82_oov_rate"] = _OOV_RATE_ORACLE
    out["x83_cluster_representatives"] = _CLUSTER_REPS_ORACLE
    out["x84_split_leakage"] = _split_leakage_oracle_sql()
    out["x85_user_sequences"] = _USER_SEQUENCES_ORACLE
    out["x86_source_drift"] = _SOURCE_DRIFT_ORACLE
    out["x87_cluster_size_histogram"] = f"""
WITH {_cc_edges_sql()},
l0 AS (SELECT doc_id AS vertex, doc_id AS component FROM documents),
{_cc_round('l0', 'l1')},
{_cc_round('l1', 'l2')},
{_cc_round('l2', 'l3')},
{_cc_round('l3', 'l4')},
sz AS (SELECT component, COUNT(*) AS size FROM l4 GROUP BY component)
SELECT size, COUNT(*) AS n_clusters,
       CAST(SUM(size) AS BIGINT) AS n_docs
FROM sz GROUP BY size ORDER BY size
"""
    return out
