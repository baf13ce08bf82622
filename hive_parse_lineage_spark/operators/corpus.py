"""Corpus-level text operators for LLM training-data pipelines.

Boilerplate / contamination n-gram detection (CCNet-style line dedup
re-expressed over whitespace corpora), decontamination scoring,
inverted-index construction, TF-IDF term ranking and n-gram language
model counts — all as single-pass DataFrame plans with no Python in
the hot path.

Scale posture (100 TB): every operator here is
``explode -> hash-partial-agg -> final-agg`` — one shuffle keyed on the
shingle/token, map-side combine does the heavy reduction (shingle
counts collapse ~40x before the exchange on typical web corpora), and
all string work is codegen'd (``split``/``slice``/``concat_ws``).
The flagged-shingle set produced by :func:`common_shingles` is tiny by
construction (boilerplate is rare relative to the vocabulary), so
:func:`contamination_score` broadcasts it — the corpus never
reshuffles.

Reference parity: the reference engine ships token/fingerprint text
utilities (reference: utils/TextUtils-style helpers exercised via
LineParser.java:56-90 test corpus); the corpus-statistics layer here is
the Spark-native generalisation the build brief asks for beyond the
reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hive_parse_lineage_spark.functions.text import tokens, word_shingles
from hive_parse_lineage_spark.operators.util import spread_for_compute


def doc_shingles(docs: DataFrame, n: int = 5, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Distinct (id, shingle) pairs — the unit for document-frequency
    statistics. Per-document distinctness is computed LOCALLY with
    ``array_distinct`` before the explode (a codegen array op), not
    with ``DataFrame.distinct()`` after it — the pair stream is keyed
    by (doc, shingle) whose duplicates only ever occur within one row's
    array, so a cluster-wide dedup exchange would shuffle the whole
    stream to remove doc-local repeats. Zero shuffles here; consumers
    pay exactly one exchange, on whatever key they aggregate."""
    return (spread_for_compute(docs)
            .select(id_col,
                    F.explode(F.array_distinct(word_shingles(text_col, n)))
                    .alias("shingle")))


def common_shingles(docs: DataFrame, n: int = 5, min_docs: int = 3,
                    text_col: str = "text", id_col: str = "doc_id",
                    pairs: DataFrame | None = None) -> DataFrame:
    """Shingles appearing in >= min_docs distinct documents: boilerplate
    (nav bars, license headers) and benchmark-contamination candidates.

    One shuffle on the shingle; COUNT over pre-distinct pairs is a
    plain count, so partial aggregation applies (COUNT(DISTINCT) inside
    one pass would force an expand). Pass ``pairs`` (a precomputed
    :func:`doc_shingles` stream, typically localCheckpointed) when a
    caller also consumes the same stream elsewhere — Catalyst does not
    share subtrees across plan branches, so without it the corpus is
    tokenized and shingled once per consumer."""
    if pairs is None:
        pairs = doc_shingles(docs, n, text_col, id_col)
    return (pairs
            .groupBy("shingle")
            .agg(F.count(id_col).alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))


def contamination_score(docs: DataFrame, flagged: DataFrame, n: int = 5,
                        max_flagged_pct: int = 5, text_col: str = "text",
                        id_col: str = "doc_id",
                        pairs: DataFrame | None = None) -> DataFrame:
    """Per-document decontamination verdict against a flagged-shingle set.

    Emits (id, n_shingles, n_flagged, keep) where keep means at most
    ``max_flagged_pct`` percent of the document's distinct shingles are
    flagged. Integer arithmetic only (``n_flagged * 100 <= pct * n``) so
    differential oracles are exact. ``flagged`` is broadcast — at any
    corpus scale the boilerplate list stays small, so the document side
    never shuffles. ``pairs`` short-circuits the shingling as in
    :func:`common_shingles` (shared-stream callers)."""
    per_doc = pairs if pairs is not None else doc_shingles(
        docs, n, text_col, id_col)
    joined = (per_doc
              .join(F.broadcast(flagged.select("shingle")
                                .withColumn("_hit", F.lit(1))),
                    "shingle", "left")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_shingles"),
                   F.count("_hit").alias("n_flagged")))
    keep = (F.col("n_flagged") * 100) <= (F.lit(max_flagged_pct) * F.col("n_shingles"))
    return joined.withColumn("keep", keep)


def inverted_index(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Token -> (document frequency, sorted postings list).

    Postings are emitted as a comma-joined string of sorted ids — the
    interchange form a downstream sharded index loader consumes.
    ``collect_set`` + ``sort_array`` keeps ordering deterministic (a
    bare ``collect_list`` would be partition-order dependent)."""
    postings = F.concat_ws(
        ",", F.transform(F.sort_array(F.collect_set(id_col)),
                         lambda x: x.cast("string")))
    return (spread_for_compute(docs)
            .select(id_col, F.explode(tokens(text_col)).alias("token"))
            .distinct()
            .groupBy("token")
            .agg(F.count(id_col).alias("df"), postings.alias("postings")))


def tf_idf_topk(docs: DataFrame, k: int = 3, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Top-k most characteristic terms per document.

    Uses the integer rarity surrogate ``score = tf * (N - df)`` —
    monotone in tf and in idf, but exactly representable, so the
    DuckDB differential oracle matches bit-for-bit (a float
    ``log(N/df)`` would be libm-dependent across engines). Three
    shuffles total: one on token for df, one token equi-join of df back
    onto tf, one on doc for the window. The df side is
    vocabulary-sized — unbounded at 100 TB — so it is a plain shuffle
    join, never a forced broadcast (AQE broadcasts it when the vocab is
    actually small); only the single-row n_docs is broadcast."""
    tf = (spread_for_compute(docs)
          .select(id_col, F.explode(tokens(text_col)).alias("token"))
          .groupBy(id_col, "token")
          .agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc())
    return (tf.join(df_, "token")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score", F.col("tf") * (F.col("n_docs") - F.col("df")))
              .withColumn("rnk", F.row_number().over(w))
              .filter(F.col("rnk") <= k)
              .select(id_col, "token", "tf", "df", "score", "rnk"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64, stride: int = 48,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token windows (RAG / context
    preprocessing): chunk i covers tokens [i*stride, i*stride+chunk).

    Pure explode-of-a-codegen-sequence — no shuffle, no Python; output
    row count is input tokens / stride, so the operator streams at any
    corpus size. Chunk count uses integer ceil ``1 + ceil((n-chunk)/
    stride)`` spelled as FLOOR((x + stride - 1)/stride) so differential
    oracles replay it exactly."""
    w = tokens(text_col)
    n = F.size(w)
    extra = F.greatest(n - chunk_tokens, F.lit(0))
    n_chunks = (F.lit(1)
                + F.floor((extra + (stride - 1)) / F.lit(float(stride)))
                ).cast("bigint")
    idx = F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
    chunked = docs.select(id_col, w.alias("w"), idx.alias("chunk_id"))
    piece = F.slice("w", F.col("chunk_id") * stride + 1, chunk_tokens)
    return chunked.select(
        id_col, "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"))


def ngram_counts(docs: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Corpus n-gram counts (the language-model / Kneser-Ney input).

    Codegen transform over the token array, explode, one count
    shuffle; at corpus scale the partial aggregation collapses the
    Zipf head map-side so the exchange carries ~vocabulary^n rows, not
    corpus-token rows."""
    grams = F.explode(word_shingles(text_col, n)).alias("ngram")
    return (spread_for_compute(docs)
            .select(grams).groupBy("ngram").agg(F.count("*").alias("n")))


BLOOM_WORD_BITS = 62  # masks stay off the BIGINT sign bit in every engine


def bloom_decontaminate(docs: DataFrame, bench: DataFrame, n: int = 5,
                        n_words: int = 256, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Bloom-filter prefilter for benchmark decontamination: per
    document, how many of its distinct n-gram shingles *might* be in
    the benchmark set (bloom hit) and how many actually are (exact
    confirm), i.e. the operator a 100 TB pipeline runs instead of
    shuffle-joining every corpus shingle against the eval set.

    Build: the benchmark shingles hash into a ``n_words × 62``-bit
    bloom (2 probes, double hashing ``bit_j = (h1 + j*h2) mod m``) via
    one tiny aggregation on the bench side. Probe: the bloom table is
    a few KB regardless of benchmark size, so membership is two
    BROADCAST joins on the word index plus codegen bit tests — the
    corpus side never shuffles until the final per-doc count. Exact
    confirmation is a third broadcast join; because a bloom has no
    false negatives, ``exact_hits <= bloom_hits`` and ``false_pos``
    measures the prefilter's precision loss directly.

    Word size is 62 bits so the single-bit masks never touch the
    BIGINT sign bit (portable across engines); hashes are the
    md5-fold ``portable_hash64`` so a SQL oracle replays the exact
    bit pattern. Production would fold the word array into plan
    literals (no join at all) and use xxhash64 — same plan shape.
    """
    from hive_parse_lineage_spark.functions.text import portable_hash64

    m = n_words * BLOOM_WORD_BITS
    h1 = portable_hash64(F.col("shingle"))
    h2 = portable_hash64(F.concat(F.lit("b#"), F.col("shingle")))

    def bit(j: int) -> Column:
        return (h1 + F.lit(j) * h2) % F.lit(m)

    def word(b: Column) -> Column:
        return (b / F.lit(BLOOM_WORD_BITS)).cast("long")

    def mask(b: Column) -> Column:
        # F.shiftleft only takes a literal shift; call the SQL builtin
        # directly so the shift amount can be a column
        return F.call_function("shiftleft", F.lit(1).cast("long"),
                               (b % BLOOM_WORD_BITS).cast("int"))

    bench_sh = doc_shingles(bench, n, text_col, id_col) \
        .select("shingle").distinct()
    entries = bench_sh.select(F.explode(F.array(*[
        F.struct(word(bit(j)).alias("word"), mask(bit(j)).alias("mask"))
        for j in range(2)])).alias("p")).select("p.word", "p.mask")
    bloom = entries.groupBy("word").agg(F.bit_or("mask").alias("bits"))

    corp = (doc_shingles(docs, n, text_col, id_col)
            .withColumn("w0", word(bit(0))).withColumn("m0", mask(bit(0)))
            .withColumn("w1", word(bit(1))).withColumn("m1", mask(bit(1))))
    probed = (corp
              .join(F.broadcast(bloom.select(F.col("word").alias("w0"),
                                             F.col("bits").alias("bits0"))),
                    "w0", "left")
              .join(F.broadcast(bloom.select(F.col("word").alias("w1"),
                                             F.col("bits").alias("bits1"))),
                    "w1", "left")
              .join(F.broadcast(bench_sh.withColumn("_b", F.lit(1))),
                    "shingle", "left"))
    bloom_hit = (F.col("bits0").isNotNull()
                 & (F.col("bits0").bitwiseAND(F.col("m0")) != 0)
                 & F.col("bits1").isNotNull()
                 & (F.col("bits1").bitwiseAND(F.col("m1")) != 0))
    return (probed
            .groupBy(id_col)
            .agg(F.count("*").alias("n_shingles"),
                 F.sum(bloom_hit.cast("long")).alias("bloom_hits"),
                 F.sum(F.col("_b").isNotNull().cast("long")).alias("exact_hits"))
            .withColumn("false_pos",
                        F.col("bloom_hits") - F.col("exact_hits")))


def duplicate_span_stats(docs: DataFrame, n: int = 10, min_docs: int = 2,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Substring-level duplication accounting (the signal behind
    span-level dedup in Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): for each document, how many of its token
    positions are covered by an n-gram that also occurs in >= min_docs
    documents, plus the integer-permille fraction.

    Doc-level dedup (x07/x11) misses partially-copied documents; this
    measures exactly the copied *spans*. Plan shape:

    1. positional shingles: ``posexplode(word_shingles(n))`` — pure
       codegen, |tokens| rows;
    2. duplicated-occurrence marking: for the default ``min_docs=2``
       the test "shingle occurs in >= 2 documents" is exactly
       ``min(doc) != max(doc)`` over the shingle's occurrence group, so
       ONE window over a single shuffle on the shingle replaces the
       older count-distinct-aggregate + self-semi-join spelling — the
       shingle stream (the |tokens|-row posexplode, the expensive part)
       is derived once instead of twice, and the join disappears.
       For ``min_docs > 2`` the general count-distinct + semi-join path
       is kept (second shuffle; shuffle join, AQE converts when small);
    4. covered positions by INTERVAL UNION (gaps-and-islands over the
       [pos, pos+n-1] spans, one shuffle on the doc id): running-max
       end over a pos-ordered window marks island starts, a cumulative
       sum numbers the islands, and the union length is the sum of
       per-island extents. Never explodes the n positions of each span
       and never needs a COUNT(DISTINCT) expand — per-doc cost is the
       number of duplicated OCCURRENCES, not occurrences x n.

    Docs shorter than n tokens collapse to one whole-doc shingle whose
    span is the whole doc (mirrors :func:`word_shingles`). Integer
    permille (``*1000 div n_tokens``) keeps the output float-free for
    cross-engine replay.
    """
    from pyspark.sql import Window

    from hive_parse_lineage_spark.functions.text import token_count

    # The shingle is a purely internal grouping key (never output,
    # never oracle-compared), so fold the ~n-token strings to 8-byte
    # xxhash64 ints AT the explode — the shingle shuffle then moves
    # fixed-width ints instead of long strings (the same fold x105
    # applies; a cross-shingle collision would need ~2^32 distinct
    # shingles per 50% chance — corpus vocabularies sit orders below).
    occ = (spread_for_compute(docs)
           .select(F.col(id_col), token_count(text_col).alias("n_tokens"),
                   F.posexplode(F.transform(word_shingles(text_col, n),
                                            lambda s: F.xxhash64(s)))
                    .alias("pos", "shingle")))
    span_end = (F.when(F.col("n_tokens") >= n, F.col("pos") + n - 1)
                .otherwise(F.col("n_tokens") - 1))
    if min_docs == 2:
        w_sh = Window.partitionBy("shingle")
        spans = (occ
                 .withColumn("_dup", F.min(id_col).over(w_sh)
                             != F.max(id_col).over(w_sh))
                 .filter(F.col("_dup"))
                 .select(id_col, "pos", span_end.alias("end")))
    else:
        dup = (occ.groupBy("shingle")
               .agg(F.countDistinct(id_col).alias("nd"))
               .filter(F.col("nd") >= min_docs)
               .select("shingle"))
        spans = (occ.join(dup, "shingle")
                 .select(id_col, "pos", span_end.alias("end")))
    w_prev = (Window.partitionBy(id_col).orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.partitionBy(id_col).orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, 0))
    prev_end = F.max("end").over(w_prev)
    covered = (spans
               .withColumn("new_island",
                           (prev_end.isNull()
                            | (F.col("pos") > prev_end)).cast("int"))
               .withColumn("island", F.sum("new_island").over(w_cum))
               .groupBy(id_col, "island")
               .agg((F.max("end") - F.min("pos") + 1).alias("ext"))
               .groupBy(id_col)
               .agg(F.sum("ext").alias("dup_tokens")))
    return (docs.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
            .join(covered, id_col, "left")
            .select(id_col, "n_tokens",
                    F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
                    F.expr("(coalesce(dup_tokens, 0) * 1000) div n_tokens")
                     .alias("dup_permille")))
