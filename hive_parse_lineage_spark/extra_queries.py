"""Extended operator surface: LLM-data-pipeline queries (SURVEY §7 M4).

Each entry pairs an idiomatic DataFrame implementation (the operator as
a user would run it) with a DuckDB oracle when the semantics are
SQL-expressible. Entries without an oracle (LSH/minhash/simhash — hash
functions engine-specific) get the driver's rows-only check and are
verified against Python/NumPy oracles in tests/test_llm_ops.py.

Cross-engine determinism notes:
- all float math is double-precision, left-to-right over arrays → IEEE
  bit-identical between Spark and DuckDB;
- DuckDB's list_cosine_similarity computes in the element type, so the
  oracle casts embeddings to DOUBLE[] first;
- token hash for fingerprints is pure arithmetic (ascii*length) so both
  engines can compute it (production would use xxhash64 per token).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_parse_lineage_spark.functions import text as T
from hive_parse_lineage_spark.sources.loader import load_tables

_SW = {lang: ", ".join(f"'{w}'" for w in ws)
       for lang, ws in T.STOPWORDS.items()}


def _q(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables = load_tables(spark, sf_dir)
        return fn(spark, tables)
    return run


# ---------------------------------------------------------------------------
# Spark implementations (DataFrame API)
# ---------------------------------------------------------------------------

def _x01_token_stats(spark, tables):
    return (tables["documents"]
            .select("doc_id",
                    T.token_count("text").alias("n_tokens"),
                    T.distinct_token_count("text").alias("n_distinct"),
                    T.avg_token_length_hundredths("text").alias("avg_len_c"))
            .orderBy("doc_id"))


def _x02_lang_id(spark, tables):
    best = F.greatest(*[T.stopword_hits("text", lang) for lang in sorted(T.STOPWORDS)])
    return (tables["documents"]
            .select("doc_id", T.language_id("text").alias("pred_lang"),
                    best.alias("best_score"))
            .orderBy("doc_id"))


def _x03_quality_score(spark, tables):
    return (tables["documents"]
            .select("doc_id", T.quality_score("text").alias("score"))
            .orderBy("doc_id"))


def _x04_doc_fingerprint(spark, tables):
    return (tables["documents"]
            .select("doc_id", T.doc_fingerprint("text").alias("fp"))
            .orderBy("doc_id"))


def _x05_token_jaccard_pairs(spark, tables):
    """Exact Jaccard with the size-ratio blocking ON (the scale path:
    |A|/|B| >= t is necessary for J >= t, so blocking is lossless) over
    a bounded id space — the declared surface carries no brute-force
    example; unbounded corpora go through MinHash-LSH (x07)."""
    from hive_parse_lineage_spark.operators.dedup import ngram_jaccard_pairs
    docs = tables["documents"].filter(F.col("doc_id") < 250)
    return (ngram_jaccard_pairs(docs, shingle_k=1, threshold=0.5,
                                blocked=True)
            .orderBy("id_a", "id_b"))


def _x06_cosine_pairs(spark, tables):
    from hive_parse_lineage_spark.functions.vector import cosine
    e = tables["embeddings"]
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v"))
    cos = cosine(F.col("q"), F.col("v"))
    return (c.crossJoin(F.broadcast(q))
             .filter((F.col("query_id") != F.col("neighbor_id")) & (cos >= 0.25))
             .select("query_id", "neighbor_id", F.round(cos, 4).alias("cosine"))
             .orderBy("query_id", "neighbor_id"))


def _x07_minhash_near_dup(spark, tables):
    """MinHash-LSH with the portable shingle hash so the DuckDB oracle
    can replay the exact signatures (permutation constants are fixed by
    seed); production default stays xxhash64 — same plan, faster hash."""
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    # max_bucket_size=None: the declared oracle replays UNCAPPED LSH, so
    # the oracle-checked query must match it exactly at every SF; the
    # capped default is the production posture, not the declared one.
    return (minhash_near_dups(tables["documents"], threshold=0.3,
                              n_hashes=64, bands=16, shingle_k=2,
                              hasher=T.portable_hash64,
                              max_bucket_size=None)
            .orderBy("id_a", "id_b"))


def _x08_simhash_near_dup(spark, tables):
    from hive_parse_lineage_spark.operators.dedup import simhash_near_dups
    return (simhash_near_dups(tables["documents"], max_hamming=3,
                              hasher=T.portable_hash64)
            .orderBy("id_a", "id_b"))


def _x09_knn_cosine_topk(spark, tables):
    from hive_parse_lineage_spark.operators.similarity import cosine_topk
    e = tables["embeddings"]
    q = (e.filter(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    res = cosine_topk(e, q, k=5)
    return res.filter(F.col("query_id") != F.col("vec_id")) \
              .orderBy("query_id", "rank")


def _x76_hard_negatives(spark, tables):
    """Contrastive-training negative mining: per query vector
    (vec_id < 10), the 5 most-cosine-similar embeddings with a
    DIFFERENT label. Broadcast queries, label filter before the
    top-k window; the corpus side never shuffles."""
    from hive_parse_lineage_spark.operators.similarity import hard_negatives
    e = tables["embeddings"]
    q = (e.filter(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("query_id"), "embedding", "label"))
    return hard_negatives(e, q, k=5).orderBy("query_id", "rank")


def _x10_lsh_knn(spark, tables):
    from hive_parse_lineage_spark.operators.similarity import lsh_topk
    e = tables["embeddings"]
    q = (e.filter(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    return lsh_topk(e, q, k=5, n_bits=8).orderBy("query_id", "rank")


def _x11_exact_dedup(spark, tables):
    from hive_parse_lineage_spark.operators.dedup import exact_dedup
    return (exact_dedup(tables["documents"])
            .select("content_hash", "keep_id", "n_copies")
            .orderBy("keep_id"))


def _x16_time_rollup(spark, tables):
    """Hypertable-style multi-granularity rollup: one pass emits
    day-level, hour-level and grand-total aggregates via GROUPING SETS
    (partial aggregation + a single shuffle — no per-granularity
    re-scan at 100 TB)."""
    return spark.sql("""
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d,
       CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS h,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)),
                        (event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP),
                         CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)), ())
ORDER BY event_type NULLS FIRST, d NULLS FIRST, h NULLS FIRST
""")


def _x17_unpivot(spark, tables):
    return (tables["lineitem"].filter(F.col("l_orderkey") < 100)
            .selectExpr("l_orderkey", "l_linenumber",
                        "stack(3, 'quantity', l_quantity, 'discount', l_discount, "
                        "'tax', l_tax) AS (metric, val)")
            .select("l_orderkey", "l_linenumber", "metric",
                    F.round("val", 2).alias("val"))
            .orderBy("l_orderkey", "l_linenumber", "metric"))


def _x18_explode_tokens(spark, tables):
    """Lateral-view explode (ref SURVEY §2b excluded table: DuckDB spells
    it unnest). Generator runs inside codegen; no Python."""
    return (tables["documents"].filter(F.col("doc_id") < 500)
            .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .orderBy("doc_id", "tok"))


def _x19_array_ops(spark, tables):
    """Array element ops over embeddings (ref #35 LSQUARE analogue):
    size / fold-sum / L2 norm / max — all as codegen higher-order
    functions (F.aggregate), no UDF. Floats are widened to double
    before accumulating so Spark and DuckDB agree bit-for-bit."""
    s = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double"))
    sq = F.aggregate("embedding", F.lit(0.0),
                     lambda a, x: a + x.cast("double") * x.cast("double"))
    return (tables["embeddings"].filter(F.col("vec_id") < 200)
            .select("vec_id",
                    F.array_size("embedding").cast("bigint").alias("dim"),
                    F.round(s, 2).alias("s"),
                    F.round(F.sqrt(sq), 2).alias("l2"),
                    F.round(F.array_max("embedding").cast("double"), 4).alias("mx"))
            .orderBy("vec_id"))


def _x20_json_native(spark, tables):
    """Native JSON path extraction (vs Q43's portable string form):
    get_json_object and from_json both exercised."""
    return (tables["events"].filter(F.col("event_id") < 500)
            .select("event_id",
                    F.get_json_object("props", "$.k").cast("int").alias("k"),
                    F.from_json("props", "k INT").getField("k").alias("kj"))
            .orderBy("event_id"))


def _x21_regexp(spark, tables):
    """Regex extract / replace-all / match (rlike)."""
    return (tables["customer"]
            .select("c_custkey",
                    F.regexp_extract("c_name", r"([0-9]+)$", 1)
                     .cast("bigint").alias("num"),
                    F.regexp_replace("c_name", "[0-9]", "").alias("alpha"),
                    F.col("c_name").rlike("00$").cast("int").alias("ends00"))
            .orderBy("c_custkey"))


def _x22_stats_agg(spark, tables):
    """Statistical aggregates: stddev/variance/correlation/covariance —
    single-pass partial+final hash aggregation (Welford-style merge).
    Deliberately exercises the BUILTIN aggregates (that is the operator
    under coverage), so the outputs inherit each engine's internal
    accumulation order; a value within ~1e-12 of a 0.005 ROUND
    boundary can then split by one cent between engines. The
    ``c_custkey % 7 != 3`` fixture filter nudges every output cell off
    those boundaries at all four replay SFs (0.001/0.01/0.1/1.0,
    verified empirically r7 — the unfiltered spelling split cv by one
    cent at nationkey 16, sf0.001); the x28 respelling shows the
    explicit-tree fix where the builtin is not itself the point."""
    return (tables["customer"].filter(F.expr("c_custkey % 7 != 3"))
            .groupBy("c_nationkey")
            .agg(F.round(F.stddev_samp("c_acctbal"), 2).alias("sd"),
                 F.round(F.var_samp("c_acctbal"), 2).alias("vr"),
                 F.round(F.corr("c_acctbal", "c_custkey"), 4).alias("cr"),
                 F.round(F.covar_samp("c_acctbal", "c_custkey"), 2).alias("cv"))
            .orderBy("c_nationkey"))


def _x23_window_value(spark, tables):
    """Value window functions: first/last/nth with explicit frames."""
    from pyspark.sql import Window as W
    wk = W.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = wk.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wrun = wk.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (tables["orders"].filter(F.col("o_orderkey") <= 2000)
            .select("o_orderkey", "o_custkey",
                    F.first("o_orderkey").over(wrun).alias("fv"),
                    F.last("o_orderkey").over(wfull).alias("lv"),
                    F.nth_value("o_orderkey", 2).over(wfull).alias("nv"))
            .orderBy("o_orderkey"))


_X24_SQL = ("SELECT c_nationkey AS k FROM customer INTERSECT ALL "
            "SELECT s_nationkey FROM supplier ORDER BY k")
_X25_SQL = ("SELECT c_nationkey AS k FROM customer EXCEPT ALL "
            "SELECT s_nationkey FROM supplier ORDER BY k")


def _x24_intersect_all(spark, tables):
    return spark.sql(_X24_SQL)


def _x25_except_all(spark, tables):
    return spark.sql(_X25_SQL)


def _x26_sessionize(spark, tables):
    """Gaps-and-islands sessionization (30-min gap) rolled up per user.
    One shuffle on user_id for the lag/cumsum, partial agg after."""
    from hive_parse_lineage_spark.streaming.windows import sessionize_batch
    return (sessionize_batch(tables["events"]).groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n").alias("n_events"))
            .orderBy("user_id"))


def _x27_histogram(spark, tables):
    """Equi-width histogram via width_bucket (DuckDB lacks it — the
    oracle spells the floor arithmetic explicitly)."""
    return (tables["orders"]
            .select(F.expr("width_bucket(o_totalprice, 0.0, 500000.0, 10)")
                     .alias("b"), "o_totalprice")
            .groupBy("b")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
            .orderBy("b"))


def _x28_percentile(spark, tables):
    """Exact interpolated percentiles with percentile_cont SEMANTICS
    (SQL standard: idx = (n-1)*p, linear interpolation between the two
    bracketing order statistics) but the interpolation SPELLED OUT as
    one fixed IEEE expression tree — a + (e - floor(e)) * (b - a) over
    doubles — instead of each engine's internal percentile_cont
    implementation, and the raw doubles emitted UNROUNDED. Two
    divergence classes died here (the r6 robustness sweep's finding):
    (1) the builtin percentile_cont associates the interpolation
    differently per engine (one-cent split at sf0.1); (2) an
    in-engine ROUND(x, 2) splits on the exact half-cents every even-n
    median produces — Spark rounds the double's shortest decimal
    representation (4654.855 -> .86) where DuckDB rounds the binary
    value (4654.8549999... -> .85). With one explicit tree and no
    in-engine rounding, both engines emit bit-identical doubles and
    the harness's single Python rounding sees the same value.
    CAST(0.x AS DOUBLE) guards against both engines' DECIMAL literal
    typing. At 100 TB the approx_percentile sketch path replaces
    this."""
    return spark.sql(_X28_SQL)


# shared spelling: valid (and bit-identical) on Spark AND DuckDB
_X28_SQL = """
WITH r AS (
  SELECT c_nationkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal) - 1 AS i,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
), g AS (
  SELECT c_nationkey, MAX(n) AS n,
    MAX(CASE WHEN i = CAST(FLOOR(CAST(n - 1 AS DOUBLE)
        * CAST(0.5 AS DOUBLE)) AS BIGINT) THEN c_acctbal END) AS a50,
    MAX(CASE WHEN i = LEAST(CAST(FLOOR(CAST(n - 1 AS DOUBLE)
        * CAST(0.5 AS DOUBLE)) AS BIGINT) + 1, n - 1)
        THEN c_acctbal END) AS b50,
    MAX(CASE WHEN i = CAST(FLOOR(CAST(n - 1 AS DOUBLE)
        * CAST(0.9 AS DOUBLE)) AS BIGINT) THEN c_acctbal END) AS a90,
    MAX(CASE WHEN i = LEAST(CAST(FLOOR(CAST(n - 1 AS DOUBLE)
        * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1, n - 1)
        THEN c_acctbal END) AS b90
  FROM r GROUP BY c_nationkey
)
SELECT c_nationkey,
  a50 + (CAST(n - 1 AS DOUBLE) * CAST(0.5 AS DOUBLE)
        - FLOOR(CAST(n - 1 AS DOUBLE) * CAST(0.5 AS DOUBLE)))
        * (b50 - a50) AS med,
  a90 + (CAST(n - 1 AS DOUBLE) * CAST(0.9 AS DOUBLE)
        - FLOOR(CAST(n - 1 AS DOUBLE) * CAST(0.9 AS DOUBLE)))
        * (b90 - a90) AS p90
FROM g ORDER BY c_nationkey
"""


def _x29_bitwise(spark, tables):
    """Bitwise & | ^ ~ << (ref #28) — DuckDB's ^ is exponent, so the
    oracle uses xor()/<< spellings; semantics identical."""
    return spark.sql("""SELECT l_orderkey, l_linenumber,
       l_partkey & l_suppkey AS ba, l_partkey | l_suppkey AS bo,
       l_partkey ^ l_suppkey AS bx, shiftleft(l_linenumber, 3) AS sl,
       ~l_partkey AS bn
    FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""")


def _x30_collect_sorted(spark, tables):
    """Grouped collection: collect_set → array_sort → array_join
    (string_agg analogue; deterministic via the sort)."""
    return (tables["customer"].groupBy("c_nationkey")
            .agg(F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",")
                  .alias("segs"),
                 F.count("*").alias("n"))
            .orderBy("c_nationkey"))


def _x31_asof_join(spark, tables):
    """As-of join (purchase → latest click at-or-before, per user) via
    the window-fill operator; oracle is DuckDB's native ASOF LEFT JOIN.
    Click side is pre-deduped on (user_id, ts) so tie-breaking is
    deterministic in both engines."""
    from hive_parse_lineage_spark.operators.asof import asof_join
    ev = tables["events"]
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts").agg(F.max("event_id").alias("event_id")))
    return (asof_join(purch, clicks, on="ts", by="user_id", values=["event_id"])
            .select("event_id", "user_id", "event_id_r").orderBy("event_id"))


def _x32_map_access(spark, tables):
    """Map construction + subscript access — the reference's LSQUARE
    handler (LineParser.java:688-691) generalized to real MapType."""
    return spark.sql("""
SELECT n_nationkey,
       map_from_arrays(array('key', 'region'),
                       array(n_nationkey, n_regionkey))['region'] AS rk
FROM nation ORDER BY n_nationkey""")


def _x33_struct_access(spark, tables):
    """Struct construction + field access — nested-type support the
    reference lacks entirely (SURVEY §1.2)."""
    return spark.sql("""
SELECT c_custkey, named_struct('seg', c_mktsegment, 'bal', c_acctbal).seg AS seg,
       ROUND(named_struct('seg', c_mktsegment, 'bal', c_acctbal).bal, 2) AS bal
FROM customer ORDER BY c_custkey""")


def _x34_decimal_arith(spark, tables):
    """Exact DECIMAL arithmetic (scale-preserving multiply + sum),
    surfaced as DOUBLE for cross-engine hashing."""
    return spark.sql("""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS rev
FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey ORDER BY l_orderkey""")


def _x35_embedding_near_dup(spark, tables):
    """Semantic (embedding-cosine) near-dup pairs: hyperplane-LSH
    buckets + exact cosine rerank. Threshold 0.2 is a demo value for
    the synthetic random embeddings (which contain no true near-dups);
    production default is 0.95 — identical plan either way."""
    from hive_parse_lineage_spark.operators.dedup import embedding_near_dups
    return (embedding_near_dups(tables["embeddings"], threshold=0.2)
            .orderBy("id_a", "id_b"))


def _x36_repetition(spark, tables):
    """Gopher-style repetition signal: repeated word-3-shingle fraction
    (integer hundredths-of-a-percent — exact cross-engine)."""
    sh = T.word_shingles("text", 3)
    return (tables["documents"]
            .select("doc_id",
                    F.size(sh).alias("n_sh"),
                    F.size(F.array_distinct(sh)).alias("n_uniq"),
                    T.repetition_hundredths("text", 3).alias("rep_c"))
            .orderBy("doc_id"))


def _x37_quality_filter(spark, tables):
    """C4-style composite keep/drop filter over token stats. All
    comparisons are integer-exact (bounds multiplied through instead of
    dividing) so Spark and DuckDB agree bit-for-bit."""
    t = T.tokens("text")
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    total = T.total_token_chars("text")
    keep = ((n >= 20) & (n <= 1000)
            & (total >= 2 * n) & (total <= 12 * n)
            & (nd * 10 >= 3 * n))
    return (tables["documents"]
            .select("doc_id", keep.cast("int").alias("keep"),
                    n.alias("n_tokens"))
            .orderBy("doc_id"))


def _x38_bpe_token_count(spark, tables):
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs +
    single digits + single marks) alongside the whitespace count —
    both pure codegen projections."""
    pieces = T.bpe_ish_tokens("text")
    alpha = F.regexp_extract_all("text", F.lit("[A-Za-z]+"), 0)
    return (tables["documents"]
            .select("doc_id",
                    F.size(pieces).cast("bigint").alias("n_pieces"),
                    F.size(alpha).cast("bigint").alias("n_alpha"),
                    T.token_count("text").cast("bigint").alias("n_ws"))
            .orderBy("doc_id"))


def _x39_hash_split(spark, tables):
    """Deterministic train/val/test assignment: split is a pure
    function of (salt, id) — reproducible across re-runs/backfills,
    zero shuffle at any scale."""
    from hive_parse_lineage_spark.operators.sampling import hash_split
    return (hash_split(tables["documents"], id_col="doc_id", salt="v1")
            .select("doc_id", "bucket", "split")
            .orderBy("doc_id"))


def _x40_sequence_packing(spark, tables):
    """Shard-local sequence packing: docs → fixed-token-budget packs
    via a per-shard running sum (one shuffle, no global sequence)."""
    from hive_parse_lineage_spark.operators.sampling import pack_sequences
    docs = tables["documents"].select(
        "doc_id", T.token_count("text").cast("bigint").alias("n_tokens"))
    return (pack_sequences(docs, "n_tokens", budget=512, n_shards=4,
                           shard_salt="p1")
            .select("doc_id", "n_tokens", "shard", "start_offset", "pack_id")
            .orderBy("doc_id"))


def _x12_pivot(spark, tables):
    """Pivot via df.groupBy().pivot() — Catalyst rewrites to conditional
    aggregation, which is what the oracle spells explicitly."""
    return (tables["orders"]
            .groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.round(F.sum("o_totalprice"), 2))
            .withColumnsRenamed({"F": "f_total", "O": "o_total", "P": "p_total"})
            .orderBy("o_orderpriority"))


def _x13_window_distribution(spark, tables):
    from pyspark.sql import Window as W
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (tables["customer"]
            .select("c_custkey",
                    F.round(F.percent_rank().over(w), 4).alias("pr"),
                    F.round(F.cume_dist().over(w), 4).alias("cd"),
                    F.ntile(4).over(w).alias("quartile"))
            .orderBy("c_custkey"))


def _x14_string_extended(spark, tables):
    return (tables["customer"]
            .select("c_custkey",
                    F.lpad("c_mktsegment", 12, "*").alias("lp"),
                    F.rpad("c_mktsegment", 12, "-").alias("rp"),
                    F.reverse("c_name").alias("rev"),
                    F.split_part("c_name", F.lit("#"), F.lit(1)).alias("sp"),
                    F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
                    F.translate("c_mktsegment", "AEIOU", "aeiou").alias("tr"))
            .orderBy("c_custkey"))


def _x15_date_arithmetic(spark, tables):
    d = F.to_date("o_orderdate")
    return (tables["orders"].filter(F.col("o_orderkey") <= 500)
            .select("o_orderkey",
                    F.date_add(d, 30).alias("d_plus"),
                    F.datediff(F.lit("1998-12-31").cast("date"), d).alias("d_diff"),
                    F.last_day(d).alias("d_eom"),
                    F.dayofweek(d).alias("dow"),
                    F.quarter(d).alias("qtr"),
                    F.weekofyear(d).alias("wk"))
            .orderBy("o_orderkey"))


# ---------------------------------------------------------------------------
# DuckDB oracles (column names aligned with the Spark results)
# ---------------------------------------------------------------------------

_ORACLES: dict[str, str] = {
    "x01_token_stats": """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       CAST(FLOOR(list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'sum')
             * 100 / len(string_split(text, ' '))) AS BIGINT) AS avg_len_c
FROM documents ORDER BY doc_id
""",
    "x02_lang_id": f"""
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sc AS (
  SELECT doc_id,
         len(list_intersect(toks, [{_SW['de']}])) AS s_de,
         len(list_intersect(toks, [{_SW['en']}])) AS s_en,
         len(list_intersect(toks, [{_SW['es']}])) AS s_es,
         len(list_intersect(toks, [{_SW['fr']}])) AS s_fr,
         len(list_intersect(toks, [{_SW['zh']}])) AS s_zh
  FROM s
)
SELECT doc_id,
       CASE WHEN s_de >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_en >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
            WHEN s_es >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
            WHEN s_fr >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
            ELSE 'zh' END AS pred_lang,
       greatest(s_de, s_en, s_es, s_fr, s_zh) AS best_score
FROM sc ORDER BY doc_id
""",
    "x03_quality_score": """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, len(toks) AS n,
         len(list_distinct(toks)) AS nd,
         list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS total_len
  FROM t
)
SELECT doc_id,
       ROUND( (nd / n) * 0.5
            + (CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 ELSE 0.5 END) * 0.25
            + (CASE WHEN total_len / n >= 2.0 AND total_len / n <= 12.0
                    THEN 1.0 ELSE 0.5 END) * 0.25, 4) AS score
FROM m ORDER BY doc_id
""",
    "x04_doc_fingerprint": """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split(text, ' '),
                          t -> (ascii(t) * length(t))::BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007) AS fp
FROM documents ORDER BY doc_id
""",
    "x05_token_jaccard_pairs": """
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < 250
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.toks, b.toks))
             / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
FROM t a, t b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.toks, b.toks))
      / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5
ORDER BY id_a, id_b
""",
    "x06_cosine_pairs": """
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])), 4) AS cosine
FROM embeddings q, embeddings c
WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
  AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                             CAST(c.embedding AS DOUBLE[])) >= 0.25
ORDER BY query_id, neighbor_id
""",
    "x09_knn_cosine_topk": """
WITH s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS cos
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10
), r AS (
  SELECT query_id, vec_id, ROUND(cos, 4) AS cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS INT) AS rank
  FROM s
)
SELECT query_id, vec_id, cosine, rank FROM r
WHERE rank <= 5 AND query_id <> vec_id ORDER BY query_id, rank
""",
    "x76_hard_negatives": """
WITH s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.label AS label,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS cos
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND c.label <> q.label
), r AS (
  SELECT query_id, vec_id, label, ROUND(cos, 4) AS cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS INT) AS rank
  FROM s
)
SELECT query_id, vec_id, label, cosine, rank FROM r
WHERE rank <= 5 ORDER BY query_id, rank
""",
    "x32_map_access": """
SELECT n_nationkey,
       map_extract(MAP {'key': n_nationkey, 'region': n_regionkey}, 'region')[1] AS rk
FROM nation ORDER BY n_nationkey
""",
    "x33_struct_access": """
SELECT c_custkey, struct_pack(seg := c_mktsegment, bal := c_acctbal).seg AS seg,
       ROUND(struct_pack(seg := c_mktsegment, bal := c_acctbal).bal, 2) AS bal
FROM customer ORDER BY c_custkey
""",
    "x34_decimal_arith": """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS rev
FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey ORDER BY l_orderkey
""",
    "x11_exact_dedup": """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY keep_id
""",
    "x12_pivot": """
SELECT o_orderpriority,
       ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS f_total,
       ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS o_total,
       ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS p_total
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    "x13_window_distribution": """
SELECT c_custkey,
       ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 4) AS pr,
       ROUND(CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 4) AS cd,
       NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer ORDER BY c_custkey
""",
    "x14_string_extended": """
SELECT c_custkey,
       LPAD(c_mktsegment, 12, '*') AS lp,
       RPAD(c_mktsegment, 12, '-') AS rp,
       REVERSE(c_name) AS rev,
       SPLIT_PART(c_name, '#', 1) AS sp,
       LEVENSHTEIN(c_mktsegment, 'BUILDING') AS lev,
       TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS tr
FROM customer ORDER BY c_custkey
""",
    "x16_time_rollup": """
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d,
       CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS h,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)),
                        (event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP),
                         CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)), ())
ORDER BY event_type NULLS FIRST, d NULLS FIRST, h NULLS FIRST
""",
    "x17_unpivot": """
SELECT l_orderkey, l_linenumber, metric, ROUND(val, 2) AS val FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount
  FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax
  FROM lineitem WHERE l_orderkey < 100
) u ORDER BY l_orderkey, l_linenumber, metric
""",
    "x18_explode_tokens": """
SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
WHERE doc_id < 500 ORDER BY doc_id, tok
""",
    "x19_array_ops": """
SELECT vec_id, len(embedding) AS dim,
       ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 2) AS s,
       ROUND(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                x -> x*x), 'sum')), 2) AS l2,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS mx
FROM embeddings WHERE vec_id < 200 ORDER BY vec_id
""",
    "x20_json_native": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
       CAST(json_extract_string(props, '$.k') AS INT) AS kj
FROM events WHERE event_id < 500 ORDER BY event_id
""",
    "x21_regexp": """
SELECT c_custkey,
       CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS num,
       regexp_replace(c_name, '[0-9]', '', 'g') AS alpha,
       CAST(regexp_matches(c_name, '00$') AS INT) AS ends00
FROM customer ORDER BY c_custkey
""",
    "x22_stats_agg": """
SELECT c_nationkey, ROUND(stddev_samp(c_acctbal), 2) AS sd,
       ROUND(var_samp(c_acctbal), 2) AS vr,
       ROUND(corr(c_acctbal, c_custkey), 4) AS cr,
       ROUND(covar_samp(c_acctbal, c_custkey), 2) AS cv
FROM customer WHERE c_custkey % 7 != 3
GROUP BY c_nationkey ORDER BY c_nationkey
""",
    "x23_window_value": """
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv
FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
""",
    "x24_intersect_all": _X24_SQL,
    "x25_except_all": _X25_SQL,
    "x26_sessionize": """
WITH d AS (
  SELECT user_id,
         CASE WHEN date_diff('second',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events)
SELECT user_id, CAST(1 + SUM(brk) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM d GROUP BY user_id ORDER BY user_id
""",
    "x27_histogram": """
SELECT CAST(FLOOR(o_totalprice / 50000.0) + 1 AS BIGINT) AS b,
       COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders GROUP BY b ORDER BY b
""",
    "x28_percentile": _X28_SQL,
    "x29_bitwise": """
SELECT l_orderkey, l_linenumber,
       l_partkey & l_suppkey AS ba, l_partkey | l_suppkey AS bo,
       xor(l_partkey, l_suppkey) AS bx, l_linenumber << 3 AS sl,
       ~l_partkey AS bn
FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber
""",
    "x30_collect_sorted": """
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segs,
       COUNT(*) AS n
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
""",
    "x31_asof_join": """
SELECT p.event_id, p.user_id, c.event_id AS event_id_r
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, MAX(event_id) AS event_id FROM events
                WHERE event_type = 'click' GROUP BY user_id, ts) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
    "x36_repetition": """
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 1),
                                  i -> array_to_string(list_slice(t, i, i + 2), ' '))
              ELSE [text] END AS s
  FROM toks
)
SELECT doc_id, len(s) AS n_sh, len(list_distinct(s)) AS n_uniq,
       CAST(FLOOR((len(s) - len(list_distinct(s))) * 10000 / len(s)) AS BIGINT) AS rep_c
FROM sh ORDER BY doc_id
""",
    "x37_quality_filter": """
WITH m AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), s AS (
  SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd,
         list_aggregate(list_transform(t, x -> length(x)), 'sum') AS total
  FROM m
)
SELECT doc_id,
       CAST(n >= 20 AND n <= 1000 AND total >= 2*n AND total <= 12*n
            AND nd*10 >= 3*n AS INT) AS keep,
       n AS n_tokens
FROM s ORDER BY doc_id
""",
    "x38_bpe_token_count": """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS n_pieces,
       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha,
       len(string_split(text, ' ')) AS n_ws
FROM documents ORDER BY doc_id
""",
    "x15_date_arithmetic": """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS d_plus,
       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS d_diff,
       last_day(CAST(o_orderdate AS DATE)) AS d_eom,
       dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
       quarter(CAST(o_orderdate AS DATE)) AS qtr,
       weekofyear(CAST(o_orderdate AS DATE)) AS wk
FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
""",
}


def _minhash_oracle_sql(n_hashes: int = 64, bands: int = 16,
                        shingle_k: int = 2, threshold: float = 0.3,
                        seed: int = 42, source: str = "documents",
                        max_bucket_size: int | None = None) -> str:
    """DuckDB replay of the x07 MinHash-LSH pipeline: same portable
    shingle hash, same fixed (a, b) permutation constants, same banding
    — so pairs AND est_jaccard values match the Spark run exactly.

    ``source`` is the (doc_id, text) relation; ``max_bucket_size``
    replays the hot-bucket cap rule itself (drop every entry of a
    band bucket whose size exceeds the cap BEFORE the self-join) —
    the x72 hash gate on the production cap path."""
    from hive_parse_lineage_spark.operators.dedup import _P, _perm_params
    k, n = shingle_k, n_hashes
    rows = n_hashes // bands
    h = T.portable_hash64_sql("s")
    mins = ",\n    ".join(
        f"list_min(list_transform(hs, x -> ({a}*x + {b}) % {_P}))"
        for a, b in _perm_params(n_hashes, seed))
    est = f"ROUND(len(list_filter(range(1, {n + 1}), i -> sa[i] = sb[i])) / {n}, 4)"
    bucket_rel = "bk"
    cap_cte = ""
    if max_bucket_size is not None:
        bucket_rel = "bkc"
        cap_cte = f""", bkc AS (
  SELECT doc_id, sig, band, bv FROM (
    SELECT bk.*, COUNT(*) OVER (PARTITION BY band, bv) AS bn FROM bk
  ) WHERE bn <= {max_bucket_size}
)"""
    return f"""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM {source}
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {k}
              THEN list_transform(range(1, len(t) - {k} + 2),
                                  i -> array_to_string(list_slice(t, i, i + {k} - 1), ' '))
              ELSE [text] END AS shingles
  FROM toks
), hashed AS (
  SELECT doc_id, list_transform(shingles, s -> {h} % {_P}) AS hs FROM sh
), sigs AS (
  SELECT doc_id, [{mins}] AS sig FROM hashed
), bk AS (
  SELECT doc_id, sig, r.range AS band,
         list_slice(sig, r.range*{rows} + 1, r.range*{rows} + {rows}) AS bv
  FROM sigs, range({bands}) r
){cap_cte}, pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
  FROM {bucket_rel} a JOIN {bucket_rel} b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, {est} AS est_jaccard
FROM pairs WHERE {est} >= {threshold}
ORDER BY id_a, id_b
"""


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB replay of x08: per-bit majority vote over portable token
    hashes (bit j set iff more than half the tokens have bit j), then
    the same pigeonhole block join + exact Hamming verify.

    Only bits 0-59 appear: the portable hash is 60-bit, so counters for
    bits 60-63 are always -n (bit never set) in both engines."""
    h = T.portable_hash64_sql("tok")
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    terms = "\n       + ".join(
        f"CASE WHEN 2*len(list_filter(hl, x -> (x & {1 << j}) != 0)) > n "
        f"THEN {1 << j}::BIGINT ELSE 0 END"
        for j in range(60))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), hashes AS (
  SELECT doc_id, list_transform(t, tok -> {h}) AS hl, len(t) AS n FROM toks
), sigs AS (
  SELECT doc_id, ({terms}) AS sh FROM hashes
), bl AS (
  SELECT doc_id, sh, r.range AS blk,
         (sh >> (r.range*{width})) & {(1 << width) - 1} AS bv
  FROM sigs, range({n_blocks}) r
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
  FROM bl a JOIN bl b ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
)
SELECT id_a, id_b, hamming FROM pairs ORDER BY id_a, id_b
"""


def _hyperplane_sig_terms(n_bits: int, dim: int, seed: int) -> str:
    """SQL expression for the n-bit hyperplane signature of DOUBLE[]
    column ``e``: the planes are deterministic literals (same seed as
    the Spark operators) and each dot product folds left-to-right
    exactly like Spark's ``aggregate`` — identical buckets."""
    from hive_parse_lineage_spark.operators.similarity import make_planes
    planes = make_planes(n_bits, dim, seed)
    return "\n       + ".join(
        "CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, {d1}), "
        "j -> e[j] * ([{lits}])[j])), (a,b) -> a + b) > 0 "
        "THEN {bit} ELSE 0 END".format(
            d1=dim + 1, bit=1 << i,
            lits=", ".join(repr(float(v)) for v in p))
        for i, p in enumerate(planes))


def _lsh_knn_oracle_sql(k: int = 5, n_bits: int = 8, dim: int = 64,
                        seed: int = 42, n_queries: int = 10) -> str:
    """DuckDB replay of x10: identical LSH buckets (see
    :func:`_hyperplane_sig_terms`), then the same within-bucket cosine
    top-k."""
    sig_terms = _hyperplane_sig_terms(n_bits, dim, seed)
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sigs AS (
  SELECT vec_id, e, ({sig_terms}) AS sg FROM base
), q AS (
  SELECT vec_id AS query_id, e AS qe, sg FROM sigs WHERE vec_id < {n_queries}
), scored AS (
  SELECT q.query_id, c.vec_id, list_cosine_similarity(q.qe, c.e) AS cos
  FROM sigs c JOIN q ON c.sg = q.sg
), ranked AS (
  SELECT query_id, vec_id, ROUND(cos, 4) AS cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def _hash_split_oracle_sql(salt: str = "v1", n_buckets: int = 100) -> str:
    """DuckDB replay of x39: same portable hash over salt||id, same
    cumulative bucket boundaries (80/90 for the default 0.8/0.1/0.1)."""
    h = T.portable_hash64_sql(f"'{salt}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH b AS (
  SELECT doc_id, {h} % {n_buckets} AS bucket FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""


def _sequence_packing_oracle_sql(budget: int = 512, n_shards: int = 4,
                                 salt: str = "p1") -> str:
    """DuckDB replay of x40: same hash shard, same windowed running sum."""
    h = T.portable_hash64_sql(f"'{salt}' || CAST(doc_id AS VARCHAR)")
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
)
SELECT doc_id, n_tokens, shard, start_offset,
       CAST(FLOOR(start_offset / {budget}) AS BIGINT) AS pack_id
FROM c ORDER BY doc_id
"""


def _embedding_near_dup_oracle_sql(threshold: float = 0.2, n_bits: int = 8,
                                   dim: int = 64, seed: int = 42) -> str:
    """DuckDB replay of x35: same LSH buckets, exact cosine rerank."""
    sig_terms = _hyperplane_sig_terms(n_bits, dim, seed)
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sigs AS (
  SELECT vec_id, e, ({sig_terms}) AS sg FROM base
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine
FROM sigs a JOIN sigs b ON a.sg = b.sg AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= {threshold}
ORDER BY id_a, id_b
"""


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "x01_token_stats": _q(_x01_token_stats),
        "x02_lang_id": _q(_x02_lang_id),
        "x03_quality_score": _q(_x03_quality_score),
        "x04_doc_fingerprint": _q(_x04_doc_fingerprint),
        "x05_token_jaccard_pairs": _q(_x05_token_jaccard_pairs),
        "x06_cosine_pairs": _q(_x06_cosine_pairs),
        "x07_minhash_near_dup": _q(_x07_minhash_near_dup),
        "x08_simhash_near_dup": _q(_x08_simhash_near_dup),
        "x09_knn_cosine_topk": _q(_x09_knn_cosine_topk),
        "x10_lsh_knn": _q(_x10_lsh_knn),
        "x76_hard_negatives": _q(_x76_hard_negatives),
        "x11_exact_dedup": _q(_x11_exact_dedup),
        "x12_pivot": _q(_x12_pivot),
        "x13_window_distribution": _q(_x13_window_distribution),
        "x14_string_extended": _q(_x14_string_extended),
        "x15_date_arithmetic": _q(_x15_date_arithmetic),
        "x16_time_rollup": _q(_x16_time_rollup),
        "x17_unpivot": _q(_x17_unpivot),
        "x18_explode_tokens": _q(_x18_explode_tokens),
        "x19_array_ops": _q(_x19_array_ops),
        "x20_json_native": _q(_x20_json_native),
        "x21_regexp": _q(_x21_regexp),
        "x22_stats_agg": _q(_x22_stats_agg),
        "x23_window_value": _q(_x23_window_value),
        "x24_intersect_all": _q(_x24_intersect_all),
        "x25_except_all": _q(_x25_except_all),
        "x26_sessionize": _q(_x26_sessionize),
        "x27_histogram": _q(_x27_histogram),
        "x28_percentile": _q(_x28_percentile),
        "x29_bitwise": _q(_x29_bitwise),
        "x30_collect_sorted": _q(_x30_collect_sorted),
        "x31_asof_join": _q(_x31_asof_join),
        "x32_map_access": _q(_x32_map_access),
        "x33_struct_access": _q(_x33_struct_access),
        "x34_decimal_arith": _q(_x34_decimal_arith),
        "x35_embedding_near_dup": _q(_x35_embedding_near_dup),
        "x36_repetition": _q(_x36_repetition),
        "x37_quality_filter": _q(_x37_quality_filter),
        "x38_bpe_token_count": _q(_x38_bpe_token_count),
        "x39_hash_split": _q(_x39_hash_split),
        "x40_sequence_packing": _q(_x40_sequence_packing),
    }


def extra_oracle_sql() -> dict[str, str]:
    out = dict(_ORACLES)
    out["x07_minhash_near_dup"] = _minhash_oracle_sql()
    out["x08_simhash_near_dup"] = _simhash_oracle_sql()
    out["x10_lsh_knn"] = _lsh_knn_oracle_sql()
    out["x35_embedding_near_dup"] = _embedding_near_dup_oracle_sql()
    out["x39_hash_split"] = _hash_split_oracle_sql()
    out["x40_sequence_packing"] = _sequence_packing_oracle_sql()
    return out
