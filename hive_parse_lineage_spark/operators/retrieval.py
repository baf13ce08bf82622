"""Lexical retrieval over the documents table: BM25 scoring.

Spark-first shape: term frequencies come from one filtered explode
(the term list is pushed into the explode's filter, so the shuffle
carries only matching tokens), document length is a codegen
projection, and corpus statistics (N, total length, per-term df) are
single-row / |terms|-row aggregates that broadcast. No UDFs.

The score is the log-free BM25 variant: the classic
``log((N - df + 0.5) / (df + 0.5))`` idf is replaced by its rational
argument ``(2N - 2df + 1) / (2df + 1)`` (same ordering for a single
term, monotone in df). Keeping the whole score inside +,*,/ on
IEEE doubles makes it bit-reproducible across engines — the DuckDB
oracle computes the identical expression tree, which is what lets a
floating-point ranking function sit under a value-hash gate.

Reference parity: the reference engine exposes full-text scoring only
through its SQL function surface; this module is the Spark-side
equivalent for the training-data pipeline (passage ranking for
retrieval-augmented data curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hive_parse_lineage_spark.functions.text import tokens


def bm25_term_topk(docs: DataFrame, terms: list[str], k: int = 10,
                   k1: float = 1.2, b: float = 0.75,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Top-``k`` documents per query term by BM25 weight.

    Returns ``(term, doc_id, tf, dl, score, rank)`` with ``score``
    rounded to 4 decimals and ``rank`` dense over (score desc, id).

    Scale posture: the explode is filtered to the term list before the
    (term, doc) count, so the shuffle is proportional to matching
    tokens only; df and the two corpus scalars broadcast; the only
    full-corpus pass is the dl projection feeding one equi-join.
    """
    # Python-level constants so the oracle can embed the exact same
    # doubles (k1*(1-b) evaluated here, not re-derived in SQL).
    c0 = k1 * (1.0 - b)
    c1 = k1 * b
    base = docs.select(F.col(id_col), tokens(text_col).alias("w"))
    dl = base.select(id_col, F.size("w").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("total_len"))
    term_arr = F.array(*[F.lit(t) for t in terms])
    tf = (base.select(id_col, F.explode("w").alias("tok"))
          .filter(F.col("tok").isin(terms))
          .groupBy("tok", id_col).agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (tf.join(dl, id_col)
              .join(F.broadcast(df_), "tok")
              .crossJoin(F.broadcast(stats)))
    idf = ((F.lit(2) * F.col("n_docs") - F.lit(2) * F.col("df") + F.lit(1))
           .cast("double") / (F.lit(2) * F.col("df") + F.lit(1)))
    den = (F.col("tf") + F.lit(c0)
           + F.lit(c1) * F.col("dl") * F.col("n_docs") / F.col("total_len"))
    score = (idf * (F.col("tf") / den)).alias("_score")
    ranked = scored.select(F.col("tok").alias("term"), F.col(id_col),
                           "tf", "dl", score)
    w = Window.partitionBy("term").orderBy(F.desc("_score"), F.col(id_col))
    return (ranked.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("term", id_col, "tf", "dl",
                    F.round("_score", 4).alias("score"), "rank"))


def bm25_oracle_sql(terms: list[str], k: int = 10,
                    k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of :func:`bm25_term_topk` — the same expression
    tree over the same integer inputs, so doubles match bitwise."""
    c0 = repr(k1 * (1.0 - b))
    c1 = repr(k1 * b)
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), dl AS (
  SELECT doc_id, len(w) AS dl FROM w
), stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl
), tf AS (
  SELECT tok, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS tok FROM w)
  WHERE tok IN ({term_list})
  GROUP BY tok, doc_id
), df AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT tf.tok AS term, tf.doc_id, tf.tf, dl.dl,
         (CAST(2 * stats.n_docs - 2 * df.df + 1 AS DOUBLE)
              / (2 * df.df + 1))
         * (tf.tf / (tf.tf + {c0}
                     + {c1} * dl.dl * stats.n_docs / stats.total_len))
             AS _score
  FROM tf JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN stats
), ranked AS (
  SELECT term, doc_id, tf, dl, _score,
         ROW_NUMBER() OVER (PARTITION BY term
                            ORDER BY _score DESC, doc_id) AS rank
  FROM scored
)
SELECT term, doc_id, tf, dl, ROUND(_score, 4) AS score, rank
FROM ranked WHERE rank <= {k}
ORDER BY term, rank
"""

def hybrid_rrf_topk(docs: DataFrame, terms: list[str], k: int = 10,
                    pool: int = 20, c: int = 60,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Two-stage hybrid retrieval fused with Reciprocal Rank Fusion.

    Ranker A is BM25 (:func:`bm25_term_topk`, top-``pool`` per term);
    ranker B is query-likelihood term density (``tf/dl``, the
    smoothing-free QL ranker), also top-``pool``. The fused score is
    the classic RRF ``sum(1/(c + rank_i))`` with a missing ranker
    contributing 0; output is the top-``k`` per term by fused score
    (ties broken on ``doc_id``).

    Determinism under the hash gate: each contribution is ONE double
    division of small integers (``CAST(1 AS DOUBLE)/(c+rank)``) and the
    sum is a fixed two-term left-associated add — the DuckDB oracle
    (:func:`rrf_oracle_sql`) writes the identical IEEE tree, so the
    doubles are bit-equal.

    Scale posture: both rankers end in a per-term top-``pool``
    window (rank state bounded by |terms| * pool, never corpus rows);
    the fusion join is |terms| * pool vs |terms| * pool — tiny — and
    the only corpus-sized work is the shared filtered explode both
    rankers derive from. Reference parity: the reference exposes only
    single-signal ranking (SURVEY §2); fusion is the standard data-
    curation composition of its lexical + vector surfaces.
    """
    a = (bm25_term_topk(docs, terms, k=pool, id_col=id_col,
                        text_col=text_col)
         .select("term", id_col, F.col("rank").alias("ra")))
    base = docs.select(F.col(id_col), tokens(text_col).alias("w"))
    dl = base.select(id_col, F.size("w").alias("dl"))
    tf = (base.select(id_col, F.explode("w").alias("tok"))
          .filter(F.col("tok").isin(terms))
          .groupBy("tok", id_col).agg(F.count("*").alias("tf")))
    dens = (tf.join(dl, id_col)
            .select(F.col("tok").alias("term"), F.col(id_col),
                    (F.col("tf").cast("double") / F.col("dl"))
                    .alias("_d")))
    wb = Window.partitionBy("term").orderBy(F.desc("_d"), F.col(id_col))
    b = (dens.withColumn("rb", F.row_number().over(wb))
         .filter(F.col("rb") <= pool).select("term", id_col, "rb"))
    one = F.lit(1).cast("double")
    zero = F.lit(0).cast("double")
    fused = (a.join(b, ["term", id_col], "full_outer")
             .select("term", id_col, "ra", "rb",
                     (F.coalesce(one / (F.lit(c) + F.col("ra")), zero)
                      + F.coalesce(one / (F.lit(c) + F.col("rb")), zero))
                     .alias("rrf")))
    wf = Window.partitionBy("term").orderBy(F.desc("rrf"), F.col(id_col))
    return (fused.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= k)
            .select("term", id_col, "ra", "rb", "rrf", "rank"))


def rrf_oracle_sql(terms: list[str], k: int = 10, pool: int = 20,
                   c: int = 60, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of :func:`hybrid_rrf_topk` — same BM25 tree, same
    density ranker, same two-division RRF expression."""
    c0 = repr(k1 * (1.0 - b))
    c1 = repr(k1 * b)
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), dl AS (
  SELECT doc_id, len(w) AS dl FROM w
), stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl
), tf AS (
  SELECT tok, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS tok FROM w)
  WHERE tok IN ({term_list})
  GROUP BY tok, doc_id
), df AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT tf.tok AS term, tf.doc_id, tf.tf, dl.dl,
         (CAST(2 * stats.n_docs - 2 * df.df + 1 AS DOUBLE)
              / (2 * df.df + 1))
         * (tf.tf / (tf.tf + {c0}
                     + {c1} * dl.dl * stats.n_docs / stats.total_len))
             AS _score
  FROM tf JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN stats
), ranked_a AS (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term
                            ORDER BY _score DESC, doc_id) AS ra
  FROM scored
), pool_a AS (
  SELECT term, doc_id, ra FROM ranked_a WHERE ra <= {pool}
), dens AS (
  SELECT tf.tok AS term, tf.doc_id,
         CAST(tf.tf AS DOUBLE) / dl.dl AS _d
  FROM tf JOIN dl USING (doc_id)
), ranked_b AS (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term
                            ORDER BY _d DESC, doc_id) AS rb
  FROM dens
), pool_b AS (
  SELECT term, doc_id, rb FROM ranked_b WHERE rb <= {pool}
), fused AS (
  SELECT term, doc_id, ra, rb,
         COALESCE(CAST(1 AS DOUBLE) / ({c} + ra), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / ({c} + rb), CAST(0 AS DOUBLE))
             AS rrf
  FROM pool_a FULL OUTER JOIN pool_b USING (term, doc_id)
)
SELECT term, doc_id, ra, rb, rrf,
       ROW_NUMBER() OVER (PARTITION BY term
                          ORDER BY rrf DESC, doc_id) AS rank
FROM fused
QUALIFY rank <= {k}
ORDER BY term, rank
"""
