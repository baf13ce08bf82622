"""Multi-phrase exact matching at corpus scale: anchor-join instead of
K substring scans.

The naive spelling of "find every occurrence of K phrases" is K
full-corpus ``LIKE``/``contains`` scans (or one scan with a K-way OR)
— at 100 TB that is K passes over the text bytes and none of it
shuffles smaller than the corpus. The scalable shape (the relational
skeleton of Aho-Corasick) is:

1. ONE tokenization pass emits, per token position, a fixed-width
   context window — here ``(anchor = tok_i + ' ' + tok_i+1, t3 =
   tok_i+2, pos)`` — via a codegen ``transform`` + ``explode``; no
   per-row Python, no full token-array carried through the explode.
2. The phrase table (K rows — bounded by the request, a LEGITIMATE
   broadcast under the repo's hint budget) equi-joins on the anchor
   bigram; Spark picks a broadcast hash join, so the corpus-sized
   context stream never shuffles for the match itself.
3. Longer phrases verify against the carried context (``t3`` for
   3-token phrases); supporting wider phrases is the same pattern
   with a wider fixed window.

Matching is TOKEN-boundary-exact: ``'table hash'`` does not match
inside ``'stable hash'`` — which is precisely what a raw substring
oracle would get wrong; the DuckDB oracle therefore replays the same
token-window definition.

Reference parity: the reference's text surface is single-pattern
``LIKE``/``RLIKE`` (SURVEY §2b Q02/x21); multi-phrase matching is the
batch-curation composition used for blocklist tagging and targeted
span audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_parse_lineage_spark.functions.text import tokens


def phrase_match(spark: SparkSession, docs: DataFrame,
                 phrases: list[str], id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-(doc, phrase) hit report for 2- and 3-token phrases.

    Returns ``(doc_id, phrase, n_hits, first_pos)`` — ``first_pos``
    is the 1-based token index of the phrase's first occurrence —
    sorted by ``(doc_id, phrase)``. Overlapping occurrences all
    count (positions are independent windows).
    """
    lens = {len(p.split(" ")) for p in phrases}
    if not lens <= {2, 3}:
        raise ValueError("phrase_match supports 2- and 3-token phrases")
    ph = spark.createDataFrame(
        [(p, p.split(" ")) for p in phrases],
        "phrase string, toks array<string>").select(
        "phrase",
        F.expr("concat(toks[0], ' ', toks[1])").alias("anchor"),
        F.size("toks").alias("plen"),
        F.expr("try_element_at(toks, 3)").alias("p3"))
    # size(w) >= 2 guard first: sequence(0, size-2) on a 1-token doc
    # would otherwise emit the DESCENDING sequence [0, -1].
    ctx = (docs.select(F.col(id_col), tokens(text_col).alias("w"))
           .filter(F.size("w") >= 2)
           .select(id_col, F.explode(F.expr(
               "transform(sequence(0, size(w) - 2), i -> named_struct("
               "'anchor', concat(w[i], ' ', w[i + 1]), "
               "'t3', try_element_at(w, i + 3), "
               "'pos', i + 1))")).alias("s"))
           .select(id_col, "s.anchor", "s.t3", "s.pos"))
    hits = (ctx.join(F.broadcast(ph), "anchor")
            .filter((F.col("plen") == 2) | (F.col("t3") == F.col("p3"))))
    return (hits.groupBy(id_col, "phrase")
            .agg(F.count("*").alias("n_hits"),
                 F.min("pos").alias("first_pos"))
            .orderBy(id_col, "phrase"))


def phrase_match_oracle_sql(phrases: list[str]) -> str:
    """DuckDB twin of :func:`phrase_match` — the same token-window
    semantics spelled as the naive per-position slice comparison."""
    rows = ", ".join(f"('{p.replace(chr(39), chr(39)*2)}')"
                     for p in phrases)
    return f"""
WITH ph AS (
  SELECT phrase, string_split(phrase, ' ') AS ptoks
  FROM (VALUES {rows}) AS v(phrase)
), w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), pos AS (
  SELECT doc_id, w, unnest(range(1, len(w))) AS pos FROM w
), hit AS (
  SELECT p.doc_id, ph.phrase, p.pos
  FROM pos p JOIN ph
    ON array_to_string(list_slice(p.w, CAST(p.pos AS INT),
                                  CAST(p.pos AS INT) + len(ph.ptoks) - 1),
                       ' ') = ph.phrase
)
SELECT doc_id, phrase, COUNT(*) AS n_hits, MIN(pos) AS first_pos
FROM hit GROUP BY doc_id, phrase ORDER BY doc_id, phrase
"""
