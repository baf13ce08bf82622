"""x88-x93 (pipeline_queries): plan-shape assertions plus a
brute-force BM25 reference on a toy corpus. Value-level correctness
vs DuckDB is covered by the oracle gate (selfcheck / driver sweep);
these tests pin the 100 TB plan posture and the scoring math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
from hive_parse_lineage_spark.sources.loader import load_tables


def _plan_of(spark, sf_dir, name: str) -> str:
    df = pipeline_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_matches_brute_force(spark):
    """Score parity with a driver-side reference implementation of the
    log-free BM25 on a toy corpus (including a term hitting one doc
    and a term hitting none)."""
    from hive_parse_lineage_spark.operators.retrieval import bm25_term_topk
    rows = [(1, "a b a c"), (2, "a d"), (3, "b b b e"), (4, "c c a b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["term"], r["doc_id"]): (r["tf"], r["dl"], r["score"], r["rank"])
           for r in bm25_term_topk(docs, ["a", "e", "zz"], k=10).collect()}
    toks = {d: t.split(" ") for d, t in rows}
    n, total = len(rows), sum(len(w) for w in toks.values())
    exp = {}
    for term in ["a", "e"]:
        hits = {d: w.count(term) for d, w in toks.items() if term in w}
        df = len(hits)
        idf = (2 * n - 2 * df + 1) / (2 * df + 1)
        scored = sorted(
            ((idf * (tf / (tf + 0.3 + 0.9 * len(toks[d]) * n / total)), d, tf)
             for d, tf in hits.items()), key=lambda x: (-x[0], x[1]))
        for rank, (s, d, tf) in enumerate(scored, 1):
            exp[(term, d)] = (tf, len(toks[d]), round(s, 4), rank)
    assert got == exp  # and nothing for 'zz'


def test_bm25_stats_and_df_broadcast(spark, tables, sf_dir):
    """x88: per-term df and the 1-row corpus stats broadcast; the only
    non-broadcast join is the tf⋈dl equi-join. Never a cartesian."""
    plan = _plan_of(spark, sf_dir, "x88_bm25_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_importance_counts_broadcast_onto_explode(spark, tables, sf_dir):
    """x89: token-frequency tables join the exploded corpus as
    broadcasts — reshuffling the token stream by tok would be the
    100 TB bottleneck."""
    plan = _plan_of(spark, sf_dir, "x89_importance_weights")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_segment_rebuild_shuffles_on_segment_then_doc(spark, tables, sf_dir):
    """x90: keep-first windows over the segment text (one hash
    exchange on seg), then one per-doc aggregate — no join at all."""
    plan = _plan_of(spark, sf_dir, "x90_segment_dedup_rebuild")
    assert "Exchange hashpartitioning(seg" in plan, plan
    assert "Join" not in plan, plan


def test_length_quantiles_broadcast_back(spark, tables, sf_dir):
    """x91: the 5-row quantile table must broadcast onto the corpus
    for the outlier counts."""
    plan = _plan_of(spark, sf_dir, "x91_length_quantiles")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pmi_unigrams_broadcast(spark, tables, sf_dir):
    """x92: both unigram sides attach to the bigram counts as
    broadcast joins (vocabulary << bigram stream)."""
    plan = _plan_of(spark, sf_dir, "x92_pmi_collocations")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_packing_efficiency_single_shard_shuffle(spark, tables, sf_dir):
    """x94 inherits x40's posture: ONE hash exchange on the shard key
    feeds both the running-sum window and the per-shard aggregate
    (plus the final 4-row orderBy range exchange)."""
    plan = _plan_of(spark, sf_dir, "x94_packing_efficiency")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange hashpartitioning(shard" in plan, plan


def test_packing_waste_consistency(spark, tables, sf_dir):
    """Waste and straddles are internally consistent: capacity covers
    the tokens, and straddle count < doc count."""
    rows = pipeline_queries()["x94_packing_efficiency"](spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_packs"] * 512 >= r["total_tokens"]
        assert 0 <= r["waste_permille"] < 1000
        assert 0 <= r["n_straddles"] < r["n_docs"]


def test_quality_dup_deciles_cover_corpus(spark, tables, sf_dir):
    rows = pipeline_queries()["x95_quality_dup_calibration"](spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n = sum(r["n_docs"] for r in rows)
    assert n == load_tables(spark, sf_dir)["documents"].count()


def test_lang_confusion_partitions_corpus(spark, tables, sf_dir):
    """The matrix is a partition of the corpus: per-lang row sums
    equal the label counts, predictions stay in the 5-lang domain.
    (No diagonal-dominance assert: the synthetic corpus's vocabulary
    is English-leaning whatever the label — surfacing exactly that
    mismatch is what the matrix is for.)"""
    rows = pipeline_queries()["x96_lang_confusion"](spark, sf_dir).collect()
    langs = {"de", "en", "es", "fr", "zh"}
    assert {r["pred_lang"] for r in rows} <= langs
    got = {}
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_docs"]
    exp = {r["lang"]: r["n"] for r in load_tables(spark, sf_dir)["documents"]
           .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == exp


def test_integrity_audit_accounts_for_every_id(spark, tables, sf_dir):
    """x97's three statuses must partition the union of both
    (perturbed) id sets — the audit loses nothing."""
    rows = {r["status"]: r["n"] for r in
            pipeline_queries()["x97_integrity_audit"](spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir)["documents"]
    n = docs.count()
    n_docs = docs.filter("doc_id % 50 != 3").count()
    n_embs = (load_tables(spark, sf_dir)["embeddings"]
              .filter("vec_id % 50 != 7").count())
    assert rows["matched"] + rows["doc_without_embedding"] == n_docs
    assert rows["matched"] + rows["embedding_without_doc"] == n_embs
    assert sum(rows.values()) <= 2 * n


def test_frequency_spectrum_is_monotone(spark, tables, sf_dir):
    """Frequencies must be non-increasing in rank and ranks must be
    powers of two."""
    rows = pipeline_queries()["x98_frequency_spectrum"](spark, sf_dir).collect()
    ranks = [r["rank"] for r in rows]
    freqs = [r["freq"] for r in rows]
    assert all(r & (r - 1) == 0 for r in ranks)
    assert freqs == sorted(freqs, reverse=True)
    assert all(r["rank_x_freq"] == r["rank"] * r["freq"] for r in rows)


def test_metadata_inconsistency_rows_are_real_conflicts(spark, tables, sf_dir):
    rows = pipeline_queries()["x99_metadata_inconsistency"](spark, sf_dir).collect()
    assert rows  # the synthetic corpus does contain conflicting groups
    for r in rows:
        assert r["n_docs"] > 1
        assert r["n_langs"] > 1 or r["n_sources"] > 1


def test_novelty_bucket_assigned_before_explode(spark, tables, sf_dir):
    """x93 regression: ntile must run over the 10-deciles of DOCS, not
    of exploded gram rows (uniform bucket gram-counts are the bug
    signature). Cheap value check at sf0.001-scale data."""
    df = pipeline_queries()["x93_novelty_curve"](spark, sf_dir)
    rows = df.collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    # bucket 1 can never contain an already-seen gram
    assert rows[0]["repeated_permille"] == 0
    # doc-level deciles have *varying* gram totals; the exploded-row
    # ntile bug yields all-equal n_grams (±1)
    totals = {r["n_grams"] for r in rows}
    assert len(totals) > 2, rows
