"""x141-x146 (analytics_queries): the integer floor-log2 primitive,
entropy/surprise bounds, retrieval-eval consistency, RBO extremes, and
a numpy reference for the power-iteration spectral audit. Value-level
correctness vs DuckDB is covered by the oracle gate; these tests pin
the math and the 100 TB plan posture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hive_parse_lineage_spark.analytics_queries import (
    RBO_MAX, analytics_queries)


def _plan_of(spark, sf_dir, name: str) -> str:
    df = analytics_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_ibits_matches_python_bit_length(spark):
    """length(bin(x)) == x.bit_length() == floor(log2 x)+1 — the
    primitive every entropy-class entry leans on."""
    vals = [1, 2, 3, 4, 7, 8, 1023, 1024, 1025, 10**6, 2**40 - 1, 2**40]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["x"]: r["ib"]
           for r in df.select("x", F.length(F.bin("x")).alias("ib")).collect()}
    assert got == {v: v.bit_length() for v in vals}


def test_entropy_bits_toy_reference(spark):
    """Python replay of the floor-bit entropy on a 2-source toy corpus:
    a degenerate source (one token repeated) must score 0 bits; a
    diverse one must score within ±1 bit/token of true Shannon."""
    rows = [(1, "a a a a a a a a", "dup"),
            (2, "a b c d e f g h", "mix"),
            (3, "i j k l m n o p", "mix")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from hive_parse_lineage_spark.analytics_queries import _x141_entropy_bits
    out = {r["source"]: r.asDict()
           for r in _x141_entropy_bits(spark, {"documents": docs}).collect()}
    assert out["dup"]["total_bits"] == 0
    assert out["dup"]["bits_per_tok_milli"] == 0
    # mix: 16 tokens all distinct -> surprise ibits(16)-ibits(1) = 4 each
    assert out["mix"]["n_tokens"] == 16
    assert out["mix"]["n_vocab"] == 16
    assert out["mix"]["total_bits"] == 16 * 4
    true_h = math.log2(16)  # 4.0 bits/token
    assert abs(out["mix"]["bits_per_tok_milli"] / 1000 - true_h) <= 1.0


def test_bigram_surprise_bounds_and_degenerate_doc(spark):
    """c2(prev,tok) <= c1(prev) always, so per-bigram bits >= 0; a
    document that is one repeated bigram of a common pair scores lower
    than a document of corpus-unique bigrams."""
    # docs 1/2: the (x,y) bigram is the corpus default after 'x' ->
    # near-zero surprise. doc 3: same common prev 'x' but successors
    # the model has never seen after it -> ibits(c1(x)) - 1 bits each.
    rows = [(1, "x y x y x y x y"),
            (2, "x y x y x y x y"),
            (3, "x q x w x e x r")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from hive_parse_lineage_spark.analytics_queries import _x142_bigram_surprise
    out = {r["doc_id"]: r.asDict()
           for r in _x142_bigram_surprise(spark, {"documents": docs}).collect()}
    assert all(v["total_bits"] >= 0 for v in out.values())
    assert out[3]["bits_per_bigram_milli"] > out[1]["bits_per_bigram_milli"]


def test_mrr_rows_are_consistent(spark, tables, sf_dir):
    """rr_permille must equal 1000 div first_rel_rank (or 0 when no
    relevant doc reached the top-10), for every query term."""
    out = analytics_queries()["x143_retrieval_mrr"](spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        if r["first_rel_rank"] == 0:
            assert r["rr_permille"] == 0
        else:
            assert 1 <= r["first_rel_rank"] <= 10
            assert r["rr_permille"] == 1000 // r["first_rel_rank"]


def test_rbo_identical_rankings_hit_max(spark):
    """When the two quality keys induce the SAME ranking, every depth-8
    doc contributes its full weight: rbo_scaled == RBO_MAX exactly."""
    rows = [(i, " ".join(f"t{j}" for j in range(20 - i)), "s", 10 * (20 - i))
            for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    from hive_parse_lineage_spark.analytics_queries import (
        _x144_rbo_rank_stability)
    out = _x144_rbo_rank_stability(spark, {"documents": docs}).collect()
    assert len(out) == 1
    assert out[0]["rbo_scaled"] == RBO_MAX
    assert out[0]["rbo_permille"] == 1000


def test_rbo_disjoint_rankings_hit_zero(spark):
    """When the top-8 by chars and the top-8 by tokens are disjoint
    (chars anti-correlated with token count over 16+ docs), no doc has
    max(ra, rb) <= 8 and the overlap is empty."""
    n = 20
    rows = [(i, " ".join(f"t{j}" for j in range(i + 1)), "s", 10 * (n - i))
            for i in range(n)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    from hive_parse_lineage_spark.analytics_queries import (
        _x144_rbo_rank_stability)
    out = _x144_rbo_rank_stability(spark, {"documents": docs}).collect()
    assert out == []


def test_principal_direction_matches_numpy(spark):
    """End-to-end integer power iteration vs a numpy replay of the
    exact same algorithm (milli quantization, two rounds, truncating
    milli normalization) on a deterministic toy embedding table."""
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(6).astype("float64")
    vecs = [[float(x) for x in
             (base * (i + 1) / 10.0 + rng.randn(6) * 0.01).astype("float32")]
            for i in range(30)]
    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int")
    from hive_parse_lineage_spark.analytics_queries import (
        _x145_principal_direction)
    got = [r["v2_milli"]
           for r in _x145_principal_direction(
               spark, {"embeddings": emb}).collect()]

    q = np.floor(np.array(vecs, dtype="float64") * 1000.0).astype("int64")
    m = q.T @ q

    def norm(u):
        n = np.abs(u).max()
        return np.sign(u).astype("int64") * (np.abs(u) * 1000 // n)

    v1 = norm(m.sum(axis=1))
    v2 = norm(m @ v1)
    assert got == v2.tolist()
    # the dominant coordinate carries the full scale
    assert max(abs(v) for v in got) == 1000


def test_hapax_counts_partition_vocab(spark, tables, sf_dir):
    """n_hapax + n_dis <= n_vocab and permille is the floored ratio."""
    out = analytics_queries()["x146_hapax_audit"](spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        assert r["n_hapax"] + r["n_dis"] <= r["n_vocab"]
        assert r["hapax_permille"] == r["n_hapax"] * 1000 // r["n_vocab"]


def test_bag_dedup_lift_detects_reordered_doc(spark):
    """A token-reordered doc is invisible to raw-md5 dedup but caught
    by the sorted-bag key; an exact dup is caught by both; a distinct
    doc by neither."""
    rows = [(1, "a b c d", "s"), (2, "d c b a", "s"),
            (3, "a b c d", "s"), (4, "x y z w", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from hive_parse_lineage_spark.analytics_queries import _x147_bag_dedup_lift
    out = _x147_bag_dedup_lift(spark, {"documents": docs}).collect()
    assert len(out) == 1
    r = out[0]
    # docs 1+3 are raw dups; 1+2+3 are bag dups; 4 is neither
    assert (r["n_docs"], r["n_raw_dup"], r["n_bag_dup"]) == (4, 2, 3)
    assert r["lift_permille"] == (3 - 2) * 1000 // 4


def test_length_octaves_cover_each_source(spark, tables, sf_dir):
    """Octave == bit_length(n_chars); per-source permilles sum to
    ~1000 (floored)."""
    from hive_parse_lineage_spark.analytics_queries import analytics_queries
    rows = analytics_queries()["x148_length_octaves"](spark, sf_dir).collect()
    per_source: dict[str, int] = {}
    for r in rows:
        assert 1 <= r["octave"] <= 63
        per_source[r["source"]] = per_source.get(r["source"], 0) + r["permille"]
    for s, p in per_source.items():
        assert 900 <= p <= 1000, (s, p)


def test_triangle_census_on_a_known_clique(spark):
    """Three identical docs form a 3-clique in the near-dup graph:
    3 edges, 3 wedges, exactly 1 triangle, closure 1000."""
    rows = [(i, "alpha beta gamma delta epsilon zeta", "s")
            for i in range(3)] + [(7, "q w e r t z u i o p", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from hive_parse_lineage_spark.analytics_queries import (
        _x149_dup_graph_triangles)
    out = _x149_dup_graph_triangles(spark, {"documents": docs}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (3, 3, 1)
    assert r["global_cc_permille"] == 1000


def test_triangle_closure_is_bounded(spark, tables, sf_dir):
    """Every triangle contains exactly 3 wedges, so 3t <= w and the
    permille can never exceed 1000."""
    from hive_parse_lineage_spark.analytics_queries import analytics_queries
    r = analytics_queries()["x149_dup_graph_triangles"](
        spark, sf_dir).collect()[0]
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0 <= r["global_cc_permille"] <= 1000


def test_kendall_tau_extremes(spark):
    """Perfectly concordant signals score +1000; perfectly discordant
    (anti-correlated) score -1000; the census never exceeds 32*31/2
    pairs per source."""
    up = [(i, " ".join(f"t{j}" for j in range(i + 1)), "up", 10 * (i + 1))
          for i in range(10)]
    down = [(100 + i, " ".join(f"t{j}" for j in range(i + 1)), "down",
             10 * (30 - i)) for i in range(10)]
    docs = spark.createDataFrame(
        up + down, "doc_id long, text string, source string, n_chars long")
    from hive_parse_lineage_spark.analytics_queries import _x150_kendall_quality
    out = {r["source"]: r.asDict()
           for r in _x150_kendall_quality(spark, {"documents": docs}).collect()}
    assert out["up"]["tau_permille"] == 1000
    assert out["down"]["tau_permille"] == -1000
    for r in out.values():
        assert r["n_pairs"] == 45
        assert r["n_concordant"] + r["n_discordant"] <= r["n_pairs"]


# ---------------------------------------------------------------------------
# plan posture
# ---------------------------------------------------------------------------

def test_entropy_bits_no_join_no_global_window(spark, tables, sf_dir):
    """x141: the per-source total comes from a window over the
    (source, tok) aggregate — partition-local, never a join and never
    an all-partitions window."""
    plan = _plan_of(spark, sf_dir, "x141_entropy_bits")
    assert "Join" not in plan, plan
    assert "partitionBy=[]" not in plan.replace(" ", ""), plan


def test_bigram_surprise_counts_join_unhinted(spark, tables, sf_dir):
    """x142: the c1/c2 count joins are vocabulary-sized — they must
    reach the plan as plain equi-joins (AQE may pick broadcast at
    small SF; no hint may force the driver to materialize the vocab)."""
    plan = _plan_of(spark, sf_dir, "x142_bigram_surprise")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrdered" in plan, plan  # top-20, never a global sort


def test_principal_direction_is_one_arrow_pass(spark, tables, sf_dir):
    """x145: the corpus-proportional MapInPandas scan runs exactly
    once — the moment matrix is localCheckpointed, so the final plan
    operates on the materialized 4096-row table and NEVER re-reads
    the embedding file (without the checkpoint the subtree recomputes
    per branch: six full corpus passes)."""
    plan = _plan_of(spark, sf_dir, "x145_principal_direction")
    assert "MapInPandas" not in plan, plan      # pre-materialized
    assert "embeddings.parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan
