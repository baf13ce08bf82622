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


def test_split_contamination_partitions_pair_universe(spark, tables, sf_dir):
    """x151: every LSH pair lands in exactly one unordered split-pair
    bucket, labels are the x39 split names, and the bucket sum equals
    the total threshold-0.5 pair count."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x151_split_contamination)
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    from hive_parse_lineage_spark.sources.loader import load_tables
    t = load_tables(spark, sf_dir)
    rows = _x151_split_contamination(spark, t).collect()
    names = {"train", "val", "test"}
    assert all(r["split_a"] in names and r["split_b"] in names for r in rows)
    assert all(r["split_a"] <= r["split_b"] for r in rows)
    total = minhash_near_dups(
        t["documents"], threshold=0.5, n_hashes=64, bands=16, shingle_k=2,
        hasher=portable_hash64, max_bucket_size=None).count()
    assert sum(r["n_pairs"] for r in rows) == total


def test_qq_alignment_gap_identity_and_monotone(spark, tables, sf_dir):
    """x152: gap == src_v - global_v, every source carries deciles
    1..9, and decile values are non-decreasing within a source."""
    from hive_parse_lineage_spark.analytics_queries import analytics_queries
    rows = analytics_queries()["x152_qq_alignment"](spark, sf_dir).collect()
    per: dict[str, list] = {}
    for r in rows:
        assert r["gap"] == r["src_v"] - r["global_v"]
        per.setdefault(r["source"], []).append((r["decile"], r["src_v"]))
    for src, ds in per.items():
        ds.sort()
        assert [d for d, _ in ds] == list(range(1, 10)), src
        vals = [v for _, v in ds]
        assert vals == sorted(vals), (src, vals)


def test_null_safe_join_keeps_the_null_bucket(spark, tables, sf_dir):
    """x153: the NULL key bucket matches NULL (the row a plain ``=``
    join silently drops); all ten key classes appear exactly once."""
    from hive_parse_lineage_spark.analytics_queries import analytics_queries
    rows = analytics_queries()["x153_null_safe_join"](spark, sf_dir).collect()
    keys = [r["k"] for r in rows]
    assert keys[0] is None                        # NULLS FIRST pinned
    assert sorted(k for k in keys if k is not None) == [0, 1, 2, 3, 4,
                                                       6, 7, 8, 9]
    assert all(r["n_a"] > 0 and r["n_b"] > 0 for r in rows)


def test_rank_distributions_toy_values(spark):
    """x154: percent_rank/cume_dist on a known fixture — 4-row
    partition gives pr = 0, 1/3, 2/3, 1 and cd = k/4; a single-row
    partition gives pr = 0.0, cd = 1.0 in both engines."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x154_rank_distributions)
    rows = [(1, 10), (2, 10), (3, 10), (4, 10), (5, 20)]
    o = spark.createDataFrame(
        [(k, c, "O") for k, c in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string")
    got = {r["o_orderkey"]: (r["pr"], r["cd"])
           for r in _x154_rank_distributions(spark, {"orders": o}).collect()}
    assert got[1] == (0.0, 0.25)
    assert got[2] == (round(1 / 3, 4), 0.5)
    assert got[3] == (round(2 / 3, 4), 0.75)
    assert got[4] == (1.0, 1.0)
    assert got[5] == (0.0, 1.0)


def test_gaps_islands_histogram_reconstructs_rowcount(spark, tables, sf_dir):
    """x155: sum(island_len * n_islands) == the number of 'O' orders —
    the histogram is a partition of the filtered keyspace."""
    from hive_parse_lineage_spark.analytics_queries import analytics_queries
    from hive_parse_lineage_spark.sources.loader import load_tables
    rows = analytics_queries()["x155_gaps_islands"](spark, sf_dir).collect()
    n = (load_tables(spark, sf_dir)["orders"]
         .filter(F.col("o_orderstatus") == "O").count())
    assert sum(r["island_len"] * r["n_islands"] for r in rows) == n
    assert all(r["island_len"] >= 1 for r in rows)


def test_mad_outliers_toy_fixture(spark):
    """x156: constant source with one extreme value -> MAD 0 and
    exactly one outlier; a symmetric source gets the exact median/MAD
    and no 3-MAD outliers."""
    from hive_parse_lineage_spark.analytics_queries import _x156_mad_outliers
    rows = ([(i, "t", "flat", 10) for i in range(4)] + [(9, "t", "flat", 1000)]
            + [(20 + i, "t", "sym", v)
               for i, v in enumerate([1, 2, 3, 4, 5])])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    got = {r["source"]: r for r in
           _x156_mad_outliers(spark, {"documents": docs}).collect()}
    assert (got["flat"]["med"], got["flat"]["mad"],
            got["flat"]["n_outliers"]) == (10, 0, 1)
    assert (got["sym"]["med"], got["sym"]["mad"],
            got["sym"]["n_outliers"]) == (3, 1, 0)


def test_chi2_zero_under_exact_independence(spark):
    """x157: a contingency table with identical lang mix in every
    source has chi2_milli == 0; skewing one cell makes it positive."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x157_chi2_independence)
    indep = [(i, "t", l, s, 1) for i, (l, s) in enumerate(
        [(l, s) for l in ("en", "de") for s in ("a", "b") for _ in range(2)])]
    docs = spark.createDataFrame(
        [(i, "t", l, s) for i, (_, _, l, s, _) in enumerate(indep)],
        "doc_id long, text string, lang string, source string")
    r = _x157_chi2_independence(spark, {"documents": docs}).collect()[0]
    assert r["chi2_milli"] == 0 and r["n_cells"] == 4
    skew = [(i, "t", "en", "a") for i in range(6)] + [
        (10, "t", "de", "a"), (11, "t", "en", "b"),
        (12, "t", "de", "b"), (13, "t", "de", "b")]
    docs2 = spark.createDataFrame(
        skew, "doc_id long, text string, lang string, source string")
    r2 = _x157_chi2_independence(spark, {"documents": docs2}).collect()[0]
    assert r2["chi2_milli"] > 0


def test_decontamination_flags_verbatim_copy(spark):
    """x158: a corpus doc that verbatim-copies a benchmark doc (>= 8
    shared tokens) is flagged; an unrelated doc is not; benchmark
    members themselves are excluded from the audited population."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x158_benchmark_decontamination)
    bench_text = "a b c d e f g h i j k l"
    rows = [
        (0, bench_text, "s1"),            # benchmark member (0 % 97 == 0)
        (1, bench_text + " tail", "s1"),  # contains every benchmark 8-gram
        (2, "z y x w v u t s r q p o", "s1"),  # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in
           _x158_benchmark_decontamination(spark, {"documents": docs}).collect()}
    r = got["s1"]
    assert r["n_docs"] == 2          # doc 0 excluded
    assert r["n_contaminated"] == 1  # doc 1 only
    assert 0 < r["hit_permille"] < 1000


def test_token_gini_extremes(spark):
    """x159: equal-length docs -> gini 0; all tokens in one doc of n
    -> gini approaches (n-1)/n (integer permille, exact rank formula)."""
    from hive_parse_lineage_spark.analytics_queries import _x159_token_gini
    rows = ([(i, "w w w w", "flat") for i in range(4)]
            + [(10 + i, "w", "skew") for i in range(4)]
            + [(20, " ".join(["w"] * 96), "skew")])
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in
           _x159_token_gini(spark, {"documents": docs}).collect()}
    assert got["flat"]["gini_permille"] == 0
    assert got["flat"]["total_tokens"] == 16
    # skew: tok = [1,1,1,1,96], n=5, sum=100, sum(rn*tok)=1+2+3+4+480=490
    # (2*490 - 6*100)*1000 // (5*100) = 380*1000 // 500 = 760
    assert got["skew"]["gini_permille"] == 760


def test_fuzzy_linkage_toy_blocks(spark):
    """x160: same-block near-identical descriptors link (lev <= 4);
    a different p_size breaks the block so no pair forms."""
    from hive_parse_lineage_spark.analytics_queries import _x160_fuzzy_linkage
    parts = [
        (1, "red widget", "B1", "small", 5),
        (2, "ted widget", "B1", "small", 5),    # lev 1 from part 1
        (3, "red widget", "B1", "small", 9),    # other block: no pair
        (4, "blue bolt", "B1", "tiny", 5),
        (5, "blue bolt", "B1", "huge plated", 5),  # lev > 4 from part 4
    ]
    p = spark.createDataFrame(
        parts, "p_partkey long, p_name string, p_brand string, "
               "p_type string, p_size int")
    got = {r["noun"]: r for r in
           _x160_fuzzy_linkage(spark, {"part": p}).collect()}
    assert got["widget"]["n_pairs"] == 1
    assert got["widget"]["n_linked"] == 1
    assert got["widget"]["min_lev"] == 1
    assert got["bolt"]["n_pairs"] == 1
    assert got["bolt"]["n_linked"] == 0   # "tiny" -> "huge plated" is far


def test_kcore_peel_monotone(spark, tables, sf_dir):
    """x161: peeling only removes — vertices and edges are
    non-increasing across rounds, and a surviving edge set can never
    exceed what C(n_vertices, 2) allows."""
    rows = (analytics_queries()["x161_kcore_peel"](spark, sf_dir)
            .orderBy("peel_round").collect())
    assert [r["peel_round"] for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b["n_vertices"] <= a["n_vertices"]
        assert b["n_edges"] <= a["n_edges"]
    for r in rows:
        n = r["n_vertices"]
        assert r["n_edges"] <= n * (n - 1) // 2


def test_curriculum_schedule_positions_partition_quartiles(
        spark, tables, sf_dir):
    """x162: within each quartile the interleave positions are exactly
    1..n (first positions start at 1, last positions end at the
    quartile size), and global quartile sizes differ by <= 1."""
    rows = (analytics_queries()["x162_curriculum_schedule"]
            (spark, sf_dir).collect())
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["quartile"], []).append(r)
    sizes = []
    for q, rs in by_q.items():
        n = sum(r["n_docs"] for r in rs)
        sizes.append(n)
        assert min(r["first_pos"] for r in rs) == 1
        assert max(r["last_pos"] for r in rs) == n
    assert max(sizes) - min(sizes) <= 1


def test_kmeans_milli_toy_clusters_and_tie_break(spark):
    """x163: two tight clusters around the two seeds keep their
    members through both rounds; an exactly equidistant vector breaks
    its assignment tie toward the LOWER centroid id."""
    from hive_parse_lineage_spark.analytics_queries import _x163_kmeans_milli
    vecs = [
        (0,  [0.0, 0.0]),      # seed -> cid 0
        (25, [2.0, 2.0]),      # seed -> cid 25
        (1,  [0.1, 0.0]),      # cluster 0
        (2,  [0.0, 0.1]),      # cluster 0
        (26, [2.1, 2.0]),      # cluster 25
        (30, [1.0, 1.0]),      # exact tie -> cid 0
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["cid"]: r for r in
           _x163_kmeans_milli(spark, {"embeddings": e}).collect()}
    assert set(got) == {0, 25}
    assert got[0]["n1"] == 4          # 0, 1, 2 and the tie vector 30
    assert got[25]["n1"] == 2
    # after the centroid update the tie vector flips to the far-from-0
    # updated centroid only if means moved it; memberships stay sane
    assert got[0]["n2"] + got[25]["n2"] == 6
    assert got[0]["inertia2"] >= 0 and got[25]["inertia2"] >= 0


def test_lsh_precision_invariants(spark, tables, sf_dir):
    """x164: buckets start at the 0.3 threshold decile, counts are
    consistent (n_true <= n_pairs, precision recomputable), and exact
    mean Jaccard stays in permille range."""
    rows = analytics_queries()["x164_lsh_precision"](spark, sf_dir).collect()
    assert rows, "LSH emits pairs at sf0.01"
    for r in rows:
        assert 3 <= r["bucket"] <= 10          # est >= 0.3 -> m >= 20
        assert 0 <= r["n_true"] <= r["n_pairs"]
        assert r["precision_permille"] == r["n_true"] * 1000 // r["n_pairs"]
        assert 0 <= r["mean_jp"] <= 1000


def test_stratified_sample_realizes_allocation(spark, tables, sf_dir):
    """x165: the realized take per source is exactly
    min(allocation, population), the total stays within the 1000-doc
    budget, and the window carries the static WindowGroupLimit bound."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x165_stratified_sample)
    df = analytics_queries()["x165_stratified_sample"](spark, sf_dir)
    rows = df.collect()
    assert sum(r["n_taken"] for r in rows) <= 1000
    for r in rows:
        assert r["n_taken"] == min(r["n_alloc"], r["n_pop"])
        if r["n_taken"] > 0:
            assert r["sample_tokens"] > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_embedding_isotropy_extremes(spark):
    """x166: a label whose vectors are all identical is fully
    anisotropic (1000 permille — the mean carries ALL the energy); a
    label of exactly mirrored vectors has a zero mean (0 permille)."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x166_embedding_isotropy)
    vecs = [
        (0, [1.0, 2.0], 0), (1, [1.0, 2.0], 0), (2, [1.0, 2.0], 0),
        (3, [1.0, 0.0], 1), (4, [-1.0, 0.0], 1),
        (5, [0.0, 1.0], 1), (6, [0.0, -1.0], 1),
    ]
    e = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in
           _x166_embedding_isotropy(spark, {"embeddings": e}).collect()}
    assert got[0]["anisotropy_permille"] == 1000
    assert got[0]["n_vecs"] == 3
    assert got[1]["anisotropy_permille"] == 0
    assert got[1]["cent_sq_norm"] == 0


def test_incremental_rollup_is_lossless(spark, tables, sf_dir):
    """x167: the monoid merge must equal the full recompute on every
    row — matches_full is the in-band proof; the delta share must be
    nonzero (the split actually exercises the merge)."""
    rows = analytics_queries()["x167_incremental_rollup"](
        spark, sf_dir).collect()
    assert rows
    assert all(r["matches_full"] for r in rows)
    assert sum(r["n_from_delta"] for r in rows) > 0
    assert sum(r["n_orders"] for r in rows) == \
        tables["orders"].count()


def test_ngram_diversity_extremes(spark):
    """x168: an all-unique-bigram source scores 1000 permille; a
    source repeating one bigram across docs scores near the floor."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x168_ngram_diversity)
    rows = [(1, "a b c d e", "fresh"),
            (2, "x y x y x y x y x y", "loop"),
            (3, "x y x y x y x y x y", "loop")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {(r["source"], r["k"]): r for r in
           _x168_ngram_diversity(spark, {"documents": docs}).collect()}
    assert got[("fresh", 2)]["distinct_permille"] == 1000
    assert got[("fresh", 3)]["distinct_permille"] == 1000
    # loop: 18 bigram slots, only 2 distinct grams (x y / y x)
    assert got[("loop", 2)]["n_grams"] == 18
    assert got[("loop", 2)]["u_grams"] == 2
    assert got[("loop", 2)]["distinct_permille"] == 2000 // 18


def test_event_path_trigrams_toy_sequence(spark):
    """x169: a single user's a,b,c,d stream yields exactly the two
    sliding trigrams in order; a second user's repeat raises the
    count, and ordering ties break on the path string."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x169_event_path_trigrams)
    rows = [
        (1, "2024-01-01 00:00:01", 10, "a"),
        (2, "2024-01-01 00:00:02", 10, "b"),
        (3, "2024-01-01 00:00:03", 10, "c"),
        (4, "2024-01-01 00:00:04", 10, "d"),
        (5, "2024-01-01 00:00:01", 20, "a"),
        (6, "2024-01-01 00:00:02", 20, "b"),
        (7, "2024-01-01 00:00:03", 20, "c"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [(r["path"], r["n"]) for r in
           _x169_event_path_trigrams(spark, {"events": e}).collect()]
    assert got == [("a>b>c", 2), ("b>c>d", 1)]


def test_source_cross_entropy_matrix_properties(spark):
    """x170: identical-distribution sources price each other exactly
    like themselves (kl 0 in all four cells); a disjoint-vocab source
    pays a strictly positive KL against the other; the diagonal is 0
    by construction."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x170_source_cross_entropy)
    rows = [(1, "a b a b", "s1"), (2, "a b a b", "s2"),
            (3, "p q r s", "s3")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r for r in
           _x170_source_cross_entropy(spark, {"documents": docs}).collect()}
    assert len(got) == 9
    for s in ("s1", "s2", "s3"):
        assert got[(s, s)]["kl_bits"] == 0
    assert got[("s1", "s2")]["kl_bits"] == 0
    assert got[("s2", "s1")]["kl_bits"] == 0
    assert got[("s3", "s1")]["kl_bits"] > 0
    assert got[("s1", "s3")]["kl_bits"] > 0


def test_mattr_extremes_and_zero_shuffle_plan(spark, tables, sf_dir):
    """x171: a short all-distinct doc scores 1000; a long one-token
    loop scores 1000/50 = 20 (one distinct per 50-token window); the
    plan for the unordered projection carries no Exchange at all."""
    from hive_parse_lineage_spark.analytics_queries import _x171_mattr
    rows = [(1, "a b c d e f g h i j"),
            (2, " ".join(["x"] * 120))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           _x171_mattr(spark, {"documents": docs}).collect()}
    assert got[1]["mattr_permille"] == 1000
    assert got[1]["n_windows"] == 1
    assert got[2]["n_windows"] == 120 - 50 + 1
    assert got[2]["mattr_permille"] == 1000 // 50
    df = analytics_queries()["x171_mattr"](spark, sf_dir)
    # the orderBy is presentation-only; the compute subtree must be
    # exchange-free (pure per-doc projection)
    import re
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan


def test_pair_provenance_classes(spark):
    """x172: verbatim copies classify near_full with jp=1000; a pair
    sharing one long block inside otherwise-different text classifies
    long_span with the run length equal to the block size."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x172_pair_provenance)
    block = " ".join(f"b{i}" for i in range(30))
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "p q r s t " + block + " u v w x y"),
        (4, "f g h i j " + block + " k l m n o"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r for r in
           _x172_pair_provenance(spark, {"documents": docs}).collect()}
    assert got[(1, 2)]["dup_class"] == "near_full"
    assert got[(1, 2)]["jp"] == 1000
    # the shared 30-token block is a 26-shingle diagonal run -> 30 tokens
    assert got[(3, 4)]["longest_run_tokens"] == 30
    assert got[(3, 4)]["dup_class"] == "long_span"
    assert got[(3, 4)]["jp"] < 900


def test_dedup_quota_caps_at_half(spark):
    """x173: a source with two 2-clusters has 2 losers, exactly 1
    dropped (the shorter one) and 1 protected."""
    from hive_parse_lineage_spark.analytics_queries import _x173_dedup_quota
    dup_a = "the quick brown fox jumps over the lazy dog again today"
    dup_b = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
             "do eiusmod tempora incididunt ut labore et dolore magna")
    rows = [(1, dup_a, "s1"), (2, dup_a, "s1"),
            (3, dup_b, "s1"), (4, dup_b, "s1"),
            (5, "entirely unrelated text about completely other things "
                "with many unique words here", "s2")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in
           _x173_dedup_quota(spark, {"documents": docs}).collect()}
    assert got["s1"]["n_losers"] == 2
    assert got["s1"]["n_dropped"] == 1
    assert got["s1"]["n_protected"] == 1
    assert got["s2"]["n_losers"] == 0
    assert got["s2"]["n_dropped"] == 0


def test_pii_density_residual_zero(spark, tables, sf_dir):
    """x174: redaction is complete (residual 0 on every source) and
    only the injected docs carry PII."""
    rows = analytics_queries()["x174_pii_density"](spark, sf_dir).collect()
    assert rows
    assert all(r["residual"] == 0 for r in rows)
    injected = tables["documents"].filter(
        F.col("doc_id") % 7 == 0).count()
    assert sum(r["docs_with_pii"] for r in rows) == injected


def test_effective_tokens_discounts_copies(spark):
    """x175: two identical 10-token docs contribute 10 effective
    tokens total -> inflation 2000 permille; a unique doc stays at
    1000."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x175_effective_tokens)
    dup = "a b c d e f g h i j"
    rows = [(1, dup, "dup_src"), (2, dup, "dup_src"),
            (3, "k l m n o p q r s t", "uniq_src")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in
           _x175_effective_tokens(spark, {"documents": docs}).collect()}
    assert got["dup_src"]["raw_tokens"] == 20
    assert got["dup_src"]["eff_milli_tokens"] == 10000
    assert got["dup_src"]["inflation_permille"] == 2000
    assert got["uniq_src"]["inflation_permille"] == 1000


def test_rendezvous_moves_less_than_mod(spark, tables, sf_dir):
    """x176: the HRW shrink moves ~1/16 of docs; mod moves ~14/15 —
    the consistent-hashing property, measured."""
    rows = {r["scheme"]: r for r in
            analytics_queries()["x176_rendezvous_sharding"](
                spark, sf_dir).collect()}
    assert rows["hrw"]["moved_permille"] < 150      # ~62 expected
    assert rows["mod"]["moved_permille"] > 800      # ~933 expected
    assert rows["hrw"]["n_docs"] == rows["mod"]["n_docs"]
    assert rows["hrw"]["max_load"] >= rows["hrw"]["min_load"] > 0


def test_source_minhash_identical_sources_agree(spark):
    """x177: two token-identical sources estimate 1000 with exact
    1000 and zero error; disjoint sources estimate low."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x177_source_minhash)
    rows = [(1, "a b c d e f", "s1"), (2, "a b c d e f", "s2"),
            (3, "u v w x y z", "s3")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r for r in
           _x177_source_minhash(spark, {"documents": docs}).collect()}
    assert got[("s1", "s2")]["est_permille"] == 1000
    assert got[("s1", "s2")]["exact_permille"] == 1000
    assert got[("s1", "s2")]["abs_err_permille"] == 0
    assert got[("s1", "s3")]["exact_permille"] == 0
    assert got[("s2", "s3")]["exact_permille"] == 0


def test_psi_drift_identical_halves_score_zero(spark):
    """x179: when old and new halves draw from identical values, every
    bucket's p/q permille match and all PSI terms are 0; a shifted new
    half produces nonzero terms."""
    from hive_parse_lineage_spark.analytics_queries import _x179_psi_drift
    same = [(i, 100 + (i % 10)) for i in range(200)]
    docs = spark.createDataFrame(same, "doc_id long, n_chars long")
    rows = _x179_psi_drift(spark, {"documents": docs}).collect()
    assert rows
    assert all(r["psi_term_millibits"] == 0 for r in rows)
    # old half spread over 10 values, new half concentrated at the top
    # -> mass leaves the low buckets, lands in the last one
    shifted = ([(i, 100 * (i % 10)) for i in range(100)]
               + [(100 + i, 900) for i in range(100)])
    docs2 = spark.createDataFrame(shifted, "doc_id long, n_chars long")
    rows2 = _x179_psi_drift(spark, {"documents": docs2}).collect()
    assert any(r["psi_term_millibits"] != 0 for r in rows2)


def test_sorted_neighborhood_finds_adjacent_dups(spark):
    """x180: shared-prefix near-dups sort adjacent and are found with
    the exact Jaccard; a prefix-divergent dup pair is the documented
    miss class (not emitted)."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x180_sorted_neighborhood)
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "HEADER aaa " + body),
        (2, "HEADER aaa " + body + " extra"),
        (3, "zzz completely different prefix " + body),
        (4, "mmm unrelated text with its own words entirely here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           _x180_sorted_neighborhood(spark, {"documents": docs}).collect()}
    assert (1, 2) in got
    # doc 3 shares the body but its prefix sorts it away from 1/2 at
    # window w=3 over 4 docs it may still be within reach; the pair
    # (3, 4) must NOT appear (genuinely dissimilar)
    assert (3, 4) not in got and (4, 3) not in got


def test_gopher_rules_toy_scorecard(spark):
    """x181: a degenerate doc (one repeated 1-char token) fails every
    rule; a diverse 32-word doc with stopwords passes every rule —
    replayed by hand against the integer thresholds."""
    from hive_parse_lineage_spark.analytics_queries import _x181_gopher_rules
    good = " ".join(f"tok{i}" for i in range(30)) + " the a"
    rows = [(1, "w w w w w w w w", "s"), (2, good, "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = _x181_gopher_rules(spark, {"documents": docs}).collect()
    assert len(out) == 1
    r = out[0].asDict()
    # doc 1: 8 words (<20), mwl 1000 (<3000), 0 stop types, run of 8,
    # ttr 125 (<200) -> fails all five. doc 2: 32 words, word chars
    # 10*4 + 20*5 + 3 + 1 = 144 -> mwl 4500, stop {the, a}, runs of 1,
    # ttr 1000 -> passes all five.
    assert r == {"source": "s", "n_docs": 2, "pass_len": 1, "pass_mwl": 1,
                 "pass_stop": 1, "pass_run": 1, "pass_ttr": 1, "pass_all": 1}


def test_pareto_skyline_dominance(spark):
    """x182: the returned frontier is exactly the non-dominated set
    with lowest-id tie representatives, checked against a brute-force
    dominance replay in Python."""
    from hive_parse_lineage_spark.analytics_queries import _x182_pareto_skyline
    # (doc_id, n_chars, n distinct tokens)
    spec = [(1, 10, 3), (2, 20, 5), (3, 20, 5), (4, 30, 4), (5, 15, 3)]
    rows = [(i, " ".join(f"t{k}" for k in range(q)), "en", n)
            for i, n, q in spec]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    got = [(r["doc_id"], r["n_chars"], r["qual"]) for r in
           _x182_pareto_skyline(spark, {"documents": docs}).collect()]
    assert got == [(1, 10, 3), (2, 20, 5)]


def test_poisson_bootstrap_constant_corpus_has_zero_variance(spark):
    """x183: with a constant value column every replicate mean equals
    the point mean exactly (integer milli), so the bootstrap variance
    is 0 — and the weights are genuinely deterministic across calls."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x183_poisson_bootstrap)
    rows = [(i, 100, "s") for i in range(64)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long, source string")
    a = _x183_poisson_bootstrap(spark, {"documents": docs}).collect()
    b = _x183_poisson_bootstrap(spark, {"documents": docs}).collect()
    assert a == b
    r = a[0].asDict()
    assert r["mean_milli"] == 100000
    assert r["boot_mean_milli"] == 100000
    assert r["boot_var_milli2"] == 0


def test_pq_adc_codebook_member_retrieves_itself(spark):
    """x184: a codebook vector encodes to its own code in every
    subspace (distance 0), so its ADC top-1 is itself at distance 0;
    every query returns exactly 5 ranked rows with non-decreasing
    distances."""
    from hive_parse_lineage_spark.analytics_queries import (
        PQ_QUERY_IDS, _x184_pq_adc)
    rows = [(i, [((i * 7 + j) % 13) / 10.0 for j in range(64)])
            for i in range(60)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = _x184_pq_adc(spark, {"embeddings": embs}).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(PQ_QUERY_IDS)
    for q, rs in by_q.items():
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        ds = [r["adc_dist"] for r in rs]
        assert ds == sorted(ds) and all(d >= 0 for d in ds)
    # query 7 is a codebook member: self-distance is exactly 0
    top = by_q[7][0]
    assert top["vec_id"] == 7 and top["adc_dist"] == 0


def test_domain_reweight_upweights_hard_domain(spark):
    """x185: a degenerate repeated-token source scores low
    cross-entropy and loses weight; a distinct-vocabulary source
    scores high and gains — weights stay permille-normalized."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x185_domain_reweight)
    rows = ([(i, " ".join(["z"] * 10), "dup") for i in range(5)]
            + [(10 + i, " ".join(f"u{i}_{k}" for k in range(10)), "mix")
               for i in range(5)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r.asDict()
           for r in _x185_domain_reweight(spark, {"documents": docs}).collect()}
    assert out["mix"]["loss_millibits"] > out["dup"]["loss_millibits"]
    assert out["mix"]["weight_permille"] > out["dup"]["weight_permille"]
    total = sum(r["weight_permille"] for r in out.values())
    assert 998 <= total <= 1000


def test_zipf_alpha_python_replay(spark):
    """x186: the integer OLS over (ibits(rank), ibits(count)) points
    replayed in Python for a hand-built frequency spectrum; a flat
    source (all counts equal) fits slope 0 -> alpha 0."""
    from hive_parse_lineage_spark.analytics_queries import _x186_zipf_alpha
    # steep: a*8 b*4 c*2 d*1; flat: e f g h once each
    steep = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    flat = "e f g h"
    docs = spark.createDataFrame(
        [(1, steep, "steep"), (2, flat, "flat")],
        "doc_id long, text string, source string")
    out = {r["source"]: r.asDict()
           for r in _x186_zipf_alpha(spark, {"documents": docs}).collect()}

    def replay(counts):
        pts = [((i + 1).bit_length(), c.bit_length())
               for i, c in enumerate(sorted(counts, reverse=True))]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        den = n * sxx - sx * sx
        num = (n * sxy - sx * sy) * 1000
        slope = num // den if num >= 0 else -((-num) // den)
        return -slope

    assert out["steep"]["alpha_milli"] == replay([8, 4, 2, 1])
    assert out["flat"]["alpha_milli"] == 0


def test_watermark_lateness_counts_out_of_order_events(spark):
    """x187: lateness is running-max minus own event time in arrival
    order; a 5-minute-late and a 4-minute-late event are dropped by a
    1-minute watermark and kept by the 10/60-minute ones."""
    from datetime import datetime
    from hive_parse_lineage_spark.analytics_queries import (
        _x187_watermark_lateness)
    base = datetime(2024, 1, 1, 10, 0, 0)
    from datetime import timedelta
    ts = [base, base + timedelta(minutes=5),
          base + timedelta(minutes=0),            # 5 min late
          base + timedelta(minutes=10),
          base + timedelta(minutes=6)]            # 4 min late
    rows = [(i + 1, t) for i, t in enumerate(ts)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["wm"]: r.asDict()
           for r in _x187_watermark_lateness(spark, {"events": ev}).collect()}
    assert out["wm_01min"]["n_dropped"] == 2
    assert out["wm_10min"]["n_dropped"] == 0
    assert out["wm_60min"]["n_dropped"] == 0
    assert all(r["n_events"] == 5 for r in out.values())


def test_rfm_segments_grid_partitions_all_users(spark):
    """x188: every user lands in exactly one (r,f,m) quartile cell,
    the grid covers all users, and reruns are identical (tie-broken
    NTILEs are deterministic)."""
    from datetime import datetime, timedelta
    from hive_parse_lineage_spark.analytics_queries import _x188_rfm_segments
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(8):
        for k in range(u + 1):          # frequency varies by user
            eid += 1
            rows.append((eid, base + timedelta(hours=u * 3 + k),
                         u, float(10 * u + k)))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    a = _x188_rfm_segments(spark, {"events": ev}).collect()
    b = _x188_rfm_segments(spark, {"events": ev}).collect()
    assert a == b
    assert sum(r["n_users"] for r in a) == 8
    for r in a:
        assert 1 <= r["r_q"] <= 4 and 1 <= r["f_q"] <= 4 and 1 <= r["m_q"] <= 4


def test_prf_expansion_surfaces_cooccurring_doc(spark):
    """x189: a doc that never contains the seed term but shares the
    feedback docs' co-occurring vocabulary enters the round-2 ranking
    — the recall lift PRF exists for."""
    from hive_parse_lineage_spark.analytics_queries import _x189_prf_expansion
    rows = [
        (1, "spark tuning shuffle spark tuning", "s"),
        (2, "spark tuning partitions", "s"),
        (3, "spark shuffle tuning", "s"),
        (4, "tuning shuffle deep dive guide", "s"),   # no 'spark'
        (5, "unrelated words entirely different topic", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = _x189_prf_expansion(spark, {"documents": docs}).collect()
    spark_rows = [r for r in out if r["term"] == "spark"]
    assert spark_rows, "seed term must produce a round-2 ranking"
    ranked_ids = [r["doc_id"] for r in spark_rows]
    assert 4 in ranked_ids, "co-occurrence doc must be retrievable via PRF"
    assert 5 not in ranked_ids, "unrelated doc shares no group term"
    # ranks are 1..n with integer scores non-increasing
    assert [r["rank"] for r in spark_rows] == list(range(1, len(spark_rows) + 1))
    scores = [r["score_int"] for r in spark_rows]
    assert scores == sorted(scores, reverse=True)


def test_stream_watermark_drops_late_batch_rows(spark):
    """x190: a row arriving two micro-batches after the stream has
    advanced past its window is dropped, so the emitted count for that
    window excludes it — the late-drop semantics the entry gates. Toy
    stream: batch assignment is event_id % 4; batches 0/1 carry
    fresh + old data, batch 2 carries a very late row whose window
    closed long before."""
    from datetime import datetime, timedelta
    from hive_parse_lineage_spark.analytics_queries import (
        _x190_stream_watermark_windows)
    base = datetime(2024, 1, 1, 0, 30, 0)
    late = base - timedelta(hours=10)     # long-closed window
    rows = [
        (0, base, "a"),                            # batch 0
        (4, base + timedelta(hours=1), "a"),       # batch 0
        (1, base, "a"),                            # batch 1
        (5, base + timedelta(hours=2), "a"),       # batch 1
        (2, late, "a"),                            # batch 2: LATE -> drop
        (6, base + timedelta(hours=3), "a"),       # batch 2
        (3, base + timedelta(hours=4), "a"),       # batch 3 (still open)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {(r["w_start"], r["n"]) for r in
           _x190_stream_watermark_windows(spark, {"events": ev}).collect()}
    starts = {s for s, _ in out}
    # the late row's window must NOT appear (dropped, and its window
    # was never populated by on-time data)
    assert late.replace(minute=0) not in starts
    # the base window holds the two on-time rows from batches 0/1
    assert (base.replace(minute=0), 2) in out


def test_scd2_asof_join_routes_events_to_correct_version(spark):
    """x191: a re-versioned customer's events split across the two
    versions at the boundary; an un-versioned customer keeps one row
    covering the whole month."""
    from datetime import datetime
    from hive_parse_lineage_spark.analytics_queries import _x191_scd2_asof_join
    cust = spark.createDataFrame(
        [(5, 100.0), (7, 200.0)], "c_custkey long, c_acctbal double")
    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 10), 5, 10.0),     # v1 of cust 5
         (2, datetime(2024, 1, 20), 5, 20.0),     # v2 of cust 5
         (3, datetime(2024, 1, 15), 5, 30.0),     # boundary -> v2
         (4, datetime(2024, 1, 20), 7, 40.0)],    # cust 7, single version
        "event_id long, ts timestamp, user_id long, value double")
    out = {(r["c_custkey"], str(r["effective_from"])[:10]): r.asDict()
           for r in _x191_scd2_asof_join(
               spark, {"customer": cust, "events": ev}).collect()}
    assert out[(5, "2024-01-01")]["n_events"] == 1
    assert out[(5, "2024-01-01")]["sum_cents"] == 1000
    assert out[(5, "2024-01-15")]["n_events"] == 2
    assert out[(5, "2024-01-15")]["sum_cents"] == 5000
    assert out[(7, "2024-01-01")]["n_events"] == 1


def test_wav_roundtrip_stats_match_byte_math(spark):
    """x192: the synth->decode->stats loop reproduces stats computed
    directly from the text bytes — the decode path adds nothing and
    loses nothing."""
    import math
    from hive_parse_lineage_spark.analytics_queries import (
        _x192_wav_roundtrip_stats)
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "zz  z")], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in _x192_wav_roundtrip_stats(
               spark, {"documents": docs}).collect()}
    for doc_id, text in [(1, "abc"), (2, "zz  z")]:
        v = list(text.encode())
        r = out[doc_id]
        assert r["n_samples"] == len(v)
        assert r["peak"] == max(v)
        assert r["mean_milli"] == sum(v) * 1000 // len(v)
        assert r["rms_int"] == math.isqrt(sum(x * x for x in v) // len(v))


def test_cooccurrence_itemsets_caps_and_counts(spark):
    """x193: near-universal tokens never generate pairs (band cap);
    a pair present in >= 4 docs surfaces with its exact doc support."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x193_cooccurrence_itemsets)
    rows = []
    # 'stop' appears in all 12 docs (df*5 > n_docs*4 -> banned);
    # 'alpha beta' co-occur in 5 docs; 'alpha gamma' in 2 (below support)
    for i in range(12):
        toks = ["stop"]
        if i < 5:
            toks += ["alpha", "beta"]
        if i in (6, 7):
            toks += ["alpha", "gamma"]
        if i >= 5:
            toks += [f"fill{i}"]
        rows.append((i, " ".join(toks), "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["t1"], r["t2"]): r["support"]
           for r in _x193_cooccurrence_itemsets(
               spark, {"documents": docs}).collect()}
    assert out.get(("alpha", "beta")) == 5
    assert ("alpha", "gamma") not in out
    assert not any("stop" in k for pair in out for k in pair)


def test_markov_attribution_hand_chain(spark):
    """x194: a two-user toy chain (one converts after click, one
    stalls) gives conversion 500 permille and the whole removal effect
    to 'click'; channels absent from the data remove to zero effect."""
    from datetime import datetime, timedelta
    from hive_parse_lineage_spark.analytics_queries import (
        _x194_markov_attribution)
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "click", 0.0),
        (2, base + timedelta(minutes=1), 1, "purchase", 5.0),
        (3, base, 2, "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = {r["channel"]: r.asDict()
           for r in _x194_markov_attribution(spark, {"events": ev}).collect()}
    assert out["click"]["base_milli"] == 500
    assert out["click"]["conv_milli"] == 0
    assert out["click"]["removal_effect_milli"] == 500
    for ch in ("error", "signup", "view"):
        assert out[ch]["removal_effect_milli"] == 0


def test_dataset_card_counts_dups_and_quality(spark):
    """x195: duplicate bodies, the x56 quality gate, vocabulary and
    the exact median line up with a hand computation."""
    from hive_parse_lineage_spark.analytics_queries import _x195_dataset_card
    good = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, good, "en", "s", 100),
        (2, good, "en", "s", 100),          # exact dup of doc 1
        (3, "w w", "de", "s", 3),           # fails quality (2 words)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    r = _x195_dataset_card(spark, {"documents": docs}).collect()[0].asDict()
    assert r["n_docs"] == 3 and r["dup_docs"] == 1
    assert r["n_langs"] == 2
    assert r["n_vocab"] == 31               # 30 toks + 'w'
    assert r["quality_pass"] == 2           # both dup docs pass the gate
    assert r["p50_len"] == 100              # lengths 3,100,100 -> median


def test_dedup_method_census_exact_dup_found_by_all(spark):
    """x196: an exact duplicate pair is found by every method (combo
    'ELS'); a shared-prefix near-dup is found by LSH and SNM but not
    exact ('LS'); a unique doc generates nothing."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x196_dedup_method_census)
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "HEADER one " + body),
        (2, "HEADER one " + body),                 # exact dup of 1
        (3, "HEADER one " + body + " tail word"),  # near-dup, shared prefix
        (4, "totally different content with no overlap at all here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["combo"]: r["n_pairs"] for r in
           _x196_dedup_method_census(spark, {"documents": docs}).collect()}
    assert out.get("ELS", 0) >= 1          # the exact pair (1,2)
    assert sum(out.values()) >= 2          # plus at least one near-dup pair
    assert "E" not in out                  # exact never escapes L and S here


def test_time_weighted_avg_weighs_by_holding_duration(spark):
    """x197: a value held for 90% of the observation window dominates
    the TWAP even when the plain average says otherwise."""
    from datetime import datetime, timedelta
    from hive_parse_lineage_spark.analytics_queries import (
        _x197_time_weighted_avg)
    base = datetime(2024, 1, 1)
    rows = [
        # user 1, type 'a': 1.00 held 90 min, then 100.00 held 10 min
        (1, base, 1, "a", 1.0),
        (2, base + timedelta(minutes=90), 1, "a", 100.0),
        (3, base + timedelta(minutes=100), 1, "a", 100.0),  # censor point
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    r = _x197_time_weighted_avg(spark, {"events": ev}).collect()[0].asDict()
    # naive avg = (100 + 10000 + 10000) / 3 = 6700 cents
    assert r["naive_cents"] == 6700
    # twap = (100*90min + 10000*10min + 10000*0) / 100min = 1090 cents
    assert r["twap_cents"] == 1090
    assert r["n_events"] == 3
    assert r["total_s"] == 100 * 60  # 100 min observed, in whole seconds


def test_stream_static_join_merges_state_across_batches(spark):
    """x198: events for one nation land in DIFFERENT micro-batches
    (batch = event_id % 4) — the final complete-mode row must merge
    them, proving cross-batch aggregate state on top of the per-batch
    stream-static join."""
    from datetime import datetime
    from hive_parse_lineage_spark.analytics_queries import (
        _x198_stream_static_join)
    ts = datetime(2024, 1, 1)
    # event_ids 0..3 -> four different micro-batches, all user 7
    ev = spark.createDataFrame(
        [(i, ts, 7, "view", 2.5) for i in range(4)] + [(4, ts, 99, "x", 1.0)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    cust = spark.createDataFrame(
        [(7, "n", 3, 0.0, "m")],  # user 99 has no dim row -> inner-join drop
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
    rows = _x198_stream_static_join(
        spark, {"events": ev, "customer": cust}).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r == {"nationkey": 3, "n_events": 4, "cents": 4 * 250}


def test_bmp_roundtrip_position_checksum(spark):
    """x199: the decoded RGB stream equals the original bytes in ORDER
    (bottom-up storage + BGR swizzle + stride padding all undone), so
    the position-weighted checksum matches a direct computation."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x199_bmp_roundtrip_stats)
    text = "The quick brown fox! 0123456789"   # 31 bytes -> 3 rows, pad 14
    docs = spark.createDataFrame([(1, text), (2, "")],
                                 "doc_id long, text string")
    rows = _x199_bmp_roundtrip_stats(spark, {"documents": docs}).collect()
    assert len(rows) == 1                      # empty doc filtered both sides
    r = rows[0].asDict()
    b = text.encode()
    assert r["height"] == 3 and r["n_bytes"] == 45
    assert r["peak"] == max(b)
    assert r["possum"] == sum((i + 1) * v for i, v in enumerate(b))


def test_quantile_normalize_maps_source_rank_to_global_value(spark):
    """x200: a source whose docs are uniformly short must map its
    median onto the global median value, exposing the shift."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x200_quantile_normalize)
    rows = ([(i, "short", "a b") for i in range(10)]           # n=2
            + [(100 + i, "long", " ".join(["w"] * 10)) for i in range(10)])
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")
    out = _x200_quantile_normalize(spark, {"documents": docs})
    m = {(r["source"], r["decile"]): r for r in out.collect()}
    assert len(m) == 20                      # 10 deciles x 2 sources
    # global median (rank 10 of 20, tie-broken) = 2; 'short' median = 2
    assert m[("short", 5)]["src_value"] == 2
    assert m[("short", 5)]["global_value"] == 2
    # 'long' decile 10 = 10 vs global decile 10 = 10 -> shift 0
    assert m[("long", 10)]["src_value"] == 10
    assert m[("long", 10)]["global_value"] == 10
    assert m[("long", 10)]["shift_permille"] == 0
    # 'long' decile 5 = 10 vs global 2 -> shift (10-2)*1000 div 2 = 4000
    assert m[("long", 5)]["shift_permille"] == 4000


def test_cluster_safe_split_never_straddles(spark):
    """x201: near-identical docs must land in the SAME split, and the
    straddle audit column is 0; totals cover the whole corpus."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x201_cluster_safe_split)
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    rows = [(i, base + f" unique{i}", "s") for i in range(20)]
    # 3 exact near-dups of doc 0 -> one cluster of >= 4
    rows += [(100 + j, base + " unique0", "s") for j in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    out = _x201_cluster_safe_split(spark, {"documents": docs}).collect()
    assert sum(r["n_docs"] for r in out) == 23
    assert all(r["straddling_clusters"] == 0 for r in out)
    # fewer clusters than docs -> the dup family genuinely merged
    assert sum(r["n_clusters"] for r in out) < 23


def test_dq_constraints_counts_planted_violations(spark):
    """x202: planted orphan FK row, duplicate PK and out-of-range value
    each show up in exactly their constraint's row."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x202_dq_constraints)
    o = spark.createDataFrame(
        [(1, 10, "F", 5.0), (1, 10, "O", 6.0),      # dup o_orderkey
         (2, 99, "P", 7.0),                          # orphan custkey
         (3, 10, "X", 8.0)],                         # bad status
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double")
    c = spark.createDataFrame([(10, "a", 1, 0.0, "m")],
                              "c_custkey long, c_name string, "
                              "c_nationkey int, c_acctbal double, "
                              "c_mktsegment string")
    li = spark.createDataFrame(
        [(1, 1, 5.0, 0.05), (1, 1, 60.0, 0.5), (7, 2, 3.0, 0.02)],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_discount double")
    out = {r["check_name"]: r for r in _x202_dq_constraints(
        spark, {"orders": o, "customer": c, "lineitem": li}).collect()}
    assert out["orders.o_orderkey UNIQUE"]["n_violations"] == 1
    assert out["orders.o_custkey -> customer FK"]["n_violations"] == 1
    assert out["orders.o_orderstatus IN (F,O,P)"]["n_violations"] == 1
    assert out["lineitem.(l_orderkey,l_linenumber) UNIQUE"]["n_violations"] == 1
    assert out["lineitem.l_orderkey -> orders FK"]["n_violations"] == 1
    assert out["lineitem.l_quantity IN [1,50]"]["n_violations"] == 1
    assert out["lineitem.l_discount IN [0,0.1]"]["n_violations"] == 1
    assert out["orders.o_custkey NOT NULL"]["n_violations"] == 0


def test_cluster_margin_matches_numpy_reference(spark):
    """x203 against a 20-line NumPy replication of the exact integer
    semantics (milli quantization, tie-to-lowest-cid, sign-reconciled
    truncating centroid mean, top-2 margins)."""
    import numpy as np
    from hive_parse_lineage_spark.analytics_queries import _x203_cluster_margin
    rng = [(i, [((i * 7 + d * 3) % 11) / 3.0 - 1.0 for d in range(4)])
           for i in list(range(8)) + [25, 26, 50, 51]]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    out = {r["cid"]: r for r in _x203_cluster_margin(
        spark, {"embeddings": emb}).collect()}

    ids = np.array([i for i, _ in rng])
    q = np.array([[int(np.floor(v * 1000.0)) for v in vec]
                  for _, vec in rng], dtype=np.int64)
    seed_ids = [i for i in ids if i % 25 == 0 and i < 2500]
    seeds = {i: q[list(ids).index(i)] for i in seed_ids}
    d0 = {i: ((q - c) ** 2).sum(axis=1) for i, c in seeds.items()}
    cids = sorted(seeds)
    dmat = np.stack([d0[i] for i in cids], axis=1)
    a1 = np.array([cids[j] for j in dmat.argmin(axis=1)])  # argmin = lowest tie
    c1 = {}
    for cid in set(a1):
        m = q[a1 == cid]
        s, n = m.sum(axis=0), len(m)
        c1[cid] = np.where(s >= 0, s // n, -((-s) // n))
    c1ids = sorted(c1)
    dm = np.stack([((q - c1[i]) ** 2).sum(axis=1) for i in c1ids], axis=1)
    best = dm.argmin(axis=1)
    d1v = dm[np.arange(len(q)), best]
    dm2 = dm.copy(); dm2[np.arange(len(q)), best] = np.iinfo(np.int64).max
    d2v = dm2.min(axis=1) if dm.shape[1] > 1 else d1v
    exp = {}
    for k, cid in enumerate(c1ids):
        sel = best == k
        n = int(sel.sum())
        if not n:
            continue
        gap = int((d2v[sel] - d1v[sel]).sum()) // n
        amb = int(((10 * d2v[sel]) <= (11 * d1v[sel])).sum()) * 1000 // n
        exp[cid] = (n, gap, amb)
    got = {cid: (r["n_members"], r["mean_gap"], r["ambiguous_permille"])
           for cid, r in out.items()}
    assert got == exp and len(exp) >= 2


def test_benford_audit_exact_shares(spark):
    """x204: hand-checkable digit distribution — 1000.00 x2, 2xx x1,
    9xx x1 -> digits {1:2, 2:1, 9:1}; zero/negative amounts excluded."""
    from hive_parse_lineage_spark.analytics_queries import _x204_benford_audit
    o = spark.createDataFrame(
        [(1, 1000.0), (2, 1500.0), (3, 250.0), (4, 990.0), (5, 0.0)],
        "o_orderkey long, o_totalprice double")
    out = {r["digit"]: r for r in _x204_benford_audit(
        spark, {"orders": o}).collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["n"] == 2 and out[1]["obs_permille"] == 500
    assert out[1]["benford_permille"] == 301
    assert out[1]["dev_permille"] == 199
    assert out[1]["chi2_milli"] == 199 * 199 * 1000 // 301
    assert out[2]["n"] == 1 and out[2]["obs_permille"] == 250
    assert out[9]["benford_permille"] == 46


def test_user_predictability_bot_vs_organic(spark):
    """x205: a scripted user (one repeated transition) scores 0
    entropy; a user alternating over distinct types scores high."""
    from datetime import datetime, timedelta
    from hive_parse_lineage_spark.analytics_queries import (
        _x205_user_predictability)
    t0 = datetime(2024, 1, 1)
    rows = []
    # bot: view view view view -> 3 transitions, all view->view
    for i in range(4):
        rows.append((i, t0 + timedelta(minutes=i), 1, "view", 0.0))
    # organic: a b c d e -> 4 transitions, 4 distinct next types
    for i, ty in enumerate(["a", "b", "c", "d", "e"]):
        rows.append((100 + i, t0 + timedelta(minutes=i), 2, ty, 0.0))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "user_id long, event_type string, "
                                     "value double")
    out = {r["user_id"]: r for r in _x205_user_predictability(
        spark, {"events": ev}).collect()}
    bot, org = out[1], out[2]
    assert bot["n_transitions"] == 3 and bot["n_types"] == 1
    assert bot["entropy_millibits"] == 0          # ibits(3)-ibits(3) = 0
    assert bot["top_type"] == "view"
    assert bot["top_share_permille"] == 1000
    assert org["n_transitions"] == 4 and org["n_types"] == 4
    # each c=1: bits = 1*(ibits(4)-ibits(1)) = 2 per transition -> 2000
    assert org["entropy_millibits"] == 2000
    assert org["top_share_permille"] == 250


def test_sql_str_roundtrips_hostile_strings(spark):
    """r11 ADVICE: Spark's default literal parser processes backslash
    escapes (quote-only escaping turned 'a\\b' into 'a<backspace>'), so
    the VALUES-building entries (x170/x185) route every data-derived
    string through _sql_str. Round-trip the hostile cases."""
    from hive_parse_lineage_spark.analytics_queries import _sql_str
    hostile = ["it's", "a\\b", "a\\nb", "two\\\\slashes", "quote'\\mix\\",
               "src0", ""]
    for raw in hostile:
        got = spark.sql(f"SELECT {_sql_str(raw)} AS s").first()["s"]
        assert got == raw, (raw, got)


def test_markov_attribution_journey_cap(spark, monkeypatch):
    """r11 verdict ask #2: x194 bounds each user's journey to the
    FIRST ATTRIB_JOURNEY_CAP events before collect_list — a bot user
    with events past the cap contributes exactly the capped prefix
    (here: with cap 3, the purchase at position 4 never happens, so
    nothing converts and every removal effect is 0)."""
    from datetime import datetime, timedelta
    from hive_parse_lineage_spark import analytics_queries as aq
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(minutes=i), 1,
             "purchase" if i == 4 else "click", 0.0) for i in range(1, 6)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    monkeypatch.setattr(aq, "ATTRIB_JOURNEY_CAP", 3)
    out = {r["channel"]: r.asDict()
           for r in aq._x194_markov_attribution(spark, {"events": ev})
           .collect()}
    assert out["click"]["base_milli"] == 0
    assert all(v["removal_effect_milli"] == 0 for v in out.values())
    # and with the cap past the purchase, the journey converts (990,
    # not 1000: truncating integer permille over the 3-step chain)
    monkeypatch.setattr(aq, "ATTRIB_JOURNEY_CAP", 10)
    out2 = {r["channel"]: r.asDict()
            for r in aq._x194_markov_attribution(spark, {"events": ev})
            .collect()}
    assert out2["click"]["base_milli"] > 900


def test_markov_attribution_domain_contract_fails_loudly(spark):
    """r11 ADVICE: a high-cardinality event_type violates x194's
    bounded-collect contract; the guard raises instead of hanging the
    driver on an O(n^2) squaring."""
    import pytest as _pytest
    from datetime import datetime, timedelta
    from hive_parse_lineage_spark import analytics_queries as aq
    # 70x70 two-event journeys -> ~4900 distinct (from,to) transitions,
    # past the 4096 driver-side squaring bound
    base = datetime(2024, 1, 1)
    rows = []
    for i in range(70):
        for j in range(70):
            u = i * 70 + j
            rows.append((2 * u, base, u, f"type{i}", 0.0))
            rows.append((2 * u + 1, base + timedelta(minutes=1), u,
                         f"type{j}", 0.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with _pytest.raises(ValueError, match="transition table"):
        aq._x194_markov_attribution(spark, {"events": ev})


def test_reweight_and_cross_entropy_empty_corpus(spark):
    """r11 ADVICE: x170/x185 on an EMPTY documents table return an
    empty DataFrame with the right schema instead of dividing by zero
    or emitting an unparseable empty VALUES list."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x170_source_cross_entropy, _x185_domain_reweight)
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")
    out = _x185_domain_reweight(spark, {"documents": docs})
    assert out.columns == ["source", "loss_millibits", "weight",
                           "weight_permille"]
    assert out.count() == 0
    out2 = _x170_source_cross_entropy(spark, {"documents": docs})
    assert out2.columns == ["source_a", "source_b", "cross_bits",
                            "kl_bits"]
    assert out2.count() == 0
