"""Unit tests for LLM-pipeline operators against Python/NumPy oracles
(SURVEY §5.2(5) — the non-SQL-expressible operator set)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic corpus with planted near-duplicates."""
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps on the warm mat near the old door of the red house")
    near = base.replace("red house", "blue house")     # 1-word edit
    far = ("completely different content about spark catalyst optimizer "
           "plans shuffles partitions and adaptive query execution")
    rows = [(0, base), (1, near), (2, far), (3, base),  # 3 = exact dup of 0
            (4, "tiny doc"), (5, far + " with extra tail words appended here")]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- exact dedup --------------------------------------------------------

def test_exact_dedup(spark, docs):
    from hive_parse_lineage_spark.operators.dedup import exact_dedup
    res = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert res[0] == 2          # docs 0 and 3 collapse
    assert res[1] == 1


# --- minhash ------------------------------------------------------------

def _true_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_identical_and_near(spark, docs):
    from hive_parse_lineage_spark.operators.dedup import (
        minhash_near_dups, minhash_signature)
    sig = {r["doc_id"]: r["minhash"]
           for r in minhash_signature(docs, n_hashes=128).collect()}
    assert sig[0] == sig[3]                      # identical text → identical sig
    est01 = sum(x == y for x, y in zip(sig[0], sig[1])) / 128
    true01 = _true_jaccard(
        docs.filter("doc_id=0").first()["text"],
        docs.filter("doc_id=1").first()["text"])
    assert abs(est01 - true01) < 0.2             # MinHash estimate ≈ true Jaccard
    est02 = sum(x == y for x, y in zip(sig[0], sig[2])) / 128
    assert est02 < 0.2                           # unrelated docs → low estimate

    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_near_dups(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs and (0, 1) in pairs and (1, 3) in pairs
    assert (0, 2) not in pairs


# --- simhash ------------------------------------------------------------

def test_simhash(spark, docs):
    from hive_parse_lineage_spark.operators.dedup import simhash, simhash_near_dups
    sig = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sig[0] == sig[3]
    ham01 = bin((sig[0] ^ sig[1]) & ((1 << 64) - 1)).count("1")
    ham02 = bin((sig[0] ^ sig[2]) & ((1 << 64) - 1)).count("1")
    assert ham01 < ham02                         # near-dup closer than unrelated
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_dups(docs, max_hamming=6).collect()}
    assert pairs[(0, 3)] == 0
    assert (0, 2) not in pairs


# --- n-gram jaccard -----------------------------------------------------

def test_ngram_jaccard_exact(spark, docs):
    from hive_parse_lineage_spark.operators.dedup import ngram_jaccard_pairs
    res = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert res[(0, 3)] == 1.0
    a = docs.filter("doc_id=0").first()["text"]
    b = docs.filter("doc_id=1").first()["text"]
    assert res[(0, 1)] == pytest.approx(round(_true_jaccard(a, b), 4), abs=1e-4)
    # blocked=True must not lose qualifying pairs on this corpus
    blocked = {(r["id_a"], r["id_b"])
               for r in ngram_jaccard_pairs(docs, threshold=0.4, blocked=True).collect()}
    assert blocked == set(res)


# --- vector similarity --------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from hive_parse_lineage_spark.sources.loader import read_table
    return read_table(spark, sf_dir, "embeddings")


def test_cosine_topk_matches_numpy(spark, emb):
    from hive_parse_lineage_spark.operators.similarity import cosine_topk
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk(emb, q, k=5).collect()

    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        sims = (mat @ mat[qi]) / (norms * norms[qi])
        order = np.lexsort((ids, -np.round(sims, 12)))
        want = [int(ids[i]) for i in order[:5]]
        have = [r["vec_id"] for r in got if r["query_id"] == qid]
        assert have == want, f"query {qid}"
        for r in got:
            if r["query_id"] == qid:
                i = np.where(ids == r["vec_id"])[0][0]
                assert r["cosine"] == pytest.approx(sims[i], abs=1e-4)


def test_pandas_topk_matches_expression_topk(spark, emb):
    from hive_parse_lineage_spark.operators.similarity import (
        cosine_topk, cosine_topk_pandas)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    a = {(r["query_id"], r["rank"]): r["vec_id"]
         for r in cosine_topk(emb, q, k=5).collect()}
    qv = {r["query_id"]: list(r["embedding"]) for r in q.collect()}
    b = {(r["query_id"], r["rank"]): r["vec_id"]
         for r in cosine_topk_pandas(emb, qv, k=5).collect()}
    assert a == b


def test_lsh_topk_recall(spark, emb):
    from hive_parse_lineage_spark.operators.similarity import cosine_topk, lsh_topk
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=3).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in lsh_topk(emb, q, k=3, n_bits=4).collect()}
    # 4-bit signatures → 16 buckets of ~30 vectors; self-match (query is
    # in the corpus) is always found, so recall is strictly positive and
    # typically >50% on 500 random vectors
    assert len(exact & approx) / len(exact) > 0.3


# --- text functions vs python oracles -----------------------------------

def test_text_functions_vs_python(spark, docs):
    from hive_parse_lineage_spark.functions import text as T
    got = docs.select(
        "doc_id", "text",
        T.token_count("text").alias("n"),
        T.distinct_token_count("text").alias("nd"),
        T.avg_token_length_hundredths("text").alias("alc"),
        T.doc_fingerprint("text").alias("fp"),
        T.language_id("text").alias("lang"),
    ).collect()
    for r in got:
        toks = r["text"].split(" ")
        assert r["n"] == len(toks)
        assert r["nd"] == len(set(toks))
        assert r["alc"] == sum(map(len, toks)) * 100 // len(toks)
        fp = 0
        for t in toks:
            fp = (fp * 31 + ord(t[0]) * len(t)) % 1_000_000_007
        assert r["fp"] == fp
        scores = {lang: len(set(toks) & set(ws))
                  for lang, ws in sorted(T.STOPWORDS.items())}
        best = max(scores.values())
        want = min(l for l, s in scores.items() if s == best)
        assert r["lang"] == want


# --- skew helpers -------------------------------------------------------

def test_salted_join_matches_plain(spark, tables):
    from hive_parse_lineage_spark.operators.skew import (
        hot_key_split_join, salted_join)
    li = tables["lineitem"].select("l_orderkey", "l_quantity").filter(
        F.col("l_orderkey") < 2000)
    od = tables["orders"].select("o_orderkey", "o_totalprice").withColumnRenamed(
        "o_orderkey", "l_orderkey")
    plain = li.join(od, "l_orderkey")
    salted = salted_join(li, od, "l_orderkey", n_salts=4)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    split = hot_key_split_join(li, od, "l_orderkey", hot_threshold=3)
    assert sorted(map(tuple, split.collect())) == sorted(map(tuple, plain.collect()))


def test_ivf_topk_recall(spark, emb):
    from hive_parse_lineage_spark.operators.similarity import cosine_topk, ivf_topk
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=3).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ivf_topk(emb, q, k=3, n_centroids=8, n_probe=4).collect()}
    # probing half the cells on clustered-ish data: recall well above chance;
    # self-match is guaranteed (a query's own cell is always probed first)
    assert len(exact & approx) / len(exact) > 0.5


def test_embedding_near_dups(spark, emb):
    """Planted near-identical vectors must be found; unrelated pairs must
    pass the cosine verify only if genuinely similar."""
    from hive_parse_lineage_spark.operators.dedup import embedding_near_dups
    base = emb.select("vec_id", "embedding")
    # plant: vec 9000 = copy of vec 0, vec 9001 = slightly perturbed vec 1
    import numpy as np
    rows = {r["vec_id"]: list(r["embedding"]) for r in base.filter(F.col("vec_id") < 2).collect()}
    v0 = rows[0]
    v1 = [x + 0.001 for x in rows[1]]
    planted = spark.createDataFrame(
        [(9000, v0), (9001, v1)], "vec_id long, embedding array<float>")
    corpus = base.unionByName(planted)
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dups(corpus, threshold=0.98).collect()}
    assert (0, 9000) in pairs and pairs[(0, 9000)] >= 0.999
    assert (1, 9001) in pairs
    for (a, b), c in pairs.items():
        assert c >= 0.98


# --- deterministic splitting ---------------------------------------------

def test_hash_split_deterministic_and_salted(spark, docs):
    from hive_parse_lineage_spark.operators.sampling import hash_split
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b  # pure function of id
    c = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="other").collect()}
    assert a != c  # salt re-rolls assignments
    assert set(a.values()) <= {"train", "val", "test"}


def test_hash_split_custom_fractions(spark, docs):
    from hive_parse_lineage_spark.operators.sampling import hash_split
    out = hash_split(docs, fractions={"a": 0.5, "b": 0.5})
    got = {r["split"] for r in out.collect()}
    assert got <= {"a", "b"}
    buckets = [r["bucket"] for r in out.collect()]
    assert all(0 <= x < 100 for x in buckets)


def test_stratified_sample_fractions(spark, tables):
    from hive_parse_lineage_spark.operators.sampling import stratified_sample
    ev = tables["events"].select("event_type", "event_id")
    frac = {t: 0.5 for t in ("click", "view", "purchase")}
    n_all = ev.filter(F.col("event_type").isin(*frac)).count()
    n_s = stratified_sample(ev, "event_type", frac).count()
    assert 0.35 * n_all < n_s < 0.65 * n_all


def test_pack_sequences_invariants(spark, docs):
    from hive_parse_lineage_spark.functions import text as T
    from hive_parse_lineage_spark.operators.sampling import pack_sequences
    d = docs.select("doc_id", T.token_count("text").cast("bigint").alias("n"))
    out = pack_sequences(d, "n", budget=100, n_shards=2).collect()
    assert len(out) == d.count()
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        # start offsets are the exclusive running sum in id order
        acc = 0
        for r in rows:
            assert r["start_offset"] == acc
            assert r["pack_id"] == acc // 100
            acc += r["n"]


def test_lsh_hot_bucket_cap_bounds_pairs(spark):
    """1k identical docs put 1000 rows in every band bucket; with the
    cap those buckets are dropped BEFORE the self-join, so the pair
    count is bounded instead of ~500k x bands (VERDICT r3 #2). Exact
    duplicates remain exact_dedup's job."""
    from hive_parse_lineage_spark.operators.dedup import (
        exact_dedup, lsh_candidate_pairs, minhash_signature_agg)
    rows = [(i, "the same boilerplate header repeated everywhere forever")
            for i in range(1000)]
    rows += [(2000, "a genuinely unique document about spark shuffles"),
             (2001, "a genuinely unique document about spark shuffles!!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signature_agg(docs, n_hashes=16, shingle_k=2)
    capped = lsh_candidate_pairs(sig, n_hashes=16, bands=4,
                                 max_bucket_size=100).collect()
    # the 1k-clone buckets are gone; only the small buckets joined
    assert len(capped) <= 10
    assert all(r["id_a"] >= 2000 for r in capped)
    uncapped = lsh_candidate_pairs(sig, n_hashes=16, bands=4,
                                   max_bucket_size=None)
    assert uncapped.count() > 400_000  # the blowup the cap prevents
    # the boilerplate family is still caught, by the right operator
    assert exact_dedup(docs).count() == 3


def test_lsh_cap_observation_reports_dropped_rows(spark):
    """The bucket cap trades recall for boundedness; that loss must be
    observable (ADVICE r4). Passing an Observation surfaces the count
    of capped bucket entries with zero extra passes."""
    from pyspark.sql import Observation

    from hive_parse_lineage_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signature_agg)
    rows = [(i, "the same boilerplate header repeated everywhere forever")
            for i in range(200)]
    rows += [(900, "a genuinely unique document about spark shuffles")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signature_agg(docs, n_hashes=16, shingle_k=2)
    obs = Observation("lsh_cap")
    lsh_candidate_pairs(sig, n_hashes=16, bands=4, max_bucket_size=100,
                        cap_observation=obs).collect()
    m = obs.get
    # 200 clones x 4 bands = 800 oversized bucket entries dropped
    assert m["capped_bucket_rows"] == 800
    assert m["total_bucket_rows"] == 201 * 4
    # no observation requested -> same pairs, no error
    no_obs = Observation("lsh_nocap")
    uncapped = lsh_candidate_pairs(sig, n_hashes=16, bands=4,
                                   max_bucket_size=10_000,
                                   cap_observation=no_obs)
    uncapped.collect()
    assert no_obs.get["capped_bucket_rows"] == 0


def test_x72_bucket_cap_actually_drops_clone_pairs(spark, tables):
    """x72's hash gate only means something if the cap FIRES: the 20
    synthesized clones must produce zero pairs under the cap while the
    uncapped twin finds all 190 of them."""
    from hive_parse_lineage_spark.corpus_queries import (
        _X72_BOILER, _x72_capped_lsh)
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups

    capped = _x72_capped_lsh(spark, tables).collect()
    assert all(r["id_a"] < 9_000_000 and r["id_b"] < 9_000_000
               for r in capped)
    docs = tables["documents"].select("doc_id", "text")
    clones = (spark.range(1, 21)
              .select((F.lit(9_000_000) + F.col("id")).alias("doc_id"),
                      F.lit(_X72_BOILER).alias("text")))
    uncapped = minhash_near_dups(docs.unionByName(clones), threshold=0.3,
                                 n_hashes=16, bands=4, shingle_k=2,
                                 hasher=portable_hash64,
                                 max_bucket_size=None)
    clone_pairs = uncapped.filter("id_a >= 9000000").count()
    assert clone_pairs == 190  # 20 choose 2


def test_lsh_cross_pairs_matches_full_lsh_cross_subset(spark, tables):
    """lsh_cross_pairs(new, corpus) must find exactly the cross pairs
    the full self-join LSH finds — while never generating
    corpus-vs-corpus candidates."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import (
        lsh_candidate_pairs, lsh_cross_pairs, minhash_signature_agg)
    docs = tables["documents"].limit(300)
    sig = minhash_signature_agg(docs, n_hashes=16, shingle_k=2,
                                hasher=portable_hash64)
    corpus = sig.filter("doc_id < 150")
    new = sig.filter("doc_id >= 150")
    cross = {(r["corpus_id"], r["new_id"], r["est_jaccard"])
             for r in lsh_cross_pairs(new, corpus, n_hashes=16,
                                      bands=4).collect()}
    full = {(r["id_a"], r["id_b"], r["est_jaccard"])
            for r in lsh_candidate_pairs(sig, n_hashes=16, bands=4,
                                         max_bucket_size=None).collect()
            if r["id_a"] < 150 <= r["id_b"]}
    assert cross == full
    assert all(c < 150 <= n for c, n, _ in cross)


def test_incremental_dedup_bucketed_corpus_no_corpus_shuffle(spark, tables):
    """The 100 TB incremental shape: corpus band-buckets persisted
    bucketed by (band, band_hash) mean the daily cross-LSH join
    shuffles only the NEW batch — the corpus side scans its bucket
    files with no Exchange above them (join keys == bucket keys)."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import (
        _band_buckets, minhash_signature_agg)
    from hive_parse_lineage_spark.sources.bucketing import write_bucketed

    docs = tables["documents"].limit(300)
    sig = minhash_signature_agg(docs, n_hashes=16, shingle_k=2,
                                hasher=portable_hash64)
    corpus_buckets = _band_buckets(sig.filter("doc_id < 150"),
                                   "doc_id", 16, 4, None)
    write_bucketed(corpus_buckets, "corpus_sig_buckets",
                   bucket_cols=["band", "band_hash"], n_buckets=8)
    confs = {"spark.sql.autoBroadcastJoinThreshold": "-1",
             "spark.sql.adaptive.enabled": "false"}
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        new_buckets = _band_buckets(sig.filter("doc_id >= 150"),
                                    "doc_id", 16, 4, None)
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = (spark.table("corpus_sig_buckets").alias("c")
                  .join(new_buckets.alias("n"), ["band", "band_hash"]))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # exactly one band_hash exchange: the new-batch side; the
        # bucketed corpus side reads its files pre-partitioned
        assert plan.count("Exchange hashpartitioning(band") == 1, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS corpus_sig_buckets")


def test_ivf_index_build_query_matches_inline(spark, tables, tmp_path):
    """Persisted IVF index (build once, query later) returns the same
    neighbors as the inline ivf_topk with the same centroids, and the
    lists scan is partition-pruned to the probed cells."""
    from hive_parse_lineage_spark.operators.similarity import (
        ivf_build, ivf_query, ivf_topk)
    e = tables["embeddings"]
    q = (e.filter("vec_id < 5")
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    path = str(tmp_path / "ivf")
    ivf_build(e, path, n_centroids=8)
    res = ivf_query(spark, path, q, k=3, n_probe=2)
    got = [(r["query_id"], r["vec_id"], r["rank"]) for r in res.collect()]
    inline = ivf_topk(e, q, k=3, n_centroids=8, n_probe=2)
    want = [(r["query_id"], r["vec_id"], r["rank"]) for r in inline.collect()]
    assert sorted(got) == sorted(want)
    plan = res._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in part_filters, plan  # scan pruned to probed cells


def test_ivf_query_accepts_string_query_ids(spark, tables, tmp_path):
    """ivf_query must take the same id types as ivf_topk — the schema
    is derived from the query DataFrame, not hardcoded long (ADVICE
    r4)."""
    from hive_parse_lineage_spark.operators.similarity import (
        ivf_build, ivf_query)
    e = tables["embeddings"]
    q = (e.filter("vec_id < 3")
         .select(F.concat(F.lit("q-"), F.col("vec_id").cast("string"))
                 .alias("query_id"), "embedding"))
    path = str(tmp_path / "ivf_str")
    ivf_build(e, path, n_centroids=8)
    rows = ivf_query(spark, path, q, k=2, n_probe=2).collect()
    assert {r["query_id"] for r in rows} == {"q-0", "q-1", "q-2"}
    assert all(r["rank"] in (1, 2) for r in rows)


def test_hard_negatives_excludes_query_label_and_ranks_densely(spark, tables):
    """Every mined negative carries a label different from its query's,
    ranks are dense 1..k per query, and the rank order follows cosine
    descending (ties by id) — the contrastive-mining contract."""
    from hive_parse_lineage_spark.operators.similarity import hard_negatives
    e = tables["embeddings"]
    q = (e.filter(F.col("vec_id") < 6)
         .select(F.col("vec_id").alias("query_id"), "embedding", "label"))
    rows = hard_negatives(e, q, k=4).collect()
    q_label = {r["vec_id"]: r["label"]
               for r in e.select("vec_id", "label").collect() if r["vec_id"] < 6}
    by_q = {}
    for r in rows:
        assert r["label"] != q_label[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for qid, rs in by_q.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
        assert [c for _, c in rs] == sorted((c for _, c in rs), reverse=True)


def test_bloom_decontaminate_no_false_negatives(spark, tables):
    """A bloom filter may over-approximate but never under-approximate:
    every exact benchmark shingle hit must also be a bloom hit
    (false_pos >= 0 row-wise), and exact_hits must equal the
    brute-force membership join count per document."""
    from hive_parse_lineage_spark.operators.corpus import (
        bloom_decontaminate, doc_shingles)
    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    rows = bloom_decontaminate(docs, bench, n=5, n_words=64).collect()
    assert rows, "no output"
    for r in rows:
        assert 0 <= r["exact_hits"] <= r["bloom_hits"] <= r["n_shingles"]
        assert r["false_pos"] == r["bloom_hits"] - r["exact_hits"]
    # brute-force exact membership for comparison
    bench_sh = doc_shingles(bench, 5).select("shingle").distinct()
    brute = {r["doc_id"]: r["n"] for r in
             doc_shingles(docs, 5).join(bench_sh, "shingle")
             .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        assert r["exact_hits"] == brute.get(r["doc_id"], 0)
    # the benchmark docs themselves are fully flagged
    bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
    for r in rows:
        if r["doc_id"] in bench_ids:
            assert r["exact_hits"] == r["n_shingles"]


def test_semdedup_matches_numpy_reference(spark, tables):
    """semdedup's assignment and keep rule replayed in NumPy: argmax
    cosine to seeds (tie -> lowest seed), drop iff a lower-id cell-mate
    has cosine >= threshold."""
    from hive_parse_lineage_spark.operators.dedup import semdedup
    e = tables["embeddings"].filter(F.col("vec_id") < 200)
    seeds = (e.filter(F.col("vec_id") % 50 == 0)
             .select(F.col("vec_id").alias("seed_id"), "embedding"))
    got = {r["vec_id"]: (r["cell"], r["kept"])
           for r in semdedup(e, seeds, threshold=0.3).collect()}

    rows = sorted((r["vec_id"], np.array(r["embedding"], dtype=np.float64))
                  for r in e.collect())
    ids = [i for i, _ in rows]
    mat = np.stack([v for _, v in rows])
    seed_ids = [i for i in ids if i % 50 == 0]
    sm = np.stack([mat[ids.index(i)] for i in seed_ids])
    sims = (mat @ sm.T) / (np.linalg.norm(mat, axis=1)[:, None]
                           * np.linalg.norm(sm, axis=1)[None, :])
    cells = [seed_ids[int(np.argmax(s))] for s in sims]  # argmax: first max
    nrm = mat / np.linalg.norm(mat, axis=1)[:, None]
    pair = nrm @ nrm.T
    for bi, vid in enumerate(ids):
        expect_kept = 1
        for ai, aid in enumerate(ids):
            if aid < vid and cells[ai] == cells[bi] and pair[ai, bi] >= 0.3:
                expect_kept = 0
                break
        assert got[vid] == (cells[bi], expect_kept), vid


def test_ann_recall_invariants_and_bucket_size_tradeoff(spark, tables):
    """Recall bookkeeping is internally consistent, and shrinking the
    signature width (bigger buckets) can only raise the candidate
    count — the recall/cost dial the operator exists to measure."""
    from hive_parse_lineage_spark.operators.similarity import ann_recall
    e = tables["embeddings"]
    q = (e.filter(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    narrow = {r["query_id"]: r for r in ann_recall(e, q, k=5, n_bits=8).collect()}
    wide = {r["query_id"]: r for r in ann_recall(e, q, k=5, n_bits=2).collect()}
    assert set(narrow) == set(wide) == set(range(8))
    for rs in (narrow, wide):
        for r in rs.values():
            assert 0 <= r["n_overlap"] <= min(r["n_exact"], r["n_ann"])
            assert r["recall_permille"] == r["n_overlap"] * 1000 // r["n_exact"]
    for qid in narrow:
        assert wide[qid]["n_ann"] >= narrow[qid]["n_ann"]
        assert wide[qid]["recall_permille"] >= narrow[qid]["recall_permille"]


def test_mmr_matches_numpy_reference(spark, tables):
    """Every MMR pick replayed greedily in NumPy: round r maximizes
    0.7*sim(q,c) - 0.3*max-sim-to-selected over the top-10 pool
    (ties -> lower id)."""
    from hive_parse_lineage_spark.operators.similarity import mmr_topk
    e = tables["embeddings"].filter(F.col("vec_id") < 300)
    q = (e.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = {(r["query_id"], r["rank"]): r["vec_id"]
           for r in mmr_topk(e, q, k=3, pool=10, lam=0.7).collect()}

    rows = sorted((r["vec_id"], np.array(r["embedding"], dtype=np.float64))
                  for r in e.collect())
    ids = np.array([i for i, _ in rows])
    mat = np.stack([v for _, v in rows])
    nrm = mat / np.linalg.norm(mat, axis=1)[:, None]
    for qi in range(3):
        sims = nrm @ nrm[list(ids).index(qi)]
        order = sorted((i for i in range(len(ids)) if ids[i] != qi),
                       key=lambda i: (-sims[i], ids[i]))
        pool = order[:10]
        selected = []
        for rank in range(1, 4):
            best = None
            for i in pool:
                if i in selected:
                    continue
                pen = max((nrm[i] @ nrm[j] for j in selected), default=0.0)
                score = 0.7 * sims[i] - 0.3 * pen
                if best is None or (score, -ids[i]) > best[0]:
                    best = ((score, -ids[i]), i)
            selected.append(best[1])
            assert got[(qi, rank)] == ids[best[1]], (qi, rank)


def test_aqe_splits_skewed_join_partitions(spark):
    """Evidence that the engine's session posture (AQE + skewJoin
    enabled, session.py RUNTIME_CONFS) actually handles data skew at
    runtime: a 200k-row fact with 95% of rows on one key joined to a
    small-but-not-broadcast dim must execute with AQE's skew-split
    (the final adaptive plan marks the SMJ `skew=true`), not one giant
    straggler partition."""
    from pyspark.sql import functions as F
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pad"))
        dim = spark.range(50_000).select(F.col("id").alias("k"),
                                         (F.col("id") * 2).alias("v"))
        joined = fact.join(dim, "k")
        # execute THIS DataFrame's QueryExecution (count() would build
        # a fresh one and leave this plan isFinalPlan=false)
        assert len(joined.collect()) == 192_500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:1000]
        assert "skew=true" in plan, plan[:4000]
        assert "skewed" in plan, plan[:4000]   # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_semdedup_arrow_and_sql_paths_agree(spark, tables):
    """The BLAS gram-matrix pair stage (use_arrow, default) and the
    per-cell SQL equi-join must produce identical (cell, kept) for
    every vector — same float64 cosine contract, two spellings."""
    from hive_parse_lineage_spark.operators.dedup import semdedup
    e = tables["embeddings"].filter(F.col("vec_id") < 300)
    seeds = (e.filter(F.col("vec_id") % 50 == 0)
             .select(F.col("vec_id").alias("seed_id"), "embedding"))
    ar = sorted(tuple(r) for r in semdedup(e, seeds, threshold=0.25).collect())
    sq = sorted(tuple(r) for r in
                semdedup(e, seeds, threshold=0.25, use_arrow=False).collect())
    assert ar == sq and len(ar) > 0
