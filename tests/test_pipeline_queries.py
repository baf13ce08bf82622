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


def test_importance_counts_join_without_forced_broadcast(spark, tables,
                                                         sf_dir):
    """x89: the unigram-count tables are vocabulary-sized (unbounded
    at 100 TB), so they must reach the plan as plain equi-joins — the
    only forced broadcast is the single-row totals. AQE may still
    choose broadcast at small SF; what matters is no hint makes the
    driver materialize the vocab."""
    plan = _plan_of(spark, sf_dir, "x89_importance_weights")
    assert "CartesianProduct" not in plan, plan
    df = pipeline_queries()["x89_importance_weights"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1, analyzed  # totals only


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


def test_pmi_unigrams_join_without_forced_broadcast(spark, tables, sf_dir):
    """x92: the unigram sides are vocabulary-sized, so they attach to
    the bigram counts as plain equi-joins (no forced broadcast; the
    single-row totals is the only hint)."""
    plan = _plan_of(spark, sf_dir, "x92_pmi_collocations")
    assert "CartesianProduct" not in plan, plan
    df = pipeline_queries()["x92_pmi_collocations"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1, analyzed  # tot only


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
    """x93 regression: buckets are id-range deciles of DOCS (pure
    projection — the original ntile-over-exploded-rows bug produced
    uniform bucket gram-counts, and a global ntile was the sweep's
    19×-at-10×-rows scale killer). Cheap value check."""
    df = pipeline_queries()["x93_novelty_curve"](spark, sf_dir)
    rows = df.collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    # bucket 1 can never contain an already-seen gram
    assert rows[0]["repeated_permille"] == 0
    # doc-level deciles have *varying* gram totals; the exploded-row
    # ntile bug yields all-equal n_grams (±1)
    totals = {r["n_grams"] for r in rows}
    assert len(totals) > 2, rows


def _rebuild_reference(rows, seg_tokens):
    """Pure-Python reference for segment_dedup_rebuild."""
    segs = []
    for doc_id, text in rows:
        toks = text.split(" ")
        for i in range(0, (len(toks) + seg_tokens - 1) // seg_tokens):
            segs.append((doc_id, i,
                         " ".join(toks[i * seg_tokens:(i + 1) * seg_tokens])))
    first = {}
    for doc_id, idx, seg in sorted(segs):
        first.setdefault(seg, (doc_id, idx))
    out = {}
    for doc_id, idx, seg in sorted(segs):
        if first[seg] == (doc_id, idx):
            n, parts = out.get(doc_id, (0, []))
            out[doc_id] = (n + 1, parts + [seg])
    return {d: (n, " ".join(p)) for d, (n, p) in out.items()}


@pytest.mark.parametrize("seed", [11, 42])
def test_segment_rebuild_matches_python_reference(spark, seed):
    """Random corpora over a 6-word alphabet (forces heavy segment
    collisions): the operator must match the pure-Python keep-first
    reconstruction exactly, and every distinct segment text must
    survive exactly once across all rebuilt docs."""
    import random

    from hive_parse_lineage_spark.operators.dedup import segment_dedup_rebuild
    rnd = random.Random(seed)
    alpha = ["a", "b", "c", "d", "e", "f"]
    rows = [(i, " ".join(rnd.choice(alpha)
                         for _ in range(rnd.randrange(1, 30))))
            for i in range(25)]
    got = {r["doc_id"]: (r["n_kept"], r["rebuilt"])
           for r in segment_dedup_rebuild(
               spark.createDataFrame(rows, "doc_id long, text string"),
               seg_tokens=4).collect()}
    exp = _rebuild_reference(rows, 4)
    assert got == exp
    all_kept = [s for n, t in got.values() for s in [t]]
    segs = [seg for t in all_kept for seg in _split_rebuilt(t, rows, 4)]
    assert len(segs) == len(set(segs))


def _split_rebuilt(rebuilt, rows, seg_tokens):
    """Rebuilt text is a space-join of whole segments; recover them by
    re-splitting against the reference segment set."""
    ref = set()
    for _, text in rows:
        toks = text.split(" ")
        for i in range(0, (len(toks) + seg_tokens - 1) // seg_tokens):
            ref.add(" ".join(toks[i * seg_tokens:(i + 1) * seg_tokens]))
    # greedy longest-match split over known segments
    toks = rebuilt.split(" ")
    out, i = [], 0
    while i < len(toks):
        for ln in range(min(seg_tokens, len(toks) - i), 0, -1):
            cand = " ".join(toks[i:i + ln])
            if cand in ref:
                out.append(cand)
                i += ln
                break
        else:
            raise AssertionError(f"unsplittable rebuilt text: {rebuilt!r}")
    return out


@pytest.mark.parametrize("seed", [5, 77])
def test_bm25_random_corpus_matches_reference(spark, seed):
    """BM25 on random corpora vs the driver-side reference: same
    (term, doc) -> (tf, dl, score, rank) map for every term."""
    import random

    from hive_parse_lineage_spark.operators.retrieval import bm25_term_topk
    rnd = random.Random(seed)
    alpha = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rnd.choice(alpha)
                         for _ in range(rnd.randrange(2, 40))))
            for i in range(30)]
    terms = ["w0", "w5", "w11", "missing"]
    got = {(r["term"], r["doc_id"]): (r["tf"], r["dl"], r["score"], r["rank"])
           for r in bm25_term_topk(
               spark.createDataFrame(rows, "doc_id long, text string"),
               terms, k=8).collect()}
    toks = {d: t.split(" ") for d, t in rows}
    n, total = len(rows), sum(len(w) for w in toks.values())
    exp = {}
    for term in terms:
        hits = {d: w.count(term) for d, w in toks.items() if term in w}
        if not hits:
            continue
        df = len(hits)
        idf = (2 * n - 2 * df + 1) / (2 * df + 1)
        scored = sorted(
            ((idf * (tf / (tf + 0.3 + 0.9 * len(toks[d]) * n / total)), d, tf)
             for d, tf in hits.items()), key=lambda x: (-x[0], x[1]))[:8]
        for rank, (s, d, tf) in enumerate(scored, 1):
            exp[(term, d)] = (tf, len(toks[d]), round(s, 4), rank)
    assert got == exp


def test_pmi_topk_uses_takeordered(spark, tables, sf_dir):
    """x92's top-20 must be TakeOrderedAndProject (per-partition
    heaps), not a global row_number window over every scored bigram."""
    plan = _plan_of(spark, sf_dir, "x92_pmi_collocations")
    assert "TakeOrderedAndProject" in plan, plan


def test_novelty_has_no_global_sort_stage(spark, tables, sf_dir):
    """x93's bucket is a broadcast-scalar projection: no ntile, and
    the only single-partition exchange is the 1-row MAX(doc_id)
    scalar (the sweep measured the ntile spelling 19× slower at 10×
    rows)."""
    plan = _plan_of(spark, sf_dir, "x93_novelty_curve")
    assert "ntile" not in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_pagerank_matches_python_reference(spark):
    """Fixed-point PageRank vs a driver-side integer reference on a
    small graph with a hub, a chain, and an isolated vertex."""
    from hive_parse_lineage_spark.operators.graph import pagerank_fixed_point
    pairs = [(1, 2), (1, 3), (1, 4), (4, 5)]
    verts = [1, 2, 3, 4, 5, 99]   # 99 isolated
    got = {r["vertex"]: r["rank_ppm"] for r in pagerank_fixed_point(
        spark.createDataFrame(pairs, "id_a long, id_b long"),
        spark.createDataFrame([(v,) for v in verts], "vertex long"),
        rounds=3).collect()}
    adj: dict[int, list[int]] = {v: [] for v in verts}
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    r = {v: 1_000_000 for v in verts}
    for _ in range(3):
        r = {v: 150_000 + (850_000 * sum(r[u] // len(adj[u])
                                         for u in adj if v in adj[u]))
             // 1_000_000 for v in verts}
    assert got == r
    assert got[99] == 150_000          # isolated settles at base
    assert got[1] == max(got.values())  # the hub out-ranks everyone


def test_training_manifest_shares_sum_to_1000(spark, tables, sf_dir):
    """Per split: source shares (floored permille) must sum into
    (1000 - n_sources, 1000], and doc counts must cover the corpus."""
    rows = pipeline_queries()["x101_training_manifest"](spark, sf_dir).collect()
    by_split: dict[str, list] = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    assert set(by_split) == {"train", "val", "test"}
    for split, rs in by_split.items():
        s = sum(r["share_permille"] for r in rs)
        assert 1000 - len(rs) < s <= 1000, (split, s)
    n = sum(r["n_docs"] for r in rows)
    assert n == load_tables(spark, sf_dir)["documents"].count()


def test_conversion_window_no_join(spark, tables, sf_dir):
    """x103 computes next-purchase attribution with windows over ONE
    sorted pass — never a view×purchase join."""
    plan = _plan_of(spark, sf_dir, "x103_conversion_window")
    assert "Join" not in plan, plan


@pytest.mark.parametrize("seed", [13, 202])
def test_conversion_window_matches_brute_force(spark, seed):
    """Random event streams vs a pure-Python scan: same per-day
    conversion counts and integer average latency."""
    import datetime
    import random
    rnd = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(40):
        t = base + datetime.timedelta(seconds=rnd.randrange(0, 86400 * 3))
        for _ in range(rnd.randrange(1, 12)):
            t += datetime.timedelta(seconds=rnd.randrange(1, 5000))
            rows.append((eid, user, t,
                         rnd.choice(["view", "purchase", "click"])))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    from hive_parse_lineage_spark.pipeline_queries import _x103_conversion_window
    got = {(r["day"], r["n_conversions"], r["avg_latency_sec"])
           for r in _x103_conversion_window(spark, {"events": df}).collect()}

    firsts = {}
    for user in range(40):
        evs = sorted([r for r in rows if r[1] == user], key=lambda r: (r[2], r[0]))
        for i, (eid_, _, ts, ty) in enumerate(evs):
            if ty != "view":
                continue
            nxt = next((p[2] for p in evs[i:] if p[3] == "purchase"
                        and p[2] >= ts), None)
            if nxt is not None and (nxt - ts).total_seconds() <= 3600:
                firsts[user] = (ts.date(), int((nxt - ts) /
                                               datetime.timedelta(microseconds=1)))
                break
    per_day: dict = {}
    for day, lat in firsts.values():
        n, s = per_day.get(day, (0, 0))
        per_day[day] = (n + 1, s + lat)
    exp = {(day, n, (s // n) // 1_000_000) for day, (n, s) in per_day.items()}
    assert got == exp


def test_cms_never_undercounts(spark, tables, sf_dir):
    """x104 CMS invariant: est >= exact for every probe (CMS can only
    overcount), and every probe token appears in the output."""
    from hive_parse_lineage_spark.pipeline_queries import CMS_PROBES
    rows = pipeline_queries()["x104_cms_heavy_hitters"](spark, sf_dir).collect()
    assert {r["tok"] for r in rows} == set(CMS_PROBES)
    for r in rows:
        assert r["est"] >= r["exact"] >= 0
        assert r["overcount"] == r["est"] - r["exact"]


@pytest.mark.parametrize("seed", [31, 404])
def test_ppjoin_finds_every_pair_brute_force(spark, seed):
    """x105's defining property: prefix filtering is EXACT — on random
    corpora it must emit precisely the pairs a brute-force all-pairs
    3-shingle Jaccard scan finds (no false negatives, unlike LSH)."""
    import random

    from hive_parse_lineage_spark.pipeline_queries import _x105_ppjoin_exact
    rnd = random.Random(seed)
    alpha = [f"w{i}" for i in range(8)]
    rows = []
    for i in range(30):
        if i % 5 == 0 and rows:   # inject near-copies to force matches
            base = rows[rnd.randrange(len(rows))][1].split(" ")
            if len(base) > 3:
                base = base[:-1] + [rnd.choice(alpha)]
            rows.append((100 + i, " ".join(base)))
        else:
            rows.append((100 + i, " ".join(
                rnd.choice(alpha) for _ in range(rnd.randrange(3, 15)))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["i"], r["jaccard_permille"])
           for r in _x105_ppjoin_exact(spark, {"documents": df}).collect()}

    def shingles(t):
        w = t.split(" ")
        if len(w) < 3:
            return {t}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    exp = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            sa, sb = shingles(rows[a][1]), shingles(rows[b][1])
            i = len(sa & sb)
            if 5 * i >= 3 * (len(sa | sb)):
                exp[(rows[a][0], rows[b][0])] = (i, i * 1000 // len(sa | sb))
    assert got == exp
    assert exp  # the injected near-copies must produce matches


def test_event_transitions_shares_partition(spark, tables, sf_dir):
    """x106: per from_type, floored permille shares sum into
    (1000 - k, 1000]; pair count = full 5x5 matrix on the fixture."""
    rows = pipeline_queries()["x106_event_transitions"](spark, sf_dir).collect()
    by_from: dict[str, list] = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["share_permille"])
    for f, shares in by_from.items():
        assert 1000 - len(shares) < sum(shares) <= 1000, (f, shares)
    assert len(rows) == 25


def test_langid_kappa_bounds_and_consistency(spark, tables, sf_dir):
    """x107: kappa_permille in [-1000, 1000] and consistent with the
    x96 confusion matrix's diagonal."""
    r = pipeline_queries()["x107_langid_kappa"](spark, sf_dir).collect()[0]
    assert -1000 <= r["kappa_permille"] <= 1000
    conf = pipeline_queries()["x96_lang_confusion"](spark, sf_dir).collect()
    diag = sum(c["n_docs"] for c in conf if c["lang"] == c["pred_lang"])
    n = sum(c["n_docs"] for c in conf)
    assert (r["diag"], r["n"]) == (diag, n)


def test_new_entries_plan_hygiene(spark, tables, sf_dir):
    """x100/x101/x104-x107 plan floor: no CartesianProduct anywhere;
    x104's probe side attaches to the 1024-cell sketch as a broadcast;
    x101 has no join at all (pure rollup over the hash split)."""
    for name in ["x100_dup_pagerank", "x101_training_manifest",
                 "x104_cms_heavy_hitters", "x105_ppjoin_exact",
                 "x106_event_transitions", "x107_langid_kappa"]:
        plan = _plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, (name, plan[:2000])
    assert "BroadcastHashJoin" in _plan_of(spark, sf_dir,
                                           "x104_cms_heavy_hitters")
    assert "Join" not in _plan_of(spark, sf_dir, "x101_training_manifest")


def test_kmv_rank_filter_pushes_below_shuffle(spark, tables, sf_dir):
    """x108's scale claim is that rn <= k is a per-partition top-k
    merge, not a vocabulary-sized per-source sort: the executed plan
    must carry WindowGroupLimit (map-side group-limit before the
    exchange). Also sanity-pin the estimator: every per-source
    estimate lands within 50% of the exact distinct count at sf0.01
    (KMV k=64 standard error is ~1/sqrt(62) ~ 13%)."""
    plan = _plan_of(spark, sf_dir, "x108_kmv_distinct")
    assert "WindowGroupLimit" in plan, plan
    rows = pipeline_queries()["x108_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est"] > 0
        assert abs(r["est"] - r["exact_distinct"]) <= 0.5 * r["exact_distinct"], r


def test_key_skew_report_shape_and_bounds(spark, tables, sf_dir):
    """x109: join-free (two scans, two aggregates, windows over key
    tables only) and Gini/top-share invariants hold: 0 <= gini < 1000,
    top1 share >= ceil(1000/n_keys) (the hottest key is at least the
    mean)."""
    plan = _plan_of(spark, sf_dir, "x109_key_skew_report")
    assert "Join" not in plan, plan
    rows = pipeline_queries()["x109_key_skew_report"](spark, sf_dir).collect()
    assert {r["dim"] for r in rows} == {"events.event_type",
                                        "documents.source"}
    for r in rows:
        assert 0 <= r["gini_permille"] < 1000, r
        assert r["top1_share_permille"] * r["n_keys"] >= 1000 - r["n_keys"], r


def test_quality_auc_matches_brute_force(spark):
    """x110's doubled-rank Mann-Whitney on a toy table vs the O(n^2)
    definition (mean over all pos/neg pairs of [s_pos > s_neg] + 0.5
    [tie]), including ties across classes."""
    import itertools

    from hive_parse_lineage_spark.pipeline_queries import _x110_quality_auc
    rows = [(1, "a", 10), (2, "a", 10), (3, "b", 12), (4, "c", 15),
            (5, "c", 15), (6, "d", 8), (7, "e", 15), (8, "f", 20)]
    # duplicate-label: docs 1,2 share text "a"; 4,5 share "c"
    docs = spark.createDataFrame(
        [(i, t, n) for i, t, n in rows],
        "doc_id long, text string, n_chars long")
    out = _x110_quality_auc(spark, {"documents": docs}).collect()[0]
    pos = [n for _, t, n in rows
           if sum(1 for _, t2, _ in rows if t2 == t) >= 2]
    neg = [n for _, t, n in rows
           if sum(1 for _, t2, _ in rows if t2 == t) < 2]
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    u = sum(1.0 if p > q else (0.5 if p == q else 0.0)
            for p, q in itertools.product(pos, neg))
    expected = int(u * 1000 // (len(pos) * len(neg)))
    assert out["auc_permille"] == expected, (out, u)


def test_split_ks_matches_brute_force(spark):
    """x113's cross-multiplied KS vs the textbook max-CDF-gap on a toy
    corpus, with the split assignment taken from the same hash_split
    the operator uses."""
    from hive_parse_lineage_spark.operators.sampling import hash_split
    from hive_parse_lineage_spark.pipeline_queries import _x113_split_ks_drift
    rows = [(i, f"doc {i}", (i * 7) % 40 + 5) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = _x113_split_ks_drift(spark, {"documents": docs}).collect()[0]
    assign = {r["doc_id"]: r["split"]
              for r in hash_split(docs, salt="v1").collect()}
    a = sorted(n for i, _, n in rows if assign[i] == "train")
    b = sorted(n for i, _, n in rows if assign[i] == "val")
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    vals = sorted(set(a) | set(b))
    d_num = max(abs(sum(1 for x in a if x <= v) * len(b)
                    - sum(1 for x in b if x <= v) * len(a)) for v in vals)
    assert out["ks_permille"] == d_num * 1000 // (len(a) * len(b)), out


def test_winnowing_matches_python_reference(spark):
    """x133's window-min selection + df cap + pair counts vs a direct
    Python transcription of the winnowing rule on a toy corpus with a
    planted shared passage."""
    from hive_parse_lineage_spark.pipeline_queries import (
        _x133_winnowing_fingerprints)
    import hashlib
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, shared + " one two three"),
            (2, "x y " + shared),
            (3, "p q r s t u v w x y z aa bb cc"),
            (4, "short doc")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in _x133_winnowing_fingerprints(
               spark, {"documents": docs}).collect()}

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def fps(text):
        t = text.split(" ")
        sh = ([" ".join(t[i:i + 5]) for i in range(len(t) - 4)]
              if len(t) >= 5 else [text])
        hs = [h(s) for s in sh]
        out = set()
        for i in range(len(hs)):
            w = hs[i:i + 4]
            if hs[i] == min(w):
                out.add(hs[i])
        return out

    f = {d: fps(t) for d, t in rows}
    exp = {}
    for a in f:
        for b in f:
            if a < b:
                n = len(f[a] & f[b])
                if n >= 2:
                    exp[(a, b)] = n
    assert got == exp, (got, exp)


def test_winnowing_window_is_per_doc(spark, tables, sf_dir):
    """x133's selection window must be partitioned by doc (no global
    sort of the fingerprint stream) and the pair join an equi-join."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    df = pipeline_queries()["x133_winnowing_fingerprints"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "partitionBy=[doc_id]" in plan.replace(" ", "") or \
        "hashpartitioning(doc_id" in plan, plan


def test_source_overlap_distinct_before_pair_join(spark, tables, sf_dir):
    """x129's scale contract: the (source, shingle) DISTINCT runs
    below the self-join, so per-shingle fanout is bounded by the
    source count — the analyzed plan must aggregate/dedup the shingle
    stream before any join, and the join is an equi-join."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    df = pipeline_queries()["x129_source_overlap"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or \
        "ShuffledHashJoin" in plan, plan
    out = pipeline_queries()["x129_source_overlap"](spark, sf_dir).collect()
    for r in out:
        assert r["src_a"] < r["src_b"]
        assert 0 <= r["overlap_permille"] <= 1000


def test_histogram_quantile_sketch_bounds(spark, tables, sf_dir):
    """x131: the estimate is an upper bound on the exact value (bin
    upper edge), the error is nonnegative, and every (source, q) cell
    appears exactly once."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    rows = pipeline_queries()["x131_histogram_quantiles"](
        spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["est"] >= r["exact_v"], r
        assert r["err_permille"] >= 0, r
        key = (r["source"], r["q"])
        assert key not in seen
        seen.add(key)
    assert len({q for _, q in seen}) == 3


def test_vocab_growth_cumulative_consistency(spark, tables, sf_dir):
    """x132: cumulative columns telescope, bucket 1 introduces every
    type it contains, and the final cum_types equals the corpus-wide
    distinct bigram count."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    from hive_parse_lineage_spark.sources.loader import load_tables
    rows = pipeline_queries()["x132_vocab_growth"](spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    cum_t = cum_g = 0
    for r in rows:
        cum_t += r["new_types"]
        cum_g += r["n_grams"]
        assert r["cum_types"] == cum_t and r["cum_grams"] == cum_g
    d = load_tables(spark, sf_dir)["documents"]
    total = (d.select(F.explode(word_shingles("text", 2)).alias("g"))
             .select("g").distinct().count())
    assert rows[-1]["cum_types"] == total


def test_label_centroid_drift_zero_for_global(spark):
    """x134 sanity: a single-label corpus has zero drift (its centroid
    IS the global centroid)."""
    from hive_parse_lineage_spark.pipeline_queries import (
        _x134_label_centroid_drift)
    rows = [(i, [0.1 * i, -0.2 * i, 0.3], 7) for i in range(1, 9)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = _x134_label_centroid_drift(spark, {"embeddings": emb}).collect()
    assert len(out) == 1
    assert out[0]["label"] == 7 and out[0]["n_vecs"] == 8
    assert out[0]["l1_drift_milli"] == 0


def test_stream_stream_join_matches_batch_join(spark, tables, sf_dir):
    """x135: the append-mode stream-stream inner join's final sink
    equals the batch join over the same two sides."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    from hive_parse_lineage_spark.sources.loader import load_tables
    got = pipeline_queries()["x135_stream_stream_join"](
        spark, sf_dir).collect()
    e = load_tables(spark, sf_dir)["events"]
    v = e.filter(F.col("event_type") == "view").alias("v")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    exp = (v.join(p, (F.col("v.user_id") == F.col("p.user_id"))
                  & (F.col("p.ts") >= F.col("v.ts"))
                  & (F.col("p.ts") < F.col("v.ts")
                     + F.expr("INTERVAL 1 HOUR")))
           .select(F.col("v.event_id").alias("view_id"),
                   F.col("p.event_id").alias("purchase_id"))
           .collect())
    assert {(r["view_id"], r["purchase_id"]) for r in got} \
        == {(r["view_id"], r["purchase_id"]) for r in exp}
    assert all(0 <= r["latency_us"] < 3_600_000_000 for r in got)


def test_column_profile_two_scan_hash_agg_and_sane(spark, tables, sf_dir):
    """x136's two-scan contract: exactly two column-pruned parquet
    scans (one wide global agg for counts/min/max, one (col,value)
    pair stream for exact distincts), the pair-stream distincts as
    HASH aggregates (4: partial+final for the two groupBys), and
    SortAggregate confined to the global string min/max agg (2) —
    never on the corpus-proportional pair stream. Plus: the key
    column profiles null-free with distinct == row count."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    from hive_parse_lineage_spark.sources.loader import load_tables
    df = pipeline_queries()["x136_column_profile"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 2, plan
    assert plan.count("HashAggregate") == 4, plan
    assert plan.count("SortAggregate") == 2, plan
    rows = {r["col"]: r for r in df.collect()}
    n = load_tables(spark, sf_dir)["orders"].count()
    assert rows["o_orderkey"]["n_null"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n
    assert rows["o_orderkey"]["min_s"].isdigit()


def test_snapshot_diff_partitions_key_universe(spark, tables, sf_dir):
    """x137: every key in either snapshot lands in exactly one change
    class, and the class counts reconstruct the snapshot sizes."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    from hive_parse_lineage_spark.sources.loader import load_tables
    rows = {r["change_type"]: r["n_keys"]
            for r in pipeline_queries()["x137_snapshot_diff"](
                spark, sf_dir).collect()}
    o = load_tables(spark, sf_dir)["orders"]
    na = o.filter(F.expr("o_orderkey % 4 != 3")).count()
    nb = o.filter(F.expr("o_orderkey % 4 != 1")).count()
    assert rows["delete"] + rows["update"] + rows["unchanged"] == na
    assert rows["insert"] + rows["update"] + rows["unchanged"] == nb


def test_borda_blend_topk_is_window_group_limit(spark, tables, sf_dir):
    """x138: the top-5-per-source filter must compile to a
    WindowGroupLimit (rank pushed below the shuffle), never a global
    sort of the ranked corpus."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    df = pipeline_queries()["x138_borda_quality_blend"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    rows = df.collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in per.items():
        assert ranks == sorted(ranks) and len(ranks) <= 5, (src, ranks)


def test_decay_mix_weights_halve(spark, tables, sf_dir):
    """x139: weights halve per decile of age and shares sum to ~1000."""
    from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
    rows = pipeline_queries()["x139_decay_mix_schedule"](
        spark, sf_dir).collect()
    w = {r["bucket"]: r["weight_permille"] for r in rows}
    assert w[10] == 1000 and w[9] == 500 and w[1] == 1
    total = sum(r["share_permille"] for r in rows)
    assert 990 <= total <= 1000  # integer-floor undershoot only


def test_burstiness_matches_python_reference(spark):
    """x140's gaps-and-islands run lengths vs a direct scan on a toy
    corpus with planted runs."""
    from hive_parse_lineage_spark.pipeline_queries import (
        _x140_token_burstiness)
    rows = [(1, "a a a b", "en"), (2, "a b a b", "en"),
            (3, "x x y y", "de"), (4, "z", "de")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: (r["n_docs"], r["longest_run"], r["n_bursty"])
           for r in _x140_token_burstiness(spark, {"documents": docs})
           .collect()}

    def max_run(t):
        best = cur = 1
        ts = t.split(" ")
        for a, b in zip(ts, ts[1:]):
            cur = cur + 1 if a == b else 1
            best = max(best, cur)
        return best

    exp = {}
    for lang in ("en", "de"):
        runs = [max_run(t) for _, t, lg in rows if lg == lang]
        exp[lang] = (len(runs), max(runs), sum(1 for r in runs if r >= 3))
    assert got == exp, (got, exp)


def test_snapshot_diff_cents_column_agrees_with_duckdb(spark, sf_dir):
    """The r7 verdict's x137 risk, proven closed with cents EMITTED:
    the FLOOR-then-cast integer-cents surrogate must be value-identical
    to DuckDB's on every key (a plain CAST(double AS BIGINT) rounds in
    DuckDB but truncates in Spark — the floor pins both engines)."""
    import duckdb

    from tests.oracle import compare
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .select("o_orderkey",
                 F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")
                 .alias("cents"),
                 F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT) * "
                        "CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END")
                 .alias("cents_b"))
         .orderBy("o_orderkey"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    res = compare(o, """
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                   * CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END
                   AS cents_b
        FROM orders ORDER BY o_orderkey
    """, con)
    assert res["rows_match"] and res["cols_match"] and res["hash_match"]
