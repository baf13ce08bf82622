"""x206-x212 (audit_queries): toy-reference tests for the math and
fan-out shapes; value-level correctness vs DuckDB is covered by the
oracle gate (selfcheck / driver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_parse_lineage_spark.audit_queries import (
    _x206_y4m_frame_sample, _x207_png_roundtrip_stats, _x208_fd_violations,
    _x209_join_cardinality_audit, _x211_acf_lags, _x212_edge_embeddedness)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_y4m_frame_sample_schedule_and_checksum(spark):
    """130 bytes -> 6 frames of 24; every-200ms at F25:1 samples frames
    0 and 5; checksums replay the padded byte layout exactly."""
    text = "".join(chr(65 + (i % 26)) for i in range(130))
    out = _x206_y4m_frame_sample(
        spark, {"documents": _docs(spark, [text])}).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_sampled"] == 2 and r["idx_sum"] == 5 and r["ts_sum"] == 200

    def frame_ps(i):
        chunk = text[i * 24:(i + 1) * 24].ljust(24, "\0")
        return sum((j + 1) * ord(c) for j, c in enumerate(chunk))

    assert r["possum"] == frame_ps(0) + frame_ps(5)


def test_png_roundtrip_filters_reconstruct(spark):
    """A text long enough to hit all three filter rows (None/Sub/Up)
    must come back byte-exact through zlib + filter reconstruction."""
    text = "The quick brown fox jumps over the lazy dog 0123456789"
    out = _x207_png_roundtrip_stats(
        spark, {"documents": _docs(spark, [text])}).collect()
    r = out[0].asDict()
    n, w = len(text), 5
    h = (n + w - 1) // w
    assert h >= 4  # filters 0,1,2 all exercised
    assert r["height"] == h and r["n_bytes"] == h * w
    assert r["peak"] == max(ord(c) for c in text)
    assert r["possum"] == sum((k + 1) * ord(c) for k, c in enumerate(text))


def test_fd_violations_toy(spark):
    part = spark.createDataFrame(
        [(1, "b1", "t1"), (2, "b2", "t1"), (3, "b2", "t2")],
        "p_partkey long, p_brand string, p_type string")
    tables = {
        "part": part,
        "customer": spark.createDataFrame(
            [(1, 1, "A")], "c_custkey long, c_nationkey long, "
                           "c_mktsegment string"),
        "orders": spark.createDataFrame(
            [(1, 1, "P1"), (2, 1, "P2")],
            "o_orderkey long, o_custkey long, o_orderpriority string"),
        "lineitem": spark.createDataFrame(
            [(1, "R")], "l_orderkey long, l_returnflag string"),
        "nation": spark.createDataFrame(
            [(1, "x", 1), (2, "y", 1)],
            "n_nationkey long, n_name string, n_regionkey long"),
    }
    got = {r["fd"]: r.asDict()
           for r in _x208_fd_violations(spark, tables).collect()}
    # p_partkey -> p_brand: PK lhs, always holds
    assert got["part.p_partkey->p_brand"]["n_violating"] == 0
    # p_type -> p_brand: t1 maps to {b1, b2} -> 1 of 2 groups violates
    t = got["part.p_type->p_brand"]
    assert (t["n_groups"], t["n_violating"], t["max_rhs"],
            t["violation_permille"]) == (2, 1, 2, 500)
    # o_custkey -> o_orderpriority: one group, two priorities
    assert got["orders.o_custkey->o_orderpriority"]["n_violating"] == 1
    # n_regionkey -> n_name: one region, two names
    assert got["nation.n_regionkey->n_name"]["violation_permille"] == 1000


def test_join_cardinality_estimate_formula(spark, sf_dir):
    """PK-FK joins: actual == |FK side with matching keys|; the
    System-R estimate |A|*|B|/max(ndv) must land within 5% on the
    uniform synthetic keys (that's the audit's point)."""
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    rows = {r["join_name"]: r.asDict()
            for r in _x209_join_cardinality_audit(spark, tables).collect()}
    lo = rows["lineitem_orders"]
    # l_orderkey -> o_orderkey is FK->PK: every lineitem matches once
    assert lo["actual_rows"] == tables["lineitem"].count()
    assert lo["est_rows"] == (lo["n_left"] * lo["n_right"]
                              // max(lo["ndv_left"], lo["ndv_right"]))
    assert abs(lo["err_permille"]) <= 50


def test_acf_linear_ramp_slope_is_exactly_one(spark):
    """Hourly counts 1,2,...,8 -> count(t+k) = count(t) + k, so the
    lag-k regression slope is exactly 1.000 for every lag."""
    rows = []
    eid = 0
    for h in range(8):
        for _ in range(h + 1):
            rows.append((eid, h * 3600_000_000, 1, "a", 0.0))
            eid += 1
    e = spark.createDataFrame(rows, "event_id long, us long, user_id long,"
                                    " event_type string, value double") \
        .select("event_id", F.timestamp_micros("us").alias("ts"),
                "user_id", "event_type", "value")
    out = _x211_acf_lags(spark, {"events": e}).collect()
    assert len(out) == 6
    for r in out:
        assert r["ar_milli"] == 1000, r


def test_edge_embeddedness_triangle_plus_pendant(spark):
    """3 identical docs form an LSH triangle (each edge has 1 common
    neighbor); 2 other identical docs form an isolated edge
    (embeddedness 0)."""
    tri = "alpha beta gamma delta epsilon zeta eta theta"
    pend = "one two three four five six seven eight nine"
    docs = _docs(spark, [tri, tri, tri, pend, pend])
    got = {r["embeddedness"]: r["n_edges"]
           for r in _x212_edge_embeddedness(
               spark, {"documents": docs}).collect()}
    assert got == {0: 1, 1: 3}


def test_merkle_diff_localizes_damage(spark, sf_dir):
    """Every reported bucket must actually contain a damaged doc_id
    (dropped %97=13 or mutated %53=7), and every damaged doc's bucket
    must be reported — divergence localization is the operator's whole
    contract."""
    from hive_parse_lineage_spark.audit_queries import (
        _MERKLE_BUCKETS, _x213_merkle_bucket_diff)
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    reported = {r["bucket"] for r in
                _x213_merkle_bucket_diff(spark, tables).collect()}
    damaged = (tables["documents"]
               .filter((F.col("doc_id") % 97 == 13)
                       | (F.col("doc_id") % 53 == 7))
               .select(F.pmod(portable_hash64(
                   F.col("doc_id").cast("string")),
                   F.lit(_MERKLE_BUCKETS)).alias("b")))
    damaged_buckets = {r["b"] for r in damaged.distinct().collect()}
    assert reported == damaged_buckets and reported


def test_zorder_trades_partkey_span_for_suppkey_span(spark, sf_dir):
    """The audit's reason to exist: lexicographic partkey bucketing
    leaves every bucket full-range on suppkey (suppkey predicates
    prune nothing), while z-order collapses the suppkey span sum at
    the cost of a wider partkey span."""
    from hive_parse_lineage_spark.audit_queries import (
        _x214_zorder_clustering)
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    got = {r["scheme"]: r.asDict()
           for r in _x214_zorder_clustering(spark, tables).collect()}
    assert got["zorder"]["suppkey_span_sum"] < got["lex"]["suppkey_span_sum"]
    assert got["lex"]["partkey_span_sum"] < got["zorder"]["partkey_span_sum"]


def test_interarrival_octaves_toy(spark):
    """Gaps of 1us, 2us, 3us, 1s land in octaves 1, 2, 2, 20."""
    rows = [(i, us, 1, "a", 0.0)
            for i, us in enumerate([0, 1, 3, 6, 1_000_006])]
    e = spark.createDataFrame(
        rows, "event_id long, us long, user_id long, event_type string,"
              " value double") \
        .select("event_id", F.timestamp_micros("us").alias("ts"),
                "user_id", "event_type", "value")
    from hive_parse_lineage_spark.audit_queries import (
        _x215_interarrival_octaves)
    got = {r["octave"]: r["n_gaps"]
           for r in _x215_interarrival_octaves(
               spark, {"events": e}).collect()}
    assert got == {1: 1, 2: 2, 20: 1}


def test_hamilton_allocation_sums_to_budget(spark, sf_dir):
    """Largest-remainder apportionment: final allocations must sum to
    EXACTLY the budget and differ from the unrounded share by < 1."""
    from hive_parse_lineage_spark.audit_queries import (
        _HAMILTON_BUDGET, _x219_hamilton_allocation)
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    rows = _x219_hamilton_allocation(spark, tables).collect()
    assert sum(r["final_alloc"] for r in rows) == _HAMILTON_BUDGET
    n = sum(r["n_docs"] for r in rows)
    for r in rows:
        exact = _HAMILTON_BUDGET * r["n_docs"] / n
        assert abs(r["final_alloc"] - exact) < 1.0, r


def test_hazard_table_censoring_toy(spark):
    """3 users: A active weeks 0..2 then gone (churns week 2), B active
    through the end (censored, never churned), C active only week 0
    (churns week 0). Observation end = B's last event."""
    wk = 7 * 24 * 3600 * 1_000_000
    rows = [("A", 0), ("A", 2 * wk + 5), ("B", 0), ("B", 4 * wk + 5),
            ("C", 10)]
    e = spark.createDataFrame(
        [(i, us, u) for i, (u, us) in enumerate(rows)],
        "event_id long, us long, user_id string") \
        .select("event_id", F.timestamp_micros("us").alias("ts"),
                "user_id")
    from hive_parse_lineage_spark.audit_queries import _x220_hazard_table
    got = {r["week"]: r.asDict()
           for r in _x220_hazard_table(spark, {"events": e}).collect()}
    # week 0: all 3 at risk; C churns (lifespan 0, observed 4)
    assert (got[0]["n_at_risk"], got[0]["n_churned"]) == (3, 1)
    # week 2: A and B at risk; A churns
    assert (got[2]["n_at_risk"], got[2]["n_churned"]) == (2, 1)
    # week 4: only B at risk; B is censored (obs_w == life_w) — 0 churn
    assert (got[4]["n_at_risk"], got[4]["n_churned"]) == (1, 0)


def test_deletion_propagation_reconciles(spark, sf_dir):
    """For user-keyed artifacts, rows_after must equal rows_before
    minus the deleted-user residue — the audit's invariant."""
    from hive_parse_lineage_spark.audit_queries import (
        _x217_deletion_propagation)
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    for r in _x217_deletion_propagation(spark, tables).collect():
        assert (r["rows_after_rederive"]
                == r["rows_before"] - r["referencing_deleted"]), r
        assert r["referencing_deleted"] > 0, r


def test_normalizer_is_idempotent_and_counts_collisions(spark):
    """f(f(x)) == f(x) for messy inputs, and the census counts exactly
    the pairs that collide only under normalization."""
    from hive_parse_lineage_spark.audit_queries import (
        _norm_spark, _x221_normalization_collisions)
    messy = ["  Hello,   WORLD!! ", "hello world", "A--B  c",
             "a b C", "unique one"]
    df = spark.createDataFrame([(t,) for t in messy], "t string")
    once = [r["n"] for r in df.select(_norm_spark(F.col("t"))
                                      .alias("n")).collect()]
    twice = [r["n2"] for r in
             spark.createDataFrame([(t,) for t in once], "t string")
             .select(_norm_spark(F.col("t")).alias("n2")).collect()]
    assert once == twice
    docs = spark.createDataFrame(
        [(i + 1, t, "s") for i, t in enumerate(messy)],
        "doc_id long, text string, source string")
    row = _x221_normalization_collisions(
        spark, {"documents": docs}).collect()[0]
    # 5 raw-distinct texts -> 3 normalized ("hello world", "a b c",
    # "unique one") -> 2 collisions
    assert (row["distinct_raw"], row["distinct_norm"],
            row["collisions"]) == (5, 3, 2)


def test_join_output_skew_matches_actual_join(spark, sf_dir):
    """The predicted output contribution (cl * cr per key) must equal
    the ACTUAL join output count per key — predicted without paying
    for the join is the operator's promise."""
    from hive_parse_lineage_spark.audit_queries import (
        _x223_join_output_skew)
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    pred = {r["key"]: r["out_rows"]
            for r in _x223_join_output_skew(spark, tables).collect()}
    li, s, c = tables["lineitem"], tables["supplier"], tables["customer"]
    actual = (li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
              .join(c, F.col("s_nationkey") == F.col("c_nationkey"))
              .groupBy("s_nationkey").agg(F.count("*").alias("n"))
              .collect())
    actual = {r["s_nationkey"]: r["n"] for r in actual}
    for k, v in pred.items():
        assert actual[k] == v, (k, v, actual.get(k))


def test_reciprocal_best_match_tie_and_asymmetry(spark):
    """3 identical docs A,B,C: every best-neighbor points to the
    lowest-id other doc, so A<->B is mutual but C->A is asymmetric
    (A prefers B) and must NOT survive; an isolated identical pair
    D,E is mutual."""
    from hive_parse_lineage_spark.audit_queries import (
        _x210_reciprocal_best_match)
    tri = "alpha beta gamma delta epsilon zeta eta theta"
    pair = "one two three four five six seven eight nine"
    docs = spark.createDataFrame(
        [(1, tri), (2, tri), (3, tri), (4, pair), (5, pair)],
        "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in _x210_reciprocal_best_match(
               spark, {"documents": docs}).collect()}
    assert set(got) == {(1, 2), (4, 5)}
    assert all(v == 1.0 for v in got.values())


def test_label_propagation_chain_majority_and_tie(spark):
    """majority_label_round semantics, toy-pinned: (a) majority wins
    within a blocking group (2 seeds 'beta' beat 1 seed 'alpha');
    (b) a 1-1 tie breaks to the MIN label; (c) labels travel along a
    prefix->suffix CHAIN across the two x224 rounds — a doc with no
    labeled prefix-peer still gets labeled in round 2 through a
    suffix-peer that was labeled in round 1."""
    from pyspark.sql import functions as F

    from hive_parse_lineage_spark.operators.components import (
        majority_label_round)

    rows = [
        # group g1: two 'beta' seeds + one 'alpha' seed + one unlabeled
        (1, "g1", "beta"), (2, "g1", "beta"), (3, "g1", "alpha"),
        (4, "g1", None),
        # group g2: 1-1 tie -> min label 'aa'
        (5, "g2", "zz"), (6, "g2", "aa"), (7, "g2", None),
        # group g3: no seeds -> stays NULL
        (8, "g3", None),
    ]
    df = spark.createDataFrame(rows, "id long, k string, lab string")
    got = {r["id"]: r["lab"]
           for r in majority_label_round(df, "k", "lab").collect()}
    assert got[4] == "beta" and got[7] == "aa" and got[8] is None
    # seeds never change
    assert got[3] == "alpha" and got[5] == "zz"

    # chain: doc 30 shares NO prefix with a seed, but shares a suffix
    # with doc 20, which gets labeled from seed doc 10 in round 1
    docs = spark.createDataFrame(
        [(9, "p q r s t u v w SEEDSIDE"),        # 9 % 3 == 0 -> seed
         (20, "p q r s t u v w x y z m n o END1 END2 END3 END4 E5 E6 E7 E8"),
         (31, "totally different start words here ok yes END1 END2 END3 "
              "END4 E5 E6 E7 E8")],
        "doc_id long, text string")
    docs = docs.withColumn("source", F.lit("curated"))
    from hive_parse_lineage_spark.audit_queries import (
        _x224_label_propagation)
    out = {r["label"]: (r["n_seed"], r["n_after_r1"], r["n_after_r2"])
           for r in _x224_label_propagation(
               spark, {"documents": docs}).collect()}
    # doc 9 seeded; doc 20 adopts via shared 8-token prefix in r1;
    # doc 31 adopts via shared 8-token suffix with 20 in r2
    assert out == {"curated": (1, 2, 3)}


def _py_cdc_chunks(text, w=4, dv=32):
    """Independent reimplementation of the x225 cut rule (hashlib md5
    fold) — the differential anchor for the Spark/DuckDB spellings."""
    import hashlib
    t = text.split(" ")
    n = len(t)
    if n >= w:
        sh = [" ".join(t[i:i + w]) for i in range(n - w + 1)]
    else:
        sh = [text]
    h = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh]
    cuts = [1] + [j + w for j in range(1, len(sh) + 1)
                  if h[j - 1] % dv == 0 and j + w <= n] + [n + 1]
    return [" ".join(t[cuts[m] - 1:cuts[m + 1] - 1])
            for m in range(len(cuts) - 1)]


def test_cdc_chunking_matches_independent_python(spark):
    """x225's Spark chunker must equal the hashlib reimplementation
    chunk-for-chunk, and the census must count the cross-doc shared
    chunk as duplicate mass."""
    import random
    from pyspark.sql import functions as F

    from hive_parse_lineage_spark.audit_queries import (
        _CDC_D, _CDC_W, _x225_cdc_chunking)
    rng = random.Random(7)
    words = "a b c d e f g h i j k l m n o p q r s t u v w".split()
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 200)))
             for _ in range(40)]
    docs = spark.createDataFrame(
        [(i, t, "src%d" % (i % 2)) for i, t in enumerate(texts)],
        "doc_id long, text string, source string")
    # census vs a full python replay
    exp = {}
    chunk_docs = {}
    for i, t in enumerate(texts):
        for c in _py_cdc_chunks(t, _CDC_W, _CDC_D):
            chunk_docs.setdefault(c, set()).add(i)
    for i, t in enumerate(texts):
        src = "src%d" % (i % 2)
        st = exp.setdefault(src, [0, 0, 0, 0])
        for c in _py_cdc_chunks(t, _CDC_W, _CDC_D):
            nt = len(c.split(" "))
            st[0] += 1
            st[1] += nt
            if len(chunk_docs[c]) >= 2:
                st[2] += 1
                st[3] += nt
    got = {r["source"]: (r["n_chunks"], r["tok_mass"], r["n_dup_chunks"],
                         r["dup_tok_mass"])
           for r in _x225_cdc_chunking(spark, {"documents": docs}).collect()}
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_cdc_census_text_keyed_spot_check(spark, tables, sf_dir):
    """r10 ADVICE: x225's dup census keys on the 60-bit fingerprint
    and its oracle replays the same hash, so a collision would inflate
    n_dup_chunks/dup_tok_mass invisibly to the gate — the ~n²/2^61
    exposure was documented but only toy-tested. This re-runs the
    census keyed on the chunk TEXT itself over the real sf0.01 corpus
    and asserts it equals the fingerprint-keyed result, measuring the
    collision-free assumption on real data instead of arguing it."""
    from pyspark.sql import functions as F

    from hive_parse_lineage_spark.audit_queries import (
        _cdc_chunk_stream, _x225_cdc_chunking)
    from hive_parse_lineage_spark.sources.loader import load_tables

    tbls = load_tables(spark, sf_dir)
    ck = _cdc_chunk_stream(tbls)
    dup = ck.groupBy("chunk").agg(F.countDistinct("doc_id").alias("nd"))
    text_keyed = (ck.join(dup, "chunk")
                  .groupBy("source")
                  .agg(F.count("*").alias("n_chunks"),
                       F.sum("n_tok").alias("tok_mass"),
                       F.sum((F.col("nd") >= 2).cast("long"))
                       .alias("n_dup_chunks"),
                       F.sum(F.when(F.col("nd") >= 2, F.col("n_tok"))
                             .otherwise(F.lit(0))).alias("dup_tok_mass")))
    want = {r["source"]: (r["n_chunks"], r["tok_mass"], r["n_dup_chunks"],
                          r["dup_tok_mass"])
            for r in text_keyed.collect()}
    got = {r["source"]: (r["n_chunks"], r["tok_mass"], r["n_dup_chunks"],
                         r["dup_tok_mass"])
           for r in _x225_cdc_chunking(spark, tbls).collect()}
    assert got == want
    assert sum(v[2] for v in want.values()) > 0  # census saw real dups


def test_cdc_chunking_boundary_stability():
    """The CDC selling point: prepending tokens only disturbs chunks
    up to the first cut — every chunk after it is byte-identical, so
    chunk-level dedup survives edits that re-align every fixed-stride
    window."""
    import random
    rng = random.Random(11)
    words = "alpha beta gamma delta eps zeta eta theta iota kappa".split()
    base = " ".join(rng.choice(words) for _ in range(400))
    edited = "NEW TOKENS AT FRONT " + base
    c1 = _py_cdc_chunks(base)
    c2 = _py_cdc_chunks(edited)
    assert len(c1) > 3  # the corpus draw actually produced cuts
    # all base chunks except (at most) the first survive the edit
    assert set(c1[1:]) <= set(c2)


def test_bitmap_distinct_merge_property_and_zero_diff(spark):
    """The bitmap fold is a mergeable monoid: folding two disjoint
    shards separately and bit_or-merging the word tables must give the
    same count as folding the union — and on a toy stream with known
    duplicates the census diff column is 0 everywhere."""
    from pyspark.sql import functions as F

    from hive_parse_lineage_spark.audit_queries import (
        _x226_bitmap_distinct)
    rows = [(i, uid, "t%d" % (uid % 2), 0.0)
            for i, uid in enumerate([1, 1, 2, 63, 63, 64, 125, 200, 200])]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, v double")
    out = {r["event_type"]: r.asDict()
           for r in _x226_bitmap_distinct(
               spark, {"events": ev}).collect()}
    assert all(r["diff"] == 0 for r in out.values())
    # t1: uids 1,1,63,63,125 -> 3 distinct; t0: 2,64,200,200 -> 3
    assert out["t1"]["distinct_bitmap"] == 3
    assert out["t0"]["distinct_bitmap"] == 3
    # merge property: shard by event parity, fold each, OR the words
    words = lambda df: (df.groupBy(F.expr("user_id div 62").alias("b"))
                        .agg(F.expr("bit_or(shiftleft(1L, "
                                    "CAST(user_id % 62 AS INT)))")
                             .alias("bits")))
    a = words(ev.filter("event_id % 2 = 0"))
    b = words(ev.filter("event_id % 2 = 1"))
    merged = (a.unionByName(b).groupBy("b")
              .agg(F.expr("bit_or(bits)").alias("bits"))
              .agg(F.sum(F.bit_count("bits"))).first()[0])
    whole = words(ev).agg(F.sum(F.bit_count("bits"))).first()[0]
    assert merged == whole == 6


def test_zonemap_skips_correlation_contrast(spark):
    """The audit's reason to exist, toy-pinned: a predicate on a
    column CORRELATED with the block order (price grows with
    o_orderkey) skips most blocks, while an equally selective
    predicate on an uncorrelated column (custkey = orderkey*31 %
    1000) skips none — its values span every block's min/max range."""
    from hive_parse_lineage_spark.audit_queries import (
        _ZONEMAP_PREDS, _x227_zonemap_skips)
    rows = [(k, (k * 7919) % 1000, k * 200.0) for k in range(1, 1281)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double")
    out = {r["pred"]: r.asDict()
           for r in _x227_zonemap_skips(spark, {"orders": orders}).collect()}
    # python replay of the block/zone rule
    import math
    mx = 1280
    blocks = {}
    for k, cust, price in rows:
        b = k * 64 // (mx + 1)
        cents = int(math.floor(price * 100))
        mm = blocks.setdefault(b, [cents, cents, cust, cust])
        mm[0], mm[1] = min(mm[0], cents), max(mm[1], cents)
        mm[2], mm[3] = min(mm[2], cust), max(mm[3], cust)
    for name, tag, lo, hi in _ZONEMAP_PREDS:
        i = (0, 1) if tag == "cents" else (2, 3)
        skip = sum(1 for mm in blocks.values()
                   if mm[i[1]] < lo or mm[i[0]] > hi)
        assert out[name]["n_blocks"] == len(blocks)
        assert out[name]["n_skippable"] == skip, name
    # price_band covers orderkey 500..1000 -> a correlated layout
    # skips the majority of blocks
    assert out["price_band"]["skip_permille"] > 400
    assert 0 < out["price_band"]["match_permille"] < 1000
    # cust_low is equally selective (~10%) but the scattered column
    # leaves nearly every block's span straddling the band
    assert out["cust_low"]["skip_permille"] < 300
    assert out["cust_low"]["skip_permille"] < out["price_band"]["skip_permille"]
    assert out["cust_low"]["match_permille"] < 200


def test_x228_packing_matches_python_replay(spark):
    """Toy pin for the sequence-packing arithmetic: a hand-built
    corpus with known token counts, python-replayed against the
    concat-and-chunk rule (exclusive prefix start, crossings =
    (start+n-1)//C - start//C)."""
    from hive_parse_lineage_spark.audit_queries import (
        _PACK_C, _x228_sequence_packing)
    sizes = [700, 100, 300, 512, 1030, 1, 511, 64]
    rows = [(i, "s%d" % (i % 2), " ".join("t%d" % j for j in range(n)))
            for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = {r["source"]: r.asDict()
           for r in _x228_sequence_packing(
               spark, {"documents": docs}).collect()}
    # python replay in doc_id order
    import collections
    start, agg = 0, collections.defaultdict(
        lambda: dict(n_docs=0, tok=0, split=0, seqs=0, mx=0))
    for i, n in enumerate(sizes):
        nc = (start + n - 1) // _PACK_C - start // _PACK_C
        a = agg["s%d" % (i % 2)]
        a["n_docs"] += 1
        a["tok"] += n
        a["split"] += 1 if nc >= 1 else 0
        a["seqs"] += nc + 1
        a["mx"] = max(a["mx"], nc)
        start += n
    for src, a in agg.items():
        got = out[src]
        assert got["n_docs"] == a["n_docs"]
        assert got["tok_mass"] == a["tok"]
        assert got["docs_split"] == a["split"], src
        assert got["seqs_touched"] == a["seqs"], src
        assert got["max_crossings"] == a["mx"], src
        assert got["split_permille"] == a["split"] * 1000 // a["n_docs"]


def test_x229_bloom_no_false_negatives(spark, tables):
    """The Bloom probe may only ever ADD rows over the true
    semi-join: n_pass >= n_true, false_pos >= 0, and a true match
    must always pass (no false negatives by construction)."""
    from hive_parse_lineage_spark.audit_queries import _x229_bloom_semijoin
    row = _x229_bloom_semijoin(spark, tables).collect()[0].asDict()
    assert row["n_pass"] >= row["n_true"]
    assert row["false_pos"] == row["n_pass"] - row["n_true"]
    assert row["false_pos"] >= 0
    assert row["n_probe"] > 0 and row["n_true"] > 0
    # geometry sanity: word table stays broadcast-class
    assert row["n_words"] <= row["m_bits"] // 62 + 1
