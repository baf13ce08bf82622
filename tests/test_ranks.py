"""operators/ranks.py + the from-shingles MinHash path (x196's diet).

Contract under test: the range-partitioned rank is VALUE-IDENTICAL to
the single-partition global window it replaces, and the from-shingles
signature is VALUE-IDENTICAL to the raw-text aggregate — these are the
two substitutions that let x196 tokenize once and never sort through
one task, so equality (not similarity) is the bar.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_parse_lineage_spark.operators.dedup import (
    minhash_signature_agg, minhash_signature_from_shingles)
from hive_parse_lineage_spark.operators.ranks import (
    range_partitioned_row_number)


def test_range_rank_equals_global_window(spark, sf_dir):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.substring("text", 1, 16).alias("k16")))
    got = range_partitioned_row_number(docs, ["k16", "doc_id"], "rk",
                                       num_ranges=7)
    want = docs.withColumn(
        "rk", F.row_number().over(Window.orderBy("k16", "doc_id"))
        .cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_range_rank_dense_and_unique(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 13).alias("key"), F.col("id").alias("pk"))
    rk = range_partitioned_row_number(df, ["key", "pk"], "rk",
                                      num_ranges=5)
    stats = rk.agg(F.min("rk").alias("lo"), F.max("rk").alias("hi"),
                   F.countDistinct("rk").alias("n")).first()
    assert (stats["lo"], stats["hi"], stats["n"]) == (1, 1000, 1000)


def test_range_rank_plan_has_no_single_partition_window(spark, sf_dir):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.substring("text", 1, 16).alias("k16")))
    plan = (range_partitioned_row_number(docs, ["k16", "doc_id"], "rk")
            ._jdf.queryExecution().executedPlan().toString())
    # the window must be keyed by the range-partition id, and nothing
    # may collapse the data to one partition
    assert "SinglePartition" not in plan
    assert "_rpid" in plan


def test_from_shingles_signature_matches_agg(spark, sf_dir):
    from hive_parse_lineage_spark.functions.text import (
        portable_hash64, word_shingles)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(300))
    via_text = minhash_signature_agg(docs, hasher=portable_hash64,
                                     shingle_k=2)
    shingled = docs.select(
        "doc_id", F.array_distinct(word_shingles("text", 2)).alias("shs"))
    via_shingles = minhash_signature_from_shingles(
        shingled, hasher=portable_hash64)
    joined = (via_text.alias("a")
              .join(via_shingles.alias("b"), "doc_id")
              .select(F.col("a.minhash").alias("ma"),
                      F.col("b.minhash").alias("mb")))
    assert joined.count() == 300
    assert joined.filter(F.col("ma") != F.col("mb")).count() == 0


def test_x179_approx_decile_flag_rank_error_bound(spark, sf_dir,
                                                  monkeypatch):
    """The flag-on percentile_approx path honors its documented
    contract against the exact spelling: each approx edge's RANK in
    the population is within n/X179_APPROX_ACCURACY rows of the exact
    decile rank — and the flag-on x179 still returns a structurally
    valid PSI report (10 buckets, permilles summing to ~1000 per
    side)."""
    from hive_parse_lineage_spark.analytics_queries import (
        X179_APPROX_ACCURACY, _decile_edges, _x179_psi_drift)
    from hive_parse_lineage_spark.sources.loader import load_tables

    tables = load_tables(spark, sf_dir)
    d = tables["documents"].select(
        "doc_id", F.col("n_chars").cast("long").alias("v"))
    mx = d.agg(F.max("doc_id").alias("mx"))
    old = (d.crossJoin(F.broadcast(mx))
           .select("v", (F.col("doc_id") * 2 <= F.col("mx"))
                   .alias("is_old"))
           .filter("is_old"))
    n = old.count()

    monkeypatch.delenv("SPARK_GRAFT_APPROX_QUANTILES", raising=False)
    exact = _decile_edges(old, "v")
    monkeypatch.setenv("SPARK_GRAFT_APPROX_QUANTILES", "1")
    approx = _decile_edges(old, "v")
    assert len(exact) == len(approx) == 9

    # rank(x) = #rows with v < x; the sketch's promise is on ranks,
    # not values (heavy ties make value distance meaningless)
    tol = max(1, n // X179_APPROX_ACCURACY) + 1
    for i, (ev, av) in enumerate(zip(exact, approx), start=1):
        target = i * (n // 10)
        rk = old.filter(F.col("v") < int(av)).count()
        rk_hi = old.filter(F.col("v") <= int(av)).count()
        # av's rank interval [rk, rk_hi] must approach the target
        assert rk - tol <= target <= rk_hi + tol, (
            f"edge {i}: exact={ev} approx={av} rank=[{rk},{rk_hi}] "
            f"target={target} tol={tol}")

    # flag-on end-to-end x179 stays a sane PSI report
    out = _x179_psi_drift(spark, tables).collect()
    assert len(out) == 10
    p_sum = sum(r["p_permille"] for r in out)
    q_sum = sum(r["q_permille"] for r in out)
    assert abs(p_sum - 1000) <= 10 and abs(q_sum - 1000) <= 10


def test_ntile_from_rank_matches_sql_ntile(spark):
    """Closed-form NTILE-from-rank must be bit-identical to
    ntile(b) over (order by ...) across remainder shapes, including
    n < buckets."""
    from hive_parse_lineage_spark.operators.ranks import (
        bucket_start_offset, ntile_from_rank)
    for n, b in [(10, 4), (12, 4), (13, 4), (3, 4), (1, 4), (100, 7),
                 (8, 8), (9, 8)]:
        df = spark.range(1, n + 1).select(F.col("id").alias("v"))
        want = df.select(
            "v", F.ntile(b).over(Window.orderBy("v")).cast("bigint")
            .alias("t")).collect()
        got = (df.withColumn("rk", F.row_number().over(
                   Window.orderBy("v")).cast("bigint"))
               .select("v", ntile_from_rank("rk", n, b).alias("t"))
               .collect())
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), (n, b)
        # offsets: rows preceding bucket t == count of rows in buckets
        # < t under the same split
        from collections import Counter
        sizes = Counter(r["t"] for r in want)
        off = (df.withColumn("rk", F.row_number().over(
                   Window.orderBy("v")).cast("bigint"))
               .select(ntile_from_rank("rk", n, b).alias("t"))
               .distinct()
               .select("t", bucket_start_offset("t", n, b).alias("o"))
               .collect())
        for r in off:
            assert r["o"] == sum(sizes[t] for t in sizes if t < r["t"]), \
                (n, b, r)


def _flag_on_off(fn, spark, tables, monkeypatch):
    import os
    monkeypatch.delenv("SPARK_GRAFT_APPROX_QUANTILES", raising=False)
    off = sorted(map(tuple, fn(spark, tables).collect()))
    monkeypatch.setenv("SPARK_GRAFT_APPROX_QUANTILES", "1")
    on = sorted(map(tuple, fn(spark, tables).collect()))
    monkeypatch.delenv("SPARK_GRAFT_APPROX_QUANTILES", raising=False)
    return off, on


def test_x162_x188_flag_paths_value_identical(spark, sf_dir,
                                              monkeypatch):
    """The SPARK_GRAFT_APPROX_QUANTILES=1 at-scale spellings of x162
    (curriculum NTILE + schedule position) and x188 (three RFM NTILEs)
    use range-partitioned ranks + closed-form NTILE arithmetic and
    must be VALUE-IDENTICAL to the global-window gate spellings —
    equality, not similarity, is the bar (unlike x179's sketch path,
    nothing here approximates)."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x162_curriculum_schedule, _x188_rfm_segments)
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    for fn in (_x162_curriculum_schedule, _x188_rfm_segments):
        off, on = _flag_on_off(fn, spark, tables, monkeypatch)
        assert off == on, fn.__name__


def test_range_running_max_equals_global_window(spark, sf_dir):
    """range_partitioned_running_max must equal the single-partition
    running-max window bit-for-bit — including when the maximum value
    arrives in the FIRST range (every later range reads it from the
    prefix carry) and when values repeat."""
    from hive_parse_lineage_spark.operators.ranks import (
        range_partitioned_running_max)
    from hive_parse_lineage_spark.sources.loader import load_tables
    ev = (load_tables(spark, sf_dir)["events"]
          .select("event_id", F.unix_micros("ts").alias("t")))
    got = range_partitioned_running_max(ev, ["event_id"], "t", "rm",
                                        num_ranges=7)
    w = (Window.orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = ev.withColumn("rm", F.max("t").over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # adversarial shape: global max first, then descending — every
    # range after the first must carry the prefix max
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (1000 - F.col("id")).alias("v"))
    got2 = range_partitioned_running_max(df, ["k"], "v", "rm",
                                         num_ranges=9)
    assert got2.filter(F.col("rm") != 1000).count() == 0


def test_x95_x152_x155_x187_x200_flag_paths_value_identical(
        spark, sf_dir, monkeypatch):
    """The remaining global-window gate spellings converted this round
    (x95 quality-dup ntile, x152 QQ global deciles, x155 gaps-islands
    rank, x187 running-max lateness, x200 quantile-normalize global
    rank) must be VALUE-IDENTICAL under SPARK_GRAFT_APPROX_QUANTILES=1
    — these swaps are exact, not sketches, so equality is the bar."""
    from hive_parse_lineage_spark.analytics_queries import (
        _x152_qq_alignment, _x155_gaps_islands, _x187_watermark_lateness,
        _x200_quantile_normalize)
    from hive_parse_lineage_spark.pipeline_queries import (
        _x95_quality_dup_calibration)
    from hive_parse_lineage_spark.sources.loader import load_tables
    tables = load_tables(spark, sf_dir)
    for fn in (_x95_quality_dup_calibration, _x152_qq_alignment,
               _x155_gaps_islands, _x187_watermark_lateness,
               _x200_quantile_normalize):
        off, on = _flag_on_off(fn, spark, tables, monkeypatch)
        assert off == on, fn.__name__


def test_simhash_agg_matches_projection(spark, sf_dir):
    """simhash_agg (explode + 64 SUM registers, the x08 hot path) must
    be BIT-IDENTICAL to the array-fold projection variant — same
    hash, same vote threshold (2*ones > T <=> signed vote > 0),
    including the sign bit."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import (
        simhash, simhash_agg)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(300))
    a = simhash(docs, hasher=portable_hash64).select(
        "doc_id", F.col("simhash").alias("sa"))
    b = simhash_agg(docs, hasher=portable_hash64)
    j = a.join(b, "doc_id")
    assert j.count() == 300
    assert j.filter(F.col("sa") != F.col("simhash")).count() == 0


def test_simhash_agg_keeps_null_and_empty_docs(spark):
    """ADVICE r8: explode of a NULL token array dropped the doc from
    simhash_agg output while the projection variant kept it. Both
    variants must now emit one row per input doc with identical
    signatures: NULL array -> NULL simhash, empty array -> 0, and a
    genuine NULL ELEMENT inside a non-empty array hashes like the
    projection's transform() does."""
    from hive_parse_lineage_spark.operators.dedup import (
        simhash, simhash_agg)
    rows = [(1, "alpha beta gamma"), (2, None), (3, "alpha beta"),
            (4, "solo")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # token_expr cases: null array, empty array, null element
    tok = F.when(F.col("doc_id") == 2, F.lit(None).cast("array<string>")) \
           .when(F.col("doc_id") == 4, F.array().cast("array<string>")) \
           .when(F.col("doc_id") == 3,
                 F.array(F.lit("alpha"), F.lit(None).cast("string"))) \
           .otherwise(F.split(F.col("text"), " "))
    a = simhash(docs, token_expr=tok).select(
        "doc_id", F.col("simhash").alias("sa"))
    b = simhash_agg(docs, token_expr=tok)
    assert b.count() == 4  # no doc vanishes
    j = a.join(b, "doc_id", "full").collect()
    assert len(j) == 4
    for r in j:
        assert r["sa"] == r["simhash"], (r["doc_id"], r["sa"], r["simhash"])
    by_id = {r["doc_id"]: r["simhash"] for r in j}
    assert by_id[2] is None      # NULL array -> NULL signature
    assert by_id[4] == 0         # empty array -> all-zero signature


def test_running_max_nan_matches_window(spark):
    """ADVICE r9: the driver-side prefix fold used Python `m > acc`,
    which drops a NaN range-max (nan > x is False) while Spark's
    window max treats NaN as greater than everything. With a NaN
    range maximum early in the order, the range-partitioned spelling
    must still agree row-for-row with the global-window spelling."""
    import math

    from hive_parse_lineage_spark.operators.ranks import (
        range_partitioned_running_max)
    rows = [(i, float("nan") if i == 7 else float(i % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    got = {r["id"]: r["rm"]
           for r in range_partitioned_running_max(
               df, ["id"], "v", "rm", num_ranges=8).collect()}
    w = (Window.orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r["id"]: r["rm"]
            for r in df.select("id", F.max("v").over(w).alias("rm"))
            .collect()}
    assert set(got) == set(want)
    for k in want:
        if math.isnan(want[k]):
            assert math.isnan(got[k]), k
        else:
            assert got[k] == want[k], k


def test_running_sum_matches_window(spark):
    """range_partitioned_running_sum must equal the single-partition
    running-sum window exactly — including NULL addends (skipped by
    both paths) and leading-NULL prefixes (NULL until the first
    non-null value, like the window spelling)."""
    from hive_parse_lineage_spark.operators.ranks import (
        range_partitioned_running_sum)
    rows = [(i, None if i % 7 == 3 else int(i * 11 % 97))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    got = {r["id"]: r["rs"]
           for r in range_partitioned_running_sum(
               df, ["id"], "v", "rs", num_ranges=9).collect()}
    w = (Window.orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r["id"]: r["rs"]
            for r in df.select("id", F.sum("v").over(w).alias("rs"))
            .collect()}
    assert got == want
    # leading-NULL prefix: rows before the first value stay NULL
    df2 = spark.createDataFrame(
        [(0, None), (1, None), (2, 5), (3, None), (4, 7)],
        "id bigint, v bigint")
    got2 = {r["id"]: r["rs"]
            for r in range_partitioned_running_sum(
                df2, ["id"], "v", "rs", num_ranges=3).collect()}
    assert got2 == {0: None, 1: None, 2: 5, 3: 5, 4: 12}
