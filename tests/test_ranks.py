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
