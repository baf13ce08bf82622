"""Partition-count invariance: a distributed operator whose OUTPUT
depends on the partitioning is silently nondeterministic at cluster
scale (AQE re-plans, executors come and go, inputs re-split). The
hash/sampling/dedup surface must produce byte-identical results no
matter how the data is partitioned — this runs representative registry
entries under two different shuffle-partition settings and wildly
different input splits and compares value hashes."""

from __future__ import annotations

import pytest

from tests.oracle import value_hash

# the entries whose plans contain hash-dependent routing (LSH bands,
# salting, sampled buckets, hash splits) — the ones that WOULD break
# first if any stage picked up partition-dependent state
INVARIANCE_QUERIES = [
    "x07_minhash_near_dup",     # LSH banding + dedup of pairs
    "x39_hash_split",           # deterministic train/val/test routing
    "x52_salted_agg",           # explicit-salt two-stage aggregation
    "x61_stratified_sample",    # salted-hash per-stratum sampling
    "x70_hot_key_split_join",   # broadcast hot path + shuffle tail union
    "x74_weighted_sample",      # hash-thresholded fractional epochs
    "x77_bloom_decontaminate",  # bloom bit routing via double hashing
    "x78_semdedup",             # centroid argmax + within-cell pair drop
    "x80_mmr_diversify",        # greedy argmax rounds over checkpointed pools
    "x82_oov_rate",             # global top-k vocabulary cutoff
    "x88_bm25_topk",            # float ranking + rank-boundary ties
    "x90_segment_dedup_rebuild",  # global keep-first over segment windows
    "x92_pmi_collocations",     # TakeOrdered top-20 with integer ties
    "x93_novelty_curve",        # id-range buckets + first-seen minima
    "x94_packing_efficiency",   # hash shards + running-sum pack ids
    "x100_dup_pagerank",        # iterative integer updates over LSH edges
    "x101_training_manifest",   # hash-split routing + floored shares
    "x103_conversion_window",   # desc-ordered window frames + keep-first
    "x104_cms_heavy_hitters",   # salted-hash sketch cells
    "x105_ppjoin_exact",        # frequency-ordered prefixes + pair joins
    "x106_event_transitions",   # per-user LEAD over (ts, event_id) order
    "x108_kmv_distinct",        # k-th smallest hash per source (WindowGroupLimit)
    "x110_quality_auc",         # doubled ranks over the score histogram
    "x113_split_ks_drift",      # hash-split routing + running CDF gap
    "x141_entropy_bits",        # window totals over a shuffled count
    "x142_bigram_surprise",     # TakeOrdered top-20 with integer ties
    "x144_rbo_rank_stability",  # two rank windows with tie-breaks
    "x145_principal_direction",  # Arrow-batch partials summed across splits
    "x147_bag_dedup_lift",      # md5 group windows across arbitrary splits
    "x149_dup_graph_triangles",  # LSH banding + oriented-edge closure
]


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_result_invariant_to_partitioning(spark, sf_dir, name):
    import __spark_entry__ as e

    q = e.queries()[name]
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        h3 = value_hash(q(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        h29 = value_hash(q(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert h3 == h29, f"{name} output depends on shuffle partitioning"
