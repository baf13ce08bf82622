"""Streaming near-duplicate detection: arriving documents vs a static
corpus (stream-static LSH join).

The landing-zone admission filter at 100 TB: the standing corpus's
MinHash band buckets are computed ONCE (batch, persisted/bucketed by
band hash in production), and each micro-batch of new documents is
banded by a pure projection — `minhash_signature` (array transform,
no aggregation) + `_band_buckets` without a cap (explode only) — so
the streaming side is fully stateless and append-legal. The equi-join
on (band, band_hash) against the static side co-locates each arriving
doc with only the corpus buckets it could collide with; corpus-vs-
corpus pairs are never generated and no streaming state accumulates.

A pair that collides in several bands is emitted once per band (the
rows are identical); exact-once pair delivery belongs to the
downstream idempotent sink (foreachBatch MERGE — `operators/merge.py`)
or a batch `dropDuplicates`, not to the stream operator, which would
otherwise need unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hive_parse_lineage_spark.operators.dedup import (
    _band_buckets, _est_jaccard, minhash_signature, minhash_signature_agg)


def corpus_band_buckets(corpus_docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n_hashes: int = 64,
                        bands: int = 16, shingle_k: int = 3,
                        seed: int = 42, hasher=None,
                        max_bucket_size: int | None = 1000) -> DataFrame:
    """The static side, built once per corpus snapshot. The hot-bucket
    cap applies HERE (boilerplate accumulates in the corpus, and a
    capped static side bounds every future micro-batch's join fanout).
    """
    sig = minhash_signature_agg(corpus_docs.select(id_col, text_col),
                                text_col=text_col, id_col=id_col,
                                n_hashes=n_hashes, shingle_k=shingle_k,
                                seed=seed, hasher=hasher)
    return _band_buckets(sig, id_col, n_hashes, bands, max_bucket_size)


def stream_near_dup_matches(stream_docs: DataFrame,
                            corpus_buckets: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            threshold: float = 0.5,
                            n_hashes: int = 64, bands: int = 16,
                            shingle_k: int = 3, seed: int = 42,
                            hasher=None,
                            repartition: int | None = None) -> DataFrame:
    """``stream_docs`` may be a streaming DataFrame. Emits
    ``(new_id, corpus_id, est_jaccard)`` for every arriving document
    whose estimated Jaccard vs some corpus document clears
    ``threshold``. Stateless: signature + banding are projections, the
    join's static side is ``corpus_buckets``.

    ``repartition`` fans each micro-batch out before signing/banding.
    A file-source micro-batch arrives with the FILE's partitioning
    (often 1-2 splits), and without a shuffle the whole band-collision
    verify stage — the dominant cost when boilerplate buckets fan out
    — runs on those few tasks; result-identical, but at sf1.0 the
    2-task spelling exceeded 300 s where the fanned-out one takes ~77 s
    (the 100 TB posture: a landing-zone batch is processed by the
    whole cluster, not by however many files it arrived in).
    """
    if repartition:
        stream_docs = stream_docs.repartition(repartition)
    sig = (minhash_signature(stream_docs.select(id_col, text_col),
                             text_col=text_col, n_hashes=n_hashes,
                             shingle_k=shingle_k, seed=seed, hasher=hasher)
           .select(id_col, "minhash"))
    nb = _band_buckets(sig, id_col, n_hashes, bands, None).alias("l")
    cb = corpus_buckets.alias("r")
    pairs = (nb.join(cb, (F.col("l.band") == F.col("r.band"))
                     & (F.col("l.band_hash") == F.col("r.band_hash")))
             .select(F.col(f"l.{id_col}").alias("new_id"),
                     F.col(f"r.{id_col}").alias("corpus_id"),
                     F.col("l.minhash").alias("mh_a"),
                     F.col("r.minhash").alias("mh_b")))
    return (pairs.select("new_id", "corpus_id",
                         _est_jaccard(n_hashes).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold))
