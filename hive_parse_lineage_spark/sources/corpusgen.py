"""Synthetic corpus generator as a Spark 4 Python Data Source.

``spark.read.format("corpusgen").option("rows", N)`` materializes a
deterministic documents table of ANY size with zero input IO — the
scale-testing counterpart to ``/root/testdata``'s fixed SFs (the 10x
sweep point unions parquet; this generates 100x+ partition-parallel
with no files at all).

Why a DataSource and not ``spark.range().select(udf)``: partitions()
gives the planner real input partitions (parallelism scales with the
requested size, no repartition), the schema is declared once, and the
source composes with everything downstream exactly like a parquet
table (``df = spark.read.format(...)`` → dedup/LSH/quality operators).

Determinism contract: row content is a pure function of (seed, doc_id)
— independent of partition count — so results are reproducible across
cluster sizes, and duplicate documents are injected at a controlled
rate for dedup-operator testing (every ``dup_every``-th doc repeats
the text of ``doc_id - 1``).
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = ("doc_id bigint, text string, lang string, source string, "
           "n_chars bigint")
_LANGS = ("en", "de", "fr", "es", "zh")
_SOURCES = ("web", "books", "code", "wiki")
# Vocabulary and doc-length ranges matter for realism, not just
# volume: the first cut (400 words, 5-120-token docs) made chance
# 2-shingle Jaccard between unrelated SHORT docs exceed the usual 0.3
# near-dup threshold, so a 500k-doc generate produced genuine
# ~10^4-doc near-dup mega-clusters and every pair-emitting dedup went
# quadratic (73 GB of shuffle before dying). Real corpora have much
# larger vocabularies and longer documents; 2k words / >= 30 tokens
# keeps the Zipf head hot (shared shingles for x41-style stats) while
# chance Jaccard stays far below near-dup thresholds.
_VOCAB = [f"w{i:04d}" for i in range(2000)]

# Zipf(1.1) over the vocabulary via inverse-CDF. The first cut drew
# min(paretovariate, uniform), which put ~88% of ALL tokens on the top
# 5 words — every document became nearly the same bag of five tokens,
# i.e. one corpus-wide genuine near-dup cluster, and pair-emitting
# dedup at 500k generated docs was correctly quadratic (73 GB of
# shuffle). A 1/r^1.1 head (~7% on the top word) keeps shared-shingle
# statistics realistic without making unrelated docs near-duplicates.
_CUM = []
_acc = 0.0
for _r in range(1, len(_VOCAB) + 1):
    _acc += 1.0 / _r ** 1.1
    _CUM.append(_acc)
_TOT = _CUM[-1]


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _mix(*parts: int) -> int:
    """Deterministic integer seed from components (tuple seeds were
    removed from random.Random in Python 3.11)."""
    h = 0
    for p in parts:
        h = (h * 1_000_003 + p) & 0xFFFFFFFFFFFFFFFF
    return h


def _doc_text(seed: int, doc_id: int) -> str:
    import bisect

    rnd = random.Random(_mix(seed, doc_id))
    n_words = rnd.randint(30, 120)
    return " ".join(
        _VOCAB[bisect.bisect_left(_CUM, rnd.random() * _TOT)]
        for _ in range(n_words))


class CorpusGenDataSource(DataSource):
    """Options: rows (default 1000), partitions (default 8),
    seed (default 42), dup_every (default 10; 0 disables)."""

    @classmethod
    def name(cls) -> str:
        return "corpusgen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "CorpusGenReader":
        return CorpusGenReader(self.options)


class CorpusGenReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))
        self.dup_every = int(options.get("dup_every", 10))

    def partitions(self):
        step = -(-self.rows // self.n_parts)
        return [_Range(s, min(s + step, self.rows))
                for s in range(0, self.rows, step)]

    def read(self, partition: _Range):
        seed, dup = self.seed, self.dup_every
        for i in range(partition.start, partition.end):
            src_id = i - 1 if (dup and i % dup == 0 and i > 0) else i
            text = _doc_text(seed, src_id)
            rnd = random.Random(_mix(seed, i, 7919))
            yield (i, text, rnd.choice(_LANGS), rnd.choice(_SOURCES),
                   len(text))


def register(spark) -> None:
    """Idempotent ``spark.dataSource.register`` for the generator."""
    spark.dataSource.register(CorpusGenDataSource)
