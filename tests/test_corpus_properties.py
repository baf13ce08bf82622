"""Randomized property tests for corpus operators: connected
components vs a union-find oracle on random graphs, and chunking vs a
pure-Python slicing oracle — seeded, so failures reproduce."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from hive_parse_lineage_spark.operators.components import connected_components
from hive_parse_lineage_spark.operators.corpus import chunk_documents
from tests.test_corpus import _union_find


@pytest.mark.parametrize("seed", [7, 21, 1234])
def test_connected_components_random_graphs(spark, seed):
    rnd = random.Random(seed)
    n = 40
    edges = sorted({tuple(sorted(rnd.sample(range(n), 2)))
                    for _ in range(rnd.randrange(5, 60))})
    verts = list(range(n))
    edf = spark.createDataFrame(edges, "id_a: long, id_b: long")
    vdf = spark.createDataFrame([(v,) for v in verts], "vertex: long")
    got = {r["vertex"]: r["component"]
           for r in connected_components(edf, vertices=vdf).collect()}
    assert got == _union_find(edges, verts)


@pytest.mark.parametrize("seed", [3, 99])
def test_chunking_matches_python_slicing(spark, seed):
    rnd = random.Random(seed)
    chunk, stride = 16, 12
    docs, expect = [], {}
    for doc_id in range(8):
        n = rnd.randrange(1, 80)
        toks = [f"w{doc_id}_{i}" for i in range(n)]
        docs.append(Row(doc_id=doc_id, text=" ".join(toks)))
        n_chunks = 1 + max(0, -(-(n - chunk) // stride))  # 1 + ceil
        for c in range(n_chunks):
            piece = toks[c * stride: c * stride + chunk]
            expect[(doc_id, c)] = (len(piece), " ".join(piece))
    got = {(r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
           for r in chunk_documents(spark.createDataFrame(docs),
                                    chunk_tokens=chunk,
                                    stride=stride).collect()}
    assert got == expect
