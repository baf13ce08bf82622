"""Oracle-differential tests: every declared query (SURVEY §2b Q01-Q43)
must hash-match DuckDB on sf0.01 — the primary correctness gate."""

from __future__ import annotations

import pytest

from hive_parse_lineage_spark.queries import DECLARED_QUERIES


@pytest.mark.parametrize("name", list(DECLARED_QUERIES))
def test_declared_query_matches_oracle(name, spark, tables, duck):
    from tests.oracle import compare
    sql = DECLARED_QUERIES[name]
    res = compare(spark.sql(sql), sql, duck)
    assert res["hash_match"], res


def _extra_oracle_names():
    from hive_parse_lineage_spark.extra_queries import extra_oracle_sql
    return sorted(extra_oracle_sql())


@pytest.mark.parametrize("name", _extra_oracle_names())
def test_extra_query_matches_oracle(name, spark, tables, sf_dir, duck):
    from tests.oracle import compare
    from hive_parse_lineage_spark.extra_queries import extra_oracle_sql, extra_queries
    res = compare(extra_queries()[name](spark, sf_dir),
                  extra_oracle_sql()[name], duck)
    assert res["hash_match"], res


def _corpus_oracle_names():
    from hive_parse_lineage_spark.corpus_queries import corpus_oracle_sql
    return sorted(corpus_oracle_sql())


@pytest.mark.parametrize("name", _corpus_oracle_names())
def test_corpus_query_matches_oracle(name, spark, tables, sf_dir, duck):
    from tests.oracle import compare
    from hive_parse_lineage_spark.corpus_queries import (
        corpus_oracle_sql, corpus_queries)
    res = compare(corpus_queries()[name](spark, sf_dir),
                  corpus_oracle_sql()[name], duck)
    assert res["hash_match"], res


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns == ["l_orderkey", "revenue", "odate"]


def test_queries_oracle_keys_align():
    import __spark_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
