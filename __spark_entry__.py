"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_parse_lineage_spark.queries import DECLARED_QUERIES
from hive_parse_lineage_spark.sources.loader import load_tables


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(sql)
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q17, TPC-H Q3 shape: 3-way join + agg + top-k) on sf0.001."""
    load_tables(spark, "/root/testdata/sf0.001")
    return spark.sql(DECLARED_QUERIES["q17_join_multiway_agg"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _sql_query(sql) for name, sql in DECLARED_QUERIES.items()
    }
    try:
        from hive_parse_lineage_spark.extra_queries import extra_queries
        out.update(extra_queries())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.corpus_queries import corpus_queries
        out.update(corpus_queries())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.pipeline_queries import pipeline_queries
        out.update(pipeline_queries())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.analytics_queries import analytics_queries
        out.update(analytics_queries())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.audit_queries import audit_queries
        out.update(audit_queries())
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry."""
    out = dict(DECLARED_QUERIES)
    try:
        from hive_parse_lineage_spark.extra_queries import extra_oracle_sql
        out.update(extra_oracle_sql())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.corpus_queries import corpus_oracle_sql
        out.update(corpus_oracle_sql())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.pipeline_queries import pipeline_oracle_sql
        out.update(pipeline_oracle_sql())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.analytics_queries import analytics_oracle_sql
        out.update(analytics_oracle_sql())
    except ImportError:
        pass
    try:
        from hive_parse_lineage_spark.audit_queries import audit_oracle_sql
        out.update(audit_oracle_sql())
    except ImportError:
        pass
    return out
