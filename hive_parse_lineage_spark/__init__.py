"""hive_parse_lineage_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference project
``complone/hive-parse-lineage`` (a Hive-SQL column-level lineage
extractor, see SURVEY.md) on top of Apache Spark:

- **Query execution**: the full SQL surface the reference understands
  (joins of every type, aggregation incl. ROLLUP/CUBE/GROUPING SETS,
  window functions, set ops, subqueries, DDL/DML classification) is
  *executed* here via Spark SQL / the DataFrame API, not merely parsed.
- **Column-level lineage**: a traversal of the Catalyst *analyzed*
  logical plan emitting ``ColLine`` edges — the reference's data model
  (``entity/ColLine.java:12-31``) re-derived from Spark's resolved
  attributes instead of a hand-rolled ANTLR AST walk.
- **LLM-data-pipeline operators**: dedup (exact, MinHash-LSH, SimHash),
  vector similarity search, text analysis, multimodal column plumbing —
  designed for 100 TB scale (partitioning documented per operator).

Everything here is built only from public knowledge: the Apache Spark /
PySpark API and the reference repo read at ``/root/reference``.
"""

__version__ = "0.1.0"

from hive_parse_lineage_spark.engine import Engine  # noqa: F401
from hive_parse_lineage_spark.session import get_spark  # noqa: F401
