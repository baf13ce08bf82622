from hive_parse_lineage_spark.operators import dedup, similarity  # noqa: F401
