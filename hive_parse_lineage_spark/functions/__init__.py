from hive_parse_lineage_spark.functions import text, vector  # noqa: F401
