from hive_parse_lineage_spark.streaming import windows  # noqa: F401
