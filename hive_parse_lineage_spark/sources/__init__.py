from hive_parse_lineage_spark.sources.loader import TABLES, load_tables, read_table  # noqa: F401
