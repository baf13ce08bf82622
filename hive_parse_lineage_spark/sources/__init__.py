from hive_parse_lineage_spark.sources.loader import TABLES, load_tables, read_table  # noqa: F401
from hive_parse_lineage_spark.sources.partitioned import (  # noqa: F401
    overwrite_partitions, read_partitioned, write_partitioned)
