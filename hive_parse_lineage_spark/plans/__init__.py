from hive_parse_lineage_spark.plans.lineage import (  # noqa: F401
    ColLine,
    ScriptLineage,
    StatementLineage,
    extract_lineage,
    split_statements,
)
