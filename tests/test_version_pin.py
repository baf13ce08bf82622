"""Runtime-version pins for empirically-derived constants.

x190's oracle replays the micro-batch engine's late-data FILTER
watermark, which lags the progress-reported watermark by
X190_FILTER_LAG_BATCHES — observed behavior of the installed Spark,
not a documented contract. On a Spark upgrade this ONE test fails
with instructions, instead of a silently-changed lag turning the
whole x190 gate red with no pointer to the cause (r8 verdict ask #8).
"""

import pyspark

from hive_parse_lineage_spark.analytics_queries import (
    X190_FILTER_LAG_BATCHES, X190_PINNED_SPARK)


def test_x190_filter_lag_pinned_against_installed_spark():
    assert pyspark.__version__ == X190_PINNED_SPARK, (
        f"Installed Spark {pyspark.__version__} != {X190_PINNED_SPARK}, "
        f"the release X190_FILTER_LAG_BATCHES={X190_FILTER_LAG_BATCHES} "
        "was derived on (analytics_queries.py). Re-derive the filter "
        "lag: run x190's stream with the new Spark, compare kept rows "
        "per batch against the oracle for lag candidates 0/1/2, set "
        "X190_FILTER_LAG_BATCHES to the matching value, then update "
        "X190_PINNED_SPARK.")
