"""Rank corpus entries by DataFrame BUILD time (py4j construction) —
the driver-side cost the profiler showed is ~50% of LSH-entry walls.
No execution; relative ranking is the product."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from hive_parse_lineage_spark.session import RUNTIME_CONFS

builder = (SparkSession.builder.master("local[4]").appName("buildprof")
           .config("spark.driver.memory", "8g")
           .config("spark.ui.enabled", "false")
           .config("spark.ui.showConsoleProgress", "false"))
for k, v in RUNTIME_CONFS.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from bench import _corpus_query_map
from hive_parse_lineage_spark.sources.loader import load_tables

sf_dir = "/root/testdata/sf0.1"
load_tables(spark, sf_dir)

qmap = _corpus_query_map()
out = {}
for name, fn in sorted(qmap.items()):
    fn(spark, sf_dir)  # warm (imports, load_tables cache)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 4)

rows = sorted(out.items(), key=lambda kv: -kv[1])
print(json.dumps(rows[:60], indent=0))
print("TOTAL_BUILD_SECONDS", round(sum(out.values()), 2), "N", len(out))
json.dump(out, open("/tmp/build_times.json", "w"))
