"""Rank corpus entries by DataFrame BUILD time (py4j construction) —
the driver-side cost the profiler showed is ~50% of LSH-entry walls.
No execution; relative ranking is the product.

r13: also counts the Spark JOBS each build triggers — an entry whose
body eagerly localCheckpoints (the cluster family) runs real compute
inside fn() and its 'build' seconds are execution, not py4j; the
fusion candidates are the rows with jobs == 0 (pure Column-tree
construction)."""
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

tracker = spark.sparkContext.statusTracker()


def _n_jobs() -> int:
    ids = tracker.getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


qmap = _corpus_query_map()
out = {}
for name, fn in sorted(qmap.items()):
    fn(spark, sf_dir)  # warm (imports, load_tables cache)
    best, jobs = 1e9, 0
    for _ in range(2):
        j0 = _n_jobs()
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        best = min(best, time.perf_counter() - t0)
        jobs = _n_jobs() - j0
    out[name] = {"build": round(best, 4), "jobs": jobs}

pure = {n: v["build"] for n, v in out.items() if v["jobs"] == 0}
eager = {n: v for n, v in out.items() if v["jobs"] > 0}
rows = sorted(pure.items(), key=lambda kv: -kv[1])
print("PURE-BUILD (jobs==0) top 60:")
print(json.dumps(rows[:60], indent=0))
print("PURE_BUILD_SECONDS", round(sum(pure.values()), 2), "N", len(pure))
print("EAGER (jobs>0):",
      json.dumps(sorted(((n, v["build"], v["jobs"]) for n, v in
                         eager.items()), key=lambda r: -r[1])[:25],
                 indent=0))
print("TOTAL_BUILD_SECONDS",
      round(sum(v["build"] for v in out.values()), 2), "N", len(out))
json.dump(out, open("/tmp/build_times.json", "w"))
