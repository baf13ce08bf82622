"""A/B the declared 43-query surface under candidate bench confs.

Same methodology as bench_spark (warm-up pass + min-of-3, collect or
toPandas chosen at warm-up), one fresh subprocess per variant so each
gets the same cold JVM. Prints one JSON line per variant.
"""
import json
import os
import subprocess
import sys

VARIANTS = {
    "current_p4": {},
    "p2": {"spark.sql.shuffle.partitions": "2"},
    "p1": {"spark.sql.shuffle.partitions": "1"},
    "p8": {"spark.sql.shuffle.partitions": "8"},
    "aqe_on_p16": {"spark.sql.adaptive.enabled": "true",
                   "spark.sql.shuffle.partitions": "16",
                   "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m"},
}

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
extra = json.loads(os.environ["AB_CONFS"])
from pyspark.sql import SparkSession
from hive_parse_lineage_spark.session import RUNTIME_CONFS
from bench import BENCH_CONFS, _timed_passes
from hive_parse_lineage_spark.queries import DECLARED_QUERIES
from hive_parse_lineage_spark.sources.loader import load_tables
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 16)
b = (SparkSession.builder.master(f"local[{cpus}]").appName("ab")
     .config("spark.driver.memory", "16g").config("spark.ui.enabled", "false")
     .config("spark.sql.shuffle.partitions", str(cpus)))
for k, v in {**RUNTIME_CONFS, **BENCH_CONFS, **extra}.items():
    b = b.config(k, v)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, "/root/testdata/sf0.1")
big = set()
def warm(name, sql):
    pdf = spark.sql(sql).toPandas()
    if len(pdf) > 5000: big.add(name)
    return len(pdf)
def run(name, sql):
    df = spark.sql(sql)
    return len(df.toPandas()) if name in big else len(df.collect())
times, passes = _timed_passes(run, dict(DECLARED_QUERIES), 3, warm_run=warm)
print(json.dumps({"total": round(sum(times.values()), 3),
                  "passes": passes, "times": times}))
"""

for name, confs in VARIANTS.items():
    env = {**os.environ, "AB_CONFS": json.dumps(confs)}
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True)
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    if line:
        d = json.loads(line[-1])
        print(json.dumps({"variant": name, "total": d["total"],
                          "passes": d["passes"]}))
        json.dump(d, open(f"/tmp/ab_{name}.json", "w"))
    else:
        print(name, "FAILED", p.stderr[-500:])
