"""r13 A/B: declared-surface shuffle sizing — static counts vs AQE
coalescing (the r12 verdict's ask #1). Same methodology as bench_spark
(warm-up pass + min-of-3, collect/toPandas chosen at warm-up), one
fresh subprocess per variant so each gets the same cold JVM. Prints
one JSON line per variant; per-query times land in /tmp/ab2_*.json.

Run interleaved (A, B, C, A, B, C) with AB2_ROUNDS=2 to separate host
drift from the conf effect.
"""
import json
import os
import subprocess
import sys

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

VARIANTS = {
    # r12 shipped rule at sf0.1: AQE off, 1 shuffle partition
    "p1_r12": {"spark.sql.shuffle.partitions": "1"},
    # r13 candidate rule at sf0.1/32 cores: AQE coalescing ON, initial
    # = max(ceil(bytes/128MB), min(cpus, ceil(bytes/4MB))) = 7
    "aqe_rule": {"spark.sql.adaptive.enabled": "true",
                 "spark.sql.shuffle.partitions": "7"},
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
load_tables(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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

rounds = int(os.environ.get("AB2_ROUNDS", "2"))
results: dict[str, list] = {n: [] for n in VARIANTS}
for rnd in range(rounds):
    for name, confs in VARIANTS.items():
        env = {**os.environ, "AB_CONFS": json.dumps(confs),
               "SPARK_GRAFT_CPUS": CPUS}
        p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True)
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if line:
            d = json.loads(line[-1])
            results[name].append(d)
            print(json.dumps({"round": rnd, "variant": name,
                              "total": d["total"], "passes": d["passes"]}),
                  flush=True)
        else:
            print(name, "FAILED", p.stderr[-800:], flush=True)

# min across rounds per query per variant
summary = {}
for name, runs in results.items():
    if not runs:
        continue
    times = {}
    for d in runs:
        for q, t in d["times"].items():
            times[q] = min(times.get(q, t), t)
    summary[name] = {"total": round(sum(times.values()), 3), "times": times}
json.dump(summary, open("/tmp/ab2_summary.json", "w"), indent=1)
focus = ("q12_join_full", "q17_join_multiway_agg", "q25_window_rank",
         "q26_window_lag_lead", "q18_agg_groupby", "q19_agg_count_distinct",
         "q39_tumbling_window", "q40_topk_per_key")
hdr = "query".ljust(26) + "".join(n.rjust(12) for n in summary)
print(hdr)
for q in focus:
    print(q.ljust(26) + "".join(
        f"{summary[n]['times'][q]:12.3f}" for n in summary))
print("TOTAL".ljust(26) + "".join(
    f"{summary[n]['total']:12.3f}" for n in summary))
