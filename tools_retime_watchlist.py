"""r13 cross-round re-time (r12 verdict ask #4): x179/x210/x184/x31
regressed 28-41% driver-to-driver on single timed passes with
structurally unchanged plans. Adjudicate with the bench's own
symmetric min-of-3 treatment applied CROSS-ROUND: alternate fresh
cold-JVM subprocesses between the current tree and the
pre-optimization tree (3fee819, the r12 round-start), 3 passes per
tree, warm-up + 1 timed pass per subprocess (the corpus bench's exact
per-entry methodology), min across passes per tree.

Usage: python tools_retime_watchlist.py [OLD_TREE_DIR]
       (default /tmp/r12pre — create with
        git worktree add --detach /tmp/r12pre 3fee819)
"""
import json
import os
import subprocess
import sys

ENTRIES = ("x179_psi_drift", "x210_reciprocal_best_match",
           "x184_pq_adc", "x31_asof_join")
PASSES = 3

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["RT_TREE"])
from pyspark.sql import SparkSession
from hive_parse_lineage_spark.session import RUNTIME_CONFS
from bench import BENCH_CONFS, _corpus_query_map
from hive_parse_lineage_spark.sources.loader import load_tables
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 16)
b = (SparkSession.builder.master(f"local[{cpus}]").appName("retime")
     .config("spark.driver.memory", "16g").config("spark.ui.enabled", "false")
     .config("spark.sql.shuffle.partitions", str(cpus)))
for k, v in {**RUNTIME_CONFS, **BENCH_CONFS}.items():
    b = b.config(k, v)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
load_tables(spark, sf_dir)
names = json.loads(os.environ["RT_ENTRIES"])
qmap = _corpus_query_map()
walls = {}
for name in names:
    qmap[name](spark, sf_dir).collect()        # warm-up (JIT + codegen)
    t0 = time.perf_counter()
    qmap[name](spark, sf_dir).collect()        # the bench's timed shape
    walls[name] = round(time.perf_counter() - t0, 4)
print("RT " + json.dumps(walls))
"""

old_tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r12pre"
here = os.path.dirname(os.path.abspath(__file__))
out: dict = {"metric": "retime_watchlist", "unit": "sec",
             "entries": list(ENTRIES), "passes": PASSES,
             "trees": {"now": here, "r12_prestart": old_tree},
             "pass_walls": {"now": [], "r12_prestart": []}}
for p in range(PASSES):
    for label, tree in (("now", here), ("r12_prestart", old_tree)):
        env = {**os.environ, "RT_TREE": tree,
               "RT_ENTRIES": json.dumps(list(ENTRIES))}
        proc = subprocess.run([sys.executable, "-c", CHILD], env=env,
                              capture_output=True, text=True)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("RT ")]
        if not lines:
            print(label, "FAILED", proc.stderr[-800:], flush=True)
            sys.exit(1)
        walls = json.loads(lines[-1][3:])
        out["pass_walls"][label].append(walls)
        print(json.dumps({"pass": p, "tree": label, **walls}), flush=True)

for name in ENTRIES:
    now = min(w[name] for w in out["pass_walls"]["now"])
    old = min(w[name] for w in out["pass_walls"]["r12_prestart"])
    out.setdefault("min_of_passes", {})[name] = {
        "now": now, "r12_prestart": old,
        "now_over_prestart": round(now / old, 3) if old else None}
print(json.dumps(out["min_of_passes"], indent=1))
json.dump(out, open("/tmp/retime_watchlist.json", "w"), indent=1,
          sort_keys=True)
