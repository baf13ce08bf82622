"""Stage-level dissection of the LSH family's shared cost (x07 shape).

Splits one corpus entry's wall into: DataFrame build (py4j), analysis+
optimization (driver, Catalyst), and execution (noop sink), per guide
section 1 (measure first) and 7.3 (driver-side planning). Run on a quiet
box; prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from hive_parse_lineage_spark.session import RUNTIME_CONFS

BENCH_CONFS = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "4",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1000000",
    "spark.ui.showConsoleProgress": "false",
}

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 16)
builder = (SparkSession.builder.master(f"local[{cpus}]").appName("profile")
           .config("spark.driver.memory", "16g")
           .config("spark.ui.enabled", "false")
           .config("spark.sql.shuffle.partitions", str(cpus)))
for k, v in {**RUNTIME_CONFS, **BENCH_CONFS}.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from hive_parse_lineage_spark.sources.loader import load_tables

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
tables = load_tables(spark, sf_dir)


def dissect(build_fn, n=3):
    """build -> analyze/optimize -> execute, timed separately, min-of-n."""
    out = {}
    # warm-up executes once so codegen/JIT are charged to nobody
    build_fn().collect()
    for _ in range(n):
        t0 = time.perf_counter()
        df = build_fn()
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # analysis+optimization+planning
        t2 = time.perf_counter()
        df.collect()
        t3 = time.perf_counter()
        for key, dt in (("build", t1 - t0), ("plan", t2 - t1),
                        ("exec_after_plan", t3 - t2), ("total", t3 - t0)):
            out[key] = round(min(out.get(key, 1e9), dt), 4)
    return out


from pyspark.sql import functions as F

from hive_parse_lineage_spark.functions.text import portable_hash64
from hive_parse_lineage_spark.operators.dedup import (
    lsh_candidate_pairs, minhash_near_dups, minhash_signature_agg)

docs = tables["documents"]

res = {}
res["sig_only"] = dissect(lambda: minhash_signature_agg(
    docs, "text", "doc_id", 64, 3, 42, portable_hash64))
res["full_x07"] = dissect(lambda: minhash_near_dups(
    docs, threshold=0.7, n_hashes=64, bands=16, shingle_k=3,
    hasher=portable_hash64, max_bucket_size=None))


def pairs_no_dropdup():
    sig = minhash_signature_agg(docs, "text", "doc_id", 64, 3, 42,
                                portable_hash64)
    from hive_parse_lineage_spark.operators.dedup import _band_buckets
    b = _band_buckets(sig, "doc_id", 64, 16, None)
    l, r = b.alias("l"), b.alias("r")
    return (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.band_hash") == F.col("r.band_hash"))
                   & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("id_a"),
                    F.col("r.doc_id").alias("id_b")))


res["pairs_no_dropdup"] = dissect(pairs_no_dropdup)

# x208-shape: 10 unioned tiny aggregates — pure fixed-overhead probe
from hive_parse_lineage_spark.audit_queries import _x208_fd_violations
res["x208"] = dissect(lambda: _x208_fd_violations(spark, tables))

# declared q26 shape for reference
res["q26"] = dissect(lambda: spark.sql(
    "SELECT o_orderkey, LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev, "
    "LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt "
    "FROM orders ORDER BY o_orderkey"))

print(json.dumps(res, indent=1))
