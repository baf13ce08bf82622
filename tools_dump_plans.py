"""Dump .explain('formatted') for the declared surface + touched corpus
entries into an output dir. Run from a repo root (sys.path[0]); usage:
    python tools_dump_plans.py OUTDIR SUFFIX
Writes OUTDIR/<query>_<SUFFIX>.txt. Bench confs applied so the plans
show exactly what the bench executes (including the declared-surface
partition sizing when present in that checkout).
"""
import io
import os
import sys
from contextlib import redirect_stdout

root = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, root)
outdir, suffix = sys.argv[1], sys.argv[2]
os.makedirs(outdir, exist_ok=True)

from pyspark.sql import SparkSession

from hive_parse_lineage_spark.session import RUNTIME_CONFS
import bench as B

cpus = min(os.cpu_count() or 4, 16)
b = (SparkSession.builder.master(f"local[{cpus}]").appName("plans")
     .config("spark.driver.memory", "8g").config("spark.ui.enabled", "false")
     .config("spark.sql.shuffle.partitions", str(cpus)))
for k, v in {**RUNTIME_CONFS, **B.BENCH_CONFS}.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from hive_parse_lineage_spark.queries import DECLARED_QUERIES
from hive_parse_lineage_spark.sources.loader import TABLES, load_tables

sf_dir = "/root/testdata/sf0.1"
load_tables(spark, sf_dir)

# declared-surface pass confs, exactly as this checkout's bench sets
# them (r13: shared helper; older checkouts fall back to the inline
# static rule their bench_spark carried)
if hasattr(B, "declared_pass_confs"):
    for k, v in B.declared_pass_confs(sf_dir, cpus).items():
        spark.conf.set(k, v)
elif "declared_parts" in open(os.path.join(root, "bench.py")).read():
    in_bytes = sum(os.path.getsize(os.path.join(sf_dir, f"{t}.parquet"))
                   for t in TABLES)
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(max(1, -(-in_bytes // (128 << 20)))))

def dump(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(buf.getvalue())

for name, sql in DECLARED_QUERIES.items():
    dump(name, spark.sql(sql))

# corpus surface runs at the corpus partition setting
spark.conf.set("spark.sql.shuffle.partitions",
               B.BENCH_CONFS["spark.sql.shuffle.partitions"])
qmap = B._corpus_query_map()
TOUCHED = [
    "x07_minhash_near_dup", "x08_simhash_near_dup", "x10_lsh_knn",
    "x35_embedding_near_dup", "x46_dup_clusters", "x59_dedup_keep_one",
    "x64_incremental_dedup", "x79_ann_recall", "x119_minhash_calibration",
    "x51_embedding_quantize", "x62_embedding_centroids",
    "x122_quantized_recall", "x132_vocab_growth", "x152_qq_alignment",
    "x176_rendezvous_sharding",
    "x164_lsh_precision", "x173_dedup_quota",
    "x196_dedup_method_census", "x02_lang_id", "x208_fd_violations",
]
for name in TOUCHED:
    if name in qmap:
        try:
            dump(name, qmap[name](spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — plan dump is best-effort
            print(f"SKIP {name}: {ex}", file=sys.stderr)
print(f"dumped to {outdir} suffix={suffix}")
