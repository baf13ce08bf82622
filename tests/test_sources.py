"""Source/sink coverage: INSERT/CTAS readback (SURVEY §2b Sink row),
format round-trips, partitioned writes + partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ctas_and_insert_readback(spark, tables):
    spark.sql("DROP TABLE IF EXISTS rsink")
    spark.sql("CREATE TABLE rsink AS SELECT r_regionkey, r_name FROM region")
    assert spark.table("rsink").count() == 5
    spark.sql("INSERT INTO rsink SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3")
    assert spark.table("rsink").count() == 8
    # positional binding: INSERT maps by position, not name
    spark.sql("INSERT INTO rsink SELECT 99, 'ZZZ'")
    got = spark.sql("SELECT r_name FROM rsink WHERE r_regionkey = 99").first()
    assert got["r_name"] == "ZZZ"
    spark.sql("DROP TABLE rsink")


def test_insert_overwrite(spark, tables):
    spark.sql("DROP TABLE IF EXISTS osink")
    spark.sql("CREATE TABLE osink AS SELECT r_regionkey FROM region")
    spark.sql("INSERT OVERWRITE osink SELECT n_nationkey FROM nation")
    assert spark.table("osink").count() == 25
    spark.sql("DROP TABLE osink")


def test_hive_multi_insert_executes(spark, tables):
    """The reference's signature construct — one FROM source, several
    INSERT branches (LineParser.java:200-214, the one-TOK_QUERY /
    many-TOK_INSERT shape) — must actually RUN, not just lineage-walk
    (r10 verdict ask #5). Spark SQL supports the Hive multi-insert
    syntax natively; this executes a two-branch statement over two
    DISTINCT targets and readback-checks each branch independently,
    including a per-branch WHERE (each branch filters the shared
    source on its own predicate)."""
    spark.sql("DROP TABLE IF EXISTS mi_a")
    spark.sql("DROP TABLE IF EXISTS mi_b")
    spark.sql("CREATE TABLE mi_a (tk DOUBLE, tv BIGINT) USING parquet")
    spark.sql("CREATE TABLE mi_b (sv BIGINT) USING parquet")
    spark.sql(
        "FROM nation "
        "INSERT INTO mi_a SELECT n_nationkey AS k, n_regionkey AS v "
        "  WHERE n_nationkey < 10 "
        "INSERT INTO mi_b SELECT n_nationkey * 100 AS m "
        "  WHERE n_nationkey >= 20")
    a = spark.sql(
        "SELECT count(*) AS n, sum(tk) AS sk, sum(tv) AS sv FROM mi_a"
    ).first()
    # branch 1: nations 0..9 positionally bound onto (tk, tv)
    assert (a["n"], a["sk"]) == (10, float(sum(range(10))))
    exp_sv = spark.sql(
        "SELECT sum(n_regionkey) AS s FROM nation WHERE n_nationkey < 10"
    ).first()["s"]
    assert a["sv"] == exp_sv
    # branch 2: nations 20..24 through its own projection
    b = spark.sql("SELECT count(*) AS n, sum(sv) AS s FROM mi_b").first()
    assert (b["n"], b["s"]) == (5, sum(k * 100 for k in range(20, 25)))
    spark.sql("DROP TABLE mi_a")
    spark.sql("DROP TABLE mi_b")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tables, tmp_path, fmt):
    src = (tables["nation"]
           .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey"))
    path = str(tmp_path / f"rt_{fmt}")
    w = src.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)
    r = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        r = r.schema("n_nationkey int, n_name string, n_regionkey int")
    if fmt == "csv":
        r = r.option("header", True)
    back = r.load(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_write_prunes(spark, tables, tmp_path):
    path = str(tmp_path / "part_events")
    from hive_parse_lineage_spark.sources.loader import read_table
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry a PartitionFilters entry on
    # event_type, and read only the matching directory
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    want = ev.filter(F.col("event_type") == 'click').count()
    assert back.count() == want


def test_filter_and_projection_pushdown(spark, sf_dir):
    """Scan-level pushdown: the parquet reader must receive the filter
    and a pruned schema (100 TB: the difference between reading 2
    columns and reading 11)."""
    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .filter(F.col("l_orderkey") == 1).select("l_orderkey", "l_quantity"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]" in plan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" in rs and "l_extendedprice" not in rs


def test_compact_parquet_dir_reduces_files(spark, tmp_path):
    """Many tiny files -> ~target-sized files, rows preserved,
    no shuffle (coalesce) when shrinking."""
    from hive_parse_lineage_spark.sources.maintenance import (
        compact_parquet_dir, dir_file_sizes)
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    assert len(dir_file_sizes(src)) == 64
    total = sum(dir_file_sizes(src))
    n = compact_parquet_dir(spark, src, dst, target_file_bytes=total // 4 + 1)
    assert n <= 4
    assert spark.read.parquet(dst).count() == 10_000


def test_write_sorted_parquet_files_have_disjoint_ranges(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions yields files whose
    footer min/max ranges are disjoint -> file-level data skipping."""
    from hive_parse_lineage_spark.sources.maintenance import (
        parquet_file_stats, write_sorted_parquet)
    out = str(tmp_path / "sorted")
    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    write_sorted_parquet(df, out, ["k"], n_files=4)
    stats = parquet_file_stats(out, columns=["k"])
    assert sum(s["rows"] for s in stats) == 20_000
    ranges = sorted(s["columns"]["k"] for s in stats if s["rows"])
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint: a predicate touches exactly one file


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """Malformed JSONL lines land in quarantine with the raw text;
    clean rows parse with the declared schema — nothing lost, nothing
    fails."""
    from hive_parse_lineage_spark.sources.textio import read_jsonl, split_corrupt
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        'this is not json at all\n'
        '{"doc_id": 3, "text": "trailing\n'   # truncated record
        '{"doc_id": 4, "text": "fine"}\n')
    df = read_jsonl(spark, str(p), "doc_id long, text string")
    clean, bad = split_corrupt(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 4]
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)


def test_write_jsonl_shards_roundtrip(spark, tmp_path):
    """Sharded gzip JSONL export: shard count from rows_per_shard,
    readable back with identical rows."""
    import glob
    from hive_parse_lineage_spark.sources.textio import write_jsonl_shards
    out = str(tmp_path / "shards")
    df = spark.range(0, 1000).selectExpr("id AS doc_id",
                                         "concat('t', id) AS text")
    write_jsonl_shards(df, out, rows_per_shard=250)
    files = glob.glob(out + "/part-*.json.gz")
    assert len(files) == 4
    back = spark.read.schema("doc_id long, text string").json(out)
    assert back.count() == 1000
    assert back.filter("text = 't999'").count() == 1


def test_zorder_write_tightens_both_dimensions(spark, tmp_path):
    """Z-order clusters BOTH columns: every file's min/max range on
    each dimension is a fraction of the global range — single-column
    sort only tightens the leading column."""
    from hive_parse_lineage_spark.sources.maintenance import (
        parquet_file_stats, write_sorted_parquet, zorder_write)
    df = spark.sql("""
        SELECT x, y FROM (SELECT explode(sequence(0, 127)) AS x)
        LATERAL VIEW explode(sequence(0, 127)) t AS y""")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(df, zpath, ["x", "y"], n_files=16, bits=7)

    def avg_frac(path, col, full):
        fr = [(s["columns"][col][1] - s["columns"][col][0]) / full
              for s in parquet_file_stats(path, [col]) if s["rows"]]
        return sum(fr) / len(fr)

    # 16 files over a 128x128 grid: the curve's quadrant blocks keep the
    # AVERAGE per-file range ~1/3 of global on BOTH dims (files that
    # straddle a quadrant boundary legitimately span wider)
    assert avg_frac(zpath, "x", 127) <= 0.45
    assert avg_frac(zpath, "y", 127) <= 0.45
    # contrast: x-sorted files leave y at the FULL range
    write_sorted_parquet(df, spath, ["x"], n_files=16)
    assert avg_frac(spath, "y", 127) > 0.9
    assert spark.read.parquet(zpath).count() == 128 * 128


def test_corpusgen_datasource_deterministic_and_parallel(spark):
    """The Python Data Source generates identical rows regardless of
    partition count (content is a pure function of seed+doc_id), scans
    with the requested parallelism, and injects duplicates at the
    declared rate for dedup testing."""
    from hive_parse_lineage_spark.sources.corpusgen import register
    register(spark)

    def load(parts):
        return (spark.read.format("corpusgen")
                .option("rows", 300).option("partitions", parts).load())

    a = sorted(tuple(r) for r in load(8).collect())
    b = sorted(tuple(r) for r in load(3).collect())
    assert a == b and len(a) == 300
    assert load(8).rdd.getNumPartitions() == 8
    # every 10th doc repeats its predecessor's text
    texts = {r["doc_id"]: r["text"] for r in load(8).collect()}
    assert texts[10] == texts[9] and texts[20] == texts[19]
    assert texts[11] != texts[10]


def test_corpusgen_feeds_dedup_operators(spark):
    """Generated corpus flows through the engine's operators like any
    table: exact dedup finds exactly the injected duplicate pairs."""
    from hive_parse_lineage_spark.operators.dedup import exact_dedup
    from hive_parse_lineage_spark.sources.corpusgen import register
    register(spark)
    docs = (spark.read.format("corpusgen")
            .option("rows", 200).option("dup_every", 10).load())
    groups = exact_dedup(docs)
    dups = groups.filter("n_copies > 1")
    # docs 10,20,...,190 duplicate their predecessors -> 19 groups of 2
    assert dups.count() == 19
    assert groups.count() == 200 - 19


def test_read_csv_clean_quarantines_bad_rows(spark, tmp_path):
    """CSV rows that fail the declared schema land in quarantine; the
    clean side parses typed."""
    from hive_parse_lineage_spark.sources.textio import (
        read_csv_clean, split_corrupt)
    p = tmp_path / "docs.csv"
    p.write_text("doc_id,score\n1,0.5\n2,not_a_number\n3,0.9\n")
    df = read_csv_clean(spark, str(p), "doc_id long, score double")
    clean, bad = split_corrupt(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 3]
    raws = [r["raw_line"] for r in bad.collect()]
    assert raws == ["2,not_a_number"]


_LOAD_DATA_SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
wd = tempfile.mkdtemp(prefix="hiveload_")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]").appName("load-data-e2e")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.warehouse.dir", os.path.join(wd, "wh"))
         .config("spark.hadoop.javax.jdo.option.ConnectionURL",
                 "jdbc:derby:;databaseName=" + wd + "/metastore;create=true")
         .enableHiveSupport().getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hive_parse_lineage_spark.engine import Engine
eng = Engine(spark, register_tables=False)
spark.sql("CREATE TABLE load_tgt (id INT, name STRING) STORED AS TEXTFILE")
src = os.path.join(wd, "data.txt")
with open(src, "w") as f:
    f.write("1\x01alpha\n2\x01beta\n")
sql = "LOAD DATA LOCAL INPATH '%s' INTO TABLE load_tgt" % src
rep = eng.tables_report(sql)          # lineage BEFORE execution
eng.run_script(sql)                   # execute through the engine
rows = sorted((r["id"], r["name"])
              for r in spark.sql("SELECT * FROM load_tgt").collect())
# OVERWRITE variant replaces, not appends
with open(src, "w") as f:
    f.write("7\x01gamma\n")
eng.run_script("LOAD DATA LOCAL INPATH '%s' OVERWRITE INTO TABLE load_tgt"
               % src)
rows2 = sorted((r["id"], r["name"])
               for r in spark.sql("SELECT * FROM load_tgt").collect())
print("MARK", rows == [(1, "alpha"), (2, "beta")],
      rows2 == [(7, "gamma")],
      rep["operations"] == ["LOAD"],
      rep["output_tables"] == ["default.load_tgt"])
"""


def test_load_data_inpath_executes_and_lineage_records_target(tmp_path):
    """LOAD DATA INPATH end-to-end (ref LineParser.java:316-318, #10):
    the engine executes it against a Hive-format table (append and
    OVERWRITE), and lineage classifies the statement LOAD with the
    target as an output table. Runs in a subprocess because
    catalogImplementation=hive is a static conf the shared test
    session can't adopt."""
    import subprocess
    import sys
    script = tmp_path / "load_data_e2e.py"
    script.write_text(_LOAD_DATA_SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        cwd=str(tmp_path), timeout=300)
    marks = [l for l in proc.stdout.splitlines() if l.startswith("MARK")]
    assert marks and marks[-1] == "MARK True True True True", (
        proc.stdout[-2000:], proc.stderr[-2000:])


def test_engine_run_script_executes_in_order(spark, tmp_path, tables):
    """run_script executes statements sequentially (quote-aware split)
    and returns the final statement's DataFrame."""
    from hive_parse_lineage_spark.engine import Engine
    eng = Engine(spark, register_tables=False)
    out = eng.run_script(
        "CREATE OR REPLACE TEMPORARY VIEW rs_v AS "
        "SELECT 1 AS a, ';' AS semi; "
        "SELECT a, semi FROM rs_v")
    rows = out.collect()
    assert rows == [(1, ";")] or [tuple(r) for r in rows] == [(1, ";")]
    spark.sql("DROP VIEW IF EXISTS rs_v")


# --- Hive-style partitioned layout + ORC (sources/partitioned.py) ---------

def test_partitioned_write_prunes_at_planning_time(spark, tables, tmp_path):
    """A filter on the partition column must appear as PartitionFilters
    on the scan (directory pruning, no file opens for other
    partitions) and the pruned scan must read strictly fewer files
    than the table holds."""
    import os

    from hive_parse_lineage_spark.sources.partitioned import (
        read_partitioned, write_partitioned)
    path = str(tmp_path / "events_by_type")
    write_partitioned(tables["events"].select("event_id", "ts", "value",
                                              "event_type"),
                      path, ["event_type"])
    parts = [d for d in os.listdir(path) if d.startswith("event_type=")]
    assert len(parts) >= 2
    df = read_partitioned(spark, path).filter(F.col("event_type") == "view")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    assert df.count() == tables["events"].filter("event_type = 'view'").count()
    read_files = {r[0] for r in
                  df.select(F.input_file_name()).distinct().collect()}
    assert all("event_type=view" in f for f in read_files)


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tables,
                                                           tmp_path):
    """INSERT OVERWRITE one partition (Hive dynamic semantics): the
    rewritten partition has the new rows, every other partition is
    byte-identical (same files, same sizes)."""
    import os

    from hive_parse_lineage_spark.sources.partitioned import (
        overwrite_partitions, read_partitioned, write_partitioned)
    path = str(tmp_path / "docs_by_lang")
    docs = tables["documents"].select("doc_id", "n_chars", "lang")
    write_partitioned(docs, path, ["lang"])

    def files_of(lang):
        d = os.path.join(path, f"lang={lang}")
        return {f: os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d) if not f.startswith(("_", "."))}

    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    target, untouched = langs[0], langs[1]
    before_other = files_of(untouched)
    replacement = (docs.filter(F.col("lang") == target)
                   .withColumn("n_chars", F.lit(-1).cast("long")).limit(10))
    overwrite_partitions(replacement, path, ["lang"])
    out = read_partitioned(spark, path)
    assert out.filter(F.col("lang") == target).count() == 10
    assert (out.filter(F.col("lang") == target)
            .agg(F.max("n_chars")).first()[0] == -1)
    assert files_of(untouched) == before_other
    assert (out.filter(F.col("lang") == untouched).count()
            == docs.filter(F.col("lang") == untouched).count())
    # the scoped conf was restored: session default is still static
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "STATIC").upper() == "STATIC"


def test_orc_round_trip_with_pushdown_and_pruning(spark, tables, tmp_path):
    """ORC (Hive's default storage format): values round-trip exactly,
    predicate pushdown reaches the ORC scan, and partition pruning
    works identically to parquet."""
    from hive_parse_lineage_spark.sources.partitioned import (
        read_partitioned, write_partitioned)
    path = str(tmp_path / "orders_orc")
    orders = tables["orders"].select("o_orderkey", "o_totalprice",
                                     "o_orderstatus")
    write_partitioned(orders, path, ["o_orderstatus"], fmt="orc")
    back = read_partitioned(spark, path, fmt="orc")
    assert back.count() == orders.count()
    assert (back.agg(F.sum("o_orderkey")).first()[0]
            == orders.agg(F.sum("o_orderkey")).first()[0])
    df = back.filter((F.col("o_totalprice") > 50000)
                     & (F.col("o_orderstatus") == "F"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    assert "PushedFilters" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1][:300]
    assert "PartitionFilters" in plan
    exp = orders.filter("o_totalprice > 50000 AND o_orderstatus = 'F'")
    assert df.count() == exp.count()


def test_scan_parallelism_guard_spreads_single_row_group(spark, tmp_path):
    """A single-row-group parquet pins the whole scan stage — and every
    codegen-fused per-row expression — to ONE task regardless of cores
    (measured: x36's shingle scan, 26 s on 1 task vs ~2 s spread).
    The loader guard must insert a deterministic hash repartition for
    heavy-payload tables in that layout, and must short-circuit when
    the file is already splittable or too small to matter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_parse_lineage_spark.sources.loader import (
        _scan_parallelism_guard)

    par = spark.sparkContext.defaultParallelism
    n = 64 * par + 10

    # one row group, enough rows -> guard repartitions to `par`
    one = str(tmp_path / "one.parquet")
    pq.write_table(pa.table({"doc_id": list(range(n))}), one,
                   row_group_size=n)
    df = spark.read.parquet(one)
    guarded = _scan_parallelism_guard(spark, one, "documents", df)
    assert "RepartitionByExpression" in guarded._jdf.queryExecution() \
        .logical().toString()
    assert guarded.rdd.getNumPartitions() == par
    assert guarded.count() == n

    # already-splittable layout (row groups >= cores) -> untouched
    many = str(tmp_path / "many.parquet")
    pq.write_table(pa.table({"doc_id": list(range(n))}), many,
                   row_group_size=max(1, n // (par * 2)))
    df2 = spark.read.parquet(many)
    assert _scan_parallelism_guard(spark, many, "documents", df2) is df2

    # tiny table (under 64 rows/core) -> not worth an exchange
    tiny = str(tmp_path / "tiny.parquet")
    pq.write_table(pa.table({"doc_id": list(range(63 * par))}), tiny,
                   row_group_size=63 * par)
    df3 = spark.read.parquet(tiny)
    assert _scan_parallelism_guard(spark, tiny, "documents", df3) is df3


def test_load_tables_cache_reuses_and_invalidates(spark, tmp_path):
    """load_tables caches the parquet handles per (session, dir, file
    signature) — repeat calls must return the SAME DataFrame objects
    (the r12 bench fix: ~1 s of footer re-reads inside every timed
    corpus entry), and a rewrite of any file must invalidate the entry
    so stale schemas/listings can never be served."""
    import os
    import time as _time

    from hive_parse_lineage_spark.sources.loader import load_tables

    d = str(tmp_path / "sf")
    os.makedirs(d)
    src = "/root/testdata/sf0.001"
    import shutil
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        shutil.copy(os.path.join(src, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"))
    first = load_tables(spark, d)
    again = load_tables(spark, d)
    assert first["region"] is again["region"], "cache must hit on repeat"
    n0 = first["region"].count()
    # rewrite one file (self-copy with a bumped mtime) -> new handles
    _time.sleep(0.01)
    os.utime(os.path.join(d, "region.parquet"))
    third = load_tables(spark, d)
    assert third["region"] is not first["region"], \
        "file rewrite must invalidate the cached handle"
    assert third["region"].count() == n0
    # view re-registration after invalidation serves the new handle
    assert spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"] == n0
