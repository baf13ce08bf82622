"""Parquet table loader for the testdata star schema.

Replaces the reference's entire metadata/datasource subsystem
(``conf/``, ``datasource/``, ``type/``, ``utils/DataSourceUtils.java`` —
~600 LoC of JDBC pool + dialect SPI plumbing): Spark *is* its own
catalog, so "register a table" is one ``createOrReplaceTempView``.

Scale note: these are plain parquet scans — Catalyst pushes filters and
prunes columns into the file source, so downstream queries only pay for
what they touch. At 100 TB the same loader works unchanged provided the
data is directory-partitioned; partition pruning then composes with the
pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_parse_lineage_spark.session import configure

#: the ten driver-generated tables (TESTDATA.md)
TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: tables whose per-row payload is compute-heavy (text tokenization /
#: shingling, vector math, JSON parsing) — the ones where a
#: parallelism-starved scan serializes real work, not just IO.
_HEAVY_PAYLOAD_TABLES = frozenset({"documents", "embeddings", "events"})

#: partitioning key per heavy table (unique → uniform hash spread;
#: hash repartition is deterministic, unlike round-robin).
_HEAVY_PAYLOAD_KEY = {"documents": "doc_id", "embeddings": "vec_id",
                      "events": "event_id"}


def _scan_parallelism_guard(spark: SparkSession, path: str,
                            name: str, df: DataFrame) -> DataFrame:
    """Repartition a heavy-payload table whose file cannot split.

    A parquet row group is Spark's atomic scan unit: a file with fewer
    row groups than cores pins the whole scan stage — and, under
    whole-stage codegen, every fused per-row expression (shingling,
    ``array_distinct``, JSON extraction, vector arithmetic) — to that
    many tasks. Upstream writers produce such files routinely (DuckDB's
    default row group is 122 880 rows, so any export under that is ONE
    group; pandas/pyarrow default even larger). Measured here: x36's
    3-shingle repetition scan over 50k docs in a 1-row-group file ran
    26 s single-threaded vs ~2 s spread over 16 cores.

    Guard rule: for documents/embeddings/events only (per-row compute
    dominates; dims and facts do light work per row and parallelize at
    their first shuffle anyway), when the footer shows fewer row groups
    than ``defaultParallelism`` AND at least 64 rows per core, insert a
    deterministic hash repartition on the table's unique key. The
    exchange moves only the table's raw bytes once (2.3 MB at sf0.1)
    and buys back full-width codegen stages. At 100 TB the same guard
    is the standard defensive spread after a selective filter or a
    consolidated upstream export; well-laid-out multi-file data skips
    it (row groups >= cores short-circuits).
    """
    try:
        import pyarrow.parquet as pq
        meta = pq.ParquetFile(path).metadata
    except Exception:
        return df
    par = spark.sparkContext.defaultParallelism
    if meta.num_row_groups < par and meta.num_rows >= 64 * par:
        return df.repartition(par, F.col(_HEAVY_PAYLOAD_KEY[name]))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing types where needed.

    ``events.ts`` normalizes to session-zone TIMESTAMP whatever the
    file carries:

    - ``timestamp[ns]``: Spark 4 only reads it as BIGINT nanos (see
      session.RUNTIME_CONFS); converted via integer division —
      ``ts DIV 1000`` — NOT ``ts/1000`` (double division loses
      sub-microsecond precision at 1.7e18 ns).
    - ``timestamp[us]`` with isAdjustedToUTC=false: arrives as
      TIMESTAMP_NTZ, which watermarks/event-time ops reject; cast to
      TIMESTAMP (values unchanged — the session zone is UTC).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name in _HEAVY_PAYLOAD_TABLES:
        df = _scan_parallelism_guard(spark, path, name, df)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: (session id, abs sf_dir, tables, per-file (mtime_ns, size)) ->
#: (weakref to the owning SparkSession, {name: DataFrame}). The
#: DataFrames only carry the parquet schema and file listing — every
#: action still scans the files — so reuse is the Spark analogue of
#: the DuckDB oracle registering its read_parquet views once per
#: connection (and of spark.sql.hive.filesourcePartitionFileCacheSize
#: for directory tables). The file stat signature invalidates the
#: entry when anything rewrites the data. Keys carry the SESSION
#: identity, not just the applicationId: ``spark.newSession()`` (and a
#: host app owning several sessions) shares one applicationId but has
#: its own conf and temp-view catalog, so an app-level key would skip
#: ``configure()`` and register views in the wrong session (r12
#: ADVICE). ``id(spark)`` can be recycled after GC, hence the weakref
#: guard: a hit must also be the SAME live session object.
#: Measured r12: load_tables was ~1 s per call (10 parquet footer
#: reads + 10x conf re-apply) and every corpus bench entry paid it
#: inside its timed region.
_TABLE_CACHE: dict[tuple, tuple] = {}
#: session id -> weakref of the session configure() already ran on.
_CONFIGURED: dict[int, object] = {}
#: session id -> (weakref, cache key whose views are currently
#: registered in that session), so a repeat call for the same data
#: skips 10 createOrReplaceTempView round-trips (~0.3 s measured r12);
#: switching sf_dir (or session) re-registers.
_VIEWS_CURRENT: dict[int, tuple] = {}


def _cache_key(spark: SparkSession, sf_dir: str,
               tables: tuple[str, ...]) -> tuple | None:
    sig = []
    for name in tables:
        try:
            st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
            sig.append((name, st.st_mtime_ns, st.st_size))
        except OSError:
            # missing/odd layout: skip caching (correctness over speed)
            return None
    return (id(spark), os.path.abspath(sf_dir), tables, tuple(sig))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the DataFrames.

    Idempotent and cheap on repeat calls: the parquet footer reads are
    cached per (session, dir, file signature) — see ``_TABLE_CACHE`` —
    and the temp-view registration is likewise skipped while the same
    session/data pair stays current (NOTE: a caller that shadowed a
    view name between two identical calls keeps its shadow; pass a
    changed ``sf_dir`` or call ``createOrReplaceTempView`` itself to
    restore the table view). No data is read until a query runs.
    """
    import weakref

    key = _cache_key(spark, sf_dir, tables)
    sid = id(spark)
    conf_ref = _CONFIGURED.get(sid)
    if conf_ref is None or conf_ref() is not spark:
        configure(spark)
        _CONFIGURED[sid] = weakref.ref(spark)
    out = None
    if key is not None:
        hit = _TABLE_CACHE.get(key)
        if hit is not None and hit[0]() is spark:
            out = hit[1]
    if out is None:
        out = {name: read_table(spark, sf_dir, name) for name in tables}
        if key is not None:
            _TABLE_CACHE[key] = (weakref.ref(spark), out)
    cur = _VIEWS_CURRENT.get(sid)
    if key is None or cur is None or cur[0]() is not spark or cur[1] != key:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
        if key is not None:
            _VIEWS_CURRENT[sid] = (weakref.ref(spark), key)
    return out
