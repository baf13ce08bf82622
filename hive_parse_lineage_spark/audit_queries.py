"""Engine- and pipeline-audit entries (x206+): multimodal decode gates
for the remaining container formats (Y4M frame sampling, PNG with real
zlib + scanline-filter reconstruction), warehouse profiling audits
(functional-dependency violations, optimizer-style NDV join-cardinality
estimates), entity-resolution reciprocal best match, time-series
autoregression, and dup-graph edge embeddedness.

Same contract as the sibling registry modules: every entry is exposed
through ``audit_queries()`` with an exact DuckDB twin in
``audit_oracle_sql()``; integer spellings throughout (the x141/x150
playbook) so the hash gate compares exact values, never float
formatting. Reference parity note: the reference
(complone/hive-parse-lineage) is a lineage parser with no execution
surface — these entries extend the repo's LLM-pipeline/warehouse-audit
capability set beyond reference scope, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_parse_lineage_spark.analytics_queries import _q, _sdiv

# ---------------------------------------------------------------------------
# x206 — Y4M frame sampling under the hash gate
# ---------------------------------------------------------------------------

#: 4x4 C420 frame = 4*4*3//2 = 24 payload bytes per frame
_Y4M_W, _Y4M_H, _Y4M_FRAME = 4, 4, 24
#: F25:1 + every_ms=200 -> every 5th frame sampled, ts = idx*40 ms
_Y4M_FPS, _Y4M_EVERY_MS, _Y4M_STEP = 25, 200, 5


def _x206_y4m_frame_sample(spark, tables):
    """The VIDEO leg of the multimodal certification (x199 images,
    x192 audio): every document's bytes become a genuine YUV4MPEG2
    stream (4x4 C420 -> 24-byte frames, F25:1), and the corpus runs
    through the REAL ``sample_frames`` operator — container header
    parse, FRAME walk, every-200ms sampling with the fps rational
    (operators/multimodal.py:384, the one-row-in/many-frames-out
    fan-out shape the brief names as frame-sample). The gate certifies
    the sampling arithmetic AND the frame payload byte-exactly: per
    doc, the count/index-sum/timestamp-sum of sampled frames plus the
    position-weighted checksum of every sampled frame's bytes — an
    off-by-one in the idx = k*ms*num/(1000*den) schedule, a wrong
    frame boundary, or a truncated last-frame pad all break the hash.
    The DuckDB twin replays from character positions (ASCII corpus;
    zero pad contributes nothing).

    Scale shape: two Arrow mapInPandas passes (synthesize, sample+sum)
    and one per-doc aggregate — partition-local until the final sort;
    frame blobs never leave their partition."""
    import pandas as pd

    from hive_parse_lineage_spark.operators.multimodal import sample_frames

    header = (f"YUV4MPEG2 W{_Y4M_W} H{_Y4M_H} "
              f"F{_Y4M_FPS}:1 Ip A1:1 C420\n").encode()

    def synth(batches):
        import numpy as np
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                n = len(body)
                if n == 0:
                    continue
                nf = (n + _Y4M_FRAME - 1) // _Y4M_FRAME
                pay = np.zeros(nf * _Y4M_FRAME, np.uint8)
                pay[:n] = np.frombuffer(body, np.uint8)
                blob = header + b"".join(
                    b"FRAME\n" + pay[i * _Y4M_FRAME:(i + 1) * _Y4M_FRAME]
                    .tobytes() for i in range(nf))
                rows.append((doc_id, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    def per_frame(batches):
        import numpy as np
        for pdf in batches:
            rows = []
            for doc_id, idx, ts, frame in zip(
                    pdf["doc_id"], pdf["frame_idx"], pdf["ts_ms"],
                    pdf["frame"]):
                v = np.frombuffer(bytes(frame), np.uint8).astype(np.int64)
                pos = np.arange(1, len(v) + 1, dtype=np.int64)
                rows.append((doc_id, int(idx), int(ts),
                             int((pos * v).sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "ts_ms", "ps"])

    vids = (tables["documents"].select("doc_id", "text")
            .filter(F.length("text") > 0)
            .mapInPandas(synth, schema="doc_id long, content binary"))
    sampled = sample_frames(vids, content_col="content", id_col="doc_id",
                            every_ms=_Y4M_EVERY_MS)
    frames = sampled.mapInPandas(
        per_frame, schema="doc_id long, frame_idx long, ts_ms long, ps long")
    return (frames.groupBy("doc_id")
            .agg(F.count("*").alias("n_sampled"),
                 F.sum("frame_idx").alias("idx_sum"),
                 F.sum("ts_ms").alias("ts_sum"),
                 F.sum("ps").alias("possum"))
            .orderBy("doc_id"))


_Y4M_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L,
         (CAST(length(text) AS BIGINT) + {_Y4M_FRAME - 1}) // {_Y4M_FRAME}
             AS nf
  FROM documents WHERE length(text) > 0
), fr AS (
  SELECT doc_id, L, text, i
  FROM d, LATERAL (SELECT unnest(generate_series(
                       0, nf - 1, {_Y4M_STEP})) AS i) t
), fb AS (
  SELECT doc_id, i, j,
         CASE WHEN i * {_Y4M_FRAME} + j <= L
              THEN ord(substr(text, CAST(i * {_Y4M_FRAME} + j AS INT), 1))
              ELSE 0 END AS v
  FROM fr, LATERAL (SELECT unnest(generate_series(1, {_Y4M_FRAME})) AS j) u
), pf AS (
  SELECT doc_id, i, CAST(SUM(j * v) AS BIGINT) AS ps
  FROM fb GROUP BY doc_id, i
)
SELECT doc_id, COUNT(*) AS n_sampled, CAST(SUM(i) AS BIGINT) AS idx_sum,
       CAST(SUM(i * {1000 // _Y4M_FPS}) AS BIGINT) AS ts_sum,
       CAST(SUM(ps) AS BIGINT) AS possum
FROM pf GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# x207 — PNG roundtrip: zlib + real scanline filters under the gate
# ---------------------------------------------------------------------------

_PNG_W = 5


def _x207_png_roundtrip_stats(spark, tables):
    """x199's BMP gate exercises layout transforms; this one exercises
    the actual PNG 'codec': every document's bytes become an 8-bit
    GRAYSCALE PNG (width 5) whose scanlines alternate filter types
    None/Sub/Up (y % 3) — so ``decode_png``'s zlib inflate AND its
    per-filter reconstruction (the cumsum-mod-256 Sub path, the
    vectorized Up path) must be byte-perfect for the decoded stream to
    equal the original text. The corpus decodes through the same
    Arrow-batched ``decode_image`` walk as x199; the gate is the same
    position-weighted checksum, replayed by DuckDB from character
    positions.

    Scale shape: identical to x199 — synthesize/decode/sum are all
    partition-local mapInPandas passes; zero shuffles before the
    final sort."""
    import struct
    import zlib

    import pandas as pd

    from hive_parse_lineage_spark.operators.multimodal import decode_image

    def synth(batches):
        import numpy as np

        def chunk(ctype: bytes, body: bytes) -> bytes:
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", zlib.crc32(ctype + body)
                                  & 0xFFFFFFFF))

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                body = text.encode("utf-8")
                n = len(body)
                if n == 0:
                    continue
                h = (n + _PNG_W - 1) // _PNG_W
                pay = np.zeros(h * _PNG_W, np.uint8)
                pay[:n] = np.frombuffer(body, np.uint8)
                raw = pay.reshape(h, _PNG_W).astype(np.int32)
                scan = bytearray()
                prev = np.zeros(_PNG_W, np.int32)
                for y in range(h):
                    f = y % 3
                    row = raw[y]
                    if f == 0:
                        filt = row
                    elif f == 1:   # Sub: minus left neighbor (ch=1)
                        filt = (row - np.concatenate(([0], row[:-1]))) & 0xFF
                    else:          # Up: minus previous raw row
                        filt = (row - prev) & 0xFF
                    scan.append(f)
                    scan += filt.astype(np.uint8).tobytes()
                    prev = row
                ihdr = struct.pack(">IIBBBBB", _PNG_W, h, 8, 0, 0, 0, 0)
                blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                        + chunk(b"IDAT", zlib.compress(bytes(scan)))
                        + chunk(b"IEND", b""))
                rows.append((doc_id, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    def stats(batches):
        import numpy as np
        for pdf in batches:
            rows = []
            for doc_id, h, pix in zip(pdf["doc_id"], pdf["height"],
                                      pdf["pixels"]):
                v = np.frombuffer(bytes(pix), np.uint8).astype(np.int64)
                idx = np.arange(1, len(v) + 1, dtype=np.int64)
                rows.append((doc_id, int(h), len(v), int(v.max()),
                             int((idx * v).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "height", "n_bytes", "peak", "possum"])

    pngs = (tables["documents"].select("doc_id", "text")
            .filter(F.length("text") > 0)
            .mapInPandas(synth, schema="doc_id long, content binary"))
    decoded = decode_image(pngs, content_col="content", id_col="doc_id")
    return (decoded.mapInPandas(
        stats, schema="doc_id long, height long, n_bytes long, "
                      "peak long, possum long")
        .orderBy("doc_id"))


_PNG_ROUNDTRIP_ORACLE = f"""
WITH ch AS (
  SELECT doc_id, i, ord(substr(text, CAST(i AS INT), 1)) AS v
  FROM documents,
       LATERAL (SELECT unnest(generate_series(
                    1, CAST(length(text) AS BIGINT))) AS i) t
  WHERE length(text) > 0
), agg AS (
  SELECT doc_id, COUNT(*) AS n, MAX(v) AS peak,
         CAST(SUM(i * v) AS BIGINT) AS possum
  FROM ch GROUP BY doc_id
)
SELECT doc_id, (n + {_PNG_W - 1}) // {_PNG_W} AS height,
       ((n + {_PNG_W - 1}) // {_PNG_W}) * {_PNG_W} AS n_bytes,
       CAST(peak AS BIGINT) AS peak, possum
FROM agg ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# x208 — functional-dependency violation census
# ---------------------------------------------------------------------------

#: (table, lhs, rhs) — candidate FDs a profiler would test: PK-derived
#: dependencies expected to hold next to plausible-but-false ones, so
#: the report shows both ends of the scale.
_FDS = (
    ("part", "p_partkey", "p_brand"),         # PK-derived: must hold
    ("part", "p_type", "p_brand"),            # plausible, likely false
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("nation", "n_regionkey", "n_name"),
)


def _x208_fd_violations(spark, tables):
    """Approximate functional-dependency discovery (the
    Metanome/TANE-style profiling primitive, reduced to the census a
    warehouse ANALYZE would publish): for each declared candidate FD
    lhs -> rhs, the number of lhs groups, the groups carrying more
    than one distinct rhs (violations), the worst group's distinct-rhs
    count, and the violation rate in permille. An exact-hold FD
    (violation 0) is a constraint the optimizer and the dedup pipeline
    may lean on; a high rate falsifies the candidate — x202's declared
    DQ constraints, discovered instead of asserted.

    Scale shape: one countDistinct aggregate per FD keyed by its lhs
    (map-side partial, |lhs-domain| rows out of any table size), then
    a scalar rollup per FD; the union is |FDs| rows. No joins."""
    out = None
    for t, lhs, rhs in _FDS:
        g = (tables[t].groupBy(lhs)
             .agg(F.countDistinct(rhs).alias("ndv")))
        rep = (g.agg(F.count("*").alias("n_groups"),
                     F.sum((F.col("ndv") > 1).cast("long"))
                     .alias("n_violating"),
                     F.max("ndv").alias("max_rhs"))
               .select(F.lit(f"{t}.{lhs}->{rhs}").alias("fd"),
                       "n_groups", "n_violating", "max_rhs",
                       F.expr("n_violating * 1000 div n_groups")
                       .alias("violation_permille")))
        out = rep if out is None else out.unionByName(rep)
    return out.orderBy("fd")


def _fd_oracle_sql() -> str:
    parts = []
    for t, lhs, rhs in _FDS:
        parts.append(f"""
SELECT '{t}.{lhs}->{rhs}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
       CAST(MAX(ndv) AS BIGINT) AS max_rhs,
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) * 1000 AS BIGINT)
           // COUNT(*) AS violation_permille
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS ndv FROM {t} GROUP BY {lhs})
""")
    return " UNION ALL ".join(parts) + " ORDER BY fd"


# ---------------------------------------------------------------------------
# x209 — NDV join-cardinality estimate vs actual (optimizer audit)
# ---------------------------------------------------------------------------

#: (name, left table, left key, right table, right key)
_JOINS = (
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
)


def _x209_join_cardinality_audit(spark, tables):
    """Optimizer-statistics audit: the System-R textbook equi-join
    cardinality estimate |A|*|B| / max(ndv_A(k), ndv_B(k)) next to the
    ACTUAL join count, per join, with the signed error in permille —
    the number a cost-based optimizer bets its join order on, measured
    instead of assumed. PK-FK joins should land near 0 error (the
    uniform-key assumption holds by construction); a large error flags
    key skew the planner would mis-cost — x109's skew report, read
    through the optimizer's eyes.

    Scale shape: per join, two single-pass aggregates (count + exact
    countDistinct per side) and the actual join count — three
    shuffles keyed by the join key; the result union is |joins| rows.
    At 100 TB the exact NDV swaps to approx_count_distinct (x104's
    sketch class, the documented trade) with the same report shape."""
    out = None
    for name, ta, ka, tb, kb in _JOINS:
        a, b = tables[ta], tables[tb]
        sa = a.agg(F.count("*").alias("n_left"),
                   F.countDistinct(ka).alias("ndv_left"))
        sb = b.agg(F.count("*").alias("n_right"),
                   F.countDistinct(kb).alias("ndv_right"))
        sj = (a.select(F.col(ka).alias("k"))
              .join(b.select(F.col(kb).alias("k")), "k")
              .agg(F.count("*").alias("actual_rows")))
        row = (sa.crossJoin(sb).crossJoin(sj)
               .withColumn("est_rows",
                           F.expr("n_left * n_right div "
                                  "GREATEST(ndv_left, ndv_right)"))
               .select(F.lit(name).alias("join_name"),
                       "n_left", "n_right", "ndv_left", "ndv_right",
                       "est_rows", "actual_rows",
                       F.expr("CASE WHEN actual_rows = 0 THEN 0 ELSE "
                              + _sdiv("(est_rows - actual_rows) * 1000",
                                      "actual_rows")
                              + " END").alias("err_permille")))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")


def _join_card_oracle_sql() -> str:
    parts = []
    for name, ta, ka, tb, kb in _JOINS:
        num = f"(est_rows - actual_rows) * 1000"
        sdiv = (f"CASE WHEN ({num}) >= 0 THEN ({num}) // actual_rows "
                f"ELSE -((-({num})) // actual_rows) END")
        parts.append(f"""
SELECT '{name}' AS join_name, n_left, n_right, ndv_left, ndv_right,
       n_left * n_right // GREATEST(ndv_left, ndv_right) AS est_rows,
       actual_rows,
       CASE WHEN actual_rows = 0 THEN 0 ELSE {sdiv} END AS err_permille
FROM (
  SELECT sa.n_left, sa.ndv_left, sb.n_right, sb.ndv_right,
         sj.actual_rows,
         sa.n_left * sb.n_right
             // GREATEST(sa.ndv_left, sb.ndv_right) AS est_rows
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_left,
               CAST(COUNT(DISTINCT {ka}) AS BIGINT) AS ndv_left
        FROM {ta}) sa,
       (SELECT CAST(COUNT(*) AS BIGINT) AS n_right,
               CAST(COUNT(DISTINCT {kb}) AS BIGINT) AS ndv_right
        FROM {tb}) sb,
       (SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
        FROM {ta} JOIN {tb} ON {ta}.{ka} = {tb}.{kb}) sj
)
""")
    return " UNION ALL ".join(parts) + " ORDER BY join_name"


# ---------------------------------------------------------------------------
# x210 — reciprocal best match on the LSH near-dup graph
# ---------------------------------------------------------------------------

def _x210_reciprocal_best_match(spark, tables):
    """Entity-resolution RECIPROCAL BEST MATCH over the x07 near-dup
    graph: for every doc, its highest-estimated-Jaccard LSH neighbor
    (ties to the lowest id); a pair survives only if each member is
    the other's best — the classic mutual-best-match rule that picks
    the canonical merge partner and refuses asymmetric matches (a is
    b's best but b has a better twin elsewhere), the precision filter
    record-linkage systems apply before any merge x54 would execute.

    Scale shape: the edge list is x07's banded equi-join (never
    all-pairs); best-neighbor is one partition-local window over the
    symmetrized edges (keyed by doc — no global sort); mutuality is a
    self equi-join on the manufactured (doc, best) key. Everything
    downstream of the edges is edge-proportional."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    docs = tables["documents"]
    edges = minhash_near_dups(docs, threshold=0.3, n_hashes=64, bands=16,
                              shingle_k=2, hasher=portable_hash64,
                              max_bucket_size=None)
    sym = (edges.select(F.col("id_a").alias("v"), F.col("id_b").alias("u"),
                        "est_jaccard")
           .unionByName(edges.select(F.col("id_b").alias("v"),
                                     F.col("id_a").alias("u"),
                                     "est_jaccard")))
    w = Window.partitionBy("v").orderBy(F.col("est_jaccard").desc(),
                                        F.col("u").asc())
    best = (sym.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select("v", "u", "est_jaccard"))
    b2 = best.select(F.col("v").alias("v2"), F.col("u").alias("u2"))
    return (best.join(b2, (F.col("u") == F.col("v2"))
                      & (F.col("u2") == F.col("v")))
            .filter(F.col("v") < F.col("u"))
            .select(F.col("v").alias("id_a"), F.col("u").alias("id_b"),
                    "est_jaccard")
            .orderBy("id_a"))


def _reciprocal_oracle_sql() -> str:
    from hive_parse_lineage_spark.extra_queries import _minhash_oracle_sql
    mh = _minhash_oracle_sql(n_hashes=64, bands=16, shingle_k=2,
                             threshold=0.3)
    return f"""
WITH mh AS (
{mh}
), sym AS (
  SELECT id_a AS v, id_b AS u, est_jaccard FROM mh
  UNION ALL SELECT id_b AS v, id_a AS u, est_jaccard FROM mh
), best AS (
  SELECT v, u, est_jaccard FROM (
    SELECT v, u, est_jaccard,
           ROW_NUMBER() OVER (PARTITION BY v
                              ORDER BY est_jaccard DESC, u) AS rn
    FROM sym) WHERE rn = 1
)
SELECT a.v AS id_a, a.u AS id_b, a.est_jaccard
FROM best a JOIN best b ON a.u = b.v AND b.u = a.v
WHERE a.v < a.u ORDER BY id_a
"""


# ---------------------------------------------------------------------------
# x211 — hourly autoregression coefficients (lagged self-correlation)
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 4, 5, 6)


def _x211_acf_lags(spark, tables):
    """Per-event-type LAGGED SELF-REGRESSION of the hourly volume
    series: for each lag k in 1..6 hours, the least-squares slope of
    count(t+k) on count(t) over all co-present hour pairs, in exact
    integer milli — slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), the
    autocorrelation-shaped dial (periodicity shows as slope rebounding
    at the period; a memoryless stream decays to 0) that capacity
    planning and anomaly baselines read, computed without a single
    float. The x121 regression spelling applied to the series'
    own past.

    Scale shape: one (type, hour) count aggregate — hours-bounded
    output regardless of corpus size — then a 6-way exploded self
    equi-join on the manufactured hour+lag key and a |types x lags|
    aggregate. Nothing after the first aggregate is
    corpus-proportional."""
    e = tables["events"]
    hourly = (e.groupBy("event_type",
                        F.expr("unix_millis(ts) div 3600000").alias("hi"))
              .agg(F.count("*").alias("c")))
    a = hourly.select(F.col("event_type").alias("et"), "hi",
                      F.col("c").alias("x"),
                      F.explode(F.array(*[F.lit(k) for k in _ACF_LAGS]))
                      .alias("lag"))
    b = hourly.select(F.col("event_type").alias("et2"),
                      F.col("hi").alias("hib"), F.col("c").alias("y"))
    pairs = a.join(b, (F.col("et") == F.col("et2"))
                   & (F.col("hib") == F.col("hi") + F.col("lag")))
    return (pairs.groupBy(F.col("et").alias("event_type"), "lag")
            .agg(F.count("*").alias("n_pairs"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx"))
            .select("event_type", "lag", "n_pairs",
                    F.expr("CASE WHEN n_pairs * sxx - sx * sx = 0 THEN 0 "
                           "ELSE " + _sdiv(
                               "(n_pairs * sxy - sx * sy) * 1000",
                               "n_pairs * sxx - sx * sx") + " END")
                    .alias("ar_milli"))
            .orderBy("event_type", "lag"))


_ACF_ORACLE = f"""
WITH h AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hi,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, epoch_ms(ts) // 3600000
), l AS (
  SELECT unnest([{', '.join(str(k) for k in _ACF_LAGS)}]) AS lag
), p AS (
  SELECT a.event_type, l.lag, a.c AS x, b.c AS y
  FROM h a CROSS JOIN l
  JOIN h b ON b.event_type = a.event_type AND b.hi = a.hi + l.lag
), agg AS (
  SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM p GROUP BY event_type, lag
)
SELECT event_type, lag, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx = 0 THEN 0
            WHEN (n_pairs * sxy - sx * sy) * 1000 >= 0
            THEN (n_pairs * sxy - sx * sy) * 1000
                 // (n_pairs * sxx - sx * sx)
            ELSE -((-((n_pairs * sxy - sx * sy) * 1000))
                   // (n_pairs * sxx - sx * sx)) END AS ar_milli
FROM agg ORDER BY event_type, lag
"""


# ---------------------------------------------------------------------------
# x212 — edge embeddedness census of the dup graph
# ---------------------------------------------------------------------------

def _x212_edge_embeddedness(spark, tables):
    """EDGE EMBEDDEDNESS census of the near-dup graph: for every LSH
    edge, the number of common neighbors of its endpoints, then the
    histogram over that value. Embeddedness 0 = a LOCAL BRIDGE
    (Granovetter's weak tie — in a dup graph, the suspicious edge: a
    chance band collision linking two otherwise-unrelated families,
    exactly what a verify pass should re-check first); high
    embeddedness = deep inside a boilerplate clique, safe to collapse.
    x149 counts triangles globally; this distributes that closure
    evidence onto each edge, which is what an edge-level dedup
    reviewer acts on.

    Scale shape: common-neighbor counting is two hash equi-joins of
    the edge list against the symmetrized adjacency (wedge-bounded,
    the x149 class — never all-pairs), a left join back for
    zero-support edges, and a |distinct embeddedness|-row histogram."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    docs = tables["documents"]
    edges = (minhash_near_dups(docs, threshold=0.3, n_hashes=64, bands=16,
                               shingle_k=2, hasher=portable_hash64,
                               max_bucket_size=None)
             .select("id_a", "id_b").localCheckpoint(eager=True))
    adj = (edges.select(F.col("id_a").alias("v"), F.col("id_b").alias("u"))
           .unionByName(edges.select(F.col("id_b").alias("v"),
                                     F.col("id_a").alias("u"))))
    n1 = adj.select(F.col("v").alias("id_a"), F.col("u").alias("w"))
    n2 = adj.select(F.col("v").alias("id_b"), F.col("u").alias("w"))
    cn = (edges.join(n1, "id_a").join(n2, ["id_b", "w"])
          .groupBy("id_a", "id_b").agg(F.count("*").alias("c")))
    emb = (edges.join(cn, ["id_a", "id_b"], "left")
           .select(F.coalesce("c", F.lit(0)).alias("embeddedness")))
    return (emb.groupBy("embeddedness")
            .agg(F.count("*").alias("n_edges"))
            .orderBy("embeddedness"))


def _embeddedness_oracle_sql() -> str:
    from hive_parse_lineage_spark.corpus_queries import _cc_edges_sql
    return f"""
WITH {_cc_edges_sql()},
cn AS (
  SELECT e.id_a, e.id_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM mh e
  JOIN adj n1 ON n1.v = e.id_a
  JOIN adj n2 ON n2.v = e.id_b AND n2.u = n1.u
  GROUP BY e.id_a, e.id_b
), emb AS (
  SELECT COALESCE(cn.c, 0) AS embeddedness
  FROM mh LEFT JOIN cn USING (id_a, id_b)
)
SELECT embeddedness, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM emb GROUP BY embeddedness ORDER BY embeddedness
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def audit_queries():
    return {
        "x206_y4m_frame_sample": _q(_x206_y4m_frame_sample),
        "x207_png_roundtrip_stats": _q(_x207_png_roundtrip_stats),
        "x208_fd_violations": _q(_x208_fd_violations),
        "x209_join_cardinality_audit": _q(_x209_join_cardinality_audit),
        "x210_reciprocal_best_match": _q(_x210_reciprocal_best_match),
        "x211_acf_lags": _q(_x211_acf_lags),
        "x212_edge_embeddedness": _q(_x212_edge_embeddedness),
    }


def audit_oracle_sql() -> dict[str, str]:
    return {
        "x206_y4m_frame_sample": _Y4M_ORACLE,
        "x207_png_roundtrip_stats": _PNG_ROUNDTRIP_ORACLE,
        "x208_fd_violations": _fd_oracle_sql(),
        "x209_join_cardinality_audit": _join_card_oracle_sql(),
        "x210_reciprocal_best_match": _reciprocal_oracle_sql(),
        "x211_acf_lags": _ACF_ORACLE,
        "x212_edge_embeddedness": _embeddedness_oracle_sql(),
    }
