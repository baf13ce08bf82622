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
    downstream of the edges is edge-proportional; the downstream body
    is shared with bench.py's capped skew-rung variant
    (reciprocal_best_match_from_edges) so the two measurements can
    never drift."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    from hive_parse_lineage_spark.operators.dedup import minhash_near_dups
    docs = tables["documents"]
    edges = minhash_near_dups(docs, threshold=0.3, n_hashes=64, bands=16,
                              shingle_k=2, hasher=portable_hash64,
                              max_bucket_size=None)
    return reciprocal_best_match_from_edges(edges)


def reciprocal_best_match_from_edges(edges):
    """x210's edge-proportional downstream over an arbitrary
    (id_a, id_b, est_jaccard) edge list."""
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
# x213 — Merkle-bucket anti-entropy diff of two snapshots
# ---------------------------------------------------------------------------

_MERKLE_BUCKETS = 256
#: row-fingerprint sums fold mod 1e12 so a 2^63 accumulator never
#: overflows: 1e12 * rows stays under 2^63 up to ~9M rows per bucket
_MERKLE_FOLD = 10 ** 12


def _x213_merkle_bucket_diff(spark, tables):
    """Anti-entropy SNAPSHOT RECONCILIATION, the Merkle-bucket way two
    100-TB replicas are actually compared: hash every row's
    fingerprint into one of 256 buckets, keep per-bucket (count,
    fingerprint-sum), and report ONLY the buckets where the two
    snapshots disagree — the divergent 1/256th of the data is what a
    repair job re-reads, never the full corpus. Snapshot B here is A
    with deterministic damage (doc_id % 97 = 13 dropped, % 53 = 7
    text-mutated), so the report provably localizes both delete- and
    update-class divergence. Fingerprints are the portable md5-fold
    hash, folded mod 1e12 before summing (order-free, overflow-safe).

    Scale shape: one scan + one 256-group aggregate PER SIDE, then a
    256-row full-outer join — the comparison itself never touches row
    data again. The production follow-up (re-read only the divergent
    buckets) is a partition-pruned scan keyed by the same hash."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    docs = tables["documents"].select("doc_id", "text")
    b = (docs.filter(F.col("doc_id") % 97 != 13)
         .select("doc_id",
                 F.when(F.col("doc_id") % 53 == 7,
                        F.concat(F.col("text"), F.lit("!")))
                 .otherwise(F.col("text")).alias("text")))

    def digest(df):
        fp = F.pmod(portable_hash64(
            F.concat(F.col("doc_id").cast("string"), F.lit("|"),
                     F.col("text"))), F.lit(_MERKLE_FOLD))
        bucket = F.pmod(portable_hash64(F.col("doc_id").cast("string")),
                        F.lit(_MERKLE_BUCKETS))
        return (df.select(bucket.alias("bucket"), fp.alias("fp"))
                .groupBy("bucket")
                .agg(F.count("*").alias("n"), F.sum("fp").alias("s")))
    da = digest(docs).select("bucket", F.col("n").alias("n_a"),
                             F.col("s").alias("sum_a"))
    db = digest(b).select("bucket", F.col("n").alias("n_b"),
                          F.col("s").alias("sum_b"))
    return (da.join(db, "bucket", "full_outer")
            .select("bucket",
                    F.coalesce("n_a", F.lit(0)).alias("n_a"),
                    F.coalesce("n_b", F.lit(0)).alias("n_b"),
                    F.coalesce("sum_a", F.lit(0)).alias("sum_a"),
                    F.coalesce("sum_b", F.lit(0)).alias("sum_b"))
            .filter((F.col("n_a") != F.col("n_b"))
                    | (F.col("sum_a") != F.col("sum_b")))
            .orderBy("bucket"))


def _merkle_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    fp = portable_hash64_sql("CAST(doc_id AS VARCHAR) || '|' || text")
    bkt = portable_hash64_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH a AS (
  SELECT doc_id, text FROM documents
), b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 53 = 7 THEN text || '!' ELSE text END AS text
  FROM documents WHERE doc_id % 97 != 13
), da AS (
  SELECT {bkt} % {_MERKLE_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_a,
         CAST(SUM({fp} % {_MERKLE_FOLD}) AS BIGINT) AS sum_a
  FROM a GROUP BY 1
), db AS (
  SELECT {bkt} % {_MERKLE_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM({fp} % {_MERKLE_FOLD}) AS BIGINT) AS sum_b
  FROM b GROUP BY 1
)
SELECT bucket, COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
       COALESCE(sum_a, 0) AS sum_a, COALESCE(sum_b, 0) AS sum_b
FROM da FULL OUTER JOIN db USING (bucket)
WHERE COALESCE(n_a, 0) != COALESCE(n_b, 0)
   OR COALESCE(sum_a, 0) != COALESCE(sum_b, 0)
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# x214 — Z-order vs lexicographic clustering effectiveness
# ---------------------------------------------------------------------------

#: 8-bit folded coordinates -> 16-bit z-value; >> 10 -> 64 buckets
_Z_BITS, _Z_BUCKETS_SHIFT = 8, 10


def _zvalue_spark():
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"shiftleft(shiftright(l_partkey & 255, {b}) & 1, "
                     f"{2 * b})")
        terms.append(f"shiftleft(shiftright(l_suppkey & 255, {b}) & 1, "
                     f"{2 * b + 1})")
    return F.expr(" + ".join(terms))


def _zvalue_duck() -> str:
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((((l_partkey & 255) >> {b}) & 1) << {2 * b})")
        terms.append(f"((((l_suppkey & 255) >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


def _x214_zorder_clustering(spark, tables):
    """DATA-LAYOUT audit: what does Z-ORDERING (bit-interleaving the
    8-bit folds of l_partkey and l_suppkey) buy over lexicographic
    partkey order? Both schemes place rows into 64 layout buckets
    (z-value high bits vs partkey-fold high bits); per scheme the
    report sums each bucket's bounding-box SPAN PER DIMENSION plus the
    product area. The per-dimension sums are the decision numbers: a
    skipping index prunes a bucket when a predicate misses its span,
    so lexicographic order gives razor-thin partkey spans but leaves
    EVERY bucket full-range on suppkey (suppkey predicates prune
    nothing), while z-order spends bits on both — suppkey span sum
    collapses at the cost of a wider partkey span. Total area stays
    ~constant on uniform keys; the TRADE is the finding, and which
    side wins depends on the query mix — exactly what this report
    quantifies before a 100-TB Z-ORDER rewrite is paid for. Pure
    integer bit arithmetic, identical on both engines.

    Scale shape: two scans with a 64-group aggregate each (map-side
    combinable), a 2-row output; the z-value is a projection — the
    audit costs two cheap passes, the layout decision it informs is
    the expensive thing it replaces."""
    li = tables["lineitem"].select(
        (F.col("l_partkey").bitwiseAND(255)).alias("l_partkey"),
        (F.col("l_suppkey").bitwiseAND(255)).alias("l_suppkey"))
    z = li.select(
        F.shiftright(_zvalue_spark(), _Z_BUCKETS_SHIFT).alias("bucket"),
        "l_partkey", "l_suppkey")
    lex = li.select(
        F.expr("shiftright(l_partkey, 2)").alias("bucket"),
        "l_partkey", "l_suppkey")

    def boxes(df, scheme):
        per = (df.groupBy("bucket")
               .agg((F.max("l_partkey") - F.min("l_partkey") + 1)
                    .alias("ps"),
                    (F.max("l_suppkey") - F.min("l_suppkey") + 1)
                    .alias("ss")))
        return (per.agg(F.count("*").alias("n_buckets"),
                        F.sum("ps").alias("partkey_span_sum"),
                        F.sum("ss").alias("suppkey_span_sum"),
                        F.sum(F.col("ps") * F.col("ss")).alias("sum_area"))
                .select(F.lit(scheme).alias("scheme"), "n_buckets",
                        "partkey_span_sum", "suppkey_span_sum",
                        "sum_area"))
    return (boxes(z, "zorder").unionByName(boxes(lex, "lex"))
            .orderBy("scheme"))


def _zorder_oracle_sql() -> str:
    zd = _zvalue_duck()
    return f"""
WITH li AS (
  SELECT l_partkey & 255 AS l_partkey, l_suppkey & 255 AS l_suppkey
  FROM lineitem
), z AS (
  SELECT ({zd}) >> {_Z_BUCKETS_SHIFT} AS bucket, l_partkey, l_suppkey
  FROM li
), lex AS (
  SELECT l_partkey >> 2 AS bucket, l_partkey, l_suppkey FROM li
), zb AS (
  SELECT bucket, MAX(l_partkey) - MIN(l_partkey) + 1 AS ps,
         MAX(l_suppkey) - MIN(l_suppkey) + 1 AS ss
  FROM z GROUP BY bucket
), lb AS (
  SELECT bucket, MAX(l_partkey) - MIN(l_partkey) + 1 AS ps,
         MAX(l_suppkey) - MIN(l_suppkey) + 1 AS ss
  FROM lex GROUP BY bucket
)
SELECT 'lex' AS scheme, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(ps) AS BIGINT) AS partkey_span_sum,
       CAST(SUM(ss) AS BIGINT) AS suppkey_span_sum,
       CAST(SUM(ps * ss) AS BIGINT) AS sum_area
FROM lb
UNION ALL
SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(ps) AS BIGINT), CAST(SUM(ss) AS BIGINT),
       CAST(SUM(ps * ss) AS BIGINT)
FROM zb
ORDER BY scheme
"""


# ---------------------------------------------------------------------------
# x215 — inter-arrival octave histogram
# ---------------------------------------------------------------------------

def _x215_interarrival_octaves(spark, tables):
    """Inter-arrival LATENCY HISTOGRAM in octaves — the log2-bucketed
    distribution every ops dashboard draws, exact-integer here: per
    event type, the gap in microseconds between consecutive events
    (global event-time order, tie on event_id) bucketed by
    floor(log2(gap))+1 (the x141 ibits primitive; gap 0 = bucket 0).
    A healthy Poisson-ish stream shows a smooth unimodal octave curve;
    batch-ingestion artifacts spike octave 0 (simultaneous stamps) and
    periodic schedulers spike one high octave — shapes a mean or p99
    alone cannot distinguish (x148's length-octave logic, pointed at
    time).

    Scale shape: one per-type window (partition-local — types
    partition the stream), one (type, octave) count aggregate. No
    joins; output is |types x ~40 octaves|."""
    e = tables["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (e.select("event_type", "ts", "event_id")
            .withColumn("gap_us",
                        F.unix_micros("ts")
                        - F.lag(F.unix_micros("ts")).over(w))
            .filter(F.col("gap_us").isNotNull()))
    oct_ = F.when(F.col("gap_us") <= 0, F.lit(0)) \
        .otherwise(F.length(F.bin("gap_us")))
    return (gaps.select("event_type", oct_.alias("octave"))
            .groupBy("event_type", "octave")
            .agg(F.count("*").alias("n_gaps"))
            .orderBy("event_type", "octave"))


_INTERARRIVAL_ORACLE = """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
), o AS (
  SELECT event_type,
         CASE WHEN gap_us <= 0 THEN 0
              ELSE length(bin(gap_us)) END AS octave
  FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type, CAST(octave AS BIGINT) AS octave,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM o GROUP BY event_type, octave ORDER BY event_type, octave
"""


# ---------------------------------------------------------------------------
# x216 — bucketed-join balance audit
# ---------------------------------------------------------------------------

_BUCKET_COUNTS = (8, 32, 128)


def _x216_bucket_balance_audit(spark, tables):
    """BUCKETING-DESIGN audit run before anyone writes bucketed
    tables: for each candidate bucket count N, hash o_custkey (the
    orders side) and c_custkey (the customer side) into N buckets with
    the SAME portable hash both tables would be written with, and
    report each side's max bucket share (in permille of a perfectly
    even 1000/N) plus the straggler factor — max bucket rows * N /
    total rows, in permille. A co-located bucketed join runs at the
    speed of its fullest bucket, so straggler_permille near 1000 says
    the layout is safe at that N and a hot bucket says salt first
    (operators/skew.py) — the one number that decides between N=32
    and N=128 before 100 TB gets rewritten.

    Scale shape: ONE scan + one 128-group count aggregate per side —
    the candidate Ns form a divisor chain (8 | 32 | 128), so
    h mod 8 = (h mod 128) mod 8 and every coarser bucketing rolls up
    from the pinned 128-row fine table; the md5-fold hash is computed
    once per row, not once per (row, N). The report is |Ns| x 2 rows.
    No joins anywhere — the audit costs two scans."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    n_fine = max(_BUCKET_COUNTS)
    out = None
    sides = (("orders", tables["orders"], "o_custkey"),
             ("customer", tables["customer"], "c_custkey"))
    for side, df, key in sides:
        fine = (df.select(F.pmod(portable_hash64(
            F.col(key).cast("string")), F.lit(n_fine)).alias("bf"))
            .groupBy("bf").agg(F.count("*").alias("c"))
            # <= n_fine rows; pinned because every N rolls up from it
            .localCheckpoint(eager=True))
        for n in _BUCKET_COUNTS:
            b = (fine.groupBy(F.pmod(F.col("bf"), F.lit(n))
                              .alias("bucket"))
                 .agg(F.sum("c").alias("c")))
            rep = (b.agg(F.sum("c").alias("total"),
                         F.max("c").alias("mx"),
                         F.count("*").alias("used"))
                   .select(F.lit(n).alias("n_buckets"),
                           F.lit(side).alias("side"),
                           "total", F.col("mx").alias("max_bucket_rows"),
                           F.col("used").alias("buckets_used"),
                           F.expr(f"mx * {n} * 1000 div total")
                           .alias("straggler_permille")))
            out = rep if out is None else out.unionByName(rep)
    return out.orderBy("n_buckets", "side")


def _bucket_balance_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    parts = []
    for n in _BUCKET_COUNTS:
        for side, table, key in (("orders", "orders", "o_custkey"),
                                 ("customer", "customer", "c_custkey")):
            h = portable_hash64_sql(f"CAST({key} AS VARCHAR)")
            parts.append(f"""
SELECT {n} AS n_buckets, '{side}' AS side,
       CAST(SUM(c) AS BIGINT) AS total,
       CAST(MAX(c) AS BIGINT) AS max_bucket_rows,
       CAST(COUNT(*) AS BIGINT) AS buckets_used,
       CAST(MAX(c) * {n} * 1000 AS BIGINT) // CAST(SUM(c) AS BIGINT)
           AS straggler_permille
FROM (SELECT {h} % {n} AS bucket, COUNT(*) AS c
      FROM {table} GROUP BY 1)
""")
    return (" UNION ALL ".join(parts)
            + " ORDER BY n_buckets, side")


# ---------------------------------------------------------------------------
# x217 — deletion-propagation (right-to-be-forgotten) audit
# ---------------------------------------------------------------------------

_DEL_MOD, _DEL_REM = 37, 5


def _x217_deletion_propagation(spark, tables):
    """RIGHT-TO-BE-FORGOTTEN propagation audit: given a deletion list
    (user_id % 37 = 5 — the GDPR batch), for each user-keyed derived
    artifact the pipeline materializes, report how many rows the
    pre-deletion build contains, how many of those reference deleted
    users (the residue a DPA audit would flag), and how many rows a
    re-derive on the scrubbed events produces. For user-keyed
    artifacts rows_after = rows_before - referencing, and the report
    proves it per artifact — the reconciliation that says deletion
    actually PROPAGATED instead of merely disappearing from the raw
    table. Artifacts: per-user activity summary, (hour, user) rollup,
    and the view->purchase-within-hour funnel (x103's shape).

    Scale shape: each artifact is one aggregate over events; residue
    counting is a filter on the artifact's own user key (no joins —
    the deletion predicate is hash-derivable per row); the re-derive
    reuses the same aggregate on the filtered scan. Output is
    |artifacts| rows."""
    e = tables["events"].select("event_id", "user_id", "ts", "event_type")
    deleted = F.col("user_id") % _DEL_MOD == _DEL_REM
    kept = e.filter(~deleted)

    def summary(ev):
        return ev.groupBy("user_id").agg(F.count("*").alias("n"))

    def rollup(ev):
        return (ev.groupBy("user_id",
                           F.expr("unix_millis(ts) div 3600000")
                           .alias("hi"))
                .agg(F.count("*").alias("n")))

    def funnel(ev):
        v = ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("u"), F.col("ts").alias("vts"),
            F.col("event_id").alias("vid"))
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("u"), F.col("ts").alias("pts"),
            F.col("event_id").alias("pid"))
        return (v.join(p, "u")
                .filter((F.col("pts") >= F.col("vts"))
                        & (F.unix_micros("pts") - F.unix_micros("vts")
                           < 3600_000_000))
                .select(F.col("u").alias("user_id"), "vid", "pid"))

    out = None
    for name, build in (("user_summary", summary),
                        ("hourly_rollup", rollup),
                        ("view_purchase_funnel", funnel)):
        before = build(e)
        row = (before.agg(F.count("*").alias("rows_before"),
                          F.sum((F.col("user_id") % _DEL_MOD == _DEL_REM)
                                .cast("long")).alias("referencing_deleted"))
               .crossJoin(build(kept).agg(F.count("*")
                                          .alias("rows_after_rederive")))
               .select(F.lit(name).alias("artifact"), "rows_before",
                       "referencing_deleted", "rows_after_rederive"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("artifact")


_DELETION_ORACLE = f"""
WITH k AS (
  SELECT * FROM events WHERE user_id % {_DEL_MOD} != {_DEL_REM}
), s_b AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
s_a AS (SELECT user_id FROM k GROUP BY user_id),
r_b AS (SELECT user_id, epoch_ms(ts) // 3600000 AS hi
        FROM events GROUP BY user_id, epoch_ms(ts) // 3600000),
r_a AS (SELECT user_id, epoch_ms(ts) // 3600000 AS hi
        FROM k GROUP BY user_id, epoch_ms(ts) // 3600000),
f_b AS (
  SELECT v.user_id FROM events v JOIN events p
    ON v.event_type = 'view' AND p.event_type = 'purchase'
   AND v.user_id = p.user_id AND p.ts >= v.ts
   AND epoch_us(p.ts) - epoch_us(v.ts) < 3600000000
), f_a AS (
  SELECT v.user_id FROM k v JOIN k p
    ON v.event_type = 'view' AND p.event_type = 'purchase'
   AND v.user_id = p.user_id AND p.ts >= v.ts
   AND epoch_us(p.ts) - epoch_us(v.ts) < 3600000000
)
SELECT 'hourly_rollup' AS artifact,
       (SELECT COUNT(*) FROM r_b) AS rows_before,
       (SELECT COUNT(*) FROM r_b
        WHERE user_id % {_DEL_MOD} = {_DEL_REM}) AS referencing_deleted,
       (SELECT COUNT(*) FROM r_a) AS rows_after_rederive
UNION ALL
SELECT 'user_summary',
       (SELECT COUNT(*) FROM s_b),
       (SELECT COUNT(*) FROM s_b
        WHERE user_id % {_DEL_MOD} = {_DEL_REM}),
       (SELECT COUNT(*) FROM s_a)
UNION ALL
SELECT 'view_purchase_funnel',
       (SELECT COUNT(*) FROM f_b),
       (SELECT COUNT(*) FROM f_b
        WHERE user_id % {_DEL_MOD} = {_DEL_REM}),
       (SELECT COUNT(*) FROM f_a)
ORDER BY artifact
"""


# ---------------------------------------------------------------------------
# x218 — sparse TF-IDF cosine pairs (rare-token blocked)
# ---------------------------------------------------------------------------

_TFIDF_DF_CAP = 20      # posting join restricted to tokens with df <= cap
_TFIDF_TF_CAP = 20      # tf capped so dot^2 * 1000 stays in int64


def _x218_sparse_tfidf_pairs(spark, tables):
    """Sparse TF-IDF cosine similarity — the search-engine similarity
    primitive in TERM space (x06/x09 are dense-embedding cosine; x05
    is unweighted Jaccard): terms are 3-word shingles (the corpus
    vocabulary is a 31-word closed set, so unigram idf is flat —
    shingles carry the discriminative mass, x41's lesson), and the
    vector space drops terms with df > 20 — the stoplist move every
    search engine makes, which here also bounds the posting join. The
    dot product then aggregates DIRECTLY off the posting self-join
    (sum of df^2 rows per term, df-capped — never all-pairs, never a
    pair-times-terms re-join). Weights are exact integers: tf capped
    at 20 (so the squared-cosine permille below stays in int64 — at
    corpora where ibits(N/df) exceeds ~15, halve the tf cap) times
    ibits(N div df) (the x44 integer log-rarity). Output is squared
    cosine in permille — dot*dot*1000 div (|a|^2 * |b|^2), one fixed
    division chain so both engines truncate identically; >= 250
    (cos >= 0.5) survives.

    Scale shape: ONE posting self-join keyed by rare terms
    (per-term fanout <= df-cap choose 2) feeding a pair-keyed SUM;
    the per-doc norm rides ON the posting rows (one doc-keyed window
    pass over the df-capped postings) so the pair aggregate emits
    n2a/n2b directly — no pair-keyed norm joins after the SUM (the r8
    plan paid two)."""
    from hive_parse_lineage_spark.functions.text import word_shingles
    docs = tables["documents"].select("doc_id", "text")
    tf = (docs.select("doc_id", F.explode(word_shingles("text", 3))
                      .alias("tok"))
          .groupBy("doc_id", "tok")
          .agg(F.least(F.count("*"), F.lit(_TFIDF_TF_CAP)).alias("tf")))
    n_docs = docs.agg(F.count("*").alias("nn"))
    # stopword drop IS the vector space: terms with df > cap carry no
    # weight (boilerplate shingles from big dup families — the same
    # terms a search engine stoplists), so the dot product aggregates
    # DIRECTLY off the posting self-join (sum df^2 rows, df-capped)
    # with no pair-times-terms re-join — the spelling that blew up
    # both engines at sf1.0 before this restriction. df rides on the
    # postings as a tok-keyed window count (never a global order)
    # instead of a separate groupBy + shuffle join: one exchange, and
    # the window's tok partitioning is exactly what the posting
    # self-join wants next (sf1.0 warm wall 6.7 s -> 5.1 s).
    w = (tf.withColumn("df", F.count("*").over(Window.partitionBy("tok")))
         .filter(F.col("df") <= _TFIDF_DF_CAP)
         .crossJoin(F.broadcast(n_docs))
         .select("doc_id", "tok",
                 (F.col("tf") * F.length(F.bin(F.expr("nn div df"))))
                 .alias("w")))
    # the squared norm rides on the posting rows (doc-keyed window,
    # never a global order) so the pair aggregate below carries
    # n2a/n2b out of the SUM for free — n2 is constant per doc, MIN
    # just picks it — instead of re-joining the pair set against a
    # norms table twice (two pair-keyed shuffle joins in the r8 plan)
    wn = (w.withColumn("n2", F.sum(F.col("w") * F.col("w"))
                       .over(Window.partitionBy("doc_id")))
          .localCheckpoint(eager=False))
    wa = wn.select(F.col("doc_id").alias("id_a"), "tok",
                   F.col("w").alias("wa"), F.col("n2").alias("n2a"))
    wb = wn.select(F.col("doc_id").alias("id_b"), "tok",
                   F.col("w").alias("wb"), F.col("n2").alias("n2b"))
    return (wa.join(wb, "tok")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"),
                 F.min("n2a").alias("n2a"), F.min("n2b").alias("n2b"))
            .select("id_a", "id_b",
                    F.expr("dot * dot * 1000 div (n2a * n2b)")
                    .alias("cos2_permille"))
            .filter(F.col("cos2_permille") >= 250)
            .orderBy("id_a", "id_b"))


_SPARSE_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> array_to_string(list_slice(t, i, i + 2), ' '))
                ELSE [text] END) AS tok
  FROM toks
), tf AS (
  SELECT doc_id, tok, LEAST(COUNT(*), {_TFIDF_TF_CAP}) AS tf
  FROM sh GROUP BY doc_id, tok
), nd AS (SELECT COUNT(*) AS nn FROM documents),
dfr AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        HAVING COUNT(*) <= {_TFIDF_DF_CAP}),
w AS MATERIALIZED (
  SELECT tf.doc_id, tf.tok,
         tf.tf * length(bin(nn // df)) AS w
  FROM tf JOIN dfr USING (tok), nd
), norms AS (
  SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.w * b.w) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.id_a, d.id_b,
       d.dot * d.dot * 1000 // (na.n2 * nb.n2) AS cos2_permille
FROM dots d JOIN norms na ON na.doc_id = d.id_a
            JOIN norms nb ON nb.doc_id = d.id_b
WHERE d.dot * d.dot * 1000 // (na.n2 * nb.n2) >= 250
ORDER BY d.id_a, d.id_b
"""


# ---------------------------------------------------------------------------
# x219 — Hamilton (largest-remainder) sample allocation
# ---------------------------------------------------------------------------

_HAMILTON_BUDGET = 10_000


def _x219_hamilton_allocation(spark, tables):
    """EXACT PROPORTIONAL SAMPLE ALLOCATION by the Hamilton
    largest-remainder method — the apportionment rule that turns 'give
    each source its fair share of a 10k-doc sample budget' into
    integers that provably sum to the budget: each source gets
    floor(budget * n_s / N), and the leftover seats go to the largest
    fractional remainders (tie to source name). Every mixing entry
    (x120/x139/x185) needs this step before it can materialize a
    sample; rounding naively either over- or under-draws the budget.

    Scale shape: one |sources|-row count aggregate, a broadcast of the
    single-row total, one window over the |sources|-row table
    (bounded — never corpus-proportional). Output |sources| rows."""
    d = tables["documents"]
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("nn"))
    base = (counts.crossJoin(F.broadcast(tot))
            .select("source", "n_docs",
                    F.expr(f"n_docs * {_HAMILTON_BUDGET} div nn")
                    .alias("base_alloc"),
                    F.expr(f"n_docs * {_HAMILTON_BUDGET} % nn")
                    .alias("rem"), "nn"))
    wsum = base.agg(F.sum("base_alloc").alias("sb"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    return (base.crossJoin(F.broadcast(wsum))
            .withColumn("rk", F.row_number().over(w))
            .select("source", "n_docs", "base_alloc",
                    (F.col("rk") <= _HAMILTON_BUDGET - F.col("sb"))
                    .cast("long").alias("extra"))
            .withColumn("final_alloc",
                        F.col("base_alloc") + F.col("extra"))
            .orderBy("source"))


_HAMILTON_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn FROM c),
b AS (
  SELECT source, n_docs,
         n_docs * {_HAMILTON_BUDGET} // nn AS base_alloc,
         n_docs * {_HAMILTON_BUDGET} % nn AS rem
  FROM c, t
), s AS (SELECT CAST(SUM(base_alloc) AS BIGINT) AS sb FROM b),
r AS (
  SELECT source, n_docs, base_alloc, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
  FROM b
)
SELECT source, n_docs, base_alloc,
       CAST(CASE WHEN rk <= {_HAMILTON_BUDGET} - sb THEN 1 ELSE 0 END
            AS BIGINT) AS extra,
       base_alloc + CASE WHEN rk <= {_HAMILTON_BUDGET} - sb
                         THEN 1 ELSE 0 END AS final_alloc
FROM r, s ORDER BY source
"""


# ---------------------------------------------------------------------------
# x220 — discrete-time hazard (churn) table with censoring
# ---------------------------------------------------------------------------

_HAZARD_WEEK_US = 7 * 24 * 3600 * 1_000_000
_HAZARD_MAX_WEEK = 12


def _x220_hazard_table(spark, tables):
    """DISCRETE-TIME CHURN HAZARD with right-censoring — the
    survival-analysis table x47's cohort retention cannot give: per
    week-since-first-event k, the users still AT RISK (observed and
    alive through week k), the users who CHURNED in week k (last
    activity in week k while the observation window extends beyond
    it), and the hazard in permille. Users whose observation window
    itself ends in week k are CENSORED, not churned — the distinction
    naive retention curves get wrong and the reason this is the
    estimator a churn model trains on. Integer week arithmetic
    end-to-end.

    Scale shape: one per-user min/max aggregate (map-side
    combinable), a broadcast single-row observation end, a 13-way
    explode of the |users|-row table, one (week) aggregate. Nothing
    after the first aggregate is event-proportional."""
    e = tables["events"].select("user_id", F.unix_micros("ts").alias("us"))
    per = e.groupBy("user_id").agg(F.min("us").alias("first_us"),
                                   F.max("us").alias("last_us"))
    end = e.agg(F.max("us").alias("end_us"))
    spans = (per.crossJoin(F.broadcast(end))
             .select(F.expr(f"(last_us - first_us) div {_HAZARD_WEEK_US}")
                     .alias("life_w"),
                     F.expr(f"(end_us - first_us) div {_HAZARD_WEEK_US}")
                     .alias("obs_w")))
    k = F.explode(F.sequence(F.lit(0), F.lit(_HAZARD_MAX_WEEK))).alias("k")
    graded = (spans.select("life_w", "obs_w", k)
              .filter((F.col("life_w") >= F.col("k"))
                      & (F.col("obs_w") >= F.col("k"))))
    return (graded.groupBy("k")
            .agg(F.count("*").alias("n_at_risk"),
                 F.sum(((F.col("life_w") == F.col("k"))
                        & (F.col("obs_w") > F.col("k"))).cast("long"))
                 .alias("n_churned"))
            .select(F.col("k").alias("week"), "n_at_risk", "n_churned",
                    F.expr("n_churned * 1000 div n_at_risk")
                    .alias("hazard_permille"))
            .orderBy("week"))


_HAZARD_ORACLE = f"""
WITH per AS (
  SELECT user_id, MIN(epoch_us(ts)) AS first_us,
         MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id
), e AS (SELECT MAX(epoch_us(ts)) AS end_us FROM events),
spans AS (
  SELECT (last_us - first_us) // {_HAZARD_WEEK_US} AS life_w,
         (end_us - first_us) // {_HAZARD_WEEK_US} AS obs_w
  FROM per, e
), g AS (
  SELECT life_w, obs_w, k
  FROM spans, LATERAL (SELECT unnest(generate_series(
                           0, {_HAZARD_MAX_WEEK})) AS k) t
  WHERE life_w >= k AND obs_w >= k
)
SELECT k AS week, CAST(COUNT(*) AS BIGINT) AS n_at_risk,
       CAST(SUM(CASE WHEN life_w = k AND obs_w > k
                THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN life_w = k AND obs_w > k
                THEN 1 ELSE 0 END) * 1000 AS BIGINT) // COUNT(*)
           AS hazard_permille
FROM g GROUP BY k ORDER BY week
"""


# ---------------------------------------------------------------------------
# x221 — text-normalization collision census (idempotence-audited)
# ---------------------------------------------------------------------------

def _norm_spark(col):
    # punctuation becomes a SPACE (not deleted): deleting would glue
    # adjacent tokens ("a--b" -> "ab") and manufacture false merges
    return F.trim(F.regexp_replace(F.regexp_replace(
        F.lower(col), "[^a-z0-9 ]", " "), " +", " "))


_NORM_DUCK = ("trim(regexp_replace(regexp_replace(lower({c}), "
              "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))")


def _x221_normalization_collisions(spark, tables):
    """TEXT-NORMALIZATION collision census — what the canonicalization
    step every dedup pipeline runs BEFORE hashing actually does to the
    corpus: per source, raw distinct texts vs distinct texts after
    normalize (lowercase, strip non-alphanumerics, collapse spaces),
    and the collision count — document pairs that become identical
    ONLY under normalization (raw-distinct minus norm-distinct). That
    delta is exactly the extra dedup mass a normalized exact-dedup
    pass (x11 on normalized text) gains, and a spike in it flags
    punctuation/casing noise in one source. The normalizer is audited
    idempotent in tests (f(f(x)) = f(x)) — a non-idempotent
    normalizer silently makes dedup order-dependent.

    Scale shape: one scan with two countDistinct aggregates per
    source (map-side partial; the normalize is a projection). Output
    |sources| rows. No joins."""
    d = tables["documents"].select(
        "source", F.col("text").alias("raw"),
        _norm_spark(F.col("text")).alias("norm"))
    return (d.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("raw").alias("distinct_raw"),
                 F.countDistinct("norm").alias("distinct_norm"))
            .withColumn("collisions",
                        F.col("distinct_raw") - F.col("distinct_norm"))
            .orderBy("source"))


_NORM_COLLISION_ORACLE = f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_raw,
       CAST(COUNT(DISTINCT {_NORM_DUCK.format(c='text')}) AS BIGINT)
           AS distinct_norm,
       CAST(COUNT(DISTINCT text)
            - COUNT(DISTINCT {_NORM_DUCK.format(c='text')}) AS BIGINT)
           AS collisions
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# x222 — k-anonymity census over quasi-identifiers
# ---------------------------------------------------------------------------

def _x222_kanonymity_census(spark, tables):
    """K-ANONYMITY census — the privacy audit run before a table is
    released: under the quasi-identifier (c_nationkey, c_mktsegment),
    every customer belongs to an equivalence class; a released row is
    k-anonymous iff its class has >= k members. The report is the
    class-size OCTAVE histogram (floor(log2 k)+1 — x148's bucketing)
    plus per-bucket row mass, and the headline min class size: if any
    class has 1 member, the release re-identifies someone no matter
    what the k policy says. Suppression/generalization decisions read
    exactly this table.

    Scale shape: one (QI) count aggregate, one |classes|-row octave
    aggregate, a 1-row min crossed in (bounded). No joins."""
    c = tables["customer"]
    cls = (c.groupBy("c_nationkey", "c_mktsegment")
           .agg(F.count("*").alias("k")))
    octv = (cls.groupBy(F.length(F.bin("k")).alias("k_octave"))
            .agg(F.count("*").alias("n_classes"),
                 F.sum("k").alias("n_rows"),
                 F.min("k").alias("min_k"), F.max("k").alias("max_k")))
    overall = cls.agg(F.min("k").alias("global_min_k"))
    return (octv.crossJoin(F.broadcast(overall))
            .select("k_octave", "n_classes", "n_rows", "min_k", "max_k",
                    "global_min_k")
            .orderBy("k_octave"))


_KANON_ORACLE = """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS k
  FROM customer GROUP BY c_nationkey, c_mktsegment
), o AS (
  SELECT CAST(length(bin(k)) AS BIGINT) AS k_octave,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(k) AS BIGINT) AS n_rows,
         MIN(k) AS min_k, MAX(k) AS max_k
  FROM cls GROUP BY length(bin(k))
), g AS (SELECT MIN(k) AS global_min_k FROM cls)
SELECT k_octave, n_classes, n_rows, min_k, max_k, g.global_min_k
FROM o, g ORDER BY k_octave
"""


# ---------------------------------------------------------------------------
# x223 — join-output skew contribution (top keys by produced rows)
# ---------------------------------------------------------------------------

def _x223_join_output_skew(spark, tables):
    """JOIN-OUTPUT skew diagnosis — x109 profiles per-TABLE key skew;
    this profiles what the JOIN will actually produce: for the
    many-to-many (lineitem x orders ON custkey-derived nationkey...
    deliberately the SKEWED shape: lineitem joined to orders via
    orderkey is 1:N and boring, so the audit uses l_suppkey x
    s_suppkey enriched to s_nationkey) — per join key, the output
    contribution is count_left * count_right, WITHOUT running the
    join: two per-key count aggregates multiplied. The report is the
    top-10 nation keys by contribution plus each key's permille of
    total output — the number that says which key AQE's skew split
    (or a salting pass, operators/skew.py) must handle, before any
    shuffle is paid.

    Scale shape: two per-key counts (map-side combinable), a
    |keys|-row join of the two count tables, a bounded top-10. The
    join itself is never executed — that's the point."""
    li = tables["lineitem"]
    s = tables["supplier"]
    left = (li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy(F.col("s_nationkey").alias("key"))
            .agg(F.count("*").alias("cl")))
    right = (tables["customer"]
             .groupBy(F.col("c_nationkey").alias("key"))
             .agg(F.count("*").alias("cr")))
    contrib = (left.join(right, "key")
               .select("key", "cl", "cr",
                       (F.col("cl") * F.col("cr")).alias("out_rows")))
    tot = contrib.agg(F.sum("out_rows").alias("t"))
    w = Window.orderBy(F.col("out_rows").desc(), F.col("key"))
    return (contrib.crossJoin(F.broadcast(tot))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 10)
            .select("key", "cl", "cr", "out_rows",
                    F.expr("out_rows * 1000 div t")
                    .alias("contribution_permille"),
                    F.col("rk").cast("long").alias("rank"))
            .orderBy("rank"))


_JOIN_SKEW_ORACLE = """
WITH l AS (
  SELECT s.s_nationkey AS key, CAST(COUNT(*) AS BIGINT) AS cl
  FROM lineitem li JOIN supplier s ON li.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey
), r AS (
  SELECT c_nationkey AS key, CAST(COUNT(*) AS BIGINT) AS cr
  FROM customer GROUP BY c_nationkey
), c AS (
  SELECT l.key, l.cl, r.cr, l.cl * r.cr AS out_rows
  FROM l JOIN r USING (key)
), t AS (SELECT CAST(SUM(out_rows) AS BIGINT) AS t FROM c),
rk AS (
  SELECT key, cl, cr, out_rows,
         ROW_NUMBER() OVER (ORDER BY out_rows DESC, key) AS rank
  FROM c
)
SELECT rk.key, rk.cl, rk.cr, rk.out_rows,
       rk.out_rows * 1000 // t.t AS contribution_permille,
       CAST(rank AS BIGINT) AS rank
FROM rk, t WHERE rank <= 10 ORDER BY rank
"""


# ---------------------------------------------------------------------------
# x224 — semi-supervised label propagation over dup-blocking keys
# ---------------------------------------------------------------------------


def _x224_label_propagation(spark, tables):
    """Semi-supervised LABEL PROPAGATION through the dedup blocking
    graph — the curation move the registry was missing: a vetted seed
    subset (every 3rd doc keeps its source as a provenance/quality
    label) spreads to unlabeled docs via two synchronous majority
    rounds over ALTERNATING blocking keys (8-token prefix, then
    8-token suffix — the same boilerplate keys x95/x99 block on), so
    labels travel along prefix-suffix chains no single key connects.
    Majority ties break to the MIN label; the census reports, per
    final label, the seed count, the count labeled after round 1, and
    the final count — the adoption funnel a curator reads before
    trusting propagated labels.

    Scale shape: two ``majority_label_round`` calls
    (operators/components.py) — each ONE count aggregate + one
    keys-sized argmax + one same-key left join; label cardinality is
    |sources|-bounded, nothing pairwise, no windows. The suffix key
    is spelled ``reverse -> first 8`` (order is irrelevant for a
    blocking key, and both engines slice reversed lists identically
    for short docs)."""
    from hive_parse_lineage_spark.operators.components import (
        majority_label_round)
    toks = F.split(F.col("text"), " ")
    base = tables["documents"].select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 8), " ").alias("pre"),
        F.array_join(F.slice(F.reverse(toks), 1, 8), " ").alias("suf"),
        F.when(F.col("doc_id") % 3 == 0, F.col("source")).alias("seed"))
    r1 = majority_label_round(base.withColumn("lab1", F.col("seed")),
                              "pre", "lab1")
    r2 = majority_label_round(r1.withColumn("lab2", F.col("lab1")),
                              "suf", "lab2")
    return (r2.filter(F.col("lab2").isNotNull())
            .groupBy(F.col("lab2").alias("label"))
            .agg(F.sum(F.col("seed").isNotNull().cast("long"))
                 .alias("n_seed"),
                 F.sum(F.col("lab1").isNotNull().cast("long"))
                 .alias("n_after_r1"),
                 F.count("*").alias("n_after_r2"))
            .orderBy("label"))


_LABEL_PROP_ORACLE = """
WITH base AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
           AS pre,
         array_to_string(
           list_slice(list_reverse(string_split(text, ' ')), 1, 8), ' ')
           AS suf,
         CASE WHEN doc_id % 3 = 0 THEN source END AS seed
  FROM documents
), c1 AS (
  SELECT pre, seed AS l, COUNT(*) AS c FROM base
  WHERE seed IS NOT NULL GROUP BY pre, seed
), w1 AS (
  SELECT pre, l AS win FROM (
    SELECT pre, l,
           ROW_NUMBER() OVER (PARTITION BY pre ORDER BY c DESC, l) AS rn
    FROM c1) WHERE rn = 1
), r1 AS (
  SELECT base.*, COALESCE(seed, w1.win) AS lab1
  FROM base LEFT JOIN w1 USING (pre)
), c2 AS (
  SELECT suf, lab1 AS l, COUNT(*) AS c FROM r1
  WHERE lab1 IS NOT NULL GROUP BY suf, lab1
), w2 AS (
  SELECT suf, l AS win FROM (
    SELECT suf, l,
           ROW_NUMBER() OVER (PARTITION BY suf ORDER BY c DESC, l) AS rn
    FROM c2) WHERE rn = 1
), r2 AS (
  SELECT r1.*, COALESCE(lab1, w2.win) AS lab2
  FROM r1 LEFT JOIN w2 USING (suf)
)
SELECT lab2 AS label,
       CAST(SUM(CASE WHEN seed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seed,
       CAST(SUM(CASE WHEN lab1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after_r1,
       CAST(COUNT(*) AS BIGINT) AS n_after_r2
FROM r2 WHERE lab2 IS NOT NULL
GROUP BY lab2 ORDER BY label
"""


# ---------------------------------------------------------------------------
# x225 — content-defined chunking + duplicate-chunk census
# ---------------------------------------------------------------------------

#: Gear-style CDC parameters: cut after a 4-token window whose hash is
#: ≡ 0 (mod 32) → expected chunk ≈ 36 tokens. Production FastCDC adds
#: min/max chunk caps; the census spelling keeps the pure cut rule so
#: the oracle replays it verbatim.
_CDC_W, _CDC_D = 4, 32


def _cdc_chunk_stream(tables):
    """x225's chunk stream — (doc_id, source, n_tok, h, chunk): the
    Gear-rule cut positions as a per-doc array program, exploded to
    one row per chunk with both the 60-bit fingerprint (the census
    key) and the chunk TEXT (so the collision spot-check in
    tests/test_audit_queries.py can re-run the census text-keyed on
    real-SF data and measure, not argue, the collision-free
    assumption)."""
    w, dv = _CDC_W, _CDC_D
    from hive_parse_lineage_spark.functions.text import (
        portable_hash64, word_shingles)
    d = tables["documents"].select(
        "doc_id", "source", F.split("text", " ").alias("t"),
        word_shingles("text", w).alias("s"))
    hj = ("CAST(CONV(SUBSTRING(MD5(element_at(s, j)), 1, 15), 16, 10) "
          "AS BIGINT)")
    cuts = F.expr(
        f"concat(array(1), "
        f"transform(filter(sequence(1, size(s)), "
        f"j -> {hj} % {dv} = 0 AND j + {w} <= size(t)), j -> j + {w}), "
        f"array(size(t) + 1))")
    ch = (d.withColumn("cuts", cuts)
          .select("doc_id", "source",
                  F.explode(F.expr(
                      "transform(sequence(1, size(cuts) - 1), m -> "
                      "concat_ws(' ', slice(t, element_at(cuts, m), "
                      "element_at(cuts, m + 1) - element_at(cuts, m))))"))
                  .alias("chunk")))
    return ch.select("doc_id", "source", "chunk",
                     F.size(F.split("chunk", " ")).cast("long")
                     .alias("n_tok"),
                     portable_hash64("chunk").alias("h"))


def _x225_cdc_chunking(spark, tables):
    """CONTENT-DEFINED CHUNKING census — the boundary-stable dedup
    primitive x53's fixed-stride windows cannot provide: chunk cuts
    land where a rolling 4-token window's hash ≡ 0 (mod 32) (Gear/
    FastCDC rule), so inserting a sentence shifts ONE chunk instead of
    re-aligning every window after it — the property that makes
    chunk-level dedup and incremental corpus diffing survive edits.
    Per source: chunk count, token mass, cross-doc duplicate chunks
    (chunk fingerprint seen in ≥2 distinct docs), duplicate token
    permille, and mean chunk size — the dial for picking the divisor
    before a chunk-store is built.

    Collision exposure (documented, like the 60-bit-hash remark
    below): the dup census keys on the 60-bit chunk fingerprint, not
    the chunk text — a fingerprint collision between two distinct
    chunks inflates n_dup_chunks/dup_tok_mass, and because the DuckDB
    oracle replays the same hash the gate cannot see it (the python
    differential test compares by TEXT, but only on toy data).
    Expected collisions ≈ n²/2^61 — negligible below ~10^8 distinct
    chunks; past that, group on the chunk text itself (the x75
    exact-dedup shuffle width) or widen the fingerprint.

    Scale shape: chunking is a pure per-doc array program (shingle
    hashes → cut positions → slices) — zero shuffles until the dup
    census, which is ONE hash shuffle on the chunk fingerprint (the
    exact-dedup shape) plus one per-source aggregate. The 60-bit
    md5-fold hash is the portable replay spelling; production swaps
    xxhash64 into the same cut rule."""
    ck = _cdc_chunk_stream(tables)
    dup = ck.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    return (ck.join(dup, "h")
            .groupBy("source")
            .agg(F.count("*").alias("n_chunks"),
                 F.sum("n_tok").alias("tok_mass"),
                 F.sum((F.col("nd") >= 2).cast("long"))
                 .alias("n_dup_chunks"),
                 F.sum(F.when(F.col("nd") >= 2, F.col("n_tok"))
                       .otherwise(F.lit(0))).alias("dup_tok_mass"))
            .withColumn("dup_tok_permille",
                        F.expr("dup_tok_mass * 1000 div tok_mass"))
            .withColumn("mean_chunk_tok",
                        F.expr("tok_mass div n_chunks"))
            .orderBy("source"))


def _cdc_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    w, dv = _CDC_W, _CDC_D
    hj = portable_hash64_sql("sh[j]")
    hc = portable_hash64_sql("chunk")
    return f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS t, text
  FROM documents
), s AS (
  SELECT doc_id, source, t,
         CASE WHEN len(t) >= {w} THEN list_transform(
             range(1, len(t) - {w - 2}), i ->
             array_to_string(list_slice(t, i, i + {w - 1}), ' '))
         ELSE [text] END AS sh
  FROM d
), c AS (
  SELECT doc_id, source, t,
         list_concat(list_concat(
             [1],
             list_transform(list_filter(range(1, len(sh) + 1),
                 j -> ({hj}) % {dv} = 0 AND j + {w} <= len(t)),
                 j -> j + {w})),
             [len(t) + 1]) AS cuts
  FROM s
), ch AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(cuts)), m ->
             array_to_string(
                 list_slice(t, cuts[m], cuts[m + 1] - 1), ' '))) AS chunk
  FROM c
), ck AS (
  SELECT doc_id, source,
         CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok,
         {hc} AS h
  FROM ch
), dup AS (
  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ck GROUP BY h
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tok) AS BIGINT) AS tok_mass,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(SUM(CASE WHEN nd >= 2 THEN n_tok ELSE 0 END) AS BIGINT)
         AS dup_tok_mass,
       CAST(SUM(CASE WHEN nd >= 2 THEN n_tok ELSE 0 END) * 1000
            // SUM(n_tok) AS BIGINT) AS dup_tok_permille,
       CAST(SUM(n_tok) // COUNT(*) AS BIGINT) AS mean_chunk_tok
FROM ck JOIN dup USING (h)
GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# x226 — exact mergeable bitmap distinct
# ---------------------------------------------------------------------------


def _x226_bitmap_distinct(spark, tables):
    """EXACT distinct counting as a MERGEABLE bitmap fold — the
    missing exact member of the cardinality family (KMV x108 / CMS
    x104 / histogram x131 / HLL are all approximate): per event_type,
    user ids fold into 62-bit words (``bucket = id div 62``, ``bit =
    id mod 62``) via ``bit_or`` — a commutative monoid, so per-shard
    partials merge without re-scanning, the property countDistinct's
    expand-shuffle lacks and the reason warehouse rollups precompute
    bitmap columns (the roaring-bitmap pattern). The census emits the
    bitmap count NEXT TO the plain ``countDistinct`` with their
    difference, which must be 0 on every row — the in-band equality
    proof (x223's verified-equal posture).

    Scale shape: one (event_type, bucket) bit_or aggregate (map-side
    combinable; partial rows ≈ |ids|/62 per group, dense-id layout —
    sparse 64-bit key spaces compress buckets roaring-style, the
    documented swap) + one word-count rollup + one |event_types|-row
    join against the plain spelling. All integer.

    Sign safety: ``bit = ((id % 62) + 62) % 62`` (a portable pmod —
    Spark's and DuckDB's ``%`` both follow the dividend sign) and
    ``bucket = (id - bit) div 62`` (exactly divisible, so truncating
    DIV equals floor division) — negative ids land in well-defined
    (bucket, bit) cells in BOTH engines instead of Java's masked
    shift count silently setting an arbitrary bit."""
    ev = tables["events"].select("event_type", "user_id")
    pm = "((user_id % 62) + 62) % 62"
    words = (ev.groupBy("event_type",
                        F.expr(f"(user_id - ({pm})) div 62")
                        .alias("bucket"))
             .agg(F.expr(f"bit_or(shiftleft(1L, "
                         f"CAST({pm} AS INT)))").alias("bits")))
    bm = (words.groupBy("event_type")
          .agg(F.sum(F.bit_count("bits")).alias("distinct_bitmap"),
               F.count("*").alias("n_words")))
    plain = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("distinct_plain"),
                  F.count("*").alias("n_events")))
    return (bm.join(plain, "event_type")
            .select("event_type", "n_events", "n_words",
                    "distinct_bitmap", "distinct_plain",
                    (F.col("distinct_bitmap") - F.col("distinct_plain"))
                    .alias("diff"))
            .orderBy("event_type"))


_BITMAP_DISTINCT_ORACLE = """
WITH ev AS (
  SELECT event_type, user_id FROM events
), words AS (
  SELECT event_type,
         (user_id - (((user_id % 62) + 62) % 62)) // 62 AS bucket,
         bit_or(1::BIGINT
                << CAST(((user_id % 62) + 62) % 62 AS INTEGER)) AS bits
  FROM ev
  GROUP BY event_type, (user_id - (((user_id % 62) + 62) % 62)) // 62
), bm AS (
  SELECT event_type,
         CAST(SUM(bit_count(bits)) AS BIGINT) AS distinct_bitmap,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM words GROUP BY event_type
), plain AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_plain,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ev GROUP BY event_type
)
SELECT bm.event_type, n_events, n_words, distinct_bitmap, distinct_plain,
       distinct_bitmap - distinct_plain AS diff
FROM bm JOIN plain USING (event_type)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# x227 — zone-map skip-rate audit
# ---------------------------------------------------------------------------

#: (predicate name, column tag, inclusive lo, inclusive hi) — cents =
#: FLOOR(o_totalprice*100) (the x137 both-engines spelling), cust =
#: o_custkey. Constants are SF-independent absolute values.
_ZONEMAP_PREDS = (
    ("price_band", "cents", 10_000_000, 20_000_000),
    ("price_high", "cents", 40_000_000, 9_223_372_036_854_775_000),
    ("cust_low", "cust", 0, 100),
)


def _x227_zonemap_skips(spark, tables):
    """ZONE-MAP (min/max skipping index) audit — the READ-side
    complement to x214's layout spans: orders split into 64 id-range
    blocks (the row-group model), per block the min/max of
    price-cents and custkey, then for three fixed range predicates
    the permille of blocks a scanner could SKIP (``max < lo OR min >
    hi``) next to the predicate's true row selectivity. The gap
    between the two columns is the finding: a selective predicate on
    a column UNCORRELATED with the layout order prunes nothing — the
    number that justifies (or kills) a sort/Z-order rewrite before
    it is paid for, and exactly what parquet row-group pruning will
    and won't do on this layout.

    Scale shape: one 64-group min/max aggregate (map-side combinable)
    + one 3-way conditional-count aggregate for the selectivities —
    two cheap scans, 3 output rows; the zone-map table itself is the
    |blocks|-row broadcast class."""
    o = tables["orders"].select(
        "o_orderkey", F.col("o_custkey").alias("cust"),
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias("cents"))
    mx = o.agg(F.max("o_orderkey").alias("mx"))
    b = (o.crossJoin(F.broadcast(mx))
         .select(F.expr("o_orderkey * 64 div (mx + 1)").alias("block"),
                 "cust", "cents"))
    zm = b.groupBy("block").agg(
        F.min("cents").alias("min_cents"), F.max("cents").alias("max_cents"),
        F.min("cust").alias("min_cust"), F.max("cust").alias("max_cust"))
    preds = F.array(*[
        F.struct(F.lit(n).alias("pred"), F.lit(t).alias("tag"),
                 F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
        for n, t, lo, hi in _ZONEMAP_PREDS])
    skips = (zm.select(F.explode(preds).alias("p"), "*")
             .select("p.*", "min_cents", "max_cents", "min_cust", "max_cust")
             .groupBy("pred")
             .agg(F.count("*").alias("n_blocks"),
                  F.sum(F.expr(
                      "CASE WHEN (tag = 'cents' AND (max_cents < lo "
                      "OR min_cents > hi)) OR (tag = 'cust' AND "
                      "(max_cust < lo OR min_cust > hi)) "
                      "THEN 1 ELSE 0 END")).alias("n_skippable")))
    sel = (b.select(F.explode(preds).alias("p"), "cents", "cust")
           .select("p.*", "cents", "cust")
           .groupBy("pred")
           .agg(F.sum(F.expr(
                    "CASE WHEN (tag = 'cents' AND cents BETWEEN lo AND hi)"
                    " OR (tag = 'cust' AND cust BETWEEN lo AND hi) "
                    "THEN 1 ELSE 0 END")).alias("matched"),
                F.count("*").alias("n")))
    return (skips.join(sel, "pred")
            .select("pred", "n_blocks", "n_skippable",
                    F.expr("n_skippable * 1000 div n_blocks")
                    .alias("skip_permille"),
                    F.expr("matched * 1000 div n").alias("match_permille"))
            .orderBy("pred"))


def _zonemap_oracle_sql() -> str:
    pred_rows = ", ".join(
        f"('{n}', '{t}', {lo}, {hi})" for n, t, lo, hi in _ZONEMAP_PREDS)
    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey AS cust,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), mx AS (SELECT MAX(o_orderkey) AS mx FROM o),
b AS (
  SELECT o.o_orderkey * 64 // (mx.mx + 1) AS block, cust, cents
  FROM o, mx
), zm AS (
  SELECT block, MIN(cents) AS min_cents, MAX(cents) AS max_cents,
         MIN(cust) AS min_cust, MAX(cust) AS max_cust
  FROM b GROUP BY block
), preds(pred, tag, lo, hi) AS (VALUES {pred_rows}),
skips AS (
  SELECT pred,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(CASE WHEN (tag = 'cents' AND (max_cents < lo OR min_cents > hi))
                         OR (tag = 'cust' AND (max_cust < lo OR min_cust > hi))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable
  FROM zm, preds GROUP BY pred
), sel AS (
  SELECT pred,
         CAST(SUM(CASE WHEN (tag = 'cents' AND cents BETWEEN lo AND hi)
                         OR (tag = 'cust' AND cust BETWEEN lo AND hi)
                  THEN 1 ELSE 0 END) AS BIGINT) AS matched,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM b, preds GROUP BY pred
)
SELECT s.pred, n_blocks, n_skippable,
       n_skippable * 1000 // n_blocks AS skip_permille,
       matched * 1000 // n AS match_permille
FROM skips s JOIN sel USING (pred)
ORDER BY pred
"""


# ---------------------------------------------------------------------------
# x228 — sequence-packing audit (concat-and-chunk)
# ---------------------------------------------------------------------------

#: Training-sequence token capacity for the packing audit. Small
#: enough that boundary crossings exist at every SF; the rule is
#: capacity-agnostic.
_PACK_C = 512


def _x228_sequence_packing(spark, tables):
    """SEQUENCE-PACKING audit — the step between a cleaned corpus and
    a training run: GPT-style packing concatenates all documents in a
    fixed order and cuts every ``_PACK_C`` tokens, so any document
    whose token span straddles a cut boundary is SPLIT across training
    sequences (attention never sees it whole). Per source: doc count,
    token mass, docs split at least once, split permille, total
    (doc, sequence) incidences — ``seqs_touched`` = sum over docs of
    crossings+1, the collator's work list — and the worst single
    document's crossing count. The split permille is the number that
    decides between plain concat-packing and a boundary-respecting
    packer before either is built.

    Pure arithmetic on the EXCLUSIVE global prefix sum of token
    counts in doc_id order: a doc spanning [start, start+n) is split
    iff ``(start+n-1) div C > start div C``, and crosses exactly
    ``(start+n-1) div C - start div C`` boundaries. All integer.

    Scale shape: ONE global running sum in a stable total order
    (doc_id) + one per-source aggregate; no joins. The AT-SCALE path
    is code: ``SPARK_GRAFT_APPROX_QUANTILES=1`` swaps the
    single-partition window cumsum for
    ``range_partitioned_running_sum`` (operators/ranks.py — per-range
    sums + a bounded |ranges|-row exclusive prefix fold),
    VALUE-IDENTICAL (integral addends, oracle-gated flag-on by
    tests/test_atscale_flags.py)."""
    import os
    d = tables["documents"].select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n"))
    if os.environ.get("SPARK_GRAFT_APPROX_QUANTILES", "") == "1":
        from hive_parse_lineage_spark.operators.ranks import (
            range_partitioned_running_sum)
        c = (range_partitioned_running_sum(d, ["doc_id"], "n", "_cs")
             .withColumn("start", F.col("_cs") - F.col("n")).drop("_cs"))
    else:
        w = (Window.orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        c = d.select("source", "n",
                     (F.sum("n").over(w) - F.col("n")).alias("start"))
    C = _PACK_C
    x = c.select(
        "source", "n",
        F.expr(f"(start + n - 1) div {C} - start div {C}").alias("nc"))
    return (x.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n").alias("tok_mass"),
                 F.sum((F.col("nc") >= 1).cast("long")).alias("docs_split"),
                 F.sum(F.col("nc") + 1).alias("seqs_touched"),
                 F.max("nc").alias("max_crossings"))
            .withColumn("split_permille",
                        F.expr("docs_split * 1000 div n_docs"))
            .select("source", "n_docs", "tok_mass", "docs_split",
                    "split_permille", "seqs_touched", "max_crossings")
            .orderBy("source"))


_SEQUENCE_PACKING_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT source, n,
         SUM(n) OVER (ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n AS start
  FROM d
), x AS (
  SELECT source, n,
         (start + n - 1) // {_PACK_C} - start // {_PACK_C} AS nc
  FROM c
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS tok_mass,
       CAST(SUM(CASE WHEN nc >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_split,
       CAST(SUM(CASE WHEN nc >= 1 THEN 1 ELSE 0 END) * 1000
            // COUNT(*) AS BIGINT) AS split_permille,
       CAST(SUM(nc + 1) AS BIGINT) AS seqs_touched,
       CAST(MAX(nc) AS BIGINT) AS max_crossings
FROM x GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# x229 — Bloom-filter semi-join audit (runtime filter)
# ---------------------------------------------------------------------------

#: Bloom geometry: m bits (62-bit words like x226), k=2 portable
#: hashes. Filter predicate is x227's absolute price_high band so the
#: key set is SF-proportional but rule-stable.
_BLOOM_M = 1 << 18
_BLOOM_CENTS_LO = 40_000_000


def _x229_bloom_semijoin(spark, tables):
    """RUNTIME-FILTER (Bloom semi-join) audit — the write-side
    complement to x227's zone maps: the keys of a selective orders
    predicate (price-cents >= the x227 high band) fold into an m-bit
    Bloom filter (k=2 portable hashes, 62-bit ``bit_or`` words — the
    x226 monoid, so per-shard partials merge), and every lineitem row
    probes it. Reported next to the TRUE semi-join: probe count, true
    matches, Bloom passes, false positives, and the false-positive
    permille over true negatives — the measured number that says what
    a runtime filter (Spark's bloom-filter join / DPP analogues) would
    actually deliver on THIS key distribution, versus the m/k theory.
    Bloom has no false negatives by construction; the gate enforces it
    in-band (n_pass >= n_true on every run, and any missed true match
    changes both counts).

    Scale shape: filter side is one map-side-combinable word aggregate
    (|words| <= min(2|keys|, m/62+1) — the BROADCAST class at any SF,
    m is fixed); the probe is two broadcast equi-joins on the word
    index + a projection (map-side, zero shuffles on the fact table);
    the truth column is the one real shuffle (the exact semi-join the
    Bloom exists to avoid) — kept because this entry's job is to
    MEASURE the filter against the truth."""
    from hive_parse_lineage_spark.functions.text import portable_hash64
    orders = tables["orders"].select(
        "o_orderkey",
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias("cents"))
    keys = (orders.filter(F.col("cents") >= _BLOOM_CENTS_LO)
            .select("o_orderkey").distinct())
    m = _BLOOM_M

    def bit(col, salt):
        return F.pmod(portable_hash64(
            F.concat(F.lit(salt + "|"), F.col(col).cast("string"))),
            F.lit(m))

    bits = keys.select(
        F.explode(F.array(bit("o_orderkey", "s1"),
                          bit("o_orderkey", "s2"))).alias("b"))
    words = (bits.groupBy(F.expr("b div 62").alias("bucket"))
             .agg(F.expr("bit_or(shiftleft(1L, CAST(b % 62 AS INT)))")
                  .alias("bits")))
    li = tables["lineitem"].select(F.col("l_orderkey").alias("k"))
    probe = li.select(
        "k", bit("k", "s1").alias("b1"), bit("k", "s2").alias("b2"))
    w1 = words.select(F.col("bucket").alias("k1"),
                      F.col("bits").alias("w1"))
    w2 = words.select(F.col("bucket").alias("k2"),
                      F.col("bits").alias("w2"))
    tested = (probe
              .withColumn("k1", F.expr("b1 div 62"))
              .withColumn("k2", F.expr("b2 div 62"))
              .join(F.broadcast(w1), "k1", "left")
              .join(F.broadcast(w2), "k2", "left")
              .select("k", F.expr(
                  "COALESCE(shiftright(w1, CAST(b1 % 62 AS INT)) & 1, 0) = 1 "
                  "AND "
                  "COALESCE(shiftright(w2, CAST(b2 % 62 AS INT)) & 1, 0) = 1")
                  .alias("pass")))
    truth = (tested.join(keys.withColumnRenamed("o_orderkey", "k")
                         .withColumn("is_true", F.lit(1)), "k", "left")
             .select("pass", F.coalesce("is_true", F.lit(0)).alias("t")))
    n_words = words.count()
    return (truth.agg(
                F.count("*").alias("n_probe"),
                F.sum("t").alias("n_true"),
                F.sum(F.col("pass").cast("long")).alias("n_pass"))
            .select(F.lit(m).alias("m_bits"),
                    F.lit(int(n_words)).alias("n_words"),
                    "n_probe", "n_true", "n_pass",
                    (F.col("n_pass") - F.col("n_true")).alias("false_pos"),
                    F.expr("CASE WHEN n_probe - n_true > 0 THEN "
                           "(n_pass - n_true) * 1000000 div "
                           "(n_probe - n_true) ELSE 0 END")
                    .alias("fp_per_million")))


def _bloom_oracle_sql() -> str:
    from hive_parse_lineage_spark.functions.text import portable_hash64_sql
    m = _BLOOM_M
    h1 = portable_hash64_sql("'s1|' || CAST(o_orderkey AS VARCHAR)")
    h2 = portable_hash64_sql("'s2|' || CAST(o_orderkey AS VARCHAR)")
    p1 = portable_hash64_sql("'s1|' || CAST(k AS VARCHAR)")
    p2 = portable_hash64_sql("'s2|' || CAST(k AS VARCHAR)")
    return f"""
WITH keys AS (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) >= {_BLOOM_CENTS_LO}
), bits AS (
  SELECT unnest([({h1}) % {m}, ({h2}) % {m}]) AS b FROM keys
), words AS (
  SELECT b // 62 AS bucket,
         bit_or(1::BIGINT << CAST(b % 62 AS INTEGER)) AS bits
  FROM bits GROUP BY b // 62
), probe AS (
  SELECT l_orderkey AS k, (({p1}) % {m}) AS b1, (({p2}) % {m}) AS b2
  FROM lineitem
), tested AS (
  SELECT p.k,
         COALESCE(w1.bits >> CAST(p.b1 % 62 AS INTEGER), 0) & 1 = 1
         AND COALESCE(w2.bits >> CAST(p.b2 % 62 AS INTEGER), 0) & 1 = 1
           AS pass
  FROM probe p
  LEFT JOIN words w1 ON w1.bucket = p.b1 // 62
  LEFT JOIN words w2 ON w2.bucket = p.b2 // 62
), truth AS (
  SELECT pass, CASE WHEN k IN (SELECT o_orderkey FROM keys)
               THEN 1 ELSE 0 END AS t
  FROM tested
)
SELECT CAST({m} AS BIGINT) AS m_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM words) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_probe,
       CAST(SUM(t) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) - SUM(t) AS BIGINT)
         AS false_pos,
       CAST(CASE WHEN COUNT(*) - SUM(t) > 0 THEN
            (SUM(CASE WHEN pass THEN 1 ELSE 0 END) - SUM(t)) * 1000000
            // (COUNT(*) - SUM(t)) ELSE 0 END AS BIGINT)
         AS fp_per_million
FROM truth
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
        "x213_merkle_bucket_diff": _q(_x213_merkle_bucket_diff),
        "x214_zorder_clustering": _q(_x214_zorder_clustering),
        "x215_interarrival_octaves": _q(_x215_interarrival_octaves),
        "x216_bucket_balance_audit": _q(_x216_bucket_balance_audit),
        "x217_deletion_propagation": _q(_x217_deletion_propagation),
        "x218_sparse_tfidf_pairs": _q(_x218_sparse_tfidf_pairs),
        "x219_hamilton_allocation": _q(_x219_hamilton_allocation),
        "x220_hazard_table": _q(_x220_hazard_table),
        "x221_normalization_collisions": _q(_x221_normalization_collisions),
        "x222_kanonymity_census": _q(_x222_kanonymity_census),
        "x223_join_output_skew": _q(_x223_join_output_skew),
        "x224_label_propagation": _q(_x224_label_propagation),
        "x225_cdc_chunking": _q(_x225_cdc_chunking),
        "x226_bitmap_distinct": _q(_x226_bitmap_distinct),
        "x227_zonemap_skips": _q(_x227_zonemap_skips),
        "x228_sequence_packing": _q(_x228_sequence_packing),
        "x229_bloom_semijoin": _q(_x229_bloom_semijoin),
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
        "x213_merkle_bucket_diff": _merkle_oracle_sql(),
        "x214_zorder_clustering": _zorder_oracle_sql(),
        "x215_interarrival_octaves": _INTERARRIVAL_ORACLE,
        "x216_bucket_balance_audit": _bucket_balance_oracle_sql(),
        "x217_deletion_propagation": _DELETION_ORACLE,
        "x218_sparse_tfidf_pairs": _SPARSE_TFIDF_ORACLE,
        "x219_hamilton_allocation": _HAMILTON_ORACLE,
        "x220_hazard_table": _HAZARD_ORACLE,
        "x221_normalization_collisions": _NORM_COLLISION_ORACLE,
        "x222_kanonymity_census": _KANON_ORACLE,
        "x223_join_output_skew": _JOIN_SKEW_ORACLE,
        "x224_label_propagation": _LABEL_PROP_ORACLE,
        "x225_cdc_chunking": _cdc_oracle_sql(),
        "x226_bitmap_distinct": _BITMAP_DISTINCT_ORACLE,
        "x227_zonemap_skips": _zonemap_oracle_sql(),
        "x228_sequence_packing": _SEQUENCE_PACKING_ORACLE,
        "x229_bloom_semijoin": _bloom_oracle_sql(),
    }
