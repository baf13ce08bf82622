"""Approximate-nearest-neighbor search over embedding columns.

Two paths:

- **Brute-force cosine top-k** (the correctness baseline): broadcast the
  query vectors, JVM-side dot products (``zip_with``/``aggregate``),
  window top-k per query. At 100 TB the corpus side never shuffles —
  the only wide operation is the per-query top-k aggregation, which is
  bounded by k·n_queries rows after map-side partial aggregation.
- **Random-hyperplane LSH** (the scale path): precomputed deterministic
  hyperplanes fold into the plan as literals; each vector gets an
  n-bit signature; candidates are restricted to signature buckets
  (equi-join on the bucket key — uniform shuffle), then reranked
  exactly. Recall is tunable via n_bits / n_tables.

A NumPy-vectorized ``mapInPandas`` variant is provided for wide vectors
where Arrow-batched BLAS beats codegen expression trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hive_parse_lineage_spark.functions.vector import dot, norm


def _norm_col(vec_col: str):
    return norm(vec_col)


def _quote_ident(name: str) -> str:
    """Backtick-quote a column name for interpolation into SQL text,
    matching ``F.col``'s treatment of special characters."""
    return "`" + name.replace("`", "``") + "`"


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    ``queries``: (query_id, embedding). The query side is broadcast —
    corpus partitions stay put. Ties broken by corpus id for
    determinism.
    """
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("q_vec"),
                       _norm_col(vec_col).alias("q_norm"))
    c = corpus.select(F.col(id_col),
                      F.col(vec_col).alias("c_vec"),
                      _norm_col(vec_col).alias("c_norm"))
    cos = (dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine")
    scored = c.crossJoin(F.broadcast(q)).select(query_id_col, id_col, cos)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col,
                          F.round("cosine", 4).alias("cosine"), "rank"))


def hard_negatives(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   query_id_col: str = "query_id",
                   label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive / metric-learning training
    sets: per query vector, the top-k most-similar corpus vectors with
    a DIFFERENT label (the negatives that sit closest to the decision
    boundary — the ones worth training on).

    Same plan shape as :func:`cosine_topk` — queries broadcast, corpus
    partitions never shuffle, one bounded per-query top-k window — with
    the label inequality applied BEFORE the window, so same-class
    neighbors never occupy negative ranks. At 100 TB this is one corpus
    scan per mining batch regardless of query count.
    """
    q = queries.select(F.col(query_id_col),
                       F.col(label_col).alias("q_label"),
                       F.col(vec_col).alias("q_vec"),
                       _norm_col(vec_col).alias("q_norm"))
    c = corpus.select(F.col(id_col), F.col(label_col),
                      F.col(vec_col).alias("c_vec"),
                      _norm_col(vec_col).alias("c_norm"))
    cos = (dot("q_vec", "c_vec")
           / (F.col("q_norm") * F.col("c_norm"))).alias("cosine")
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col(label_col) != F.col("q_label"))
              .select(query_id_col, id_col, label_col, cos))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"),
                                                 F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col, label_col,
                          F.round("cosine", 4).alias("cosine"), "rank"))


def hyperplane_signature(df: DataFrame, planes, vec_col: str = "embedding",
                         out_col: str = "sig") -> DataFrame:
    """n-bit signature: bit i = 1 iff dot(vec, plane_i) > 0.

    ``planes``: list of python float lists (deterministic, seeded by the
    caller). They fold into the plan as literals — no broadcast needed.
    """
    # One parsed expression for the whole signature instead of
    # n_bits x dim Column calls (the Column trees dominated the ANN
    # entries' driver wall — measured r12, see dedup._min_register_aggs).
    # repr(float) round-trips exactly and Spark's 'xD' literal parses
    # with Double.parseDouble, so the plane literals are bit-identical
    # to the former F.lit(float(v)) spelling. The column name is
    # backtick-quoted so names F.col() used to handle (dots, spaces)
    # still resolve as a COLUMN, not a nested-field path (r12 ADVICE).
    vc = _quote_ident(vec_col)
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(f"{float(v)!r}D" for v in p)
        d = (f"aggregate(zip_with({vc}, array({lits}), "
             "(x, y) -> cast(x as double) * y), 0.0D, (acc, x) -> acc + x)")
        terms.append(f"(CASE WHEN {d} > 0 THEN "
                     f"shiftleft(CAST(1 AS BIGINT), {i}) "
                     "ELSE CAST(0 AS BIGINT) END)")
    return df.withColumn(out_col, F.expr(" | ".join(terms)))


def make_planes(n_bits: int, dim: int, seed: int = 42):
    """Deterministic Gaussian hyperplanes."""
    import numpy as np
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_bits: int = 12, dim: int = 64, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: compare only within matching signature buckets.

    At 100 TB: corpus signatures are a pure projection; the bucket join
    shuffles corpus rows once on a ~uniform 2^n_bits-valued key. Recall
    loss is the price; increase bucket probing (multi-table) for higher
    recall.
    """
    planes = make_planes(n_bits, dim, seed)
    c = hyperplane_signature(
        corpus.select(id_col, vec_col), planes, vec_col).withColumnRenamed(vec_col, "c_vec")
    q = hyperplane_signature(
        queries.select(query_id_col, vec_col), planes, vec_col).withColumnRenamed(vec_col, "q_vec")
    joined = c.join(F.broadcast(q), "sig")
    cos = (dot("q_vec", "c_vec")
           / (F.sqrt(dot("c_vec", "c_vec")) * F.sqrt(dot("q_vec", "q_vec")))).alias("cosine")
    scored = joined.select(query_id_col, id_col, cos)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col,
                          F.round("cosine", 4).alias("cosine"), "rank"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id",
             sample_size: int = 10_000) -> DataFrame:
    """IVF-style ANN: k-means centroids partition the corpus into
    inverted lists; each query probes its ``n_probe`` nearest centroids
    and reranks exactly within them.

    Centroids come from a driver-side NumPy k-means over a bounded
    sample (``sample_size`` rows — constant memory regardless of corpus
    size) and fold into the plan as literals. At 100 TB the corpus pass
    is: one projection to compute the nearest-centroid id, then an
    equi-join on (centroid id) with the broadcast query×probe list —
    a single uniform-ish shuffle, no cross join.
    """
    cents = _ivf_centroids(corpus, n_centroids, seed, vec_col, id_col,
                           sample_size)
    nearest_expr = _nearest_centroid_expr(cents)

    c = corpus.select(
        id_col, F.col(vec_col).alias("c_vec"),
        F.element_at(nearest_expr(vec_col, 1), 1).alias("cell"))
    q = queries.select(
        query_id_col, F.col(vec_col).alias("q_vec"),
        F.explode(nearest_expr(vec_col, n_probe)).alias("cell"))
    joined = c.join(F.broadcast(q), "cell")
    cos = (dot("q_vec", "c_vec")
           / (F.sqrt(dot("c_vec", "c_vec")) * F.sqrt(dot("q_vec", "q_vec")))).alias("cosine")
    scored = joined.select(query_id_col, id_col, cos)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col,
                          F.round("cosine", 4).alias("cosine"), "rank"))


def _ivf_centroids(corpus: DataFrame, n_centroids: int, seed: int,
                   vec_col: str, id_col: str, sample_size: int):
    """Driver-side NumPy k-means over a bounded deterministic sample
    (TakeOrdered on the id — heap per partition, no full sort), so
    centroids are reproducible across runs/re-plans. Constant driver
    memory regardless of corpus size."""
    import numpy as np

    sample = np.array(
        [r[vec_col] for r in corpus.select(id_col, vec_col)
                              .orderBy(id_col).limit(sample_size).collect()],
        dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                              replace=False)]
    for _ in range(10):  # Lloyd iterations — driver-side, sample-bounded
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(0)
    return cents


def _nearest_centroid_expr(cents):
    """expr factory: (vector column NAME, n) -> array of the n nearest
    centroid ids (squared L2), all in codegen. One parsed expression
    instead of n_centroids x dim Column calls (measured r12 — the
    Column trees dominated the IVF entries' driver wall); 'xD' double
    literals round-trip bit-identically to the former F.lit spelling."""
    def nearest_expr(col_name: str, n):
        dists = ", ".join(
            "aggregate(zip_with({c}, array({lits}), "
            "(x, y) -> POWER(cast(x as double) - y, 2)), 0.0D, "
            "(a, x) -> a + x)".format(
                c=_quote_ident(col_name),
                lits=", ".join(f"{float(v)!r}D" for v in c))
            for c in cents)
        ids = ", ".join(str(i) for i in range(len(cents)))
        idx = (f"array_sort(zip_with(array({dists}), array({ids}), "
               "(d, i) -> named_struct('d', d, 'i', i)))")
        return F.expr(f"slice(transform({idx}, s -> s.i), 1, {n})")
    return nearest_expr


def ivf_build(corpus: DataFrame, path: str, n_centroids: int = 16,
              seed: int = 42, vec_col: str = "embedding",
              id_col: str = "vec_id", sample_size: int = 10_000) -> None:
    """Materialize an IVF index: ``path/centroids`` (tiny parquet) and
    ``path/lists`` — the corpus WITH its nearest-centroid id, written
    ``partitionBy("cell")`` so each inverted list is its own partition
    directory.

    The build is one corpus pass (nearest-centroid is a codegen
    projection). Queries then read ONLY their probed cells via
    partition pruning — at 100 TB with 1024 cells and n_probe=8, a
    query touches <1% of the data, and the index needs no table format
    or service: plain parquet + directory layout.
    """
    spark = corpus.sparkSession
    cents = _ivf_centroids(corpus, n_centroids, seed, vec_col, id_col,
                           sample_size)
    spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    nearest_expr = _nearest_centroid_expr(cents)
    (corpus.select(id_col, vec_col,
                   F.element_at(nearest_expr(vec_col, 1), 1)
                    .alias("cell"))
     .write.mode("overwrite").partitionBy("cell").parquet(f"{path}/lists"))


def ivf_query(spark, path: str, queries: DataFrame, k: int = 10,
              n_probe: int = 4, vec_col: str = "embedding",
              id_col: str = "vec_id",
              query_id_col: str = "query_id") -> DataFrame:
    """Query a persisted IVF index (see :func:`ivf_build`).

    Centroids load driver-side (tiny); each query's ``n_probe`` nearest
    cells become an IN filter on the lists' partition column, so the
    scan is partition-pruned to the probed cells (plan-asserted in
    tests), then exact rerank within them.
    """
    cents_rows = (spark.read.parquet(f"{path}/centroids")
                  .orderBy("cell").collect())
    cents = [r["centroid"] for r in cents_rows]
    nearest_expr = _nearest_centroid_expr(cents)
    # collect the exploded (query, probe-cell) rows ONCE — the query
    # side is broadcast-sized by assumption, and this avoids evaluating
    # the n_centroids-way distance expression a second time for the
    # probed-cell set
    q_rows = queries.select(
        query_id_col, F.col(vec_col).alias("q_vec"),
        F.explode(nearest_expr(vec_col, n_probe)).alias("cell")
    ).collect()
    probed = sorted({r["cell"] for r in q_rows})
    # derive the id type from the caller's schema so string/int query
    # ids work identically to the inline ivf_topk path
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    q = spark.createDataFrame(
        q_rows, f"{query_id_col} {qid_type}, q_vec array<double>, cell int")
    lists = (spark.read.parquet(f"{path}/lists")
             .filter(F.col("cell").isin(probed))
             .select(id_col, F.col(vec_col).alias("c_vec"), "cell"))
    joined = lists.join(F.broadcast(q), "cell")
    cos = (dot("q_vec", "c_vec")
           / (F.sqrt(dot("c_vec", "c_vec")) * F.sqrt(dot("q_vec", "q_vec")))).alias("cosine")
    scored = joined.select(query_id_col, id_col, cos)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col,
                          F.round("cosine", 4).alias("cosine"), "rank"))


def cosine_topk_pandas(corpus: DataFrame, query_vectors: dict[int, list[float]],
                       k: int = 10, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """NumPy/Arrow variant: per-partition BLAS matmul via mapInPandas.

    ``query_vectors`` is a small dict (id -> vector) captured in the
    closure (broadcast by task serialization). Each Arrow batch computes
    a (batch × queries) similarity matrix and emits per-batch top-k;
    the final exact top-k reduction happens in a window — partial top-k
    map-side keeps shuffle volume at k rows per (partition, query).
    """
    import numpy as np
    import pandas as pd

    qids = sorted(query_vectors)
    qm = np.array([query_vectors[i] for i in qids], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)

    def score(batches):
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(vecs) == 0:
                continue
            sims = (vecs @ qm.T) / (np.linalg.norm(vecs, axis=1)[:, None] * qn[None, :])
            for qi, qid in enumerate(qids):
                col = sims[:, qi]
                top = np.argsort(-col)[:k]
                yield pd.DataFrame({
                    "query_id": qid,
                    id_col: pdf[id_col].iloc[top].to_numpy(),
                    "cosine": np.round(col[top], 4),
                })

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id long, {id_col} long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (partial.withColumn("rank", F.row_number().over(w))
                   .filter(F.col("rank") <= k))


def ann_recall(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_bits: int = 8, dim: int = 64, seed: int = 42,
               vec_col: str = "embedding", id_col: str = "vec_id",
               query_id_col: str = "query_id") -> DataFrame:
    """Recall@k of the hyperplane-LSH path against the exact top-k —
    the measurement every ANN deployment needs before trading recall
    for the bucketed scale path (self-matches excluded from both
    sides, so the metric isn't inflated by the trivial hit).

    Returns (query_id, n_exact, n_ann, n_overlap, recall_permille)
    with integer permille so a SQL oracle replays it exactly. Cost:
    one broadcast-nested-loop pass for the exact baseline (bounded by
    the query count) plus the LSH bucket join — the corpus never
    self-joins.
    """
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("q_vec"),
                       _norm_col(vec_col).alias("q_norm"))
    c = corpus.select(F.col(id_col),
                      F.col(vec_col).alias("c_vec"),
                      _norm_col(vec_col).alias("c_norm"))
    cos = (dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    exact = (c.crossJoin(F.broadcast(q))
             .filter(F.col(query_id_col) != F.col(id_col))
             .select(query_id_col, id_col, cos)
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k)
             .select(query_id_col, id_col))

    planes = make_planes(n_bits, dim, seed)
    cs = hyperplane_signature(corpus.select(id_col, vec_col), planes,
                              vec_col).withColumnRenamed(vec_col, "c_vec")
    qs = hyperplane_signature(queries.select(query_id_col, vec_col), planes,
                              vec_col).withColumnRenamed(vec_col, "q_vec")
    bcos = (dot("q_vec", "c_vec")
            / (F.sqrt(dot("c_vec", "c_vec"))
               * F.sqrt(dot("q_vec", "q_vec")))).alias("cosine")
    ann = (cs.join(F.broadcast(qs), "sig")
           .filter(F.col(query_id_col) != F.col(id_col))
           .select(query_id_col, id_col, bcos)
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select(query_id_col, id_col))

    eg = exact.groupBy(query_id_col).agg(F.count("*").alias("n_exact"))
    ag = ann.groupBy(query_id_col).agg(F.count("*").alias("n_ann"))
    ov = (exact.join(ann, [query_id_col, id_col])
          .groupBy(query_id_col).agg(F.count("*").alias("n_overlap")))
    return (eg.join(ag, query_id_col, "left")
            .join(ov, query_id_col, "left")
            .select(query_id_col, "n_exact",
                    F.coalesce("n_ann", F.lit(0).cast("long")).alias("n_ann"),
                    F.coalesce("n_overlap",
                               F.lit(0).cast("long")).alias("n_overlap"))
            .withColumn("recall_permille",
                        F.expr("(n_overlap * 1000) div n_exact")))


def mmr_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
             pool: int = 10, lam: float = 0.7,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id") -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998) — the RAG retrieval pattern that trades raw
    similarity for coverage: round r picks
    ``argmax lam*sim(q,c) - (1-lam)*max_{s in selected} sim(c,s)``.

    Plan shape for 100 TB: the corpus contributes ONE broadcast-
    nested-loop pass to build the per-query candidate pool (top
    ``pool`` by cosine, self excluded); every MMR round then operates
    on pool-bounded DataFrames (``pool * n_queries`` rows), pairwise
    sims computed once. Rounds are a driver loop over tiny bounded
    joins — localCheckpoint truncates the growing plan, the corpus is
    never rescanned. Deterministic: ties break toward the lower id,
    so a bounded-round SQL oracle replays every pick exactly.
    """
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("q_vec"),
                       _norm_col(vec_col).alias("q_norm"))
    c = corpus.select(F.col(id_col),
                      F.col(vec_col).alias("c_vec"),
                      _norm_col(vec_col).alias("c_norm"))
    simq = (dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("simq"), F.col(id_col))
    cand = (c.crossJoin(F.broadcast(q))
            .filter(F.col(query_id_col) != F.col(id_col))
            .select(query_id_col, id_col, simq.alias("simq"), "c_vec")
            .withColumn("_rnk", F.row_number().over(w))
            .filter(F.col("_rnk") <= pool).drop("_rnk")
            .localCheckpoint())
    a = cand.select(F.col(query_id_col), F.col(id_col).alias("va"),
                    F.col("c_vec").alias("ea"))
    b = cand.select(F.col(query_id_col), F.col(id_col).alias("vb"),
                    F.col("c_vec").alias("eb"))
    pair_sim = dot("ea", "eb") / (norm("ea") * norm("eb"))
    pairs = (a.join(b, query_id_col)
             .filter(F.col("va") != F.col("vb"))
             .select(query_id_col, "va", "vb", pair_sim.alias("s"))
             .localCheckpoint())

    sel = None
    w_pick = Window.partitionBy(query_id_col).orderBy(F.desc("score"),
                                                      F.col(id_col))
    for r in range(1, k + 1):
        if sel is None:
            scored = cand.select(query_id_col, id_col,
                                 (F.lit(lam) * F.col("simq")).alias("score"))
        else:
            rem = cand.join(sel.select(query_id_col, id_col),
                            [query_id_col, id_col], "left_anti")
            msel = (rem.join(pairs.withColumnRenamed("va", id_col),
                             [query_id_col, id_col])
                    .join(sel.select(F.col(query_id_col),
                                     F.col(id_col).alias("vb")),
                          [query_id_col, "vb"])
                    .groupBy(query_id_col, id_col, "simq")
                    .agg(F.max("s").alias("maxsel")))
            scored = msel.select(
                query_id_col, id_col,
                (F.lit(lam) * F.col("simq")
                 - F.lit(1.0 - lam) * F.col("maxsel")).alias("score"))
        pick = (scored.withColumn("_rn", F.row_number().over(w_pick))
                .filter(F.col("_rn") == 1)
                .select(query_id_col, F.lit(r).alias("rank"),
                        F.col(id_col), "score"))
        sel = pick if sel is None else sel.unionByName(pick)
        sel = sel.localCheckpoint()
    return sel.select(query_id_col, "rank", id_col,
                      F.round("score", 4).alias("score"))
