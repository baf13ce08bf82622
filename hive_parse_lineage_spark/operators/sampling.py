"""Deterministic dataset splitting and sampling for training pipelines.

Hash-split is the reproducible train/val/test assignment at 100 TB: a
row's split is a pure function of its id and a salt — no global
shuffle, no state, so re-runs, backfills and late-arriving rows land in
the same split, and changing the salt re-rolls every assignment at
once. Computed as ``portable_hash64(salt || id) mod n_buckets`` — a
codegen projection (the same portable hash the dedup oracles replay in
SQL, so the operator is value-hash-checkable cross-engine).

``stratified_sample`` wraps ``DataFrame.sampleBy`` (per-stratum
Bernoulli sampling — approximate row counts by design); use
``hash_split`` when exact reproducibility matters more than exact
fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hive_parse_lineage_spark.functions.text import portable_hash64

DEFAULT_FRACTIONS: dict[str, float] = {"train": 0.8, "val": 0.1, "test": 0.1}


def split_bucket(id_col: Column | str, salt: str = "",
                 n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a row id + salt."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(portable_hash64(F.concat(F.lit(salt), c.cast("string"))),
                  F.lit(n_buckets))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               fractions: dict[str, float] | None = None,
               salt: str = "", n_buckets: int = 100,
               out_col: str = "split") -> DataFrame:
    """Append ``bucket`` and ``out_col`` columns assigning each row to a
    named split. ``fractions`` is an ordered name->fraction mapping
    (must sum to <= 1; any remainder falls into the last split)."""
    fractions = fractions or DEFAULT_FRACTIONS
    bucket = split_bucket(id_col, salt, n_buckets)
    names = list(fractions)
    cum, expr = 0.0, None
    for name in names[:-1]:
        cum += fractions[name]
        bound = int(round(cum * n_buckets))
        case = F.when(bucket < bound, F.lit(name))
        expr = case if expr is None else expr.when(bucket < bound, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("bucket", bucket).withColumn(out_col, expr)


def cap_per_group(df: DataFrame, group_col: str, cap: int,
                  id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic
    hash order — the training-mix rebalancer (cap over-represented
    sources/domains without favoring any id range).

    Hash order makes the selection a uniform, reproducible sample of
    each group; one shuffle on the group key, and the window never
    materializes more than a partition. Emits ``pick_rank`` (1-based
    position in hash order) for auditability."""
    from pyspark.sql import Window
    h = portable_hash64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("pick_rank", F.row_number().over(w))
            .filter(F.col("pick_rank") <= cap))


def pack_sequences(df: DataFrame, token_col: str, id_col: str = "doc_id",
                   budget: int = 2048, n_shards: int = 8,
                   shard_salt: str = "") -> DataFrame:
    """Assign rows to fixed-token-budget packs (sequence packing for
    training): deterministic shard by hash, then first-fit-in-id-order
    within the shard — ``pack_id = floor(start_offset / budget)`` over
    a per-shard running sum.

    At 100 TB this is the scalable shape: packing is shard-local (one
    shuffle on the shard key, bounded state per window partition), not
    a global sequential scan; raising ``n_shards`` trades packing
    tightness for parallelism. Documents longer than ``budget`` simply
    occupy multiple consecutive budget slots. Output adds ``shard``,
    ``start_offset`` and ``pack_id``.
    """
    from pyspark.sql import Window as W
    shard = split_bucket(id_col, shard_salt, n_shards).alias("shard")
    base = df.withColumn("shard", shard)
    w = (W.partitionBy("shard").orderBy(id_col)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum(token_col).over(w)
    start = (cum - F.col(token_col)).alias("start_offset")
    return (base.withColumn("start_offset", start)
                .withColumn("pack_id",
                            F.floor(F.col("start_offset") / budget)))


def bucket_sample(df: DataFrame, key_col: str, bucket: int = 1,
                  out_of: int = 10, salt: str = "") -> DataFrame:
    """``TABLESAMPLE (BUCKET x OUT OF y ON key)`` semantics as a
    deterministic filter: keep rows whose hash bucket is ``bucket - 1``
    of ``out_of`` (Hive's 1-based bucket numbering).

    The reference's only worked end-to-end example is a TABLESAMPLE
    scan (LineParser.java:794-805). Spark's native ``TABLESAMPLE
    (BUCKET x OUT OF y)`` is a seeded-random Bernoulli sample — not
    reproducible across engines or re-runs — so the engine keys the
    bucket on the portable hash instead: the sampled set is a pure
    function of the key (re-runs, backfills and SQL oracles all agree),
    and the predicate is a plain codegen filter, so it composes with
    pushdown and partition pruning like any other WHERE clause.
    """
    return df.filter(split_bucket(key_col, salt, out_of) == bucket - 1)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample (`sampleBy`): keeps roughly
    ``fractions[stratum]`` of each stratum's rows. Engine-specific
    randomness — verified statistically in tests, not oracle-hashed."""
    return df.sampleBy(strata_col, fractions, seed)


def weighted_mix(df: DataFrame, weights: dict[str, float],
                 source_col: str = "source", id_col: str = "doc_id",
                 salt: str = "mix", default_weight: float = 1.0,
                 copy_col: str = "copy") -> DataFrame:
    """Deterministic epoch-weighted source mixing — the standard
    training-mix upsampler (weight 2.5 on a source means every doc
    appears twice and a hash-chosen half appear a third time; weight
    0.3 keeps a hash-chosen 30%).

    ``n_copies = floor(w) + (1 if hash(salt||id) mod 1000 <
    round(frac*1000) else 0)`` — a pure function of the row id, so
    re-runs, backfills and SQL oracles produce the identical mix (no
    engine RNG). Emits one row per copy with a 1-based ``copy`` index
    (downstream shuffling/packing can treat copies as distinct docs).

    Plan: codegen CASE for the weight, one hash, ``explode(sequence)``
    — no shuffle, no Python; output size is exactly
    ``sum(w_source x rows_source)``. Zero-copy rows are dropped before
    the explode, so a heavily down-weighted source costs only its scan.
    """
    w_expr = None
    for name, w in weights.items():
        case = F.when(F.col(source_col) == name, F.lit(float(w)))
        w_expr = case if w_expr is None else w_expr.when(
            F.col(source_col) == name, F.lit(float(w)))
    w_expr = (F.lit(float(default_weight)) if w_expr is None
              else w_expr.otherwise(F.lit(float(default_weight))))
    whole = F.floor(w_expr).cast("int")
    frac_millis = F.round((w_expr - F.floor(w_expr)) * 1000).cast("int")
    bump = (split_bucket(id_col, salt, 1000) < frac_millis).cast("int")
    n_copies = (whole + bump).alias("n_copies")
    return (df.withColumn("n_copies", n_copies)
            .filter(F.col("n_copies") >= 1)
            .withColumn(copy_col,
                        F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
            .drop("n_copies"))
