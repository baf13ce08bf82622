"""Skew-mitigation join helpers.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on in this engine's defaults) handles most sort-merge skew at runtime.
These helpers cover the cases AQE cannot:

- ``salted_join``: explicit salting for a shuffle join where one side
  has pathological hot keys (AQE splits partitions, but a single key
  hashed to one partition can still exceed memory on the build side).
  Left rows get a random salt in [0, n_salts); right rows are
  replicated n_salts times; the join key becomes (key, salt), spreading
  each hot key over n_salts reducers. Cost: right side × n_salts —
  use only when the right side is small-ish or pre-filtered to hot keys.
- ``hot_key_split_join``: the two-path pattern — broadcast-join the hot
  keys, shuffle-join the long tail, union. Optimal when a handful of
  keys dominate (the usual power-law shape at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join on ``key`` with the left side's hot keys spread over
    ``n_salts`` sub-keys. Deterministic output, randomized placement."""
    l = left.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(df: DataFrame, keys: list[str], sums: list[str] = (),
               n_salts: int = 16) -> DataFrame:
    """COUNT(*) + SUM(col)s per ``keys`` with an explicit salt stage.

    For a power-law key (one key owning half the corpus) the partial
    aggregation usually saves you, but when the grouped *cardinality*
    is tiny (few keys, huge groups) the final agg still funnels each
    key through one reducer; the salt stage fans that into ``n_salts``
    partials first. COUNT/SUM are algebraic so the two-stage plan is
    exact; placement is randomized, the result is not.

    Emits ``n`` plus ``sum_<col>`` per sum column."""
    salt = (F.rand(seed=42) * n_salts).cast("int")
    partial = (df.withColumn("_salt", salt)
               .groupBy(*keys, "_salt")
               .agg(F.count("*").alias("_n"),
                    *[F.sum(c).alias(f"_s_{c}") for c in sums]))
    return (partial.groupBy(*keys)
            .agg(F.sum("_n").alias("n"),
                 *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sums]))


def hot_key_split_join(left: DataFrame, right: DataFrame, key: str,
                       hot_threshold: int = 100_000,
                       how: str = "inner") -> DataFrame:
    """Split the join into hot-key (broadcast) and tail (shuffle) paths.

    Hot keys are found with one cheap aggregation on the left side
    (at 100 TB this is a map-side-combined count — one shuffle of
    distinct keys, not rows). The right-side rows for hot keys are
    assumed broadcastable (hot keys are few by definition).
    """
    counts = left.groupBy(key).agg(F.count("*").alias("_n"))
    hot = counts.filter(F.col("_n") > hot_threshold).select(key)
    l_hot = left.join(F.broadcast(hot), key, "left_semi")
    l_tail = left.join(F.broadcast(hot), key, "left_anti")
    r_hot = right.join(F.broadcast(hot), key, "left_semi")
    out_hot = l_hot.join(F.broadcast(r_hot), key, how)
    out_tail = l_tail.join(right, key, how)
    return out_hot.unionByName(out_tail)
