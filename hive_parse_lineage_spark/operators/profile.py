"""Table profiling — the warehouse ANALYZE/profile surface.

One body shared by the registry gate entry (x136, exact spelling over
``orders``) and bench.py's scale-sweep variants (exact + approx over
``documents``), so the gate and the sweep can never silently measure
different profilers (the x149/triangle_census convention).

Reference parity: the reference's metadata/ANALYZE surface
(hive-parse-lineage exposes table statistics through its catalog
walk); re-expressed here as plain DataFrame aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def column_profile(df: DataFrame, cols: Sequence[str],
                   approx: bool = False) -> DataFrame:
    """Per column of ``cols``: null count, distinct count, and min/max
    cast to string AFTER the typed aggregate (numeric order kept,
    uniform output schema).

    Exact spelling (``approx=False``, the oracle-gated one): two
    column-pruned scans, both hash-friendly — (a) one wide global
    aggregate for counts/min/max (no grouping keys, so the
    string-typed min/max buffers cost no sort), exploded to long
    format via literal structs; (b) the exact per-column distincts as
    ONE (col, value)-pair stream that hash-aggregates map-side — NOT
    n_cols x countDistinct in a single agg, which Spark plans as an
    n_cols-way Expand + repeated SortAggregate passes (string buffers
    disable hash agg; measured 2.8 s vs ~0.6 s at sf0.1). The
    cast-to-string on the pair stream is injective per source type,
    so the distinct counts stay exact.

    At-scale swap (``approx=True``): approx_count_distinct (HLL++,
    ~2% relative error) folds the distincts INTO the wide global
    aggregate — ONE scan, no pair-stream shuffle at all; the sweep
    variant in bench.py measures this swap's linearity against the
    exact spelling.
    """
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [F.count(c).alias(f"{c}__nn"),
                 F.min(c).cast("string").alias(f"{c}__mn"),
                 F.max(c).cast("string").alias(f"{c}__mx")]
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__nd"))
    row = df.agg(*aggs)
    structs = F.array(*[
        F.struct(F.lit(c).alias("col"),
                 (F.col("_n") - F.col(f"{c}__nn")).alias("n_null"),
                 *([F.col(f"{c}__nd").alias("n_distinct")] if approx
                   else []),
                 F.col(f"{c}__mn").alias("min_s"),
                 F.col(f"{c}__mx").alias("max_s"))
        for c in cols])
    wide = row.select(F.explode(structs).alias("s")).select("s.*")
    if approx:
        return wide.select("col", "n_null", "n_distinct",
                           "min_s", "max_s").orderBy("col")
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("p")).select("p.*")
    nd = (pairs.filter(F.col("v").isNotNull())
          .groupBy("col", "v").agg(F.count(F.lit(1)).alias("_one"))
          .groupBy("col").agg(F.count(F.lit(1)).alias("n_distinct")))
    return (wide.join(nd, "col", "left")
            .select("col", "n_null",
                    F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
                    "min_s", "max_s")
            .orderBy("col"))
