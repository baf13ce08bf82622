"""As-of (nearest-earlier) join — an operator Spark lacks natively.

Two implementations with identical semantics (backward as-of,
optional tolerance), verified against ``pandas.merge_asof`` in tests:

- ``asof_join``: pure DataFrame composition — union the sides, sort by
  (key, time) and forward-fill the right side's values with
  ``last(..., ignorenulls=True)`` over a row-unbounded window, then keep
  the left rows. Cost: one shuffle+sort on the key — the same price as
  a sort-merge join; no Python, no per-group materialization. This is
  the 100 TB path (state is bounded by the window's running row, and
  skewed keys AQE-split like any sort).
- ``asof_join_pandas``: per-key cogrouped ``pandas.merge_asof`` via
  ``applyInPandas`` — simpler to read, Arrow-batched, but pays Python
  and assumes each key group fits in memory; the small/medium path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: str, values: list[str] | None = None,
              tolerance_seconds: int | None = None,
              suffix: str = "_r") -> DataFrame:
    """For each left row: the latest right row with
    ``right.on <= left.on`` within the same ``by`` key (backward as-of).

    ``values``: right columns to carry (default: all non-key columns).
    """
    if values is None:
        values = [c for c in right.columns if c not in (on, by)]
    lt = left.withColumn("_is_left", F.lit(1))
    rt = (right.select(
            F.col(by), F.col(on),
            *[F.col(v).alias(f"{v}{suffix}") for v in values])
          .withColumn("_is_left", F.lit(0)))
    val_cols = [f"{v}{suffix}" for v in values]
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps so an exact
    # timestamp match is visible to the left row (merge_asof semantics)
    w = (W.partitionBy(by).orderBy(F.col(on).asc(), F.col("_is_left").asc())
         .rowsBetween(W.unboundedPreceding, 0))
    filled = merged.select(
        "*",
        *[F.last(v, ignorenulls=True).over(w).alias(f"_f_{v}") for v in val_cols],
        F.last(F.when(F.col("_is_left") == 0, F.col(on)), ignorenulls=True)
         .over(w).alias("_match_time"),
    )
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        in_tol = (F.unix_timestamp(F.col(on))
                  - F.unix_timestamp(F.col("_match_time"))) <= tolerance_seconds
        out = out.select(
            *left.columns,
            *[F.when(in_tol, F.col(f"_f_{v}")).alias(v) for v in val_cols])
    else:
        out = out.select(*left.columns,
                         *[F.col(f"_f_{v}").alias(v) for v in val_cols])
    return out


def asof_join_pandas(left: DataFrame, right: DataFrame, on: str,
                     by: str, values: list[str] | None = None,
                     tolerance_seconds: int | None = None,
                     suffix: str = "_r") -> DataFrame:
    """Cogrouped ``pandas.merge_asof`` per key — Arrow-batched."""
    import pandas as pd

    if values is None:
        values = [c for c in right.columns if c not in (on, by)]
    val_cols = [f"{v}{suffix}" for v in values]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{v}{suffix}` {dict((f.name, f.dataType.simpleString()) for f in right.schema.fields)[v]}"
           for v in values])

    tol = pd.Timedelta(seconds=tolerance_seconds) if tolerance_seconds else None

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=list(lpdf.columns) + val_cols)
        r = rpdf[[on] + values].rename(columns={v: f"{v}{suffix}" for v in values})
        merged = pd.merge_asof(lpdf.sort_values(on), r.sort_values(on),
                               on=on, tolerance=tol)
        return merged[list(lpdf.columns) + val_cols]

    return (left.groupBy(by).cogroup(right.groupBy(by))
            .applyInPandas(merge, schema=out_schema))
