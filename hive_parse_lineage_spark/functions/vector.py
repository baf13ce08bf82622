"""Vector column functions (embeddings as ``ARRAY<FLOAT>``).

JVM-side expressions (``zip_with`` + ``aggregate``) — no UDF, so the
dot product participates in whole-stage codegen and column pruning.
For very wide vectors a Pandas-UDF/NumPy path can win on SIMD; see
``operators/similarity.py`` for the batched variant.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def literal_vector(values) -> Column:
    """A constant query vector as an array literal (broadcast-free:
    it folds into the plan)."""
    return F.array(*[F.lit(float(v)) for v in values])


def quantize_int8(a: Column | str) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization of an embedding column.

    Returns ``(codes, scale)``: ``codes[i] = floor(x[i] * 127 / scale)``
    with ``scale = max |x|`` (4x storage cut for ANN shards). ``floor``
    over doubles, not ``round``, so a DuckDB differential oracle is
    bit-exact (round half-up vs half-even diverges on exact .5 binary
    values). Pure codegen — no UDF, prunes and pushes like any
    projection."""
    a = F.col(a) if isinstance(a, str) else a
    d = F.transform(a, lambda x: x.cast("double"))
    scale = F.greatest(F.array_max(F.transform(d, F.abs)), F.lit(1e-30))
    # Higher-order lambdas evaluate their body per element with no
    # common-subexpression elimination, so referencing the O(dim)
    # `scale` inside the per-element lambda makes the projection
    # O(dim^2) per row. Bind it once per row instead: a one-element
    # outer transform evaluates `scale` a single time and exposes it to
    # the inner lambda as a plain variable.
    codes = F.flatten(F.transform(
        F.array(scale),
        lambda s: F.transform(
            d, lambda x: F.floor(x * F.lit(127.0) / s).cast("bigint"))))
    return codes, scale
