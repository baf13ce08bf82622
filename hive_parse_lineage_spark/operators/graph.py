"""Graph analytics over derived document/event graphs: fixed-point
PageRank.

Iterative algorithm under the exact-value hash gate: all arithmetic is
integer fixed-point (ppm — parts-per-million of rank mass), so a SQL
oracle can unroll the same bounded rounds and match bit-for-bit, the
same pattern as connected components (`operators/components.py`).

Scale posture per round: one equi-join of the rank vector onto the
out-degree-annotated adjacency (both hash-partitioned on the source
vertex), one map-side-combined SUM shuffle on the destination vertex,
one left join back onto the vertex set. Nothing global, nothing
driver-side; for deep iteration counts callers should localCheckpoint
every few rounds exactly as connected_components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000          # 1.0 rank == 1e6 ppm
DAMP_PPM = 850_000         # 0.85 damping
BASE_PPM = SCALE - DAMP_PPM


def pagerank_fixed_point(edges: DataFrame, vertices: DataFrame,
                         rounds: int = 2,
                         src_col: str = "id_a", dst_col: str = "id_b",
                         vertex_col: str = "vertex") -> DataFrame:
    """PageRank with integer fixed-point arithmetic over an UNDIRECTED
    pair list (each pair contributes both directions).

    Per round: ``r_u = BASE + (DAMP * sum_in(r_v div deg_v)) div SCALE``
    — the per-edge integer division is part of the contract (both the
    operator and the oracle floor at the same points, so results are
    engine-exact). Isolated vertices settle at BASE_PPM. Returns
    (vertex, rank_ppm) after ``rounds`` synchronous rounds from a
    uniform 1.0 start.
    """
    adj = (edges.select(F.col(src_col).alias("v"), F.col(dst_col).alias("u"))
           .unionByName(
               edges.select(F.col(dst_col).alias("v"),
                            F.col(src_col).alias("u"))))
    deg = adj.groupBy("v").agg(F.count("*").alias("deg"))
    adj_deg = adj.join(deg, "v")
    ranks = vertices.select(F.col(vertex_col),
                            F.lit(SCALE).cast("long").alias("rank_ppm"))
    for _ in range(rounds):
        contrib = (adj_deg
                   .join(ranks, adj_deg["v"] == ranks[vertex_col])
                   .select("u", F.expr("rank_ppm div deg").alias("c")))
        sums = contrib.groupBy("u").agg(F.sum("c").alias("s"))
        ranks = (vertices
                 .join(sums, vertices[vertex_col] == sums["u"], "left")
                 .select(F.col(vertex_col),
                         F.expr(f"{BASE_PPM}L + ({DAMP_PPM}L * "
                                f"coalesce(s, 0L)) div {SCALE}L")
                         .alias("rank_ppm")))
    return ranks
