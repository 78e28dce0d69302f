"""Contact-graph statistics (SURVEY.md §2.8 network descriptor — the
non-iterative slice).

The reference builds a residue ε-graph (edge iff 3-D distance <= cutoff,
feature.py:4593-4598) and emits global stats + per-node degree/clustering
(feature.py:4601-4609). Centralities needing iteration (betweenness,
eigenvector, shortest paths) stay out of scope (documented gap — they need
GraphFrames or iterative jobs); degree, density, and triangle-based
clustering are pure DataFrame joins:

- edge list: banded-range self-join on the 1-D coordinate (same
  bucketing trick as rangejoin.py — hash equi-join, no nested loop)
- degree: groupBy(node) count
- triangles: the standard edge-edge-edge join with id-ordered endpoints
  (each triangle counted once)
- global clustering coefficient = 3*triangles / open+closed triads
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contact_edges(
    df: DataFrame, entity: str, node_id: str, coord: str, cutoff: float
) -> DataFrame:
    """Undirected edge list (entity, a, b) with a < b and
    |coord_a - coord_b| <= cutoff, via banded equi-join."""
    band = cutoff
    pts = df.select(
        F.col(entity).alias("__e"),
        F.col(node_id).alias("a"),
        F.col(coord).alias("va"),
        F.floor(F.col(coord) / band).cast("long").alias("__band"),
    )
    right = df.select(
        F.col(entity).alias("__e2"),
        F.col(node_id).alias("b"),
        F.col(coord).alias("vb"),
        F.floor(F.col(coord) / band).cast("long").alias("__band2"),
    )
    expanded = pts.withColumn(
        "__jband", F.explode(F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1))
    )
    return (
        expanded.join(
            right,
            (F.col("__e") == F.col("__e2")) & (F.col("__jband") == F.col("__band2")),
        )
        .where((F.col("a") < F.col("b")) & (F.abs(F.col("va") - F.col("vb")) <= cutoff))
        .select(F.col("__e").alias(entity), "a", "b")
        .distinct()
    )


def graph_stats(edges: DataFrame, entity: str) -> DataFrame:
    """Per entity: node count (touched by an edge), edge count, max/avg
    degree, triangle count, global clustering coefficient."""
    und = edges.select(entity, F.col("a").alias("n"), F.col("b").alias("m")).unionByName(
        edges.select(entity, F.col("b").alias("n"), F.col("a").alias("m"))
    )
    deg = und.groupBy(entity, "n").agg(F.count(F.lit(1)).alias("deg"))
    per_entity_deg = deg.groupBy(entity).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("deg").alias("max_degree"),
        F.avg("deg").alias("avg_degree"),
        # triads (open+closed) = sum over nodes of C(deg, 2)
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("n_triads"),
    )
    n_edges = edges.groupBy(entity).agg(F.count(F.lit(1)).alias("n_edges"))
    # triangles: e(a,b) join e(b,c) join e(a,c) with a<b<c — each counted
    # once. Entity keys renamed per copy (self-join lineage).
    e1 = edges.select(
        F.col(entity).alias("__g1"), F.col("a").alias("x"), F.col("b").alias("y")
    )
    e2 = edges.select(
        F.col(entity).alias("__g2"), F.col("a").alias("y2"), F.col("b").alias("z")
    )
    e3 = edges.select(
        F.col(entity).alias("__g3"), F.col("a").alias("x3"), F.col("b").alias("z3")
    )
    tri = (
        e1.join(e2, (F.col("__g1") == F.col("__g2")) & (F.col("y") == F.col("y2")))
        .join(
            e3,
            (F.col("__g1") == F.col("__g3"))
            & (F.col("x") == F.col("x3"))
            & (F.col("z") == F.col("z3")),
        )
        .groupBy(F.col("__g1").alias(entity))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        per_entity_deg.join(n_edges, entity, "left")
        .join(tri, entity, "left")
        .na.fill({"n_triangles": 0})
    )
    return out.withColumn(
        "clustering_coeff",
        F.when(
            F.col("n_triads") > 0,
            3.0 * F.col("n_triangles") / F.col("n_triads"),
        ).otherwise(F.lit(0.0)),
    )
