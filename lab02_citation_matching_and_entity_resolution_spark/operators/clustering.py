"""Distributed transitive closure: iterative hash-join connected components.

The reference's final resolution is a greedy 1:1 assignment (its degenerate
clusterer, ref: src/match_utils.py:497-511); the north star requires true
transitive clustering of match edges.  We use the min-label-propagation
formulation of connected components:

  label(v) <- min(label(v), min over neighbors u of label(u))

iterated to fixpoint: each round is one shuffle join (labels ⋈ edges) + one
groupBy min — both native, AQE-coalesced.  Convergence in O(log d) rounds for
diameter d (duplicate clusters are tiny, 2-4 rounds in practice); a hard
iteration cap fails loudly rather than silently under-merging.

Scale notes (SURVEY §7.4.2): edges are canonicalized (left<right) and
deduplicated before iterating; each round localCheckpoints the label frame to
cut lineage growth; giant components (skewed labels) only ever shuffle their
*edges*, never materialize the component, so skew is bounded by edge count per
label — acceptable for ER-sized clusters, with AQE skew-join as backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    pass


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 25,
    id_col: str = "conv_id",
) -> DataFrame:
    """Edges (left_id, right_id) -> (conv_id, cluster_id) with cluster_id =
    min member id of the component.  ``vertices`` adds singletons."""
    sym = (
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
        .unionByName(
            edges.select(F.col("right_id").alias("src"), F.col("left_id").alias("dst"))
        )
        .distinct()
        # cut upstream lineage ONCE: iterations must join materialized edges,
        # not re-run the whole scoring pipeline every round
        .localCheckpoint()
    )
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("src")).distinct()
    else:
        verts = sym.select("src").distinct()
    labels = verts.withColumn("label", F.col("src")).localCheckpoint()

    for _ in range(max_iter):
        # candidate labels flowing along edges
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("src", "dst_v"), sym.dst == F.col("dst_v"))
            .select(F.col("src"), F.col("label").alias("nlabel"))
        )
        new_labels = (
            labels.select("src", F.col("label").alias("nlabel"))
            .unionByName(neighbor_labels)
            .groupBy("src")
            .agg(F.min("nlabel").alias("new_label"))
        )
        joined = labels.join(new_labels, "src")
        changed = joined.where(F.col("new_label") != F.col("label")).limit(1).count()
        labels = joined.select("src", F.col("new_label").alias("label")).localCheckpoint()
        if changed == 0:
            return labels.select(F.col("src").alias(id_col), F.col("label").alias("cluster_id"))
    raise ConvergenceError(f"connected_components did not converge in {max_iter} iterations")
