"""Distributed transitive closure: iterative hash-join connected components.

The reference's final resolution is a greedy 1:1 assignment (its degenerate
clusterer, ref: src/match_utils.py:497-511); the north star requires true
transitive clustering of match edges.  Two formulations:

``connected_components`` (default) — min-label propagation:

  label(v) <- min(label(v), min over neighbors u of label(u))

iterated to fixpoint: each round is one shuffle join (labels ⋈ edges) + one
groupBy min — both native, AQE-coalesced.  The min travels ONE HOP per
round, so convergence takes O(diameter) rounds — 2-4 in practice for
ER-sized near-clique duplicate clusters; a hard iteration cap fails loudly
rather than silently under-merging.

``connected_components_star`` — alternating large-star/small-star (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14, public
algorithm): each round rewires every node toward the minimum of its
neighborhood, halving component depth, so convergence is O(log n) rounds
REGARDLESS of diameter.  Costs two groupBy+join passes per round (vs one
for propagation), so it is the opt-in path for pathological long-chain
components — e.g. near-duplicate chains a..z where consecutive pairs match
but distant ones don't; on a 300-node path propagation's default cap fails
while star converges in ~9 rounds (pinned by test).

Scale notes (SURVEY §7.4.2): edges are canonicalized and deduplicated
before iterating; each round localCheckpoints to cut lineage growth; giant
components (skewed labels) only ever shuffle their *edges*, never
materialize the component, so skew is bounded by edge count per label —
with AQE skew-join as backstop.
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
    stats: dict | None = None,
) -> DataFrame:
    """Edges (left_id, right_id) -> (conv_id, cluster_id) with cluster_id =
    min member id of the component.  ``vertices`` adds singletons.

    ``stats`` (optional dict) receives {"rounds": n} — observability for the
    rehearsal/metrics sinks without changing the return contract."""
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

    for rounds in range(1, max_iter + 1):
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
            if stats is not None:
                stats["rounds"] = rounds
            return labels.select(F.col("src").alias(id_col), F.col("label").alias("cluster_id"))
    if stats is not None:
        stats["rounds"] = max_iter
    raise ConvergenceError(f"connected_components did not converge in {max_iter} iterations")


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(neighborhood(u) ∪ {u})."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("u"), F.col("mv")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges toward the larger endpoint; for each node u connect all
    smaller neighbors (and u itself) to min(smaller-neighborhood(u))."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v")).distinct()
    mins = o.groupBy("u").agg(F.min("v").alias("mv"))
    pairs = (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mv").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("mv").alias("v")))
    )
    return pairs.where(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    id_col: str = "conv_id",
    stats: dict | None = None,
) -> DataFrame:
    """Large-star/small-star connected components — same contract as
    :func:`connected_components` (cluster_id = min member id), O(log n)
    rounds regardless of component diameter.  The scale path for
    long-chain components where propagation's O(diameter) bound bites.

    Convergence check: (edge count, bit_xor of xxhash64(u,v)) stable across
    a round — exact up to a 64-bit hash collision (the edge set is distinct,
    so xor cancellation needs distinct colliding sets), chosen over a
    symmetric-difference anti-join because it is one cheap overflow-free
    aggregate per round on data that is shuffling anyway.
    """
    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    e = (
        edges.select(F.col("left_id").alias("u"), F.col("right_id").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # seed the signature from the INPUT (one cheap aggregate on checkpointed
    # data): an already-converged star forest — or an empty edge set — is
    # then detected after the single mandatory round instead of two
    prev_sig = _sig(e)
    converged = prev_sig[0] == 0  # no edges -> nothing to iterate
    rounds = 0
    for _ in range(max_iter):
        if converged:
            break
        e = _small_star(_large_star(e)).localCheckpoint()
        rounds += 1
        sig = _sig(e)
        if sig == prev_sig:
            converged = True
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise ConvergenceError(
            f"connected_components_star did not converge in {max_iter} iterations"
        )
    # final star forest: every edge is (child, root).  label(u) = min over
    # incident edges (root for children, min child... never — roots keep
    # their own id via least(u, min)).
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(F.col("u"), F.least(F.col("u"), F.col("mv")).alias("label"))
    )
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("u")).distinct()
        labels = (
            verts.join(labels, "u", "left")
            .select(F.col("u"), F.coalesce("label", F.col("u")).alias("label"))
        )
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("cluster_id"))


def connected_components_auto(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 25,
    id_col: str = "conv_id",
    star_max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Propagation first, star on non-convergence — the right default when
    component shapes are unknown.

    ER duplicate clusters are near-cliques (diameter 2-4), so min-label
    propagation — one join per round — converges in a handful of rounds and
    is the cheap common case.  A pathological long-chain component blows its
    O(diameter) bound; instead of failing the run, fall back ONCE to
    large-star/small-star (O(log n) rounds regardless of diameter) and record
    the fallback in ``stats`` so callers can surface it to their metrics
    sink.  Deterministic: both algorithms produce cluster_id = min member id,
    so the fallback changes cost, never output.

    stats keys: algorithm ("propagation"|"star"), rounds, fallback (bool).
    """
    stats_local: dict = {}
    try:
        out = connected_components(
            edges, vertices=vertices, max_iter=max_iter, id_col=id_col, stats=stats_local
        )
        if stats is not None:
            stats.update(
                algorithm="propagation", rounds=stats_local.get("rounds"), fallback=False
            )
        return out
    except ConvergenceError:
        star_stats: dict = {}
        out = connected_components_star(
            edges, vertices=vertices, max_iter=star_max_iter, id_col=id_col,
            stats=star_stats,
        )
        if stats is not None:
            stats.update(
                algorithm="star",
                rounds=star_stats.get("rounds"),
                fallback=True,
                propagation_rounds_spent=stats_local.get("rounds"),
            )
        return out
