"""Greedy 1:1 parity (reference src/match_utils.py:497-511 semantics) and
connected-components correctness on hand-computed cases."""

from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.operators.clustering import (
    connected_components,
)
from lab02_citation_matching_and_entity_resolution_spark.operators.resolve import (
    greedy_one_to_one,
)


def test_greedy_one_to_one_reference_semantics(spark):
    # within one block: highest score wins, used sides excluded, ties broken
    # by (left_id, right_id) after score
    rows = [
        ("blk", "a1", "b1", 0.9),
        ("blk", "a1", "b2", 0.8),   # a1 already used -> skipped
        ("blk", "a2", "b1", 0.85),  # b1 already used -> skipped
        ("blk", "a2", "b2", 0.75),
        ("blk", "a3", "b3", 0.70),
        ("blk", "a4", "b4", 0.60),  # below threshold -> dropped
    ]
    df = spark.createDataFrame(
        rows, "block_key string, left_id string, right_id string, score double"
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in greedy_one_to_one(df, threshold=0.7).collect()
    }
    assert got == {("a1", "b1"), ("a2", "b2"), ("a3", "b3")}


def test_greedy_tie_break_deterministic(spark):
    # equal scores: (left_id, right_id) ascending decides
    rows = [
        ("blk", "a2", "b1", 0.9),
        ("blk", "a1", "b1", 0.9),
        ("blk", "a1", "b2", 0.9),
    ]
    df = spark.createDataFrame(
        rows, "block_key string, left_id string, right_id string, score double"
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in greedy_one_to_one(df, threshold=0.5).collect()
    }
    # a1-b1 first (lowest left, right), then a2-b1 blocked, a1-b2 blocked
    assert got == {("a1", "b1")}


def test_connected_components_chain_and_singleton(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "left_id string, right_id string"
    )
    verts = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",), ("lone",)], "conv_id string"
    )
    got = {
        (r["conv_id"], r["cluster_id"])
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"),
        ("lone", "lone"),
    }


def test_connected_components_long_chain_converges(spark):
    # chain of 12 nodes: needs several min-label rounds
    names = [f"n{i:02d}" for i in range(12)]
    edges = spark.createDataFrame(
        list(zip(names, names[1:])), "left_id string, right_id string"
    )
    labels = connected_components(edges)
    assert labels.select("cluster_id").distinct().count() == 1


def test_star_cc_matches_propagation_on_random_graph(spark):
    import random

    from lab02_citation_matching_and_entity_resolution_spark.operators.clustering import (
        connected_components_star,
    )

    rng = random.Random(3)
    nodes = [f"v{i:03d}" for i in range(60)]
    edges_py = list({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)
    })
    edges = spark.createDataFrame(edges_py, "left_id string, right_id string")
    verts = spark.createDataFrame([(n,) for n in nodes], "conv_id string")
    prop = {
        (r["conv_id"], r["cluster_id"])
        for r in connected_components(edges, vertices=verts, max_iter=60).collect()
    }
    star = {
        (r["conv_id"], r["cluster_id"])
        for r in connected_components_star(edges, vertices=verts).collect()
    }
    assert star == prop


def test_star_cc_handles_long_chain_where_propagation_cap_fails(spark):
    """The adversarial case the star variant exists for: a 300-node path.
    Min-label propagation moves the min ONE hop per round, so the default
    25-iteration cap fails loudly; large-star/small-star halves depth per
    round and converges in ~log n rounds."""
    import pytest

    from lab02_citation_matching_and_entity_resolution_spark.operators.clustering import (
        ConvergenceError,
        connected_components_star,
    )

    names = [f"p{i:04d}" for i in range(300)]
    edges = spark.createDataFrame(
        list(zip(names, names[1:])), "left_id string, right_id string"
    )
    with pytest.raises(ConvergenceError):
        connected_components(edges)  # default max_iter=25 < 299-hop diameter
    labels = connected_components_star(edges, max_iter=15)
    rows = labels.collect()
    assert len(rows) == 300
    assert {r["cluster_id"] for r in rows} == {"p0000"}


def test_star_cc_no_edges_all_singletons(spark):
    from lab02_citation_matching_and_entity_resolution_spark.operators.clustering import (
        connected_components_star,
    )

    edges = spark.createDataFrame([], "left_id string, right_id string")
    verts = spark.createDataFrame([("a",), ("b",)], "conv_id string")
    got = {
        (r["conv_id"], r["cluster_id"])
        for r in connected_components_star(edges, vertices=verts).collect()
    }
    assert got == {("a", "a"), ("b", "b")}
