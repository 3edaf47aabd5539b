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
