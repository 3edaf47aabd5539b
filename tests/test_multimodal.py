"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic stub."""

from lab02_citation_matching_and_entity_resolution_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_assets,
)


def test_extract_features_schema_and_determinism(spark):
    assets = synthetic_assets(spark, n=12)
    f1 = extract_features(assets).collect()
    f2 = extract_features(assets).collect()
    assert len(f1) == 12
    by_id1 = {r["asset_id"]: r for r in f1}
    by_id2 = {r["asset_id"]: r for r in f2}
    for k in by_id1:
        assert by_id1[k]["content_hash"] == by_id2[k]["content_hash"]
        assert by_id1[k]["feature"] == by_id2[k]["feature"]
        assert len(by_id1[k]["feature"]) == 16
        assert by_id1[k]["n_bytes"] == 128


def test_frame_sample_plan(spark):
    assets = synthetic_assets(spark, n=12)
    frames = frame_sample_plan(assets, every_ms=1000).collect()
    videos = [r for r in assets.collect() if r["kind"] == "video"]
    # duration 3000ms, every 1000ms inclusive -> 4 frames per video
    assert len(frames) == len(videos) * 4


def test_asset_near_dup_exact_and_cosine(spark):
    """Plant a byte-identical duplicate pair: it must appear both as an
    exact group (size 2, min-id keeper) and as a cosine-1.0 near pair in
    the same kind block."""
    from pyspark.sql import functions as F

    from lab02_citation_matching_and_entity_resolution_spark.operators.multimodal import (
        asset_near_dup,
    )

    assets = synthetic_assets(spark, n=9)
    dup = assets.where(F.col("asset_id") == "a0000").select(
        F.lit("a9999").alias("asset_id"), "kind", "payload",
        "media_type", "width", "height", "duration_ms",
    )
    exact, near = asset_near_dup(assets.unionByName(dup), threshold=0.999)
    groups = {r["keeper_id"]: r["group_size"] for r in exact.collect()}
    assert groups["a0000"] == 2  # the planted byte-dup, min-id keeper
    assert all(v == 1 for k, v in groups.items() if k != "a0000")
    pairs = {(r["left_id"], r["right_id"]): r["cosine"] for r in near.collect()}
    assert pairs[("a0000", "a9999")] == 1.0
    assert len(pairs) == 1  # distinct sha-derived features are near-orthogonal


def test_asset_near_dup_blocks_on_ivf_cells_not_kind_alone(spark):
    """An n>cap single-kind corpus must NOT become one kind-wide cross
    product (round-6 verdict finding #4): the near side blocks on
    (kind, IVF cell).  Pinned two ways: the block expression carries
    cell_id (a regression to kind-only blocking drops it from the plan),
    and a planted byte-identical pair — identical vectors, therefore the
    same cell — is still found through the cell blocking."""
    from pyspark.sql import functions as F

    from lab02_citation_matching_and_entity_resolution_spark.operators.multimodal import (
        asset_near_dup,
    )

    assets = synthetic_assets(spark, n=60)
    dup = assets.where(F.col("asset_id") == "a0003").select(
        F.lit("a9999").alias("asset_id"), "kind", "payload",
        "media_type", "width", "height", "duration_ms",
    )
    exact, near = asset_near_dup(
        assets.unionByName(dup), threshold=0.999, n_cells=8
    )
    assert "cell_id" in near._jdf.queryExecution().analyzed().toString()
    pairs = {(r["left_id"], r["right_id"]) for r in near.collect()}
    assert ("a0003", "a9999") in pairs

    # n_cells=1 keeps the exhaustive per-kind scan for verification sets
    _, near1 = asset_near_dup(assets.unionByName(dup), threshold=0.999, n_cells=1)
    assert "cell_id" not in near1._jdf.queryExecution().analyzed().toString()
