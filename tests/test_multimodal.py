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
