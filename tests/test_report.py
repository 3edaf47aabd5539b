"""Statistics-reporting layer (plans/report.py) — the distributed data behind
the reference's compute_statistics + visualization charts."""

import math

from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.plans import report


def _pairs(spark):
    rows = [
        ("a", "b", 1, 0.9, 0.8),
        ("a", "c", 0, 0.1, 0.2),
        ("b", "c", 1, 0.7, None),
        ("b", "d", 0, 0.2, 0.1),
        ("c", "d", 1, 0.95, 0.9),
        ("c", "e", 0, 0.05, 0.0),
    ]
    return spark.createDataFrame(
        rows, "left_id string, right_id string, label int, score double, jaccard double"
    )


def test_corpus_statistics(spark):
    stats = report.corpus_statistics(_pairs(spark), num_samples=2)
    assert stats["labels"] == {1: 3, 0: 3}
    assert len(stats["samples"]) == 2
    assert stats["samples"][0]["left_id"] == "a" and stats["samples"][0]["right_id"] == "b"


def test_missing_data_report(spark):
    got = {r["column"]: r for r in report.missing_data_report(_pairs(spark)).collect()}
    assert got["jaccard"]["n_missing"] == 1
    assert abs(got["jaccard"]["missing_ratio"] - 1 / 6) < 1e-12
    assert got["score"]["n_missing"] == 0


def test_value_histogram_totals_and_bounds(spark):
    h = report.value_histogram(_pairs(spark), "score", n_bins=4, lo=0.0, hi=1.0).collect()
    assert sum(r["n"] for r in h) == 6
    for r in h:
        assert 0 <= r["bin"] < 4
        assert abs((r["bin_hi"] - r["bin_lo"]) - 0.25) < 1e-12
    byl = report.value_histogram(
        _pairs(spark), "score", n_bins=2, lo=0.0, hi=1.0, by="label"
    ).collect()
    # positives all land in the upper half, negatives in the lower
    assert all(r["bin"] == 1 for r in byl if r["label"] == 1)
    assert all(r["bin"] == 0 for r in byl if r["label"] == 0)


def test_feature_summary_and_correlation(spark):
    summ = {r["feature"]: r for r in report.feature_summary(
        _pairs(spark), ["score", "jaccard"]).collect()}
    assert summ["score"]["n"] == 6
    assert abs(summ["score"]["mean"] - (0.9 + 0.1 + 0.7 + 0.2 + 0.95 + 0.05) / 6) < 1e-9
    assert summ["jaccard"]["n"] == 5  # null excluded

    corr = report.feature_correlation(_pairs(spark), ["score", "jaccard", "label"]).collect()
    got = {(r["feature_a"], r["feature_b"]): r["pearson"] for r in corr}
    assert len(got) == 3
    assert got[("score", "jaccard")] > 0.9  # strongly correlated by construction


def test_split_distribution(spark):
    df = spark.createDataFrame(
        [(i, "train" if i < 6 else "test") for i in range(8)], "i int, partition string"
    )
    got = {r["partition"]: r for r in report.split_distribution(df).collect()}
    assert got["train"]["n"] == 6 and abs(got["train"]["frac"] - 0.75) < 1e-12


def test_reciprocal_rank_distribution_matches_mrr(spark):
    from lab02_citation_matching_and_entity_resolution_spark.operators.metrics import (
        mrr_at_k,
    )

    scored = _pairs(spark).select("left_id", "right_id", "score")
    truth = _pairs(spark).select("left_id", "right_id", "label")
    rr = report.reciprocal_rank_distribution(scored, truth, k=5)
    mean_rr = rr.agg(F.avg("rr").alias("m")).collect()[0]["m"]
    assert abs(mean_rr - mrr_at_k(scored, truth, k=5)) < 1e-12
