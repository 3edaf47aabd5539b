"""Learned logistic scorer end-to-end (reference modeling entry point):
train on the group-split train partition, evaluate on test — the model must
separate planted duplicates from distractors, and MRR@5 must be high."""

import pytest
from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.operators.assemble import (
    assemble_documents,
)
from lab02_citation_matching_and_entity_resolution_spark.operators.blocking import (
    candidate_pairs,
)
from lab02_citation_matching_and_entity_resolution_spark.operators.features import (
    pair_features,
)
from lab02_citation_matching_and_entity_resolution_spark.operators.tfidf import (
    pair_tfidf_cosine,
)
from lab02_citation_matching_and_entity_resolution_spark.plans.model import (
    group_split_col,
    train_and_evaluate,
)
from lab02_citation_matching_and_entity_resolution_spark.synth import (
    SynthConfig,
    labeled_pairs_df,
    transcripts_df,
)

CFG = SynthConfig(n_base=60)


@pytest.fixture(scope="module")
def feature_pairs(spark):
    tr = transcripts_df(spark, CFG)
    docs = assemble_documents(tr).persist()
    pairs, _ = candidate_pairs(docs)
    feat = pair_tfidf_cosine(pair_features(pairs, docs), docs)
    return feat.persist()


def test_group_split_no_leakage(spark):
    df = spark.createDataFrame(
        [(f"e{i}", j) for i in range(50) for j in range(3)], "left_id string, j int"
    ).withColumn("partition", group_split_col("left_id"))
    # every group maps to exactly one partition
    assert (
        df.groupBy("left_id")
        .agg(F.countDistinct("partition").alias("n"))
        .where(F.col("n") > 1)
        .count()
        == 0
    )
    parts = {r["partition"] for r in df.select("partition").distinct().collect()}
    assert parts == {"train", "val", "test"}


def test_logistic_separates_and_ranks(spark, feature_pairs):
    labeled = labeled_pairs_df(spark, CFG)
    result = train_and_evaluate(feature_pairs, labeled, threshold=0.5)
    # the synthetic corpus is cleanly separable: near-perfect test F1
    assert result.test_metrics["f1"] >= 0.95, result.test_metrics
    assert result.mrr5 >= 0.9, result.mrr5
    # model_score is a probability
    row = result.scored.agg(
        F.min("model_score").alias("lo"), F.max("model_score").alias("hi")
    ).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_predictions_table(spark, feature_pairs):
    from lab02_citation_matching_and_entity_resolution_spark.plans.model import (
        predictions_table,
        train_and_evaluate,
    )

    labeled = labeled_pairs_df(spark, CFG)
    result = train_and_evaluate(feature_pairs, labeled, threshold=0.5)
    preds = predictions_table(result.scored, labeled, k=5)
    rows = preds.collect()
    assert rows, "predictions table empty"
    for r in rows[:50]:
        assert len(r["predictions"]) <= 5
        ranks = [p["rank"] for p in r["predictions"]]
        assert ranks == sorted(ranks)
    # for a separable corpus, the top-1 prediction of entities with truth
    # should usually BE a groundtruth id
    hits = sum(
        1
        for r in rows
        if r["groundtruth"] and r["predictions"]
        and r["predictions"][0]["right_id"] in r["groundtruth"]
    )
    with_truth = sum(1 for r in rows if r["groundtruth"] and r["predictions"])
    assert with_truth == 0 or hits / with_truth >= 0.9
