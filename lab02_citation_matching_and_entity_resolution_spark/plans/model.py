"""Learned-scorer plan (SURVEY.md §3.3 — the reference's modeling entry point).

Labeled pairs join onto the feature frame, a leakage-free group-level split
(the reference's publication-level split, ref: src/match_utils.py:757-842 —
here a deterministic hash of the left entity id, order-free per SURVEY
§7.4.4), Spark ML logistic fit on the train partition, scoring everywhere,
and the reference's evaluation protocol: classification report on pairs
(ref: src/modeling_utils.py:307-315) + MRR@5 (ref: :331-388).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.features import FEATURE_COLS
from ..operators.metrics import mrr_at_k, pairwise_prf
from ..operators.scoring import fit_logistic, score_pairs_logistic


def group_split_col(key_col: str, test_frac_16: int = 2, val_frac_16: int = 2) -> F.Column:
    """Deterministic group-level split label from an md5 nibble of the key.

    test = first `test_frac_16`/16 of hash space, val = next, rest train —
    all rows of a group land in one partition (no leakage), stable under any
    row order or cluster size.
    """
    nibble = F.conv(F.substring(F.md5(F.col(key_col)), 1, 1), 16, 10).cast("int")
    return (
        F.when(nibble < test_frac_16, "test")
        .when(nibble < test_frac_16 + val_frac_16, "val")
        .otherwise("train")
    )


def attach_labels(feature_pairs: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
    """Inner-join ground-truth labels onto the feature frame (canonical ids)."""
    return feature_pairs.join(
        labeled_pairs.select("left_id", "right_id", "label"),
        ["left_id", "right_id"],
    )


def predictions_table(
    scored: DataFrame,
    labeled_pairs: DataFrame,
    k: int = 5,
    score_col: str = "model_score",
) -> DataFrame:
    """Per-left-entity top-k predictions merged with groundtruth — the
    analogue of the reference's per-paper pred.json
    (ref: src/modeling_utils.py:391-481, format README.md:429-445), as a
    MERGE-able table keyed by left_id instead of a file per group.

    Columns: left_id, predictions array<struct<right_id, score, rank>>,
    groundtruth array<string> (label-1 right ids).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("left_id").orderBy(F.desc(score_col), F.asc("right_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .groupBy("left_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rank"), F.col("right_id"), F.col(score_col).alias("score")
                    )
                )
            ).alias("predictions")
        )
    )
    truth = (
        labeled_pairs.where(F.col("label") == 1)
        .groupBy("left_id")
        .agg(F.sort_array(F.collect_set("right_id")).alias("groundtruth"))
    )
    return topk.join(truth, "left_id", "full").select(
        "left_id",
        F.coalesce("predictions", F.array()).alias("predictions"),
        F.coalesce("groundtruth", F.array().cast("array<string>")).alias("groundtruth"),
    )


@dataclass
class ModelResult:
    model: object
    scored: DataFrame          # labeled pairs + model_score + partition
    test_metrics: dict         # pairwise P/R/F1 on the test partition
    mrr5: float


def train_and_evaluate(
    feature_pairs: DataFrame,
    labeled_pairs: DataFrame,
    threshold: float = 0.5,
) -> ModelResult:
    data = attach_labels(feature_pairs, labeled_pairs).withColumn(
        "partition", group_split_col("left_id")
    ).persist()

    train = data.where(F.col("partition") == "train")
    model = fit_logistic(train)
    scored = score_pairs_logistic(model, data).persist()

    test = scored.where(F.col("partition") == "test")
    predicted = test.where(F.col("model_score") >= threshold).select(
        "left_id", "right_id"
    )
    truth = test.select("left_id", "right_id", "label")
    test_metrics = pairwise_prf(predicted, truth)
    mrr5 = mrr_at_k(
        scored.select("left_id", "right_id", F.col("model_score").alias("score")),
        labeled_pairs,
        k=5,
    )
    return ModelResult(model, scored, test_metrics, mrr5)
