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
from ..operators.scoring import (
    feature_importance_table,
    fit_logistic,
    fit_random_forest,
    score_pairs_logistic,
    tune_model,
)


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


def _group_counts(df: DataFrame, group_col: str) -> dict:
    """Driver-side (group -> row count) map — the same aggregate the
    reference collects into ``row_counts``; bounded by group cardinality."""
    return {
        r["g"]: r["c"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def _split_map_frame(df: DataFrame, group_col: str, rows: list) -> DataFrame:
    out_type = df.select(F.col(group_col)).schema.fields[0].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        rows, f"{group_col} {out_type}, partition string"
    )


def binpack_split_map(
    df: DataFrame,
    group_col: str,
    target_test_frac: float = 0.125,
    target_val_frac: float = 0.125,
    pinned_test: tuple = (),
    pinned_val: tuple = (),
) -> DataFrame:
    """Greedy row-count bin-packing split map: pinned (manual) groups are
    assigned first, then groups are taken largest-first into test/val until
    each bin reaches its row-count target (~12.5% by default); everything
    else trains.

    This is an APPROXIMATION of the reference's row-count targeting, not its
    selection rule: the reference (ref: src/match_utils.py:757-842) picks at
    most ONE manual group plus ONE closest-to-target auto group per split
    (early-stopping at 80% of the target) — implemented faithfully in
    ``reference_split_map`` below.  This variant instead fills each bin with
    as many groups as needed to hit the row fraction exactly, which is the
    better behavior when groups are small relative to the target (the
    reference's corpora have a handful of huge groups, where one group IS
    the bin).

    Opt-in alternative to the hash-nibble ``group_split_col`` (the scale
    default): this one can pin groups and hit an exact row fraction, at the
    cost of a driver-side greedy pass over the per-group count aggregate —
    one (group, count) tuple per group, the same map the reference collects
    into ``row_counts``; use the hash split when group cardinality exceeds
    driver memory (~10^7 groups).

    Returns a small (group_col, partition) DataFrame covering test+val groups
    only — broadcast-join it and default the misses to 'train'
    (``binpack_group_split`` does exactly that).
    """
    counts = _group_counts(df, group_col)
    total = sum(counts.values())
    target_test = total * target_test_frac
    target_val = total * target_val_frac
    assigned: dict = {}
    test_rows = val_rows = 0
    for g in pinned_test:
        if g in counts:
            assigned[g] = "test"
            test_rows += counts[g]
    for g in pinned_val:
        if g in counts and g not in assigned:
            assigned[g] = "val"
            val_rows += counts[g]
    # largest-first greedy; (count desc, group asc) makes the pick order —
    # and therefore the split — deterministic under any row order
    for g, c in sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0]))):
        if g in assigned:
            continue
        if test_rows + c <= target_test:
            assigned[g] = "test"
            test_rows += c
        elif val_rows + c <= target_val:
            assigned[g] = "val"
            val_rows += c
    rows = [(g, p) for g, p in sorted(assigned.items(), key=lambda kv: str(kv[0]))]
    return _split_map_frame(df, group_col, rows)


def reference_split_map(
    df: DataFrame,
    group_col: str,
    target_test_frac: float = 0.125,
    target_val_frac: float = 0.125,
    manual_groups: tuple = (),
    test_groups: tuple = (),
    val_groups: tuple = (),
) -> DataFrame:
    """Faithful port of the reference's split selection
    (ref: src/match_utils.py:757-842): explicit ``test_groups``/``val_groups``
    win outright; otherwise each split gets at most ONE manual group (largest
    manual for test, next for val) plus ONE auto group whose addition lands
    closest to the row-count target, scanning auto groups largest-first and
    early-stopping once >= 80% of the target is reached.  Everything else
    trains.  Driver-side over the per-group count aggregate, like
    ``binpack_split_map`` (same ~10^7-group bound; use ``group_split_col``
    beyond it).
    """
    counts = _group_counts(df, group_col)
    total = sum(counts.values())
    manual_set = set(manual_groups)
    manual_sorted = sorted(
        [g for g in manual_set if g in counts],
        key=lambda g: (-counts[g], str(g)),
    )
    auto_sorted = sorted(
        [g for g in counts if g not in manual_set],
        key=lambda g: (-counts[g], str(g)),
    )

    def pick(target_rows: float, seed_manual, taken: set) -> list:
        chosen = []
        rows = 0
        if seed_manual is not None:
            chosen.append(seed_manual)
            rows += counts[seed_manual]
        best_auto, best_diff = None, float("inf")
        for g in auto_sorted:
            if g in taken or g in chosen:
                continue
            cand = rows + counts[g]
            diff = abs(cand - target_rows)
            if diff < best_diff:
                best_diff = diff
                best_auto = g
                if cand >= target_rows * 0.8:
                    break
        if best_auto is not None:
            chosen.append(best_auto)
        elif not chosen and auto_sorted:
            for g in auto_sorted:
                if g not in taken:
                    chosen.append(g)
                    break
        return chosen

    test_ids = list(test_groups)
    if not test_ids:
        seed = manual_sorted[0] if manual_sorted else None
        # explicitly pinned val groups are off-limits to the test pick (the
        # reference never faces this: it only auto-selects when BOTH lists
        # are empty in practice; without the exclusion a pinned val group
        # could be claimed by test and silently dropped from val)
        test_ids = pick(int(total * target_test_frac), seed, set(val_groups))
    val_ids = list(val_groups)
    if not val_ids:
        if len(manual_sorted) > 1 and manual_sorted[1] not in test_ids:
            seed = manual_sorted[1]
        elif manual_sorted and manual_sorted[0] not in test_ids:
            seed = manual_sorted[0]
        else:
            seed = None
        val_ids = pick(int(total * target_val_frac), seed, set(test_ids))
    rows = [(g, "test") for g in sorted(test_ids, key=str) if g in counts] + [
        (g, "val") for g in sorted(val_ids, key=str) if g in counts and g not in test_ids
    ]
    return _split_map_frame(df, group_col, rows)


def binpack_group_split(
    df: DataFrame,
    group_col: str,
    target_test_frac: float = 0.125,
    target_val_frac: float = 0.125,
    pinned_test: tuple = (),
    pinned_val: tuple = (),
) -> DataFrame:
    """df + 'partition' column via the bin-packing map (broadcast join;
    groups absent from the map are train)."""
    m = binpack_split_map(
        df, group_col, target_test_frac, target_val_frac, pinned_test, pinned_val
    )
    return df.join(F.broadcast(m), group_col, "left").withColumn(
        "partition", F.coalesce("partition", F.lit("train"))
    )


def attach_labels(
    feature_pairs: DataFrame,
    labeled_pairs: DataFrame,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Join ground-truth labels onto the feature frame (canonical ids).

    Every labeled pair survives, carrying an ``unblocked`` flag (1 = blocking
    never produced the pair).  For the unblocked pairs:

    - ``docs`` given (assemble_documents output): REAL features are computed
      via pair_features and unioned in — the reference's behavior, which
      featurizes every labeled pair directly and independently of blocking
      (ref: src/feature_engineering_utils.py compute_features).  This is the
      correct mode for training.  Pairs whose ids do not exist in ``docs``
      at all (stale label files) cannot be featurized and are kept
      zero-filled with unblocked=1, so the frame never silently loses a
      labeled pair.
    - ``docs`` None: unblocked pairs are kept ZERO-FILLED (zero_filled=1).
      That is honest for label-0 (no blocking key fired, no similarity
      evidence) and for EVALUATION of label-1 (a positive blocking missed
      scores ~0 and counts as a false negative — hiding it would inflate
      recall).  It is contradictory as a TRAINING row for label-1, which is
      why train_and_evaluate excludes (label=1, zero_filled=1) rows from the
      train partition only (round-2 ADVICE), with a warning here.
    """
    lab = labeled_pairs.select("left_id", "right_id", "label")
    matched = (
        feature_pairs.join(lab, ["left_id", "right_id"], "inner")
        .withColumn("unblocked", F.lit(0))
        .withColumn("zero_filled", F.lit(0))
    )
    missing = lab.join(
        feature_pairs.select("left_id", "right_id"),
        ["left_id", "right_id"],
        "left_anti",
    )
    if docs is not None:
        from ..operators.features import pair_features

        miss_feat = (
            # no cosine is computed for these rows — don't ship vectors
            pair_features(missing, docs, attach_tfidf=False)
            .withColumn("unblocked", F.lit(1))
            .withColumn("zero_filled", F.lit(0))
        )
        # ids absent from docs: pair_features' doc joins drop them — keep
        # them zero-filled so "every labeled pair survives" stays true
        residual = (
            missing.join(
                miss_feat.select("left_id", "right_id"),
                ["left_id", "right_id"],
                "left_anti",
            )
            .withColumn("unblocked", F.lit(1))
            .withColumn("zero_filled", F.lit(1))
        )
        joined = matched.unionByName(miss_feat, allowMissingColumns=True).unionByName(
            residual, allowMissingColumns=True
        )
    else:
        import warnings

        warnings.warn(
            "attach_labels without docs: labeled pairs blocking missed keep "
            "zero features (flagged unblocked=1; positives among them are "
            "excluded from TRAINING by train_and_evaluate but kept for "
            "evaluation); pass docs= to featurize them for real.",
            RuntimeWarning,
            stacklevel=2,
        )
        joined = matched.unionByName(
            missing.withColumn("unblocked", F.lit(1)).withColumn(
                "zero_filled", F.lit(1)
            ),
            allowMissingColumns=True,
        )
    return joined.na.fill(0.0, subset=[c for c in FEATURE_COLS if c in joined.columns])


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
    importances: DataFrame | None = None   # (feature, importance, model_family)
    best_params: dict | None = None        # set when tune=True
    tuning_results: list | None = None     # [(params, val_f1), ...] grid order


def train_and_evaluate(
    feature_pairs: DataFrame,
    labeled_pairs: DataFrame,
    threshold: float = 0.5,
    model_family: str = "logistic",
    tune: bool = False,
    grid: tuple[dict, ...] | None = None,
    docs: DataFrame | None = None,
) -> ModelResult:
    """model_family: "logistic" (north-star default) or "rf" (the reference's
    RandomForest, ref: src/modeling_utils.py:255-260).  tune=True grid-searches
    on the predefined train/val split (reference GridSearchCV+PredefinedSplit,
    :207-281) instead of a single fit.  Pass ``docs`` (assemble_documents
    output) so labeled pairs blocking missed get real features, not zeros —
    see attach_labels."""
    data = attach_labels(feature_pairs, labeled_pairs, docs=docs).withColumn(
        "partition", group_split_col("left_id")
    ).persist()

    # zero-FILLED positives (blocking missed them and no real features could
    # be computed) are contradictory TRAINING rows; they stay in val/test so
    # evaluation still counts them as the false negatives they are.
    # Unblocked positives WITH real features (docs mode) train normally.
    train = data.where(
        (F.col("partition") == "train")
        & ~((F.col("label") == 1) & (F.col("zero_filled") == 1))
    )
    best_params = None
    tuning_results = None
    if tune:
        val = data.where(F.col("partition") == "val")
        model, best_params, tuning_results = tune_model(
            train, val, family=model_family, grid=grid
        )
    elif model_family == "rf":
        model = fit_random_forest(train)
    else:
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
    importances = feature_importance_table(
        feature_pairs.sparkSession, model, model_family
    )
    return ModelResult(
        model, scored, test_metrics, mrr5,
        importances=importances, best_params=best_params,
        tuning_results=tuning_results,
    )


def log_importances(log, result: ModelResult, stage: str = "model"):
    """Write the importance table into the lineage metrics table
    (metric=importance.<feature>) — the M9 sink analogue of the reference's
    published importance table (README.md:482-490)."""
    rows = [
        (0, f"importance.{r['feature']}", float(r["importance"]))
        for r in result.importances.collect()
    ]
    log.log_metrics(stage, rows)
