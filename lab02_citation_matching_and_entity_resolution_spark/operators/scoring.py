"""Match scoring: rule-combined score and learned logistic score (SURVEY.md §2.7 F26, §2.9 M5/M6).

Rule score — the reference's combined candidate score
(ref: src/match_utils.py:450-482): cosine base plus weighted boosts, capped at
1.0, rounded to 4 decimals (rounding BEFORE thresholding makes scores
bit-stable across partitioning — SURVEY §7.4.3), with an exact-key
short-circuit to 1.0 (the analogue of its arxiv_exact rule, :446-448): here,
byte-identical normalized doc_text.

Learned score — Spark ML LogisticRegression over the feature vector (the
north-star "logistic match score"; replaces the reference's sklearn
RandomForest, ref: src/modeling_utils.py:207-281, which isn't available and
wouldn't distribute).  Scoring is a broadcast dot product; we also expose the
weights for a pure-column sigmoid scorer that avoids ML pipeline overhead in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .features import FEATURE_COLS

# Reference boost weights (src/match_utils.py:466-473)
W_SIG_OVERLAP = 0.2
W_YEAR_MATCH = 0.1
W_YEAR_CLOSE = 0.05
W_TOKEN_JACC = 0.1
TOKEN_JACC_MIN = 0.6
W_SIGNATURE = 0.2


def rule_score_col(
    base: Column,
    sig_overlap: Column,
    year_match: Column,
    year_close: Column,
    token_jacc: Column,
    signature_match: Column,
) -> Column:
    raw = (
        base
        + W_SIG_OVERLAP * sig_overlap
        + W_YEAR_MATCH * year_match
        + W_YEAR_CLOSE * year_close
        + F.when(token_jacc >= TOKEN_JACC_MIN, F.lit(W_TOKEN_JACC)).otherwise(F.lit(0.0))
        + F.when(signature_match >= 1.0, F.lit(W_SIGNATURE)).otherwise(F.lit(0.0))
    )
    return F.round(F.least(F.lit(1.0), raw), 4)


def score_pairs_rule(feat: DataFrame) -> DataFrame:
    """Feature frame (pair_features + tfidf_cosine) -> + score, reason."""
    exact = (F.col("l_text") == F.col("r_text")) & (F.length("l_text") > 0)
    year_close = (
        F.when(
            F.col("l_year").isNotNull()
            & F.col("r_year").isNotNull()
            & (F.abs(F.col("l_year") - F.col("r_year")) <= 1),
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
    )
    combined = rule_score_col(
        F.col("tfidf_cosine"),
        F.col("role_tool_overlap"),
        F.col("year_match").cast("double"),
        year_close,
        F.col("jaccard"),
        F.col("signature_match"),
    )
    return feat.withColumn(
        "score", F.when(exact, F.lit(1.0)).otherwise(combined)
    ).withColumn(
        "reason",
        F.when(exact, F.lit("exact_norm")).otherwise(
            F.format_string(
                "rule(base=%.4f,sig=%.3f,year=%.0f,jacc=%.3f,tool=%.0f)",
                F.col("tfidf_cosine"),
                F.col("role_tool_overlap"),
                F.col("year_match").cast("double"),
                F.col("jaccard"),
                F.col("signature_match"),
            )
        ),
    )


def fit_logistic(train: DataFrame, label_col: str = "label"):
    """Fit Spark ML logistic regression on FEATURE_COLS; returns PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="fvec")
    lr = LogisticRegression(
        featuresCol="fvec", labelCol=label_col, maxIter=50, regParam=1e-4,
        standardization=True,
    )
    return Pipeline(stages=[assembler, lr]).fit(
        train.select(*FEATURE_COLS, label_col).na.fill(0)
    )


def fit_random_forest(
    train: DataFrame,
    label_col: str = "label",
    num_trees: int = 200,
    max_depth: int = 15,
    min_instances_per_node: int = 1,
    seed: int = 42,
):
    """Fit Spark ML RandomForest on FEATURE_COLS — the reference's model
    family (sklearn RandomForestClassifier, ref: src/modeling_utils.py:255-260;
    published best params README.md:355-369).  Same PipelineModel interface as
    fit_logistic, so score_pairs_logistic works unchanged."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="fvec")
    rf = RandomForestClassifier(
        featuresCol="fvec",
        labelCol=label_col,
        numTrees=num_trees,
        maxDepth=max_depth,
        minInstancesPerNode=min_instances_per_node,
        seed=seed,
    )
    return Pipeline(stages=[assembler, rf]).fit(
        train.select(*FEATURE_COLS, label_col).na.fill(0)
    )


# Reference grid: n_estimators [200,250] x max_depth [None,15,20] x
# min_samples_leaf [1,2] (ref: src/modeling_utils.py:236-243).  Spark analog
# (maxDepth has no None; 20 stands in for unbounded):
DEFAULT_RF_GRID: tuple[dict, ...] = tuple(
    {"num_trees": n, "max_depth": d, "min_instances_per_node": m}
    for n in (200, 250)
    for d in (15, 20)
    for m in (1, 2)
)


def tune_model(
    train: DataFrame,
    val: DataFrame,
    family: str = "rf",
    grid: tuple[dict, ...] | None = None,
    label_col: str = "label",
    seed: int = 42,
):
    """Grid search with a PREDEFINED train/val split — the reference tunes
    with GridSearchCV over a PredefinedSplit (fit on train rows, score on val
    rows; ref: src/modeling_utils.py:207-281), which Spark's random-split
    CrossValidator cannot honor, so this is a small driver loop of distributed
    fits: one fit per combo on ``train``, F1 measured on ``val``, best combo
    wins (ties -> first in grid order; all fits share ``seed``).

    Returns (best_model, best_params, results) where results is
    [(params, val_f1), ...] in grid order.
    """
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    if grid is None:
        grid = DEFAULT_RF_GRID if family == "rf" else (
            {"reg_param": 1e-4}, {"reg_param": 1e-2}, {"reg_param": 1.0},
        )
    evaluator = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="f1"
    )
    val_clean = val.select(*FEATURE_COLS, label_col).na.fill(0)
    results = []
    best = None
    for params in grid:
        if family == "rf":
            model = fit_random_forest(train, label_col=label_col, seed=seed, **params)
        elif family == "logistic":
            from pyspark.ml import Pipeline
            from pyspark.ml.classification import LogisticRegression
            from pyspark.ml.feature import VectorAssembler

            assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="fvec")
            lr = LogisticRegression(
                featuresCol="fvec", labelCol=label_col, maxIter=50,
                regParam=params.get("reg_param", 1e-4), standardization=True,
            )
            model = Pipeline(stages=[assembler, lr]).fit(
                train.select(*FEATURE_COLS, label_col).na.fill(0)
            )
        else:
            raise ValueError(f"unknown model family {family!r}")
        f1 = float(evaluator.evaluate(model.transform(val_clean)))
        results.append((params, f1))
        if best is None or f1 > best[1]:
            best = (model, f1, params)
    return best[0], best[2], results


def feature_importance_table(spark, model, model_family: str = "rf") -> DataFrame:
    """(feature, importance, model_family) — the analogue of the reference's
    published feature-importance table (README.md:482-490).  RF: Gini
    importances (sum to 1); logistic: coefficients."""
    stage = model.stages[-1]
    if model_family == "rf":
        vals = list(stage.featureImportances.toArray())
    else:
        vals = list(stage.coefficients.toArray())
    rows = [(f, float(v), model_family) for f, v in zip(FEATURE_COLS, vals)]
    rows.sort(key=lambda r: (-abs(r[1]), r[0]))
    return spark.createDataFrame(
        rows, "feature string, importance double, model_family string"
    )


def score_pairs_logistic(model, feat: DataFrame) -> DataFrame:
    """Attach model_score = P(match) from the fitted pipeline."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(feat.na.fill(0, subset=FEATURE_COLS))
    return scored.withColumn(
        "model_score", F.round(vector_to_array("probability")[1], 6)
    ).drop("fvec", "rawPrediction", "probability", "prediction")


def logistic_weights_scorer(model) -> tuple[list[float], float]:
    """Extract (coefficients, intercept) for the broadcast-sigmoid fast path."""
    lr_model = model.stages[-1]
    return list(lr_model.coefficients.toArray()), float(lr_model.intercept)


def sigmoid_score_col(weights: list[float], intercept: float) -> Column:
    """Pure-column sigmoid(X·w + b) — no ML pipeline in the hot path."""
    z = F.lit(intercept)
    for w, c in zip(weights, FEATURE_COLS):
        z = z + F.lit(w) * F.coalesce(F.col(c).cast("double"), F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
