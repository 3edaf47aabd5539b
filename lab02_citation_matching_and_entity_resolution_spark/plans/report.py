"""Corpus / model statistics reporting — the data layer behind the
reference's statistics and visualization modules, distributed.

The reference computes label counts + sample rows driver-side
(ref: src/match_utils.py:973-1002 ``compute_statistics``) and derives every
chart in src/visualization.py from pandas aggregations: value distributions
(:23-60), top-N (:61-100), missing-data ratios (:101-148), label distribution
(:280-333), feature distributions (:334-411), split distribution (:412-459),
score-by-label distribution (:460-513), feature correlation (:514-581), MRR
distribution (:709-747).  Charting is out of engine scope (SURVEY §2.10
rationale), but each chart's INPUT is an aggregation this module produces as
a DataFrame — one groupBy/agg pass each, no collect of row-level data, so the
same reports work at 10^12-turn scale.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_statistics(
    df: DataFrame,
    label_col: str = "label",
    id_cols: tuple[str, ...] = ("left_id", "right_id"),
    num_samples: int = 5,
) -> dict:
    """Parity analogue of the reference's ``compute_statistics``:
    {"labels": {label: count}, "samples": [row dicts]} — label histogram is a
    full aggregation; samples are the first ``num_samples`` rows in
    deterministic id order (the reference takes file order, which has no
    distributed equivalent)."""
    labels = {
        r["l"]: r["n"]
        for r in df.groupBy(F.col(label_col).alias("l"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    samples = [
        r.asDict() for r in df.orderBy(*[F.asc(c) for c in id_cols]).limit(num_samples).collect()
    ]
    return {"labels": labels, "samples": samples}


def missing_data_report(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_missing, missing_ratio) — plot_missing_data's input
    (ref: src/visualization.py:101-148).  One pass: conditional sums."""
    cols = cols or df.columns
    n = F.count(F.lit(1))
    aggs = [n.alias("_n")]
    for c in cols:
        missing = F.col(c).isNull()
        if dict(df.dtypes)[c] == "string":
            missing = missing | (F.col(c) == "")
        aggs.append(F.sum(missing.cast("long")).alias(f"_m_{c}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (c, int(row["_n"]), int(row[f"_m_{c}"]),
         float(row[f"_m_{c}"]) / row["_n"] if row["_n"] else 0.0)
        for c in cols
    ]
    return spark.createDataFrame(
        out, "column string, n_rows long, n_missing long, missing_ratio double"
    )


def value_histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
    by: str | None = None,
) -> DataFrame:
    """(bin, bin_lo, bin_hi[, by], n) equi-width histogram — the input of
    plot_distribution / plot_feature_distributions / score-by-label
    (ref: src/visualization.py:23-60, :334-411, :460-513).  Bounds come from
    one min/max pass unless given; binning is a native width computation, the
    count one groupBy."""
    if lo is None or hi is None:
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    width = (hi - lo) / n_bins if hi > lo else 1.0
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width).cast("int")),
    )
    keys = ([F.col(by)] if by else []) + [bin_col.alias("bin")]
    out = df.where(F.col(col).isNotNull()).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n")
    )
    return out.select(
        *([by] if by else []),
        "bin",
        (F.lit(lo) + F.col("bin") * width).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * width).alias("bin_hi"),
        "n",
    )


def feature_summary(df: DataFrame, cols: list[str]) -> DataFrame:
    """(feature, n, mean, stddev, min, max) in one aggregation pass —
    plot_feature_distributions' summary panel (ref: :334-411)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_samp(c).alias(f"{c}__std"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (
            c,
            int(row[f"{c}__n"]),
            float(row[f"{c}__mean"]) if row[f"{c}__mean"] is not None else None,
            float(row[f"{c}__std"]) if row[f"{c}__std"] is not None else None,
            float(row[f"{c}__min"]) if row[f"{c}__min"] is not None else None,
            float(row[f"{c}__max"]) if row[f"{c}__max"] is not None else None,
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "feature string, n long, mean double, stddev double, min double, max double",
    )


def feature_correlation(df: DataFrame, cols: list[str]) -> DataFrame:
    """(feature_a, feature_b, pearson) for every unordered pair, in ONE
    aggregation pass (F.corr per pair — k(k-1)/2 agg expressions, k small) —
    plot_feature_correlation's matrix (ref: :514-581) without its 10k-row
    driver sample cap: this is exact over the full frame."""
    pairs = list(itertools.combinations(cols, 2))
    aggs = [F.corr(a, b).alias(f"{a}|{b}") for a, b in pairs]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (a, b, float(row[f"{a}|{b}"]) if row[f"{a}|{b}"] is not None else None)
        for a, b in pairs
    ]
    return spark.createDataFrame(out, "feature_a string, feature_b string, pearson double")


def split_distribution(df: DataFrame, partition_col: str = "partition") -> DataFrame:
    """(partition, n, frac) — plot_split_distribution's input (ref: :412-459)."""
    total = df.count()
    return (
        df.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            partition_col,
            "n",
            (F.col("n") / F.lit(float(total))).alias("frac"),
        )
    )


def reciprocal_rank_distribution(
    scored: DataFrame,
    truth_pairs: DataFrame,
    k: int = 5,
    query_col: str = "left_id",
    cand_col: str = "right_id",
    score_col: str = "score",
) -> DataFrame:
    """(query, rr) per query entity — plot_mrr_distribution's input
    (ref: :709-747); avg(rr) equals metrics.mrr_at_k."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_col).orderBy(F.desc(score_col), F.asc(cand_col))
    ranked = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
    truth = truth_pairs.where(F.col("label") == 1).select(query_col, cand_col).distinct()
    hits = ranked.join(truth, [query_col, cand_col]).select(
        query_col, (F.lit(1.0) / F.col("rk")).alias("rr")
    )
    queries = truth.select(query_col).distinct()
    return queries.join(
        hits.groupBy(query_col).agg(F.max("rr").alias("rr")), query_col, "left"
    ).fillna({"rr": 0.0})
