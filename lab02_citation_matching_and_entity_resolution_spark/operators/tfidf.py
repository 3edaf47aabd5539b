"""TF-IDF document vectors and pair cosine, fully relational (SURVEY.md §2.4 A6/A7).

The reference fits sklearn's TfidfVectorizer per block or per split and takes
the dense cosine matrix (ref: src/match_utils.py:411-424, :561-581).  Dense
matrices don't scale; the sparse dot product does:

    explode tokens → per-(doc, term) tf → doc-frequency agg → idf join
    → L2 normalize per doc → pairs ⋈ left-vector ⋈ right-vector on term
    → groupBy(pair) sum(w_l * w_r)

Every step is a native shuffle-parallel DataFrame op; the per-term join is the
classic sparse-cosine plan (terms are the join key, so common-term fan-out is
bounded by the IDF weighting being cheap to carry).

IDF uses sklearn's smooth formulation ln((1+n)/(1+df)) + 1 to keep the scoring
scale compatible with the reference's vectorizer defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_tfidf_vectors(docs: DataFrame, token_col: str = "tokens") -> DataFrame:
    """(conv_id, term, w_norm) sparse L2-normalized TF-IDF vectors."""
    terms = docs.select("conv_id", F.explode(token_col).alias("term"))
    tf = terms.groupBy("conv_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.countDistinct("conv_id").alias("n")).collect()[0]["n"]
    df = tf.groupBy("term").agg(F.countDistinct("conv_id").alias("df"))
    idf = df.select(
        "term",
        (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    w = tf.join(idf, "term").select(
        "conv_id", "term", (F.col("tf") * F.col("idf")).alias("w")
    )
    norms = w.groupBy("conv_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    return w.join(norms, "conv_id").select(
        "conv_id", "term", (F.col("w") / F.col("norm")).alias("w_norm")
    )


def pair_tfidf_cosine(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """pairs + tfidf_cosine column (0.0 when no shared terms)."""
    vec = doc_tfidf_vectors(docs)
    lv = vec.select(
        F.col("conv_id").alias("left_id"), "term", F.col("w_norm").alias("lw")
    )
    rv = vec.select(
        F.col("conv_id").alias("right_id"), "term", F.col("w_norm").alias("rw")
    )
    dots = (
        pairs.select("left_id", "right_id")
        .join(lv, "left_id")
        .join(rv, ["right_id", "term"])
        .groupBy("left_id", "right_id")
        .agg(F.sum(F.col("lw") * F.col("rw")).alias("tfidf_cosine"))
    )
    return pairs.join(dots, ["left_id", "right_id"], "left").fillna(
        {"tfidf_cosine": 0.0}
    )
