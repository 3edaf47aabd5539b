"""Per-block TF-IDF scope (reference default TFIDF_SCOPE="paper",
ref: src/match_utils.py:411-424): fitting the IDF within each block must give
exactly the vectors of a separate global fit run on each block's documents."""

import math

from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.operators.tfidf import (
    block_scope_idf,
    doc_tfidf_vectors,
)


def _docs(spark):
    rows = [
        ("a1", "b1", ["x", "y"]),
        ("a2", "b1", ["x", "z"]),
        ("a3", "b2", ["x", "y"]),
        ("a4", "b2", ["y", "y", "w"]),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, blk string, tokens array<string>"
    )


def test_block_scope_idf_values(spark):
    idf = {
        (r["blk"], r["term"]): (r["df"], r["idf"])
        for r in block_scope_idf(_docs(spark), ("blk",)).collect()
    }
    # block b1: n=2 docs; x appears in both -> idf = ln(3/3)+1 = 1.0
    assert idf[("b1", "x")] == (2, 1.0)
    # y appears in 1 of 2 -> ln(3/2)+1
    df, v = idf[("b1", "y")]
    assert df == 1 and abs(v - (math.log(3 / 2) + 1.0)) < 1e-12
    # same term, different block, different idf: x in b2 has df=1 of n=2
    df, v = idf[("b2", "x")]
    assert df == 1 and abs(v - (math.log(3 / 2) + 1.0)) < 1e-12


def test_block_scope_equals_per_block_global_fit(spark):
    docs = _docs(spark)
    scoped = doc_tfidf_vectors(docs, scope_cols=("blk",)).collect()
    expected = []
    for b in ("b1", "b2"):
        sub = docs.where(F.col("blk") == b).select("conv_id", "tokens")
        expected += doc_tfidf_vectors(sub).collect()

    def canon(rows):
        return sorted((r["conv_id"], r["term"], round(r["w_norm"], 9)) for r in rows)

    assert canon(scoped) == canon(expected)


def test_global_scope_unchanged(spark):
    docs = _docs(spark).select("conv_id", "tokens")
    vecs = doc_tfidf_vectors(docs).collect()
    # L2 norm of every document vector is 1
    norms = {}
    for r in vecs:
        norms[r["conv_id"]] = norms.get(r["conv_id"], 0.0) + r["w_norm"] ** 2
    assert all(abs(v - 1.0) < 1e-9 for v in norms.values())
