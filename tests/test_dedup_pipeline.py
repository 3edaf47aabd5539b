"""Composed dedup pipeline (plans/dedup_pipeline.py) + its CLI mode.

The round-5 verdict's top composition gap: the dedup operator family was
library-only; "dedup this corpus" required hand-wiring signatures -> band
pairs -> groups -> keepers.  These tests pin the composed plan and the
--dedup CLI surface end-to-end, including resume and the audit sinks
(per-pass caps, IVF recall, mix shortfall -> metrics table).
"""

from __future__ import annotations

import argparse

import pytest
from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.plans.dedup_pipeline import (
    DedupConfig,
    run_dedup_pipeline,
)


def _docs(spark):
    # d1/d2 byte-identical; d3 a near-dup of d1 (one token changed);
    # d4/d5 distinct; d6 a second exact copy group with d7
    near = (
        "the quick brown fox jumps over the lazy dog and runs away fast into "
        "the deep dark forest beyond the quiet river where nobody ever goes"
    )
    rows = [
        ("d1", near, "en", "web"),
        ("d2", near, "en", "web"),
        ("d3", near.replace("dog", "cat"), "en", "web"),
        ("d4", "completely different content about spark dataframes and shuffles", "en", "wiki"),
        ("d5", "yet another unrelated document discussing parquet row groups", "en", "wiki"),
        ("d6", "boilerplate footer text repeated verbatim across pages", "en", "web"),
        ("d7", "boilerplate footer text repeated verbatim across pages", "en", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string, lang string, source string")


def test_run_dedup_pipeline_groups_and_keepers(spark):
    docs = _docs(spark)
    # 8 bands x 2 rows: the banding threshold (~0.35 Jaccard) comfortably
    # covers the planted one-word edit under xxhash64 (4x4 deterministically
    # misses it at this text length — probed, not assumed)
    cfg = DedupConfig(passes=("exact", "minhash"), shingle_n=4, minhash_bands=8)
    res = run_dedup_pipeline(docs, cfg)

    groups = {r["doc_id"]: r for r in res.groups.collect()}
    # complete assignment: every doc exactly once
    assert sorted(groups) == [f"d{i}" for i in range(1, 8)]
    # exact copies share a group with min-id keeper
    assert groups["d2"]["group_id"] == "d1" and not groups["d2"]["is_keeper"]
    assert groups["d7"]["group_id"] == "d6" and not groups["d7"]["is_keeper"]
    # near-dup d3 joins d1's group via the minhash pass
    assert groups["d3"]["group_id"] == "d1"
    # singletons keep themselves
    assert groups["d4"]["is_keeper"] and groups["d5"]["is_keeper"]

    keepers = {r["doc_id"] for r in res.keepers.collect()}
    assert keepers == {"d1", "d4", "d5", "d6"}

    passes_seen = {r["pass"] for r in res.pairs.select("pass").distinct().collect()}
    assert "exact" in passes_seen and "minhash" in passes_seen
    # exact pass is star-shaped: left is always the group min
    exact = res.pairs.where(F.col("pass") == "exact").collect()
    assert {(r["left_id"], r["right_id"]) for r in exact} == {("d1", "d2"), ("d6", "d7")}
    assert res.cc_stats.get("algorithm") in ("propagation", "star")


def test_unknown_pass_and_missing_embeddings_refuse(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="unknown dedup pass"):
        run_dedup_pipeline(docs, DedupConfig(passes=("minhashx",)))
    with pytest.raises(ValueError, match="requires an embeddings frame"):
        run_dedup_pipeline(docs, DedupConfig(passes=("embedding",)))


def _cli_args(**over):
    base = dict(
        input=None, embeddings=None, dedup_passes="exact,minhash",
        band_cap=1000, id_col="doc_id", text_col="text",
        n_partitions=8, resume=None, mix=None, mix_n=0, mix_col="source",
        embedding_cells=2,  # tiny corpora need few cells, else no blocking pairs
    )
    base.update(over)
    return argparse.Namespace(**base)


def _run_cli_dedup(spark, tmp_path, **over):
    from lab02_citation_matching_and_entity_resolution_spark.cli import _run_dedup
    from lab02_citation_matching_and_entity_resolution_spark.plans.lineage import (
        LineageLog,
    )
    from lab02_citation_matching_and_entity_resolution_spark.sources.tables import (
        TableStore,
    )

    store = TableStore(spark, str(tmp_path / "store"))
    run_id = over.pop("run_id", "t_dedup_1")
    args = _cli_args(**over)
    log = LineageLog(store, run_id)
    _run_dedup(spark, store, log, run_id, args)
    return store, log, run_id


def test_dedup_cli_end_to_end(spark, tmp_path):
    docs = _docs(spark)
    in_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(in_path)

    store, _log, run_id = _run_cli_dedup(
        spark, tmp_path, input=in_path,
        dedup_passes="exact,minhash,simhash,ngram",
        mix="web:0.5,wiki:0.5", mix_n=2,
    )

    for t in ("dedup_pairs", "dedup_groups", "dedup_keepers",
              "dedup_cap_metrics", "corpus_sample"):
        assert store.exists(t), t
    groups = store.read("dedup_groups")
    assert groups.count() == 7
    assert groups.where("is_keeper").count() == store.read("dedup_keepers").count()
    # evidence table carries the pass column for every enabled pass that fired
    fired = {r["pass"] for r in store.read("dedup_pairs").select("pass").distinct().collect()}
    assert {"exact", "minhash"} <= fired
    # metrics: per-pass pair counts + totals + mix shortfalls
    metrics = {
        r["metric"]: r["value"]
        for r in store.read("_metrics").where(F.col("run_id") == run_id).collect()
    }
    for p in ("exact", "minhash", "simhash", "ngram"):
        assert f"pairs_{p}" in metrics
        assert f"cap_rows_dropped_{p}" in metrics
    assert metrics["docs_in"] == 7.0
    assert metrics["keepers"] + metrics["docs_dropped"] == 7.0
    assert "mix_shortfall_web" in metrics and "mix_shortfall_wiki" in metrics
    # the sample respects the quota where the stratum is big enough
    sample = store.read("corpus_sample")
    assert sample.count() == 2


def test_dedup_cli_embedding_pass_with_recall_audit(spark, tmp_path):
    docs = _docs(spark)
    in_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(in_path)
    # d1/d2 embeddings nearly identical (cosine ~1), others orthogonal-ish
    vecs = [
        ("d1", [1.0, 0.0, 0.1, 0.0]),
        ("d2", [1.0, 0.01, 0.1, 0.0]),
        ("d3", [0.0, 1.0, 0.0, 0.2]),
        ("d4", [0.0, 0.0, 1.0, 0.0]),
        ("d5", [0.3, 0.3, 0.0, 1.0]),
        ("d6", [0.0, 1.0, 1.0, 0.0]),
        ("d7", [1.0, 1.0, 0.0, 1.0]),
    ]
    emb_path = str(tmp_path / "emb.parquet")
    spark.createDataFrame(vecs, "vec_id string, embedding array<double>").write.parquet(emb_path)

    store, _log, run_id = _run_cli_dedup(
        spark, tmp_path, input=in_path, embeddings=emb_path,
        dedup_passes="embedding", run_id="t_dedup_emb",
    )
    pairs = store.read("dedup_pairs").collect()
    assert all(r["pass"] == "embedding" for r in pairs)
    assert {("d1", "d2")} <= {(r["left_id"], r["right_id"]) for r in pairs}
    metrics = {
        r["metric"]: r["value"]
        for r in store.read("_metrics").where(F.col("run_id") == run_id).collect()
    }
    # IVF recall audit surfaced through the lineage metrics sink
    recall_keys = [k for k in metrics if k.startswith("ivf_recall_mean_p")]
    assert recall_keys, metrics
    assert all(0.0 <= metrics[k] <= 1.0 for k in recall_keys)


def test_dedup_cli_resume_skips_completed_partitions(spark, tmp_path):
    docs = _docs(spark)
    in_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(in_path)

    store, log, run_id = _run_cli_dedup(
        spark, tmp_path, input=in_path, run_id="t_dedup_res",
    )
    n_groups = store.read("dedup_groups").count()
    done_first = log.completed_partitions("dedup_groups").count()
    assert done_first > 0

    # resume the same run: every partition is already checkpointed, so the
    # partitioned overwrite must write ZERO new rows and leave the table whole
    _run_cli_dedup(
        spark, tmp_path, input=in_path, run_id="t_dedup_res", resume="t_dedup_res",
    )
    assert store.read("dedup_groups").count() == n_groups
    checkpoints = store.read("_checkpoints").where(
        (F.col("run_id") == "t_dedup_res") & (F.col("stage") == "dedup_groups")
    )
    # second invocation marked no additional partitions (resume filter left
    # nothing to write)
    per_seq = checkpoints.groupBy("seq").count().collect()
    assert max(r["count"] for r in per_seq) == done_first
