"""Physical-plan discipline tests (SURVEY.md §4): the optimizations we rely on
at 100 TB must actually appear in the plans — filter pushdown to parquet,
column pruning, broadcast joins for small dims, map-side partial aggregation,
and no per-row Python anywhere in the scoring path."""

from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.queries_catalog import REGISTRY, T


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(REGISTRY["s2_filtered_scan"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark, sf_dir):
    # P6 is witnessed inside p5_threshold_split (registry capped at 50);
    # the pruning contract itself is pinned here on the raw projection
    plan = _plan(
        T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    )
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in read_schema
    # unprojected wide columns must not be read
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_broadcast_join_selected(spark, sf_dir):
    plan = _plan(REGISTRY["j3_broadcast_lookup"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation(spark, sf_dir):
    plan = _plan(REGISTRY["a5_sum_rollups"].fn(spark, sf_dir))
    # partial (map-side) + final aggregate
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_in_features(spark):
    """The pair-feature frame must be JVM-native except the one Arrow UDF."""
    from lab02_citation_matching_and_entity_resolution_spark.operators.assemble import (
        assemble_documents,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators.features import (
        pair_features,
    )
    from lab02_citation_matching_and_entity_resolution_spark.synth import (
        SynthConfig,
        transcripts_df,
    )

    tr = transcripts_df(spark, SynthConfig(n_base=6))
    # persist docs exactly as run_pipeline does: without it, every join branch
    # re-runs the normalizer UDF lineage (the plan shows one ArrowEvalPython
    # per reference) — persisting collapses them to InMemoryTableScan reads
    docs = assemble_documents(tr).persist()
    docs.count()
    pairs = docs.select(F.col("conv_id").alias("left_id")).crossJoin(
        docs.select(F.col("conv_id").alias("right_id"))
    ).limit(10)
    plan = _plan(pair_features(pairs, docs))
    # row-at-a-time Python would show up as BatchEvalPython
    assert "BatchEvalPython" not in plan
    # docs lineage must be served from cache, not recomputed per join branch
    assert "InMemoryTableScan" in plan
    # exactly one EXECUTING Arrow python stage (jaro_winkler): the executing
    # tree sits above the first cached-lineage description in the plan text
    executing_tree = plan.split("InMemoryRelation")[0]
    assert executing_tree.count("ArrowEvalPython") == 1
    docs.unpersist()


def test_exchange_count_blocking_token_pass(spark):
    """Token-prefix pass: one shuffle for the window cap + join reuses it —
    no gratuitous extra exchanges."""
    from lab02_citation_matching_and_entity_resolution_spark.operators.assemble import (
        assemble_documents,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators.blocking import (
        BlockingConfig,
        token_prefix_pass,
    )
    from lab02_citation_matching_and_entity_resolution_spark.synth import (
        SynthConfig,
        transcripts_df,
    )

    tr = transcripts_df(spark, SynthConfig(n_base=6))
    docs = assemble_documents(tr)
    pairs, _ = token_prefix_pass(docs, BlockingConfig())
    # count EXECUTING exchanges in the plan tree only (the details section
    # repeats every node name once more)
    tree = _plan(pairs).split("\n\n")[0]
    n_exchange = tree.count("- Exchange")
    # expected: 1 shuffle for groupBy(conv_id) assembly, 1 for the window cap
    # on block_key (both join sides reuse that partitioning)
    assert n_exchange <= 4, tree


def test_language_id_stays_jvm_side(spark, sf_dir):
    """The 10-language profile scorer runs over every document at corpus
    scale: its plan must contain no Python/Arrow stage and no exchange
    (pure per-row projection -> narrow, codegen-able)."""
    from lab02_citation_matching_and_entity_resolution_spark.operators.textstats import (
        language_id,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(language_id(docs))
    assert "Python" not in plan, plan  # no BatchEvalPython/ArrowEvalPython
    assert "Exchange" not in plan, plan  # narrow: no shuffle for a projection


def test_dedup_cap_adds_single_exchange(spark):
    """The md5-ranked block cap is one window over the block key: capped
    minhash banding must add exactly one extra Exchange vs uncapped (the
    row_number partitioning), not a plan blowup."""
    from lab02_citation_matching_and_entity_resolution_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"text body number {i} with shared tokens") for i in range(50)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, n_hashes=8, shingle_n=4)
    uncapped = _plan(dedup.minhash_band_pairs(sigs, n_hashes=8, bands=4, band_cap=None))
    capped = _plan(dedup.minhash_band_pairs(sigs, n_hashes=8, bands=4, band_cap=10))
    n_unc = uncapped.count("Exchange")
    n_cap = capped.count("Exchange")
    assert n_cap <= n_unc + 2, (n_unc, n_cap)  # window partition + its reuse


def test_pair_feature_joins_use_shuffled_hash_not_sort_merge(spark):
    """The docs sides of the pair-feature and TF-IDF joins are hinted
    shuffle_hash: SortMergeJoin would sort the heavy enriched pair rows
    (shingle sets + prefixes, ~12 KB/row) twice per layer — measured 2-2.9x
    slower at 5.5M pairs (round-5 rehearsal).  Pin the strategy so a hint
    regression is caught."""
    from lab02_citation_matching_and_entity_resolution_spark.operators.assemble import (
        assemble_documents,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators.features import (
        pair_features,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators.tfidf import (
        pair_tfidf_cosine,
    )
    from lab02_citation_matching_and_entity_resolution_spark.synth import (
        SynthConfig,
        transcripts_df,
    )

    tr = transcripts_df(spark, SynthConfig(n_base=6))
    docs = assemble_documents(tr)
    pairs = docs.select(F.col("conv_id").alias("left_id")).crossJoin(
        docs.select(F.col("conv_id").alias("right_id"))
    ).limit(10)
    feat = pair_features(pairs, docs)
    plan = _plan(pair_tfidf_cosine(feat, docs))
    tree = plan.split("\n\n")[0]
    # the two PAIR-level joins (l/r payload sides, which since round 7 also
    # carry the TF-IDF vectors) must hash, not sort-merge; doc-side joins
    # inside tfidf vector building (doc x term rows, tiny) may keep SMJ
    assert tree.count("ShuffledHashJoin") >= 2, tree
    # round-7 invariant: the cosine is computed from the vectors the payload
    # joins already shipped — pair_tfidf_cosine adds NO join and NO exchange
    # on top of the feature frame (4 pair-row shuffles -> 2)
    feat_tree = _plan(feat).split("\n\n")[0]
    for op in ("ShuffledHashJoin", "SortMergeJoin", "Exchange"):
        assert tree.count(op) == feat_tree.count(op), (op, tree)
