#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "candidate_pairs_scored_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...}

The headline metric is the north-rule throughput: candidate pairs scored per
second through the full ER scoring stage (blocking -> features -> TF-IDF ->
rule score) on a deterministic synthetic transcript corpus.  The remaining
queries time the operator library on the driver's TPC-H-ish tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic ER corpus size for the headline throughput measurement.
# >= 6000 keeps the score stage compute-dominated (BENCH/BASELINE.md: small
# stages are scheduling-bound and report noise, not throughput)
N_BASE = int(os.environ.get("SPARK_GRAFT_BENCH_NBASE", "6000"))
# the headline stage runs LEGS times and reports the MIN: this box shares its
# CPUs with the round driver's own jobs, and round 1 measured the identical
# stage 18x apart hours apart under load — min-of-N is the noise defense
# (same harness discipline as BENCH/scaling.py)
LEGS = int(os.environ.get("SPARK_GRAFT_BENCH_LEGS", "3"))
# sustained leg: the same score stage over the corpus replicated MULT times
# with disjoint ids (~3.4M pairs at the defaults) — witnesses the
# large-corpus sustained rate (round-2 BENCH/BASELINE.md measured 5.56M
# pairs via a full n_base=24000 prep; replication reproduces that pair
# volume without paying 4x synth/assemble/blocking inside the driver's
# budget).  The leg ALWAYS RUNS (round-5 verdict #2: a deadline-skipped
# sustained leg left the official artifact without the headline number);
# box load degrades the MULTIPLIER instead — when the sprint min-leg or the
# pre-sprint control show a loaded window, mult drops 4 -> 2, bounding the
# leg at ~2x the measured sprint wall.  0 disables explicitly.
SUSTAINED_MULT = int(os.environ.get("SPARK_GRAFT_BENCH_SUSTAINED_MULT", "4"))
# loaded-window thresholds for the adaptive multiplier: control > 2.5 s
# (quiet-box control is ~0.95-1.35 s across the boxes this build has seen;
# genuinely loaded windows measure 3-30 s) or sprint min-leg > 60 s
# (quiet-box min-leg at the default corpus is ~7-16 s).  The gate takes the
# MIN of the pre- and post-sprint controls: round 6 found the FIRST control
# in a session can carry a one-time 35-60 s JVM settling cost (full-GC of
# the freshly-cached corpus + C2 tiering) even at load 0.03, which tripped
# the old single-sample 1.1 s gate on every run.
SUSTAINED_CTRL_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_CTRL_GATE", "2.5"))
SUSTAINED_LEG_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_LEG_GATE", "60"))
# learned-scorer leg: score the SAME pairs through the fitted logistic model
# (ML-pipeline path) so the model path has a throughput number alongside the
# rule path; SPARK_GRAFT_BENCH_MODEL=0 disables.  Skipped (reason recorded)
# when the deadline-critical section (sprint start -> sustained end; synth/
# assemble/blocking prep EXCLUDED, they are fixtures not measurements) has
# already run past MODEL_DEADLINE seconds — the model leg is the optional
# one, the sustained leg never is.
MODEL_LEG = os.environ.get("SPARK_GRAFT_BENCH_MODEL", "1") == "1"
MODEL_DEADLINE = float(os.environ.get("SPARK_GRAFT_BENCH_MODEL_DEADLINE", "400"))


def _force(df) -> int:
    """Fully evaluate a DataFrame (noop sink — no driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from pyspark.sql import functions as F

    from lab02_citation_matching_and_entity_resolution_spark.session import get_spark
    from lab02_citation_matching_and_entity_resolution_spark.synth import (
        SynthConfig,
        transcripts_df_distributed,
    )
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
    from lab02_citation_matching_and_entity_resolution_spark.operators.scoring import (
        score_pairs_rule,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators import dedup, ann
    from lab02_citation_matching_and_entity_resolution_spark.queries_catalog import (
        REGISTRY,
        T,
    )

    spark = get_spark(app_name="er-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")

    t_bench_start = time.time()
    timings: dict[str, float] = {}

    # ---- headline: ER scoring throughput over synthetic transcripts ----
    t0 = time.time()
    tr = transcripts_df_distributed(spark, SynthConfig(n_base=N_BASE)).persist()
    tr.count()
    timings["synth_generate"] = round(time.time() - t0, 3)

    t0 = time.time()
    docs = assemble_documents(tr).persist()
    docs.count()
    timings["assemble"] = round(time.time() - t0, 3)

    t0 = time.time()
    pairs, _ = candidate_pairs(docs)
    pairs = pairs.persist()
    n_pairs = pairs.count()
    timings["blocking"] = round(time.time() - t0, 3)

    # in-JVM pure-compute control (same leg BENCH/scaling.py uses): map-only
    # sha2, no shuffle, no Python.  Identical work at every capture, so a
    # loaded-window run shows up as an inflated control_sec — external-load
    # contamination (round-3 verdict: the 33.2k artifact) becomes
    # self-diagnosing instead of looking like an engine regression.
    def _control() -> float:
        t0 = time.time()
        spark.range(0, 40_000_000, 1, CPUS * 4).selectExpr(
            "sum(length(sha2(cast(id as string), 256))) as s"
        ).collect()
        return round(time.time() - t0, 3)

    # PRE-sprint control: calibrates the sustained multiplier and brackets
    # the sprint window (the post-sprint control brackets the other side).
    # One untimed warm-up first — the session's first control pays a
    # one-time 35-60 s settling cost (full GC of the just-built caches +
    # JIT tiering of the sha2 codegen) that is JVM lifecycle, not window
    # load; timing it would poison the load gate (observed round 6 at
    # load 0.03: first control 58.8 s, every later one 1.3 s)
    _control()
    control_pre_sec = _control()

    # deadline-critical clock starts HERE: sprint -> sustained are the
    # headline measurements; synth/assemble/blocking prep above is fixture
    # cost and must not eat the model leg's budget (round-5 verdict #1)
    t_critical_start = time.time()

    leg_times = []
    for _ in range(LEGS):
        t0 = time.time()
        scored = score_pairs_rule(pair_tfidf_cosine(pair_features(pairs, docs), docs))
        _force(scored.select("left_id", "right_id", "score"))
        leg_times.append(time.time() - t0)
    score_sec = min(leg_times)
    timings["score_pairs"] = round(score_sec, 3)
    pairs_per_sec = n_pairs / score_sec if score_sec > 0 else 0.0

    # fused block-local sprint (the production default since round 6): the
    # SAME scored rows in one fused blocking+scoring plan — its wall INCLUDES
    # re-running the blocking passes, so compare it against score_pairs +
    # blocking, not score_pairs alone
    from lab02_citation_matching_and_entity_resolution_spark.operators.fused import (
        fused_scored_pairs,
    )

    fused_times = []
    for _ in range(LEGS):
        t0 = time.time()
        fused_df, _fm = fused_scored_pairs(docs)
        _force(fused_df.select("left_id", "right_id", "score"))
        fused_times.append(time.time() - t0)
    fused_sec = min(fused_times)
    timings["score_pairs_fused"] = round(fused_sec, 3)
    fused = {
        "sec": round(fused_sec, 3),
        "pairs_per_sec": round(n_pairs / fused_sec, 1) if fused_sec > 0 else 0.0,
        "includes_blocking": True,
    }

    control_sec = _control()

    sustained = None
    if SUSTAINED_MULT > 1:
        # adaptive multiplier (never a skip): a loaded window halves the
        # replication so the leg stays bounded at ~mult x min-leg wall
        eff_mult = SUSTAINED_MULT
        if (
            min(control_pre_sec, control_sec) > SUSTAINED_CTRL_GATE
            or score_sec > SUSTAINED_LEG_GATE
        ):
            eff_mult = max(2, SUSTAINED_MULT // 2)
        rep = spark.range(eff_mult).select(F.col("id").alias("_rep"))

        def suffixed(df, cols):
            out = df.crossJoin(F.broadcast(rep))
            for c in cols:
                out = out.withColumn(c, F.concat_ws("#", F.col(c), F.col("_rep")))
            return out.drop("_rep")

        docs_big = suffixed(docs, ["conv_id"]).persist()
        pairs_big = suffixed(pairs, ["left_id", "right_id"]).persist()
        n_big = pairs_big.count()
        docs_big.count()
        # pass 1 is COLD: a brand-new plan over brand-new frames pays the
        # per-plan fixed costs (TF-IDF doc-freq fit, broadcast builds,
        # codegen JIT, Arrow worker spin-up) that a production job running
        # for hours amortizes to nothing — round 6 measured cold/warm 7.7x
        # on the identical plan at load 0.03.  A second, warm pass is the
        # steady-state sustained rate; it runs whenever the critical
        # section still fits the model deadline, and the headline sustained
        # number prefers it (cold kept alongside).
        sus_times = []
        for _ in range(2):
            t0 = time.time()
            scored_big = score_pairs_rule(
                pair_tfidf_cosine(pair_features(pairs_big, docs_big), docs_big)
            )
            _force(scored_big.select("left_id", "right_id", "score"))
            sus_times.append(time.time() - t0)
            if time.time() - t_critical_start > MODEL_DEADLINE:
                break
        sus_sec = min(sus_times)
        sustained = {
            "n_pairs": n_big,
            "sec": round(sus_sec, 3),
            "pairs_per_sec": round(n_big / sus_sec, 1) if sus_sec > 0 else 0.0,
            "cold_sec": round(sus_times[0], 3),
            "warm_sec": round(sus_times[1], 3) if len(sus_times) > 1 else None,
            "mult": eff_mult,
            "mult_configured": SUSTAINED_MULT,
            "mult_reduced_by_load": eff_mult != SUSTAINED_MULT,
        }
        timings["score_pairs_sustained"] = round(sus_sec, 3)
        docs_big.unpersist()
        pairs_big.unpersist()

    # learned-scorer leg AFTER sustained: the model leg is the optional one
    # (the round-3 verdict asked for it; the round-5 verdict made the
    # sustained leg mandatory).  Its deadline counts only the critical
    # section (sprint+sustained), not the prep fixtures.
    model_leg = None
    if MODEL_LEG and time.time() - t_critical_start > MODEL_DEADLINE:
        model_leg = {
            "skipped": f"sprint+sustained took {round(time.time() - t_critical_start, 1)}s "
                       f"> model deadline {MODEL_DEADLINE}s (loaded box)"
        }
    elif MODEL_LEG:
        # the whole leg is fenced: on a corpus slice where every sampled
        # pair's pseudo-label falls on one side of 0.5 the logistic fit is
        # degenerate (single class) and raises — a bench that never prints
        # its JSON line is worse than one without the model number, so the
        # failure reason lands in model_leg instead of aborting (round-4
        # ADVICE; same discipline as the deadline skips)
        try:
            from lab02_citation_matching_and_entity_resolution_spark.operators.scoring import (
                fit_logistic,
                score_pairs_logistic,
            )

            # fit outside the timer on a bounded sample; pseudo-labels from
            # the rule score are fine — this leg measures model-path
            # THROUGHPUT (feature frame -> ML transform), not model quality
            # (that's tests/test_model_scoring.py's job)
            train = score_pairs_rule(
                pair_tfidf_cosine(pair_features(pairs.limit(20000), docs), docs)
            ).withColumn("label", (F.col("score") >= 0.5).cast("int"))
            n_classes = train.select("label").distinct().count()
            if n_classes < 2:
                raise RuntimeError(
                    f"degenerate pseudo-labels: {n_classes} class(es) in the "
                    "20k-pair sample"
                )
            model = fit_logistic(train, "label")
            t0 = time.time()
            scored_m = score_pairs_logistic(
                model, pair_tfidf_cosine(pair_features(pairs, docs), docs)
            )
            _force(scored_m.select("left_id", "right_id", "model_score"))
            model_sec = time.time() - t0
            timings["score_pairs_model"] = round(model_sec, 3)
            model_leg = {
                "n_pairs": n_pairs,
                "sec": round(model_sec, 3),
                "pairs_per_sec": round(n_pairs / model_sec, 1) if model_sec > 0 else 0.0,
            }

            # production-inference fast path (M6): broadcast the fitted
            # weights as a pure-column sigmoid — no VectorAssembler/UDT in
            # the hot path.  Same pairs, same model; the pipeline-vs-fast gap
            # is the cost of the ML-pipeline transform, and this leg shows it
            # is recoverable.
            from lab02_citation_matching_and_entity_resolution_spark.operators.scoring import (
                logistic_weights_scorer,
                sigmoid_score_col,
            )

            w, b = logistic_weights_scorer(model)
            t0 = time.time()
            feats_f = pair_tfidf_cosine(pair_features(pairs, docs), docs)
            scored_f = feats_f.withColumn(
                "model_score", F.round(sigmoid_score_col(w, b), 6)
            )
            _force(scored_f.select("left_id", "right_id", "model_score"))
            fast_sec = time.time() - t0
            timings["score_pairs_model_fast"] = round(fast_sec, 3)
            model_leg["fast_sec"] = round(fast_sec, 3)
            model_leg["fast_pairs_per_sec"] = (
                round(n_pairs / fast_sec, 1) if fast_sec > 0 else 0.0
            )
        except Exception as exc:  # noqa: BLE001 — record, don't abort the bench
            # merge, don't rebind: a fast-leg failure must not clobber the
            # already-measured pipeline-leg fields
            err = {"error": f"{type(exc).__name__}: {exc}"}
            model_leg = {**model_leg, **err} if isinstance(model_leg, dict) else err

    # ---- operator library on the driver's tables ----
    for name in ["a5_sum_rollups", "j1_blocked_all_pairs", "w3_topk_per_group",
                 "m1_skew_cap", "a6_doc_freq_idf"]:
        if name in REGISTRY:
            t0 = time.time()
            _force(REGISTRY[name].fn(spark, SF_DIR))
            timings[name] = round(time.time() - t0, 3)

    docs_tbl = T(spark, SF_DIR, "documents")
    t0 = time.time()
    # xxhash64 = the production hot path; the md5 variant exists only for
    # engine-portable oracle parity in the catalog queries
    sigs = dedup.minhash_signatures(docs_tbl, hash_fn="xxhash64")
    _force(dedup.minhash_band_pairs(sigs))
    timings["dedup_minhash_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    _force(dedup.exact_dedup(docs_tbl))
    timings["dedup_exact"] = round(time.time() - t0, 3)

    emb = T(spark, SF_DIR, "embeddings")
    queries = emb.limit(16).select(F.col("vec_id").alias("query_id"), "embedding")
    t0 = time.time()
    _force(ann.brute_force_topk(emb, queries, k=10))
    timings["ann_brute_topk"] = round(time.time() - t0, 3)

    # round-5 text-pipeline stages in one leg: PII scrub + repetition stats
    # over every doc, plus 3-gram decontamination of the doc_id%50!=0 slice
    # against the held-out doc_id%50==0 slice (same shape as the catalog
    # witness queries)
    from lab02_citation_matching_and_entity_resolution_spark.operators import (
        textstats,
    )

    t0 = time.time()
    _force(textstats.pii_scrub(docs_tbl))
    _force(textstats.repetition_stats(docs_tbl))
    _force(
        textstats.decontaminate(
            docs_tbl.where(F.col("doc_id") % 50 != 0).select("doc_id", "text"),
            docs_tbl.where(F.col("doc_id") % 50 == 0).select("text"),
            n=3,
        )
    )
    timings["text_pipeline"] = round(time.time() - t0, 3)

    # round-5 sessionization leg: per-user gap sessions over the events
    # table + per-session rollup (one hash shuffle + one partial agg)
    from lab02_citation_matching_and_entity_resolution_spark.operators import (
        sessions as sess_ops,
    )

    ev = T(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    t0 = time.time()
    _force(
        sess_ops.session_stats(
            sess_ops.sessionize(
                ev, key_col="user_id", ts_col="ts", gap_seconds=21600,
                tiebreak_cols=("event_id",),
            )
        )
    )
    timings["sessionize"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "candidate_pairs_scored_per_sec",
                "value": round(pairs_per_sec, 1),
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "n_pairs_scored": n_pairs,
                "score_legs_sec": [round(t, 3) for t in leg_times],
                "control_pre_sec": control_pre_sec,
                "control_sec": control_sec,
                "model_leg": model_leg,
                "sustained": sustained,
                "fused": fused,
                "n_base": N_BASE,
                "total_sec": total,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
