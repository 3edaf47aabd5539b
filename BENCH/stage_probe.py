#!/usr/bin/env python
"""Round-7 stage isolation probe (guide §1.1/§1.4): where does the classic
scoring chain's wall go, and what is the per-plan FIXED cost?

Times each sub-stage of the hot chain with the noop sink, twice per stage
(fresh DataFrame objects both times, identical plan), so

  run1 - run2 ~= per-plan fixed cost (codegen compile + JIT + worker spinup)
  run2        ~= steady-state compute

Prints one JSON line per probe.  NOT a driver artifact — bench.py stays the
frozen measurement; this exists to attribute its numbers (guide §1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = int(os.environ.get("SPARK_GRAFT_BENCH_NBASE", "6000"))


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
        doc_payload,
        pair_features,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators.tfidf import (
        doc_tfidf_maps,
        pair_tfidf_cosine,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators.scoring import (
        fit_logistic,
        score_pairs_logistic,
        score_pairs_rule,
    )
    from lab02_citation_matching_and_entity_resolution_spark.operators.fused import (
        fused_scored_pairs,
    )

    spark = get_spark(app_name="stage-probe", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def probe(name, mk, select=None, reps=2):
        times = []
        for i in range(reps):
            sc.setJobDescription(f"probe:{name}#{i}")
            t0 = time.time()
            df = mk()
            force(df.select(*select) if select else df)
            times.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = times
        print(json.dumps({name: times}), flush=True)

    out: dict = {}

    t0 = time.time()
    tr = transcripts_df_distributed(spark, SynthConfig(n_base=N_BASE)).persist()
    tr.count()
    out["synth"] = round(time.time() - t0, 3)

    t0 = time.time()
    docs = assemble_documents(tr).persist()
    docs.count()
    out["assemble"] = round(time.time() - t0, 3)
    print(json.dumps({"synth": out["synth"], "assemble": out["assemble"]}), flush=True)

    t0 = time.time()
    pairs, _ = candidate_pairs(docs)
    pairs = pairs.persist()
    n_pairs = pairs.count()
    out["blocking"] = round(time.time() - t0, 3)
    print(json.dumps({"blocking": out["blocking"], "n_pairs": n_pairs}), flush=True)

    # --- isolated sub-stages of the classic chain ---
    probe("doc_payload", lambda: doc_payload(docs))
    probe("doc_tfidf_maps", lambda: doc_tfidf_maps(docs))
    probe("pair_features_noJW",
          lambda: pair_features(pairs, docs).drop("jaro_winkler"))
    probe("pair_features", lambda: pair_features(pairs, docs))
    probe("chain_feat_tfidf", lambda: pair_tfidf_cosine(pair_features(pairs, docs), docs))
    probe("chain_full",
          lambda: score_pairs_rule(pair_tfidf_cosine(pair_features(pairs, docs), docs)),
          select=["left_id", "right_id", "score"], reps=3)
    probe("fused_full", lambda: fused_scored_pairs(docs)[0],
          select=["left_id", "right_id", "score"], reps=3)

    # --- model path ---
    train = score_pairs_rule(
        pair_tfidf_cosine(pair_features(pairs.limit(20000), docs), docs)
    ).withColumn("label", (F.col("score") >= 0.5).cast("int"))
    model = fit_logistic(train, "label")
    probe("model_leg",
          lambda: score_pairs_logistic(
              model, pair_tfidf_cosine(pair_features(pairs, docs), docs)),
          select=["left_id", "right_id", "model_score"])

    print(json.dumps({"ALL": out, "n_pairs": n_pairs}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
