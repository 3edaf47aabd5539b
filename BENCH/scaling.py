#!/usr/bin/env python
"""Scaling-efficiency evidence runner (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so per BASELINE.md the same job runs
at local[8] and local[32] on the SAME synthetic input; efficiency =
(T_8 / T_32) / 4.  Each run is a fresh JVM (subprocess) so executor-thread
pools don't bleed between measurements.

Writes BENCH/scaling_results.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_BASE = int(os.environ.get("SPARK_GRAFT_SCALING_NBASE", "1500"))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); n_base = int(sys.argv[2])
from lab02_citation_matching_and_entity_resolution_spark.session import get_spark
from lab02_citation_matching_and_entity_resolution_spark.synth import SynthConfig, transcripts_df
from lab02_citation_matching_and_entity_resolution_spark.operators.assemble import assemble_documents
from lab02_citation_matching_and_entity_resolution_spark.operators.blocking import candidate_pairs
from lab02_citation_matching_and_entity_resolution_spark.operators.features import pair_features
from lab02_citation_matching_and_entity_resolution_spark.operators.tfidf import pair_tfidf_cosine
from lab02_citation_matching_and_entity_resolution_spark.operators.scoring import score_pairs_rule

spark = get_spark(app_name=f"er-scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=max(cores * 2, 16))
spark.sparkContext.setLogLevel("ERROR")
tr = transcripts_df(spark, SynthConfig(n_base=n_base)).persist(); tr.count()
docs = assemble_documents(tr).persist(); docs.count()
pairs, _ = candidate_pairs(docs); pairs = pairs.persist()
n_pairs = pairs.count()
t0 = time.time()
scored = score_pairs_rule(pair_tfidf_cosine(pair_features(pairs, docs), docs))
scored.select("left_id", "right_id", "score").write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "n_pairs": n_pairs, "score_sec": dt,
                   "pairs_per_sec": n_pairs / dt}}))
spark.stop()
"""


def run_at(cores: int) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(N_BASE)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results = {}
    for cores in (8, 32):
        r = run_at(cores)
        results[f"local[{cores}]"] = r
        print(f"local[{cores}]: {r['n_pairs']} pairs in {r['score_sec']:.1f}s "
              f"= {r['pairs_per_sec']:.0f} pairs/sec")
    t8 = results["local[8]"]["score_sec"]
    t32 = results["local[32]"]["score_sec"]
    eff = (t8 / t32) / 4.0
    results["scaling_efficiency_8_to_32"] = eff
    print(f"scaling efficiency (T8/T32)/4 = {eff:.3f}")
    with open(os.path.join(REPO, "BENCH", "scaling_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
