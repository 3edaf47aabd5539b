#!/usr/bin/env python
"""Control experiment: pure-compute (no-shuffle) scaling on this box.

Separates "the engine's plans don't scale" from "the sandbox's shared memory/
disk subsystem caps multi-core throughput": a map-only sha2 loop has zero
shuffle, zero skew, zero Python — if THIS doesn't scale ~linearly from 8 to
32 threads, the gap is the environment, not the dataflow.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
cores = int(sys.argv[1])
from lab02_citation_matching_and_entity_resolution_spark.session import get_spark
spark = get_spark(app_name=f"cpu-scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")
n = 40_000_000
df = spark.range(0, n, numPartitions=cores * 4)
t0 = time.time()
out = df.selectExpr("sha2(cast(id as string), 256) AS h").selectExpr(
    "substring(h, 1, 2) AS p"
)
out.write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print(json.dumps({"cores": cores, "rows": n, "sec": dt, "rows_per_sec": n / dt}))
spark.stop()
"""


def run_at(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.replace("@REPO@", REPO), str(cores)],
        capture_output=True, text=True, timeout=1200,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results = {}
    for cores in (8, 32):
        r = run_at(cores)
        results[f"local[{cores}]"] = r
        print(f"local[{cores}]: {r['rows']} rows in {r['sec']:.1f}s = "
              f"{r['rows_per_sec']:.0f} rows/sec")
    eff = (results["local[8]"]["sec"] / results["local[32]"]["sec"]) / 4.0
    results["cpu_scaling_efficiency_8_to_32"] = eff
    print(f"pure-compute scaling efficiency = {eff:.3f}")
    with open(os.path.join(REPO, "BENCH", "cpu_scaling_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
