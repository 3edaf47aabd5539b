#!/usr/bin/env bash
# spark-submit launcher (north rule: spark-submit --py-files at N and 4N
# executors).  Rebuilds the py-files zip, then submits the CLI shim.
#
#   SPARK_MASTER=local[8]  scripts/submit.sh --synthetic 5000 --output /tmp/er8
#   SPARK_MASTER=spark://host:7077 scripts/submit.sh --input s3a://... --output ...
#
# Extra spark-submit conf goes in SPARK_SUBMIT_OPTS_EXTRA (e.g.
# "--conf spark.sql.shuffle.partitions=2048 --num-executors 400").
set -euo pipefail
repo_root="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
master="${SPARK_MASTER:-local[8]}"

# match the interpreter spark-submit itself will use (hosts without a bare
# `python` — stock Debian/Ubuntu — still have python3)
"${PYSPARK_PYTHON:-python3}" "${repo_root}/scripts/build_pyfiles.py" --out dist/er_engine.zip

exec spark-submit \
  --master "${master}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  ${SPARK_SUBMIT_OPTS_EXTRA:-} \
  --py-files "${repo_root}/dist/er_engine.zip" \
  "${repo_root}/scripts/submit_main.py" \
  "$@"
