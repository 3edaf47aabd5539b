#!/bin/bash
# Serial quiet-window rehearsal captures for round 6: 1x then 10x.
set -u
cd /root/repo
export SPARK_GRAFT_CPUS=32
echo "=== 1x rehearsal start $(date) load: $(cat /proc/loadavg)" 
SPARK_GRAFT_REHEARSAL_NBASE=6000 \
SPARK_GRAFT_REHEARSAL_OUT=/root/repo/BENCH/pipeline_rehearsal_1x.json \
SPARK_GRAFT_REHEARSAL_STORE=/tmp/er_rehearsal_store_1x \
python BENCH/pipeline_rehearsal.py > /root/repo/BENCH/rehearsal_1x_run.log 2>&1
echo "=== 1x done $(date) rc=$? load: $(cat /proc/loadavg)"
echo "=== 10x rehearsal start $(date)"
SPARK_GRAFT_REHEARSAL_NBASE=24000 \
SPARK_GRAFT_REHEARSAL_OUT=/root/repo/BENCH/pipeline_rehearsal.json \
SPARK_GRAFT_REHEARSAL_STORE=/tmp/er_rehearsal_store \
python BENCH/pipeline_rehearsal.py > /root/repo/BENCH/rehearsal_r6_run.log 2>&1
echo "=== 10x done $(date) rc=$? load: $(cat /proc/loadavg)"
