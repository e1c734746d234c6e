#!/bin/bash
# 100x smoke lane (round-11 verdict item 6): run each of the five heaviest
# ScaleSmoke entries at SPARK_GRAFT_SCALE=100 in an ISOLATED JVM (no
# in-run contention — the r11 post-mortem measured in-run context
# inflating heavies ~2x), SPARK_GRAFT_SCALE_REPS=2 (rep 1 absorbs
# JIT/codegen; min-of-reps recorded), CPU calibration recorded per JVM.
# Merge the .partial.json outputs with tools/merge_scale100.py.
#
# Usage: bash tools/run_scale100.sh   (needs an otherwise-idle machine)
set -e
cd "$(dirname "$0")/.."
# r13 set: jaccard_prefix_pairs dedup_groups cdc_apply curation_pipeline
# robust_outliers; r14 adds the corrected-regime jaccard and the ANN
# serving path. Override with SCALE100_ENTRIES.
ENTRIES=${SCALE100_ENTRIES:-"jaccard_prefix_disjoint ann_lsh_topk nsw_topk ivfpq_topk cdc_apply"}
for e in $ENTRIES; do
  echo "[scale100] running $e ..."
  SPARK_GRAFT_SCALE=100 SPARK_GRAFT_SCALE_ONLY=$e SPARK_GRAFT_SCALE_REPS=2 \
  SPARK_GRAFT_SCALE_OUT=/tmp/scale100_$e.json \
  java $(cat /tmp/jopts.txt) -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" -Xmx40g \
    graft.ScaleSmoke > /tmp/scale100_$e.log 2>&1 \
    || { echo "[scale100] $e FAILED (continuing)"; tail -5 /tmp/scale100_$e.log; }
  grep "\[scale\]" /tmp/scale100_$e.log | tail -3
done
python3 tools/merge_scale100.py /root/repo/${SCALE100_OUT:-SCALE100_r13.json} \
  $(for e in $ENTRIES; do ls /tmp/scale100_$e.partial.json 2>/dev/null; done)
echo "[scale100] done"
