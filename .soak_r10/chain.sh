#!/bin/bash
# Round-10 soak chain (VERDICT r9 missing #2 and #3):
#   - one more fresh-process sf30 rep each for kcore / labelprop /
#     similarity_topk_pq, firming the thin n=2 medians (spreads
#     1.3-2.0x attributed to cold page cache);
#   - first sf10 rows for the wave-29 Welch t and chi-square specs
#     (single-aggregate shapes; evidence hygiene).
# One query per process per the round-7 soak protocol.
cd /root/repo
export SPARK_GRAFT_CPUS=24
export SPARK_GRAFT_DRIVER_MEM=100g
export SPARK_GRAFT_EXTRA_CONF="spark.cleaner.periodicGC.interval=60s;spark.ui.showConsoleProgress=false"
OUT=/root/repo/.soak_r10/results.jsonl
SF30=/root/repo/.scaledata/sf30
SF10=/root/repo/.scaledata/sf10
run() {
  echo "=== $(date -u +%H:%M:%S) starting $2 @ $1 ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$1" "$2" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $2; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
}
run $SF10 events_welch_value_ttest
run $SF10 orders_chi2_priority_status
run $SF30 similarity_topk_pq
run $SF30 part_copurchase_kcore
run $SF30 part_copurchase_labelprop
echo "CHAIN DONE" >> $OUT.log
