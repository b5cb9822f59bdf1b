#!/bin/bash
# Round-10 chain 3: scale rows for the wave-31 inference specs
# (sf10 then sf30; all bounded one-aggregate / prefix-scan shapes),
# then the promised CLEAN kcore sf30 rep - the r10 third rep
# (1201.9 s) shared the box with oracle pytest sessions and was
# recorded as contaminated; this one runs on an idle machine.
# One query per process per the soak protocol.
cd /root/repo
export SPARK_GRAFT_CPUS=24
export SPARK_GRAFT_DRIVER_MEM=100g
export SPARK_GRAFT_EXTRA_CONF="spark.cleaner.periodicGC.interval=60s;spark.ui.showConsoleProgress=false"
OUT=/root/repo/.soak_r10/results_chain3.jsonl
SF30=/root/repo/.scaledata/sf30
SF10=/root/repo/.scaledata/sf10
run() {
  echo "=== $(date -u +%H:%M:%S) starting $2 @ $1 ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$1" "$2" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $2; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
}
for q in orders_anova_priority orders_levene_priority \
         events_logrank_arms orders_bh_fdr_customers; do
  run $SF10 $q
done
for q in orders_anova_priority orders_levene_priority \
         events_logrank_arms orders_bh_fdr_customers; do
  run $SF30 $q
done
run $SF30 part_copurchase_kcore
echo "CHAIN DONE" >> $OUT.log
