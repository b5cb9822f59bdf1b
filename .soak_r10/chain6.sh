#!/bin/bash
# Round-10 chain 6: the wave-31 inference specs at the fourth decade
# (150M orders / 100M events). Fresh process per query.
cd /root/repo
export SPARK_GRAFT_CPUS=24
export SPARK_GRAFT_DRIVER_MEM=100g
export SPARK_GRAFT_EXTRA_CONF="spark.cleaner.periodicGC.interval=60s;spark.ui.showConsoleProgress=false"
OUT=/root/repo/.soak_r10/results_chain6.jsonl
SF=/root/repo/.scaledata/sf100
for q in orders_anova_priority orders_levene_priority \
         events_logrank_arms orders_bh_fdr_customers; do
  echo "=== $(date -u +%H:%M:%S) starting $q ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$SF" "$q" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $q; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
done
echo "CHAIN DONE" >> $OUT.log
