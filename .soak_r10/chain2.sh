#!/bin/bash
# Round-10 fourth-decade battery for the rank-statistic family: the
# shared two_level_prefix primitive (gini/KS/KW/MWU/Spearman) has
# sf30 evidence at most; sf100 = 150M orders (near-unique cents -> a
# ~100M-row distinct table through the range exchange + windows) and
# 600M lineitem for Spearman. One query per process (soak protocol).
cd /root/repo
export SPARK_GRAFT_CPUS=24
export SPARK_GRAFT_DRIVER_MEM=100g
export SPARK_GRAFT_EXTRA_CONF="spark.cleaner.periodicGC.interval=60s;spark.ui.showConsoleProgress=false"
OUT=/root/repo/.soak_r10/results_sf100.jsonl
SF=/root/repo/.scaledata/sf100
SF10=/root/repo/.scaledata/sf10
# sf10 anchors for the two new specs first (per-decade ratios)
for q in orders_mannwhitney_price_drift lineitem_spearman_qty_price; do
  echo "=== $(date -u +%H:%M:%S) starting $q @sf10 ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$SF10" "$q" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $q; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
done
for q in orders_ks_price_drift orders_mannwhitney_price_drift \
         orders_gini_by_priority orders_kruskal_priority \
         lineitem_spearman_qty_price; do
  echo "=== $(date -u +%H:%M:%S) starting $q ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$SF" "$q" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $q; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
done
echo "CHAIN DONE" >> $OUT.log
