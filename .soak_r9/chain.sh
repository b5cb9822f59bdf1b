#!/bin/bash
cd /root/repo
export SPARK_GRAFT_CPUS=24
export SPARK_GRAFT_DRIVER_MEM=100g
export SPARK_GRAFT_EXTRA_CONF="spark.cleaner.periodicGC.interval=60s;spark.ui.showConsoleProgress=false"
SF=/root/repo/.scaledata/sf30
OUT=/root/repo/.soak_r9/results.jsonl
for q in part_copurchase_kcore part_copurchase_sssp part_copurchase_labelprop \
         documents_bpe_token_counts similarity_topk_pq similarity_topk_ivfpq \
         part_copurchase_kcore part_copurchase_sssp part_copurchase_labelprop \
         documents_bpe_token_counts similarity_topk_pq similarity_topk_ivfpq; do
  echo "=== $(date -u +%H:%M:%S) starting $q ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$SF" "$q" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $q; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
done
echo "CHAIN DONE" >> $OUT.log
