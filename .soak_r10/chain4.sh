#!/bin/bash
# Round-10 chain 4: fourth-decade (sf100) evidence BEYOND the rank
# family - one representative per major operator family that had no
# sf100 row (graph excluded: 2.4B edges is a multi-hour-per-rep box
# job, already argued from its sf30 linearity). Fresh process per
# query, n=1 (cold read included), per the soak protocol.
cd /root/repo
export SPARK_GRAFT_CPUS=24
export SPARK_GRAFT_DRIVER_MEM=100g
export SPARK_GRAFT_EXTRA_CONF="spark.cleaner.periodicGC.interval=60s;spark.ui.showConsoleProgress=false"
OUT=/root/repo/.soak_r10/results_chain4.jsonl
SF=/root/repo/.scaledata/sf100
run() {
  echo "=== $(date -u +%H:%M:%S) starting $1 ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$SF" "$1" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $1; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
}
run orders_table_profile
run events_hll_daily_rollup
run sessionize_events
run corpus_pack_chunks
run text_bm25_topk
run embeddings_kmeans_lloyd
run dedup_minhash_lsh
run lineitem_logreg_return_model
run lineitem_association_rules
echo "CHAIN DONE" >> $OUT.log
