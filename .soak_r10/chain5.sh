#!/bin/bash
# Round-10 chain 5: second fourth-decade battery - order statistics
# (radix select over 600M), winsorization, sequence analytics,
# importance weighting, and language-ID. Fresh process per query.
cd /root/repo
export SPARK_GRAFT_CPUS=24
export SPARK_GRAFT_DRIVER_MEM=100g
export SPARK_GRAFT_EXTRA_CONF="spark.cleaner.periodicGC.interval=60s;spark.ui.showConsoleProgress=false"
OUT=/root/repo/.soak_r10/results_chain5.jsonl
SF=/root/repo/.scaledata/sf100
run() {
  echo "=== $(date -u +%H:%M:%S) starting $1 ===" >> $OUT.log
  timeout 2400 python tools/soak.py "$SF" "$1" --n 1 >> $OUT 2>> $OUT.log
  echo "=== rc=$? $(date -u +%H:%M:%S) done $1; disk $(df -h / | tail -1 | awk '{print $4}') free ===" >> $OUT.log
}
run lineitem_exact_price_quantiles
run lineitem_winsorized_prices
run events_markov_transitions
run corpus_dsir_weights
run text_language_id
echo "CHAIN DONE" >> $OUT.log
