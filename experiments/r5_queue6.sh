#!/bin/bash
set -u
cd /root/repo
Q=/tmp/r5_queue.log
CUTOFF=$(date -u -d "2026-08-21 00:00" +%s)
remaining() { echo $(( CUTOFF - $(date +%s) )); }
echo "=== STAGE convbilstm_n3 start $(date)" | tee -a "$Q"
setsid bash experiments/synth_speech_convbilstm_n3.sh > /tmp/r5_convbilstm_n3.log 2>&1 &
PG=$!
( sleep "$(remaining)" && kill -TERM -- -"$PG" 2>/dev/null ) &
K=$!
wait "$PG"; RC=$?
kill "$K" 2>/dev/null
echo "=== STAGE convbilstm_n3 done rc=$RC $(date)" | tee -a "$Q"
echo "=== STAGE bench_final5 start $(date)" | tee -a "$Q"
timeout 1500 python -u bench.py > /tmp/r5_bench_final5.log 2>&1
echo "=== STAGE bench_final5 done rc=$? $(date)" | tee -a "$Q"
echo "=== R5 QUEUE6 COMPLETE $(date)" | tee -a "$Q"
