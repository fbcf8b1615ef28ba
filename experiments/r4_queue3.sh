#!/bin/bash
# Round-4 third TPU queue: runs after r4_queue2.sh drains.
# All short measurement passes FIRST (so they land even if the round-end
# window closes early), then the doubled-corpus conv-bilstm quality
# probe, then a final clean bench capture.
set -u
cd "$(dirname "$0")/.."
Q=/tmp/r4_queue.log
stage() { echo "=== STAGE $1 start $(date)" | tee -a "$Q"; }
done_() { echo "=== STAGE $1 done rc=$2 $(date)" | tee -a "$Q"; }

stage bench_convbilstm
timeout 1800 python -u bench.py --encoder conv-bilstm-v1 > /tmp/bench_r4_convbilstm.log 2>&1
done_ bench_convbilstm $?

stage bench_lstm_orig
timeout 1800 python -u bench.py --encoder lstm-orig > /tmp/bench_r4_lstm.log 2>&1
done_ bench_lstm_orig $?

stage bench_sweep_full
timeout 3600 python -u bench.py --sweep > /tmp/bench_r4_sweep_full.log 2>&1
done_ bench_sweep_full $?

stage bench_shipping
timeout 1800 python -u bench.py > /tmp/bench_r4_shipping.log 2>&1
done_ bench_shipping $?

stage convbilstm_big
bash experiments/synth_speech_convbilstm_big.sh > /tmp/convbilstm_big_run.log 2>&1
done_ convbilstm_big $?

stage bench_final3
timeout 1800 python -u bench.py > /tmp/bench_r4_final3.log 2>&1
done_ bench_final3 $?

echo "=== QUEUE3 COMPLETE $(date)" | tee -a "$Q"
