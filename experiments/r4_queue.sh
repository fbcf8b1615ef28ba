#!/bin/bash
# Round-4 serialized TPU queue (one TPU process at a time, CLAUDE.md).
# Quick measurements first (VERDICT r3 items 2/4/7 measurement halves),
# then the three pending quality recipes (items 5/6).  Each stage logs
# to its own /tmp file; the driver appends a STAGE line per transition
# so progress is greppable from one file.
set -u
cd "$(dirname "$0")/.."
Q=/tmp/r4_queue.log
stage() { echo "=== STAGE $1 start $(date)" | tee -a "$Q"; }
done_() { echo "=== STAGE $1 done rc=$2 $(date)" | tee -a "$Q"; }

stage steps_per_call
timeout 2400 python -u benchmarks/steps_per_call.py > /tmp/steps_per_call.log 2>&1
done_ steps_per_call $?

stage bench_default
timeout 1800 python -u bench.py > /tmp/bench_r4.log 2>&1
done_ bench_default $?

stage bench_chain
timeout 1800 python -u bench.py --chain 50 > /tmp/bench_r4_chain.log 2>&1
done_ bench_chain $?

stage bench_b64
timeout 1800 python -u bench.py --batch 64 > /tmp/bench_r4_b64.log 2>&1
done_ bench_b64 $?

stage long_context
timeout 3600 python -u benchmarks/long_context.py > /tmp/long_context.log 2>&1
done_ long_context $?

stage bench_sweep
timeout 3600 python -u bench.py --sweep > /tmp/bench_r4_sweep.log 2>&1
done_ bench_sweep $?

stage lstm_recipe
bash experiments/synth_speech_lstm.sh > /tmp/lstm_run.log 2>&1
done_ lstm_recipe $?

stage convbilstm_recipe
bash experiments/synth_speech_convbilstm.sh > /tmp/convbilstm_run.log 2>&1
done_ convbilstm_recipe $?

stage ref_parity
bash experiments/reference_parity.sh > /tmp/ref_parity_run.log 2>&1
done_ ref_parity $?

echo "=== QUEUE COMPLETE $(date)" | tee -a "$Q"
