#!/bin/bash
# Round-4 follow-up TPU queue: runs after r4_queue.sh drains.
# Short measurement passes only — wave-wire framework loop, attn-v1
# batch scaling, fused-tail profile, and a final clean bench capture.
set -u
cd "$(dirname "$0")/.."
Q=/tmp/r4_queue.log
stage() { echo "=== STAGE $1 start $(date)" | tee -a "$Q"; }
done_() { echo "=== STAGE $1 done rc=$2 $(date)" | tee -a "$Q"; }

stage steps_per_call_wave
timeout 3000 python -u benchmarks/steps_per_call.py > /tmp/steps_per_call2.log 2>&1
done_ steps_per_call_wave $?

stage bench_attn_b64
timeout 1800 python -u bench.py --encoder attn-v1 --batch 64 > /tmp/bench_r4_attn_b64.log 2>&1
done_ bench_attn_b64 $?

stage tail_profile
timeout 2400 python -u benchmarks/tail_profile.py > /tmp/tail_profile_r4.log 2>&1
done_ tail_profile $?

stage bench_final
timeout 1800 python -u bench.py > /tmp/bench_r4_final.log 2>&1
done_ bench_final $?

echo "=== QUEUE2 COMPLETE $(date)" | tee -a "$Q"
