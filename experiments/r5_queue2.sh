#!/bin/bash
# Round-5 follower queue: waits for r5_queue.sh to drain, then runs the
# roofline verdict + the non-flagship families' batch-lever probes.
# Same hard-cutoff discipline as r5_queue.sh.
set -u
cd "$(dirname "$0")/.."
Q=/tmp/r5_queue.log
CUTOFF=$(date -u -d "2026-08-21 00:00" +%s)

stage() { echo "=== STAGE $1 start $(date)" | tee -a "$Q"; }
done_() { echo "=== STAGE $1 done rc=$2 $(date)" | tee -a "$Q"; }
remaining() { echo $(( CUTOFF - $(date +%s) )); }

run_bounded() {
  local secs=$1; shift
  setsid "$@" &
  local pg=$!
  ( sleep "$secs" && kill -TERM -- -"$pg" 2>/dev/null \
      && sleep 60 && kill -KILL -- -"$pg" 2>/dev/null ) &
  local killer=$!
  wait "$pg"; local rc=$?
  kill "$killer" 2>/dev/null; wait "$killer" 2>/dev/null
  return $rc
}

run_stage() {
  local name=$1 max=$2; shift 2
  local left; left=$(remaining)
  if [ "$left" -lt 300 ]; then
    echo "=== STAGE $name SKIPPED (cutoff reached)" | tee -a "$Q"
    return 1
  fi
  [ "$max" -gt "$left" ] && max=$left
  stage "$name"
  run_bounded "$max" "$@" > "/tmp/r5_$name.log" 2>&1
  done_ "$name" $?
}

stage wait_q1
for i in $(seq 1 1200); do
  grep -q "R5 QUEUE COMPLETE" "$Q" 2>/dev/null && break
  sleep 30
done
sleep 30
done_ wait_q1 0

# roofline verdict on the shipping step (B=64) and the pinned workload
run_stage roofline_attn64 2400 python -u benchmarks/roofline.py --batch 64
run_stage roofline_attn64_t256 2400 python -u benchmarks/roofline.py --batch 64 --seqlen 256
# batch lever for the non-flagship families (VERDICT r4 weakness 3)
run_stage bench_dprnn_b64 1800 python -u bench.py --encoder dprnn-v1 --batch 64
run_stage bench_gru_b64 1800 python -u bench.py --encoder gru-v1 --batch 64
run_stage bench_convbilstm_b64 1800 python -u bench.py --encoder conv-bilstm-v1 --batch 64
run_stage bench_tasnet_b64 2400 python -u bench.py --model tasnet-v1 --batch 64
# head-width probe: same d=256, 2 heads of 128 lanes — does the hd=64
# MXU padding cost show up? (architecture probe, not a shipping change)
run_stage bench_attn_h2 1800 python -u bench.py --encoder attn-v1 --batch 64 --set ATTN_HEADS=2

echo "=== R5 QUEUE2 COMPLETE $(date)" | tee -a "$Q"
