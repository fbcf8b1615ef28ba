#!/bin/bash
# Round-5 third queue: shipping-program decomposition.  The r4-end bench
# revealed the TRUE shipping program (attn-v1 + ANCHOR_AUX_LOSS through
# the unrolled-kmeans estimator) runs 2.4x slower than the bare train
# step (5,573 vs 13,583 mixtures/s at B=64) at near-identical FLOPs —
# the aux branch is VPU/HBM-bound.  These ablations quantify each
# component after the r5 estimator optimization (sigmoid-difference
# anchor init + unrolled kmeans), and the final default bench records
# the optimized shipping number.
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

stage wait_q2
for i in $(seq 1 1200); do
  grep -q "R5 QUEUE2 COMPLETE" "$Q" 2>/dev/null && break
  sleep 30
done
sleep 30
done_ wait_q2 0

# full shipping program under --set so every arm measures the same
# workload shape (the probes disable the shipping-arm embed; these ARE
# the shipping semantics, varied one knob at a time)
SHIP='--encoder attn-v1 --batch 64 --set ANCHOR_AUX_LOSS=0.5 --set INFER_ESTIMATOR_METHOD="kmeans"'
run_stage ship_full 1800 bash -c "python -u bench.py $SHIP"
run_stage ship_noaux 1800 bash -c "python -u bench.py --encoder attn-v1 --batch 64 --set ANCHOR_AUX_LOSS=0"
run_stage ship_anchor_aux 1800 bash -c "python -u bench.py --encoder attn-v1 --batch 64 --set ANCHOR_AUX_LOSS=0.5 --set INFER_ESTIMATOR_METHOD=\"anchor\""
run_stage ship_kmeans2 1800 bash -c "python -u bench.py $SHIP --set KMEANS_ITER=2"
# clean official-shape capture with the optimized estimator in the
# embedded shipping arm
run_stage bench_final2 1800 python -u bench.py

echo "=== R5 QUEUE3 COMPLETE $(date)" | tee -a "$Q"
