#!/bin/bash
# Round-5 TPU queue.  One process owns the chip; stages run strictly
# serially.  VERDICT r4 item 1a discipline: a HARD cutoff (CUTOFF_UTC)
# bounds every stage — `run_bounded` runs each stage in its own process
# group and SIGTERMs the whole group at its deadline (the trainer's
# preemption handler checkpoints and exits cleanly), so no stage can
# hold the chip into the round-end bench window.  All measurement
# stages run BEFORE the optional long tail; the final bench is a
# dedicated stage with the chip otherwise idle.
set -u
cd "$(dirname "$0")/.."
Q=/tmp/r5_queue.log
CUTOFF=$(date -u -d "2026-08-21 00:00" +%s)

stage() { echo "=== STAGE $1 start $(date)" | tee -a "$Q"; }
done_() { echo "=== STAGE $1 done rc=$2 $(date)" | tee -a "$Q"; }
remaining() { echo $(( CUTOFF - $(date +%s) )); }

run_bounded() {  # secs cmd...  (kills the stage's whole process group)
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

run_stage() {  # name max_secs cmd...
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

# ---- 0: wait for the round-4 queue to drain (never contend the chip)
stage wait_r4
for i in $(seq 1 240); do
  grep -q "QUEUE3 COMPLETE" /tmp/r4_queue.log 2>/dev/null && break
  sleep 30
done
sleep 30
done_ wait_r4 0

# ---- 1: B=64 convergence parity (VERDICT item 2) — stage-A A/B on the
# matched 3840-mixture corpus (same utterances/epoch: 240xB16 vs 60xB64)
B64_COMMON="--dataset synth-speech --eval-si-snr --encoder attn-v1 \
    --epochs 8 --lr 3e-4 --set VALID_CRASH_FACTOR=1.5 \
    --set TRAIN_STEPS_PER_CALL=8 --set TRANSFER_DOMAIN=\"wave\" \
    --set TRANSFER_DTYPE=\"bfloat16\""
run_stage b64_parity_16 3600 bash -c \
  "python -u experiments/synth_extended.py --save-dir saves/b64_parity_16 \
   --batches 240 $B64_COMMON"
run_stage b64_parity_64 3600 bash -c \
  "python -u experiments/synth_extended.py --save-dir saves/b64_parity_64 \
   --batches 60 --set BATCH_SIZE=64 $B64_COMMON"

# ---- 2: the data-ceiling ladder (VERDICT item 4): 7680 mixtures
run_stage attn480 23400 bash experiments/synth_speech_attn_480.sh

# ---- 3: short measurement passes
run_stage spc_wsj0 2400 python -u benchmarks/steps_per_call.py --wsj0-fixture
run_stage stream_artifact 1500 python -u benchmarks/stream_artifact_latency.py
run_stage bench_t256 1800 python -u bench.py --encoder attn-v1 --batch 64 --seqlen 256
run_stage bench_t256_xla 1800 python -u bench.py --encoder attn-v1 --batch 64 --seqlen 256 --set 'ATTN_BACKEND="xla"'
run_stage bench_b128 1800 python -u bench.py --encoder attn-v1 --batch 128
run_stage bench_sweep 4200 python -u bench.py --sweep

# ---- 4: optional long tail, only with >=4.5h margin: the low end of
# the data-scaling curve (1920 mixtures)
if [ "$(remaining)" -gt 16200 ]; then
  run_stage attn120 12600 bash experiments/synth_speech_attn_120.sh
else
  echo "=== STAGE attn120 SKIPPED (margin $(remaining)s)" | tee -a "$Q"
fi

# ---- 5: clean round-end capture (chip idle from here on)
run_stage bench_final 1800 python -u bench.py

echo "=== R5 QUEUE COMPLETE $(date)" | tee -a "$Q"
