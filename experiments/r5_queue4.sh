#!/bin/bash
# Round-5 fourth queue: quality tail.  conv-bilstm 4x-corpus ladder (the
# measured quality leader gets the data-scaling shot attn-v1 just
# plateaued on), then the deferred attn 1920-mixture curve point if
# margin remains, then a final clean capture.  Same hard-cutoff
# discipline; evals-first ordering inside the recipe (keep-best before
# latest) so a cutoff kill still leaves the headline number.
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

stage wait_q3
for i in $(seq 1 1200); do
  grep -q "R5 QUEUE3 COMPLETE" "$Q" 2>/dev/null && break
  sleep 30
done
sleep 30
done_ wait_q3 0

run_stage convbilstm480 12600 bash experiments/synth_speech_convbilstm_480.sh

if [ "$(remaining)" -gt 7200 ]; then
  run_stage attn120 5400 bash experiments/synth_speech_attn_120_real.sh
else
  echo "=== STAGE attn120 SKIPPED (margin $(remaining)s)" | tee -a "$Q"
fi

run_stage bench_final3 1800 python -u bench.py

echo "=== R5 QUEUE4 COMPLETE $(date)" | tee -a "$Q"
