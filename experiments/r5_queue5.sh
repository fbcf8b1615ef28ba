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

stage wait_q4
for i in $(seq 1 1200); do
  grep -q "R5 QUEUE4 COMPLETE" "$Q" 2>/dev/null && break
  sleep 30
done
sleep 30
done_ wait_q4 0

# flash-vs-dense crossover: T=256 measured flash 1.9x SLOWER than dense
# (11.0 vs 20.7% MFU) — find where the kernel actually wins so the
# 'auto' gate is set from data, not guesswork
run_stage bench_t512_flash 2400 python -u bench.py --encoder attn-v1 --batch 64 --seqlen 512 --set 'ATTN_BACKEND="flash"'
run_stage bench_t512_xla 2400 python -u bench.py --encoder attn-v1 --batch 64 --seqlen 512 --set 'ATTN_BACKEND="xla"'
run_stage bench_t1024_flash 2400 python -u bench.py --encoder attn-v1 --batch 32 --seqlen 1024 --set 'ATTN_BACKEND="flash"'
run_stage bench_t1024_xla 2400 python -u bench.py --encoder attn-v1 --batch 32 --seqlen 1024 --set 'ATTN_BACKEND="xla"'
# serving artifact: second capture (the tunnel RTT varies by the hour)
run_stage stream_artifact2 1500 python -u benchmarks/stream_artifact_latency.py
run_stage bench_final4 1800 python -u bench.py
echo "=== R5 QUEUE5 COMPLETE $(date)" | tee -a "$Q"
