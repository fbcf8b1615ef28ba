#!/bin/bash
set -u
cd /root/repo
Q=/tmp/r5_queue.log
CUTOFF=$(date -u -d "2026-08-21 00:00" +%s)
remaining() { echo $(( CUTOFF - $(date +%s) )); }
SAVE=saves/synth_speech_convbilstm_big
echo "=== STAGE convbilstm_polish start $(date)" | tee -a "$Q"
setsid bash -c "
  set -e
  cp -r $SAVE/synthext_best /tmp/cb_polish_ckpt && rm -rf $SAVE/latest && mv /tmp/cb_polish_ckpt $SAVE/latest
  python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --dataset synth-speech --eval-si-snr --encoder conv-bilstm-v1 \
    --set VALID_CRASH_FACTOR=1.5 --set TRAIN_STEPS_PER_CALL=8 \
    --set TRANSFER_DTYPE='\"bfloat16\"' \
    --epochs 12 --lr 5e-5 --loss pit-si-snr --infer-est kmeans --resume
  python -u experiments/eval_checkpoint.py --ckpt $SAVE/synthext_best \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1
" > /tmp/r5_convbilstm_polish.log 2>&1 &
PG=$!
( sleep "$(remaining)" && kill -TERM -- -"$PG" 2>/dev/null ) &
K=$!
wait "$PG"; RC=$?
kill "$K" 2>/dev/null
echo "=== STAGE convbilstm_polish done rc=$RC $(date)" | tee -a "$Q"
echo "=== R5 QUEUE7 COMPLETE $(date)" | tee -a "$Q"
