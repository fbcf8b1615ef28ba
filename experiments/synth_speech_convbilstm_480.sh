#!/bin/bash
# conv-bilstm-v1 on the 4x broadband corpus (480 batches = 7680
# mixtures).  The r5 doubled-corpus run made it the broadband quality
# leader (kmeans keep-best 11.29 SNR / 11.06 SI-SNR / 12.92 SDR, +1.5
# dB over attn-v1 at matched data) while attn-v1's own 3840->7680
# scaling came back flat — this run asks whether the U-Net hybrid's
# data-efficiency keeps scaling.  Same ladder as
# synth_speech_convbilstm_big.sh; bf16 WAVE wire so the 4x corpus stays
# fully host-cached (the spectra cache would overflow its 4 GB cap).
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_convbilstm_480
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 480 \
    --dataset synth-speech --eval-si-snr --encoder conv-bilstm-v1 \
    --set VALID_CRASH_FACTOR=1.5 --set TRAIN_STEPS_PER_CALL=8 \
    --set TRANSFER_DOMAIN=\"wave\" --set TRANSFER_DTYPE=\"bfloat16\""

echo "=== stage A: PIT-MSE @ 1e-3 (12 epochs)"
retry $PY --epochs 12 --lr 1e-3
echo "=== stage B: PIT-MSE @ 3e-4 (12 epochs)"
retry $PY --epochs 12 --lr 3e-4 --resume
echo "=== stage C: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1
echo "=== all done rc=$? $(date)"
