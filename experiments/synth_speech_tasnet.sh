#!/bin/bash
# Conv-TasNet (MODEL_TYPE='tasnet-v1') on the BROADBAND formant-speech
# corpus — the waveform-domain family's native setting (PARITY.md records
# that the same TCN stack underfits the DaNet EMBEDDING task; this is the
# mask-regression task it was designed for).  Single-objective recipe:
# uPIT SI-SNR end-to-end from scratch (the Conv-TasNet paper's training),
# LR ladder with checkpoint-resumed stages; 240 batches = 3840 mixtures
# (the data scale of the attn/flagship broadband runs).
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_tasnet
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --dataset synth-speech --eval-si-snr --set MODEL_TYPE=tasnet-v1"

echo "=== stage A: uPIT SI-SNR @ 1e-3 (24 epochs)"
retry $PY --epochs 24 --lr 1e-3
echo "=== stage B: @ 3e-4 (16 epochs)"
retry $PY --epochs 16 --lr 3e-4 --resume
echo "=== stage C: @ 1e-4 (12 epochs)"
retry $PY --epochs 12 --lr 1e-4 --resume
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --estimators anchor \
    --set MODEL_TYPE=tasnet-v1
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120 --estimators anchor \
    --set MODEL_TYPE=tasnet-v1
echo "=== all done rc=$? $(date)"
