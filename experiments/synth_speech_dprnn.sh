#!/bin/bash
# dprnn-v1 (dual-path RNN encoder, Luo et al. 2020) on the BROADBAND
# formant-speech corpus — same four-stage ladder as synth_speech.sh
# (bilstm flagship) and synth_speech_tcn.sh so the encoder families
# compare under one matched recipe.  Default DPRNN dims (D=128, H=128,
# P=64, R=4, bidirectional inter-chunk RNN).
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_dprnn
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 120 \
    --dataset synth-speech --eval-si-snr --encoder dprnn-v1"

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
    --dataset synth-speech --encoder dprnn-v1 --batches 120
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --encoder dprnn-v1 --batches 120
echo "=== all done rc=$? $(date)"
