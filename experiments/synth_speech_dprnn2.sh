#!/bin/bash
# dprnn-v1 capacity scaling: the default-dim run (D=128 H=128 P=64,
# PARITY.md: 3.56 dB SNR kmeans) sits well below the bilstm flagship on
# the broadband corpus.  This run doubles width and narrows segments
# (D=256 H=256 P=32 -> S=T/16 segments, deeper effective context mixing
# per block) under the same four-stage ladder.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_dprnn2
mkdir -p "$SAVE"

. experiments/lib.sh

DIMS="--set DPRNN_DIM=256 --set DPRNN_HIDDEN=256 --set DPRNN_CHUNK=32"
PY="python experiments/synth_extended.py --save-dir $SAVE --batches 120 \
    --dataset synth-speech --eval-si-snr --encoder dprnn-v1 $DIMS"

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
    --dataset synth-speech --encoder dprnn-v1 $DIMS --batches 120
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --encoder dprnn-v1 $DIMS --batches 120
echo "=== all done rc=$? $(date)"
