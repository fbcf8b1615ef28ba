#!/bin/bash
# 3-speaker staged training on the broadband formant-speech corpus — the
# configuration where the tone corpus made BSS-eval non-identifiable
# (ops/loss.py caveat); broadband sources make the N=3 SDR meaningful.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_n3
mkdir -p "$SAVE"

# The tunneled remote-compile service occasionally drops a response
# ("response body closed before all bytes were read"); every stage is
# checkpoint-resumable, so transient failures just retry the stage.
. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 120 \
    --dataset synth-speech --eval-si-snr --n-signal 3"

echo "=== stage A: PIT-MSE @ 1e-3 (12 epochs)"
retry $PY --epochs 12 --lr 1e-3
echo "=== stage B: PIT-MSE @ 3e-4 (12 epochs)"
retry $PY --epochs 12 --lr 3e-4 --resume
echo "=== stage C: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== all stages done"
