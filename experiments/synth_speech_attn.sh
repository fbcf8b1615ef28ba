#!/bin/bash
# attn-v1 on the BROADBAND formant-speech corpus (synth-speech), at the
# data scale where the transformer overtook the recurrent flagship on
# tones (PARITY.md: 3840 mixtures).  Same stage ladder as
# synth_big_attn.sh; transient remote-compile failures retry (stages are
# checkpoint-resumable).
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_attn
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --dataset synth-speech --eval-si-snr --encoder attn-v1"

echo "=== stage A: PIT-MSE @ 3e-4 (24 epochs)"
retry $PY --epochs 24 --lr 3e-4
echo "=== stage B: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage C: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 5e-5 (12 epochs, from best)"
rm -rf "$SAVE/latest" && cp -r "$SAVE/synthext_best" "$SAVE/latest"
retry $PY --epochs 12 --lr 5e-5 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120 --encoder attn-v1
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --encoder attn-v1
echo "=== all done rc=$? $(date)"
