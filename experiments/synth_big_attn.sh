#!/bin/bash
# attn-v1 at larger data scale: the transformer encoder is data-hungry
# (PARITY.md: 13.9 dB kmeans on the 960-mixture corpus vs the recurrent
# flagship's 22 dB); this run doubles again to 3840 mixtures.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_big_attn
mkdir -p "$SAVE"
PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --eval-si-snr --encoder attn-v1"

echo "=== stage A: PIT-MSE @ 3e-4 (24 epochs)"
$PY --epochs 24 --lr 3e-4
echo "=== stage B: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
$PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage C: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
$PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 5e-5 (12 epochs, from best)"
rm -rf "$SAVE/latest" && cp -r "$SAVE/synthext_best" "$SAVE/latest"
$PY --epochs 12 --lr 5e-5 --loss pit-si-snr --infer-est kmeans --resume
echo "=== all stages done"
