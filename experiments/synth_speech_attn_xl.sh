#!/bin/bash
# Scaled-up attention encoder (ATTN_DIM=384, 6 heads, 6 layers — ~3x
# the default 256/4/4 parameter count) on the DOUBLED broadband corpus,
# chasing the N=2 headline past the default attn-v1's 9.81 SNR / 11.40
# SDR (PARITY.md).  Same stage ladder as synth_speech_attn.sh; the
# eval MUST repeat the architecture overrides.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_attn_xl
mkdir -p "$SAVE"

. experiments/lib.sh

ARCH="--set ATTN_DIM=384 --set ATTN_HEADS=6 --set ATTN_LAYERS=6"
PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --dataset synth-speech --eval-si-snr --encoder attn-v1 $ARCH \
    --set VALID_CRASH_FACTOR=1.5"

echo "=== stage A: PIT-MSE @ 3e-4 (24 epochs)"
retry $PY --epochs 24 --lr 3e-4
echo "=== stage B: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage C: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 5e-5 (12 epochs, from best)"
# verify best exists BEFORE touching latest (never destroy the only
# resume checkpoint), then swap it in atomically
[ -d "$SAVE/synthext_best" ] || { echo "no keep-best checkpoint"; exit 1; }
cp -r "$SAVE/synthext_best" "$SAVE/latest_new"
rm -rf "$SAVE/latest_prepolish"
mv "$SAVE/latest" "$SAVE/latest_prepolish"
mv "$SAVE/latest_new" "$SAVE/latest"
retry $PY --epochs 12 --lr 5e-5 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120 --encoder attn-v1 $ARCH
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --encoder attn-v1 $ARCH
echo "=== all done rc=$? $(date)"
