#!/bin/bash
# Flagship bilstm-orig on a DOUBLED broadband formant-speech corpus
# (240 batches = 3840 mixtures) — the corpus-scaling + low-LR-polish
# pattern that moved attn-v1 from 13.9 to 24.5 dB on the tone corpus
# (PARITY.md), applied to the broadband headline.  Five stages: the
# standard four-stage ladder plus 12 unrolled-kmeans polish epochs at
# 5e-5 resumed from the keep-best checkpoint.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_big
mkdir -p "$SAVE"

. experiments/lib.sh

# VALID_CRASH_FACTOR: roll back to keep-best + replay when an epoch's
# valid loss exceeds 1.5x the invocation best.  The first run of this
# recipe was wrecked by exactly that failure: stage A's FINAL epoch
# spiked (valid loss 1.27e-4 -> 2.2e-4, SI-SNR 4.75 -> 0.89) and every
# later stage resumed from the damaged `latest` checkpoint.
PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --dataset synth-speech --eval-si-snr --set VALID_CRASH_FACTOR=1.5"

echo "=== stage A: PIT-MSE @ 1e-3 (12 epochs)"
retry $PY --epochs 12 --lr 1e-3
echo "=== stage B: PIT-MSE @ 3e-4 (12 epochs)"
retry $PY --epochs 12 --lr 3e-4 --resume
echo "=== stage C: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== stage E: low-LR kmeans polish from keep-best (12 epochs @ 5e-5)"
# verify best exists BEFORE touching latest (never destroy the only
# resume checkpoint), then swap it in atomically
[ -d "$SAVE/synthext_best" ] || { echo "no keep-best checkpoint"; exit 1; }
cp -r "$SAVE/synthext_best" "$SAVE/latest_new"
rm -rf "$SAVE/latest_prepolish"
mv "$SAVE/latest" "$SAVE/latest_prepolish"
mv "$SAVE/latest_new" "$SAVE/latest"
retry $PY --epochs 12 --lr 5e-5 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 240
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 240
echo "=== all done rc=$? $(date)"
