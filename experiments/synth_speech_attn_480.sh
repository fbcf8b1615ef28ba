#!/bin/bash
# attn-v1 on a 4x broadband corpus (480 batches = 7680 mixtures):
# breaking the data ceiling (VERDICT r4 item 4).  The XL capacity probe
# showed -1.2 dB from 3x params while corpus doubling gave +2.0 dB, so
# the cheapest remaining quality lever is data.  Same 4-stage ladder as
# synth_speech_attn.sh (B=16 protocol, matched to every PARITY.md
# quality row) — but on the int16-free bf16 WAVE wire: at 480 batches
# the spectra cache (4 GB cap) would overflow and re-synthesize ~40% of
# the corpus every epoch, while waveforms (4x smaller) stay fully
# cached; the wires are parity-tested interchangeable
# (tests/test_wave_wire.py).
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_attn_480
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 480 \
    --dataset synth-speech --eval-si-snr --encoder attn-v1 \
    --set VALID_CRASH_FACTOR=1.5 --set TRAIN_STEPS_PER_CALL=8 \
    --set TRANSFER_DOMAIN=\"wave\" --set TRANSFER_DTYPE=\"bfloat16\""

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
