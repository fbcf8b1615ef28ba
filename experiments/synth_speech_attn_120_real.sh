#!/bin/bash
# attn-v1 on the SINGLE broadband corpus (120 batches = 1920 mixtures):
# the missing low end of the data-scaling curve (VERDICT r4 item 4 —
# the curve is 1920 -> 3840 -> 7680 mixtures; 3840 exists from r4).
# Same ladder/protocol as synth_speech_attn.sh.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_attn_120
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 120 \
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
