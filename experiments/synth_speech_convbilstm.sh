#!/bin/bash
# conv-bilstm-v1 (the reference's U-Net-ish CNN+BiLSTM hybrid,
# /root/reference/app/modules.py:263-379) on the broadband
# formant-speech corpus, under the SAME 4-stage ladder + corpus as the
# bilstm-orig flagship row (experiments/synth_speech.sh) so the
# PARITY.md encoder-family quality table compares like for like
# (VERDICT r3 item 5).
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_convbilstm
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 120 \
    --dataset synth-speech --eval-si-snr --encoder conv-bilstm-v1 \
    --set VALID_CRASH_FACTOR=1.5 --set TRAIN_STEPS_PER_CALL=8 --set TRANSFER_DTYPE=\"bfloat16\""

echo "=== stage A: PIT-MSE @ 1e-3 (12 epochs)"
retry $PY --epochs 12 --lr 1e-3
echo "=== stage B: PIT-MSE @ 3e-4 (12 epochs)"
retry $PY --epochs 12 --lr 3e-4 --resume
echo "=== stage C: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1
echo "=== all done rc=$? $(date)"
