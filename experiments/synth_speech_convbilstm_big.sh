#!/bin/bash
# conv-bilstm-v1 on the DOUBLED broadband corpus (240 batches = 3840
# mixtures).  The 120-batch run (synth_speech_convbilstm.sh) tied the
# attn-v1 doubled-corpus headline on half the data (PARITY.md encoder
# table), so this probes whether the reference's "experimental" U-Net
# CNN+BiLSTM hybrid (/root/reference/app/modules.py:263-379) sets a new
# broadband quality headline when given the same 3840 mixtures.  Same
# 4-stage ladder as synth_speech_convbilstm.sh with stage A/B epoch
# counts scaled like the attn doubled-corpus ladder.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_convbilstm_big
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
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
# (no stage-E polish: the r4 round-end window is bounded; the attn
# ladder's stage E moved its final number by <0.1 dB)
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1
echo "=== all done rc=$? $(date)"
