#!/bin/bash
# conv-bilstm-v1 3-speaker run on the DOUBLED broadband corpus —
# completing the encoder/N matrix (r5): the U-Net hybrid is the N=2
# broadband quality leader (kmeans 11.29 SNR / 11.06 SI-SNR / 12.92
# SDR, PARITY.md); the N=3 crown is currently attn-v1's (4.90 SNR /
# 4.30 SI-SNR / 6.79 SDR on the same 240-batch corpus).  Same ladder
# as the attn N=3 run; bf16 wave wire (N=3 triples the corpus bytes,
# waveforms keep it host-cached).
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_convbilstm_n3
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --dataset synth-speech --eval-si-snr --encoder conv-bilstm-v1 \
    --n-signal 3 --set VALID_CRASH_FACTOR=1.5 \
    --set TRAIN_STEPS_PER_CALL=8 \
    --set TRANSFER_DOMAIN=\"wave\" --set TRANSFER_DTYPE=\"bfloat16\""

echo "=== stage A: PIT-MSE @ 3e-4 (24 epochs)"
retry $PY --epochs 24 --lr 3e-4
echo "=== stage B: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage C: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 5e-5 (12 epochs, from best)"
[ -d "$SAVE/synthext_best" ] || { echo "no keep-best checkpoint"; exit 1; }
rm -rf "$SAVE/latest" && cp -r "$SAVE/synthext_best" "$SAVE/latest"
retry $PY --epochs 12 --lr 5e-5 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1 \
    --n-signal 3
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120 --encoder conv-bilstm-v1 \
    --n-signal 3
echo "=== all done rc=$? $(date)"
