#!/bin/bash
# tcn-v1 RETRY with a full-utterance receptive field: the first run
# (synth_speech_tcn.sh, X=4 R=3, RF=91 frames) underfit the training
# objective (PARITY.md) — hypothesis: the embedding task needs global
# context like the recurrent/attention encoders have.  X=5 R=4 gives
# RF = 1 + 4*2*(2^5-1) = 249 frames > T=128, i.e. every frame sees the
# whole crop.  Same four-stage ladder otherwise.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_tcn2
mkdir -p "$SAVE"

. experiments/lib.sh

DIMS="--set TCN_BLOCKS=5 --set TCN_REPEATS=4"
PY="python experiments/synth_extended.py --save-dir $SAVE --batches 120 \
    --dataset synth-speech --eval-si-snr --encoder tcn-v1 $DIMS"

echo "=== stage A: PIT-MSE @ 1e-3 (12 epochs)"
retry $PY --epochs 12 --lr 1e-3
echo "=== stage B: PIT-MSE @ 3e-4 (12 epochs)"
retry $PY --epochs 12 --lr 3e-4 --resume
echo "=== stage C: waveform uPIT SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage D: unrolled-kmeans SI-SNR @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --encoder tcn-v1 $DIMS --batches 120
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --encoder tcn-v1 $DIMS --batches 120
echo "=== all done rc=$? $(date)"
