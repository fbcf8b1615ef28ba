#!/bin/bash
# DC-ablation: the flagship bilstm-orig broadband recipe
# (synth_speech.sh) with the deep-clustering auxiliary enabled
# (DC_LOSS_WEIGHT=0.3, chimera-style multi-task with magnitude-ratio
# weighting) in every stage.  Compare against the recorded non-DC run
# (PARITY.md: kmeans 7.53 SNR / 6.46 SI-SNR / 9.19 SDR at N=2) to
# measure what embedding-space clustering regularization buys the
# anchored/kmeans inference path.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_dc
mkdir -p "$SAVE"

. experiments/lib.sh

# VALID_CRASH_FACTOR: roll back to keep-best + replay when an epoch's
# valid loss exceeds 1.5x the invocation best (normal fluctuation here
# is +/-7%; the round-3 big-run stage-final spike was 1.74x and wrecked
# every later stage).  DC_LOSS_WEIGHT is RELATIVE (scale-matched).
PY="python experiments/synth_extended.py --save-dir $SAVE --batches 120 \
    --dataset synth-speech --eval-si-snr --set DC_LOSS_WEIGHT=0.3 \
    --set VALID_CRASH_FACTOR=1.5"

echo "=== stage A: PIT-MSE + DC @ 1e-3 (12 epochs)"
retry $PY --epochs 12 --lr 1e-3
echo "=== stage B: PIT-MSE + DC @ 3e-4 (12 epochs)"
retry $PY --epochs 12 --lr 3e-4 --resume
echo "=== stage C: waveform uPIT SI-SNR + DC @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --resume
echo "=== stage D: unrolled-kmeans SI-SNR + DC @ 1e-4 (16 epochs)"
retry $PY --epochs 16 --lr 1e-4 --loss pit-si-snr --infer-est kmeans --resume
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120
echo "=== eval (latest)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/latest" \
    --dataset synth-speech --batches 120
echo "=== all done rc=$? $(date)"
