#!/bin/bash
# attn-v1 3-speaker run on the DOUBLED broadband formant-speech corpus.
# The N=2 broadband headline belongs to the attention encoder
# (PARITY.md: kmeans 9.81 SNR / 9.29 SI-SNR / 11.40 SDR, +2.3 dB over
# the recurrent flagship); this applies the same data scale + stage
# ladder to the much harder 3-speaker task, where the bilstm recipe
# reached only kmeans 3.05 SNR / 4.32 SDR (120-batch corpus).
# VALID_CRASH_FACTOR arms the keep-best rollback against the
# stage-final valid spikes observed in the first doubled-corpus run.
set -e
cd "$(dirname "$0")/.."
SAVE=saves/synth_speech_attn_n3
mkdir -p "$SAVE"

. experiments/lib.sh

PY="python experiments/synth_extended.py --save-dir $SAVE --batches 240 \
    --dataset synth-speech --eval-si-snr --encoder attn-v1 --n-signal 3 \
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
    --dataset synth-speech --batches 120 --encoder attn-v1 --n-signal 3
echo "=== eval (best)"
retry python -u experiments/eval_checkpoint.py --ckpt "$SAVE/synthext_best" \
    --dataset synth-speech --batches 120 --encoder attn-v1 --n-signal 3
echo "=== all done rc=$? $(date)"
