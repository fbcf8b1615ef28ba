#!/bin/bash
# Stubbed for the r5 queue re-plan: the attn 3840->7680 result came back
# FLAT (+0.24 dB SI-SNR for 2x data) while conv-bilstm-v1 leads by +1.5
# dB at matched data — the remaining chip time goes to the conv-bilstm
# 480-batch ladder first (experiments/r5_queue4.sh).  The real attn120
# ladder lives in synth_speech_attn_120_real.sh and runs afterwards if
# margin remains.
echo "attn120 deferred to r5_queue4 (see synth_speech_attn_120_real.sh)"
exit 0
