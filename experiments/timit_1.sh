#!/bin/bash
# Curriculum training on TIMIT: growing crop length, shrinking batch,
# decaying LR, checkpoint-resumed between stages (mirrors
# /root/reference/experiments/timit_1.sh).
set -e
cd "$(dirname "$0")/.."

NAME=${1:-timit_1}

python main.py -m train -ds timit -n "$NAME" -ne 10 -tl 64  -bs 32 -lr 3e-4 \
    -o "saves/${NAME}_s1" --no-valid-on-epoch
python main.py -m train -ds timit -n "$NAME" -ne 10 -tl 128 -bs 32 -lr 1e-4 \
    -i "saves/${NAME}_s1" -o "saves/${NAME}_s2"
python main.py -m debug -ds timit -n "$NAME" -i "saves/${NAME}_s2"
python main.py -m train -ds timit -n "$NAME" -ne 10 -tl 256 -bs 16 -lr 3e-5 \
    -i "saves/${NAME}_s2" -o "saves/${NAME}_s3"
python main.py -m train -ds timit -n "$NAME" -ne 10 -tl 512 -bs 8  -lr 1e-5 \
    -i "saves/${NAME}_s3" -o "saves/${NAME}_s4"
python main.py -m test -ds timit -n "$NAME" -i "saves/${NAME}_s4"
echo "Experiment ${NAME} done"
