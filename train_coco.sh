#!/bin/bash
# Canonical COCO training recipe (reference train_coco.sh): group split 1.
BATCH_SIZE=${BATCH_SIZE:-8}
WORKER_NUMBER=${WORKER_NUMBER:-8}
LEARNING_RATE=${LEARNING_RATE:-0.01}
DECAY_STEP=${DECAY_STEP:-4}
SPLIT=${SPLIT:-1}
SEEN=${SEEN:-1}
SESSION=${SESSION:-1}
VERSION=${VERSION:-0.0.0}
EPOCH=${EPOCH:-10}
python tools/trainval_net.py \
    --dataset coco --net res50 \
    --bs $BATCH_SIZE --nw $WORKER_NUMBER \
    --lr $LEARNING_RATE --lr_decay_step $DECAY_STEP \
    --g $SPLIT --seen $SEEN --session $SESSION \
    --version $VERSION --epochs $EPOCH "$@"
