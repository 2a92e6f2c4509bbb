#!/bin/bash
# COCO eval recipe (reference test_coco.sh): group 1, 4-shot averaging.
SPLIT=${SPLIT:-1}
SEEN=${SEEN:-2}
AVERAGE=${AVERAGE:-4}
SESSION=${SESSION:-1}
VERSION=${VERSION:-0.0.0}
python tools/test_net.py \
    --dataset coco --net res50 \
    --g $SPLIT --seen $SEEN --a $AVERAGE --session $SESSION \
    --version $VERSION "$@"
