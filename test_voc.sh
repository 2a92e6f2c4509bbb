#!/bin/bash
# VOC eval recipe (reference test_voc.sh): unseen split, 4-shot averaging.
SEEN=${SEEN:-2}
AVERAGE=${AVERAGE:-4}
SESSION=${SESSION:-1}
VERSION=${VERSION:-0.0.0}
python tools/test_net.py \
    --dataset pascal_voc_0712 --net res50 \
    --seen $SEEN --a $AVERAGE --session $SESSION \
    --version $VERSION "$@"
