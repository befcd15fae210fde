#!/usr/bin/env bash
# 1B im2svg training (reference scripts/train/*.sh equivalent)
set -euo pipefail
python -m starvector_tpu.train.train \
    config=configs/models/starvector-1b/im2svg-stack.yaml \
    "$@"
