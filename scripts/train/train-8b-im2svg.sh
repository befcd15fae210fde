#!/usr/bin/env bash
set -euo pipefail
python -m starvector_tpu.train.train \
    config=configs/models/starvector-8b/im2svg-stack.yaml \
    "$@"
