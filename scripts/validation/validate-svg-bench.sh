#!/usr/bin/env bash
# Sequential per-dataset validation (reference scripts/validation/*.sh)
set -euo pipefail
CKPT=${1:?usage: validate-svg-bench.sh <checkpoint_dir> [extra dotlist args]}
shift || true
for ds in svg-stack svg-fonts svg-icons svg-emoji svg-diagrams; do
  python -m starvector_tpu.validation.validate \
      config=configs/generation/im2svg.yaml \
      model.from_checkpoint="$CKPT" \
      dataset.params.dataset_name="starvector/${ds}" "$@"
done
