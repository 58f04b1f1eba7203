#!/usr/bin/env bash
# baseline (no-memory) eval (reference: eval_baseline_DR50V3P.sh)
cd "$(dirname "$0")/.."
python -m pinthememory_tpu.evalx.cli \
  --dataset cityscapes --inference_mode sliding --scales 1.0 --split val \
  --crop_size 768 --arch DeepR50V3PlusD --dump_images \
  --snapshot "${SNAPSHOT:-pretrained_models/baseline_GS_DR50V3P.pth}" "$@"
