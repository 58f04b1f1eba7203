#!/usr/bin/env bash
# headline eval protocol (reference: eval_pinmem_DR50V3P.sh)
cd "$(dirname "$0")/.."
python -m pinthememory_tpu.evalx.cli \
  --dataset cityscapes --inference_mode sliding --scales 1.0 \
  --crop_size 768 --memory --arch DeepR50V3PlusD --dump_images \
  --snapshot "${SNAPSHOT:-pretrained_models/pinmem_GS_DR50V3P.pth}" "$@"
