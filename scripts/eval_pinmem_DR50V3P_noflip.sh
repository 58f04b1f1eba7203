#!/usr/bin/env bash
# pooled no-flip eval (reference: "eval_pinmem_DR50V3P(noflip).sh")
cd "$(dirname "$0")/.."
python -m pinthememory_tpu.evalx.cli \
  --dataset cityscapes --inference_mode pooling --scales 1.0 --no_flip \
  --memory --arch DeepR50V3PlusD \
  --snapshot "${SNAPSHOT:-pretrained_models/pinmem_GS_DR50V3P.pth}" "$@"
