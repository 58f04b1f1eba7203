#!/usr/bin/env bash
# memory activation maps (reference: abla_memact_pinmem_DR50V3P.sh)
cd "$(dirname "$0")/.."
python -m pinthememory_tpu.tools.ablation \
  --dataset cityscapes --memory --mem_actmap \
  --arch DeepR50V3PlusD \
  --snapshot "${SNAPSHOT:-pretrained_models/pinmem_GS_DR50V3P.pth}" "$@"
