#!/usr/bin/env bash
# t-SNE analysis (reference: abla_tsne_pinmem_DR50V3P.sh)
cd "$(dirname "$0")/.."
python -m pinthememory_tpu.tools.ablation \
  --dataset cityscapes gtav synthia --memory --tsne \
  --arch DeepR50V3PlusD \
  --snapshot "${SNAPSHOT:-pretrained_models/pinmem_GS_DR50V3P.pth}" "$@"
