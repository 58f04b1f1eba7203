#!/usr/bin/env bash
# t-SNE of baseline (no-memory) features (reference: abla_tsne_baseline_DR50V3P.sh)
cd "$(dirname "$0")/.."
python -m pinthememory_tpu.tools.ablation \
  --dataset cityscapes --arch DeepR50V3PlusD --tsne \
  --snapshot "${SNAPSHOT:-pretrained_models/baseline_GS_DR50V3P.pth}" "$@"
