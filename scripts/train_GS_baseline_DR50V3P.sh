#!/usr/bin/env bash
# no-memory aggregation baseline (reference: train_GS_baseline_DR50V3P.sh)
cd "$(dirname "$0")/.."
# set PRETRAINED=/path/to/torchvision-resnet.pth for ImageNet trunk init
python -m pinthememory_tpu.train.cli \
  ${PRETRAINED:+--pretrained "$PRETRAINED"} \
  --dataset gtav synthia --val_dataset cityscapes bdd100k mapillary \
  --exp baseline --arch DeepR50V3PlusD \
  --lr 0.01 --bs_mult 4 --gblur --color_aug 0.5 "$@"
