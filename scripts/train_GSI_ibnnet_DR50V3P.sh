#!/usr/bin/env bash
# IBN-Net instance-norm variant (reference: train_GSI_ibnnet_DR50V3P.sh)
cd "$(dirname "$0")/.."
# set PRETRAINED=/path/to/torchvision-resnet.pth for ImageNet trunk init
python -m pinthememory_tpu.train.cli \
  ${PRETRAINED:+--pretrained "$PRETRAINED"} \
  --dataset gtav synthia idd \
  --val_dataset cityscapes bdd100k mapillary \
  --exp ibnnet --arch DeepR50V3PlusD \
  --lr 0.01 --bs_mult 4 --gblur --color_aug 0.5 \
  --wt_layer 0 0 4 4 4 0 0 "$@"
