#!/usr/bin/env bash
# RobustNet ISW variant (reference: train_GSI_robustnet_DR50V3P.sh)
cd "$(dirname "$0")/.."
# set PRETRAINED=/path/to/torchvision-resnet.pth for ImageNet trunk init
python -m pinthememory_tpu.train.cli \
  ${PRETRAINED:+--pretrained "$PRETRAINED"} \
  --dataset gtav synthia idd \
  --covstat_val_dataset gtav synthia idd \
  --val_dataset cityscapes bdd100k mapillary \
  --exp robustnet_DR50V3P16_GSI --arch DeepR50V3PlusD \
  --lr 0.01 --bs_mult 4 --gblur --color_aug 0.5 \
  --wt_reg_weight 0.6 --relax_denom 0.0 --clusters 3 --cov_stat_epoch 5 \
  --wt_layer 0 0 2 2 2 0 0 "$@"
