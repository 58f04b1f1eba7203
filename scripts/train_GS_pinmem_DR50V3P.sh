#!/usr/bin/env bash
# flagship pinmem recipe (reference: pinmem_train_scripts/train_GS_pinmem_DR50V3P.sh)
cd "$(dirname "$0")/.."
# set PRETRAINED=/path/to/torchvision-resnet.pth for ImageNet trunk init
python -m pinthememory_tpu.train.cli \
  ${PRETRAINED:+--pretrained "$PRETRAINED"} \
  --dataset gtav synthia \
  --val_dataset cityscapes bdd100k mapillary \
  --exp pinmem \
  --arch DeepR50V3PlusD \
  --lr 0.01 --mldg --memory --bs_mult 4 --gblur --color_aug 0.5 \
  --mem_readloss 0.02 --mem_divloss 0.4 --mem_clsloss 0.2 \
  --mem_momentum 0.8 --inner_lr_anneal "$@"
