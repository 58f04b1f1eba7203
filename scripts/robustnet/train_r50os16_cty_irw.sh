#!/usr/bin/env bash
# RobustNet ablation: r50os16 / cty / irw
# (reference: pinmem_train_scripts/robustnet_scripts(from robustnet github)/
#  train_r50os16_cty_irw.sh -- rebuilt CLI dialect, same hyperparameters)
cd "$(dirname "$0")/../.."
# set PRETRAINED=/path/to/torchvision-resnet.pth for ImageNet trunk init
python -m pinthememory_tpu.train.cli \
  ${PRETRAINED:+--pretrained "$PRETRAINED"} \
  --dataset cityscapes \
  --covstat_val_dataset cityscapes \
  --val_dataset bdd100k gtav synthia mapillary \
  --arch DeepR50V3PlusD \
  --city_mode train --lr_schedule poly --lr 0.01 --poly_exp 0.9 \
  --max_cu_epoch 10000 --class_uniform_pct 0.5 --class_uniform_tile 1024 \
  --crop_size 768 --scale_min 0.5 --scale_max 2.0 --rrotate 0 \
  --max_iter 40000 --bs_mult 4 --gblur --color_aug 0.5 \
  --wt_reg_weight 0.6 --relax_denom 64.0 --clusters 0 --cov_stat_epoch 0 --trials 0 \
  --wt_layer 0 0 1 1 1 0 0 \
  --exp r50os16_cty_irw "$@"
