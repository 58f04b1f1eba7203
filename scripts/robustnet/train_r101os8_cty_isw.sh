#!/usr/bin/env bash
# RobustNet ablation: r101os8 / cty / isw
# (reference: pinmem_train_scripts/robustnet_scripts(from robustnet github)/
#  train_r101os8_cty_isw.sh -- rebuilt CLI dialect, same hyperparameters)
cd "$(dirname "$0")/../.."
# set PRETRAINED=/path/to/torchvision-resnet.pth for ImageNet trunk init
python -m pinthememory_tpu.train.cli \
  ${PRETRAINED:+--pretrained "$PRETRAINED"} \
  --dataset cityscapes \
  --covstat_val_dataset cityscapes \
  --val_dataset bdd100k gtav synthia mapillary \
  --arch DeepR101V3PlusD_OS8 \
  --city_mode train --lr_schedule poly --lr 0.01 --poly_exp 0.9 \
  --max_cu_epoch 10000 --class_uniform_pct 0.5 --class_uniform_tile 1024 \
  --crop_size 768 --scale_min 0.5 --scale_max 2.0 --rrotate 0 \
  --max_iter 40000 --bs_mult 4 --gblur --color_aug 0.5 \
  --wt_reg_weight 0.6 --relax_denom 0.0 --clusters 2 --cov_stat_epoch 5 --trials 10 \
  --wt_layer 0 0 2 2 2 0 0 \
  --exp r101os8_cty_isw "$@"
