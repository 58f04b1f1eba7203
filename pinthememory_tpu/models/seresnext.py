"""SE-ResNeXt backbones (50/101, 32x4d), NHWC Flax.

Reference: network/SEresnext.py (the legacy RobustNet backbone; imported
nowhere on the reference's live path — SURVEY.md §2.2 marks it dead — but it
is part of the component inventory, so the rebuild ships a *working*
TPU-native version and wires it into the DeepLab heads).

Reference semantics preserved:

- ``SEResNeXtBottleneck`` (SEresnext.py:170-193): 1x1 (stride 1) -> 3x3
  grouped (stride here) -> 1x1 x4, width = floor(planes * base_width/64) *
  groups with groups=32, base_width=4;
- ``SEModule`` (SEresnext.py:70-92): global average pool -> C/r -> ReLU ->
  C -> sigmoid channel gate, reduction 16, applied to the block output
  *before* the residual add (SEresnext.py:115-118);
- se_resnext stem: single 7x7/2 conv (``input_3x3=False``,
  SEresnext.py:383-391) + 3x3/2 ceil-mode pad-0 max-pool
  (SEresnext.py:271-272, ``ops.pool.max_pool_3x3_s2_ceil``);
- layer plans (3,4,6,3) / (3,4,23,3) (SEresnext.py:383-405).

TPU-native deltas: the SE gate's two 1x1 convs become Dense layers on the
pooled vector (identical math, one fewer reshape); DeepLab dilation surgery
is the same declarative per-stage (stride, dilation) plan used by
``models/resnet.py`` (the stride lives on conv2, so the surgery is exact);
whitening taps hook the block output post-add like the other trunks.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pinthememory_tpu.models.layers import apply_iw_hook, batch_norm, conv2d
from pinthememory_tpu.models.resnet import _VARIANT_PLANS
from pinthememory_tpu.ops.pool import max_pool_3x3_s2_ceil


class SEModule(nn.Module):
    """Squeeze-and-Excitation channel gate (SEresnext.py:70-92)."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # NHWC -> NC global average pool
        s = nn.Dense(self.channels // self.reduction, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class SEResNeXtBottleneck(nn.Module):
    """ResNeXt bottleneck type C with an SE gate (SEresnext.py:170-193)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    iw: int = 0
    groups: int = 32
    base_width: int = 4
    reduction: int = 16
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, taps: list, train: bool):
        out_planes = self.planes * self.expansion
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        residual = x
        # conv1 is ALWAYS stride 1 in the SE-ResNeXt block; the stride (and
        # the DeepLab dilation surgery) lives on the grouped 3x3.
        out = conv2d(width, 1, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                      padding=((self.dilation,) * 2, (self.dilation,) * 2),
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = batch_norm(self.dtype, name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(out_planes, 1, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(self.dtype, name="bn3")(out, use_running_average=not train)
        out = SEModule(out_planes, self.reduction, dtype=self.dtype,
                       name="se_module")(out)
        if self.has_downsample:
            residual = conv2d(out_planes, 1, self.stride, 0,
                              dtype=self.dtype, name="downsample_conv")(x)
            residual = batch_norm(self.dtype, name="downsample_bn")(
                residual, use_running_average=not train)
        out = out + residual
        out = apply_iw_hook(self, out, self.iw, taps, out_planes, "post", train)
        return nn.relu(out)


class SEResNeXtBackbone(nn.Module):
    """SE-ResNeXt trunk with the standard multi-level feature dict."""

    layers: Sequence[int]
    wt_layer: Sequence[int] = (0, 0, 0, 0, 0, 0, 0)
    variant: str = "D16"
    groups: int = 32
    base_width: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps: list = []
        wt = tuple(self.wt_layer)
        # se_resnext stem: 7x7/2 conv + BN + ReLU (input_3x3=False,
        # SEresnext.py:383-391); position-2 whitening hooks the stem norm
        # like the other trunks.
        x = conv2d(64, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
        if wt[2] != 0:
            x = apply_iw_hook(self, x, wt[2], taps, 64, "bn1", train)
        else:
            x = batch_norm(self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_3x3_s2_ceil(x)
        stem = x

        plans = _VARIANT_PLANS.get(self.variant, _VARIANT_PLANS["D32"])
        feats = {}
        in_planes = 64
        planes = (64, 128, 256, 512)
        for si in range(4):
            stride, dil = plans[si]
            num_blocks = self.layers[si]
            needs_ds = stride != 1 or in_planes != planes[si] * 4
            for bi in range(num_blocks):
                x = SEResNeXtBottleneck(
                    planes=planes[si],
                    stride=stride if bi == 0 else 1,
                    dilation=dil,
                    has_downsample=needs_ds and bi == 0,
                    iw=wt[3 + si] if bi == num_blocks - 1 else 0,
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    name=f"layer{si + 1}_block{bi}",
                )(x, taps, train)
            in_planes = planes[si] * 4
            feats[f"layer{si + 1}"] = x

        return {
            "stem": stem,
            "low_level": feats["layer1"],
            "aux": feats["layer3"],
            "out": feats["layer4"],
            "taps": taps,
        }


def se_resnext50_32x4d(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    return SEResNeXtBackbone((3, 4, 6, 3), wt_layer, variant, dtype=dtype)


def se_resnext101_32x4d(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    return SEResNeXtBackbone((3, 4, 23, 3), wt_layer, variant, dtype=dtype)
