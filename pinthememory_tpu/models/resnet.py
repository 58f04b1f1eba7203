"""ResNet backbones (18/50/101/152) with whitening-tap hooks, NHWC Flax.

Reference: network/Resnet.py.  Key reference semantics preserved:

- whitening code per position (``wt_layer[7]``): 0-2 are stem convs, 3-6 are
  the *last block* of layer1-4 (Resnet.py:334-350, 450-465);
- taps are taken after the residual add, before the ReLU (Resnet.py:125-132);
- ALL live trunks use the single 7x7 stem (Resnet.py:395-495): the 3-conv
  ``ResNet3X3`` (Resnet.py:219-320) is dead code -- resnet101() builds plain
  ``ResNet`` (Resnet.py:528-559, the 3X3 line is commented out) and both
  heads wrap layer0 as (conv1, bn1, relu, maxpool) (deepv2.py:95-97,
  deepv3plus.py:319-325).  ``resnet101_3x3`` keeps the dead variant working;
- DeepLab dilation surgery (deepv3plus.py:347-382) mutates each stage's 3x3
  convs post-hoc; here the same geometry is expressed declaratively via a
  per-stage ``(stride, dilation)`` plan -- equivalent for the Bottleneck
  backbones the D/D16 variants ship with (the stride lives on conv2).

The ``[x, w_arr]`` tuple threading of the reference becomes a returned dict
of features ``{stem, layer1..layer4, taps}``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pinthememory_tpu.models.layers import (
    IW_SWITCH,
    IW_WHITEN,
    IW_WHITEN_ISW,
    SpaceToDepthStem,
    apply_iw_hook,
    batch_norm,
    conv2d,
    use_block_remat,
    use_std_stem,
)
from pinthememory_tpu.ops.pool import max_pool_3x3_s2


class BasicBlock(nn.Module):
    """Two 3x3 convs; expansion 1 (reference: Resnet.py:62-134)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    iw: int = 0
    dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, taps: list, train: bool):
        residual = x
        out = conv2d(self.planes, 3, self.stride, self.dilation, self.dilation,
                     dtype=self.dtype, name="conv1")(x)
        out = batch_norm(self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, self.dilation, self.dilation,
                     dtype=self.dtype, name="conv2")(out)
        out = batch_norm(self.dtype, name="bn2")(out, use_running_average=not train)
        if self.has_downsample:
            residual = conv2d(self.planes, 1, self.stride, 0,
                              dtype=self.dtype, name="downsample_conv")(x)
            residual = batch_norm(self.dtype, name="downsample_bn")(
                residual, use_running_average=not train)
        out = out + residual
        out = apply_iw_hook(self, out, self.iw, taps, self.planes, "post", train)
        return nn.relu(out)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride/dilation) -> 1x1x4 (reference: Resnet.py:137-216).

    ``groups``/``base_width`` extend the same block to ResNeXt (32x4d/32x8d)
    and wide-ResNet variants (torchvision-compatible width rule), covering
    the reference's resnext/wide_resnet trunks (deepv3plus.py:328-339).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    iw: int = 0
    groups: int = 1
    base_width: int = 64
    # DeepV2's layer2 surgery relocates the stride onto the 1x1 conv1
    # (deepv2.py:122-123: conv1.stride=(2,2), conv2.stride=(1,1)) --
    # numerically DIFFERENT from torchvision's stride-on-conv2 with the same
    # weights (subsample before vs after the 3x3)
    stride_on_conv1: bool = False
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, taps: list, train: bool):
        out_planes = self.planes * self.expansion
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        s1 = self.stride if self.stride_on_conv1 else 1
        s2 = 1 if self.stride_on_conv1 else self.stride
        residual = x
        out = conv2d(width, 1, s1, 0, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        # stride and dilation both live on the 3x3, matching torchvision and
        # the reference's conv2-targeted dilation surgery.
        out = nn.Conv(width, (3, 3), strides=(s2, s2),
                      padding=((self.dilation,) * 2, (self.dilation,) * 2),
                      kernel_dilation=(self.dilation, self.dilation),
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = batch_norm(self.dtype, name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(out_planes, 1, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(self.dtype, name="bn3")(out, use_running_average=not train)
        if self.has_downsample:
            residual = conv2d(out_planes, 1, self.stride, 0,
                              dtype=self.dtype, name="downsample_conv")(x)
            residual = batch_norm(self.dtype, name="downsample_bn")(
                residual, use_running_average=not train)
        out = out + residual
        out = apply_iw_hook(self, out, self.iw, taps, out_planes, "post", train)
        return nn.relu(out)


class Stage(nn.Module):
    """One ResNet stage; the whitening code applies to its last block only
    (reference: Resnet.py:346-348)."""

    block_cls: type
    planes: int
    num_blocks: int
    in_planes: int
    stride: int = 1
    dilation: int = 1
    iw: int = 0
    groups: int = 1
    base_width: int = 64
    stride_on_conv1: bool = False   # deepv2 layer2 quirk; block 0 only
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, taps: list, train: bool):
        exp = self.block_cls.expansion
        needs_ds = self.stride != 1 or self.in_planes != self.planes * exp
        for i in range(self.num_blocks):
            kwargs = {}
            if self.block_cls is Bottleneck:
                kwargs = dict(groups=self.groups, base_width=self.base_width,
                              stride_on_conv1=self.stride_on_conv1 and i == 0)
            iw = self.iw if i == self.num_blocks - 1 else 0
            # per-block rematerialization (train only): save block inputs,
            # recompute the conv/BN/relu chain in the backward instead of
            # storing its transposed/padded activations.  Whitening blocks
            # (iw != 0) append taps and are never wrapped.
            cls = self.block_cls
            if train and iw == 0 and use_block_remat():
                cls = nn.remat(cls, static_argnums=(3,))
            x = cls(
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                dilation=self.dilation,
                has_downsample=needs_ds and i == 0,
                iw=iw,
                dtype=self.dtype,
                name=f"block{i}",
                **kwargs,
            )(x, taps, train)
        return x


# stage plans: (stride, dilation) per stage for each DeepLab variant
# (reference: deepv3plus.py:347-382).
_VARIANT_PLANS = {
    "D":   ((1, 1), (2, 1), (1, 2), (1, 4)),   # OS8
    "D4":  ((1, 1), (1, 2), (1, 4), (1, 8)),   # OS4
    "D16": ((1, 1), (2, 1), (2, 1), (1, 2)),   # OS16
    "D32": ((1, 1), (2, 1), (2, 1), (2, 1)),   # OS32 (no surgery)
    # DeepV2's OS8 (deepv2.py:120-133): same geometry as "D", but layer2's
    # stride is RELOCATED onto block0's 1x1 conv1 (conv1.stride=2,
    # conv2.stride=1) -- a numeric quirk the stride_on_conv1 flag carries
    "D_v2": ((1, 1), (2, 1), (1, 2), (1, 4)),
}


class ResNetBackbone(nn.Module):
    """ResNet trunk returning multi-level features for the DeepLab heads.

    Output dict: ``stem`` (post-maxpool), ``low_level`` (layer1),
    ``aux`` (layer3), ``out`` (layer4), ``taps`` (whitening taps in
    reference order).
    """

    block_cls: type
    layers: Sequence[int]
    wt_layer: Sequence[int] = (0, 0, 0, 0, 0, 0, 0)
    variant: str = "D16"
    three_stem: bool = False   # ResNet3X3 stem (resnet-101)
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps: list = []
        wt = tuple(self.wt_layer)
        def stem_norm(pos: int, feats: int, name: str, h):
            if wt[pos] in (IW_WHITEN, IW_WHITEN_ISW, 3, 4, IW_SWITCH):
                return apply_iw_hook(self, h, wt[pos], taps, feats, name, train)
            return batch_norm(self.dtype, name=name)(h, use_running_average=not train)

        if self.three_stem:
            # ResNet3X3 stem (Resnet.py:231-316): 3x3 s2 -> 3x3 -> 3x3(128)
            x = conv2d(64, 3, 2, 1, dtype=self.dtype, name="conv1")(x)
            x = nn.relu(stem_norm(0, 64, "bn1", x))
            x = conv2d(64, 3, 1, 1, dtype=self.dtype, name="conv2")(x)
            x = nn.relu(stem_norm(1, 64, "bn2", x))
            x = conv2d(128, 3, 1, 1, dtype=self.dtype, name="conv3")(x)
            x = nn.relu(stem_norm(2, 128, "bn3", x))
            in_planes = 128
        else:
            # single 7x7 stem; whitening position 2 hooks its norm
            # (Resnet.py:404-430).  In train mode the same conv runs on a
            # 2x2 space-to-depth input (exact math, measured +4.6% on the
            # episode; eval keeps the plain conv -- layers.use_std_stem).
            # Both variants share the "conv1/kernel" (7,7,3,64) param, so
            # checkpoints and the converter are unaffected.
            x = SpaceToDepthStem(features=64, dtype=self.dtype,
                                 name="conv1")(x, reorder=use_std_stem(train))
            x = nn.relu(stem_norm(2, 64, "bn1", x))
            in_planes = 64

        x = max_pool_3x3_s2(x)
        stem = x

        plans = _VARIANT_PLANS[self.variant if self.variant in _VARIANT_PLANS else "D32"]
        feats = {}
        planes = (64, 128, 256, 512)
        for si in range(4):
            stride, dil = plans[si]
            x = Stage(
                block_cls=self.block_cls,
                planes=planes[si],
                num_blocks=self.layers[si],
                in_planes=in_planes,
                stride=stride,
                dilation=dil,
                iw=wt[3 + si],
                groups=self.groups,
                base_width=self.base_width,
                stride_on_conv1=self.variant == "D_v2" and si == 1,
                dtype=self.dtype,
                name=f"layer{si + 1}",
            )(x, taps, train)
            in_planes = planes[si] * self.block_cls.expansion
            feats[f"layer{si + 1}"] = x

        return {
            "stem": stem,
            "low_level": feats["layer1"],
            "aux": feats["layer3"],
            "out": feats["layer4"],
            "taps": taps,
        }


def resnet18(wt_layer=(0,) * 7, variant="D32", dtype=jnp.float32):
    return ResNetBackbone(BasicBlock, (2, 2, 2, 2), wt_layer, variant, False, dtype=dtype)


def resnet50(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    return ResNetBackbone(Bottleneck, (3, 4, 6, 3), wt_layer, variant, False, dtype=dtype)


def resnet101(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    # plain 7x7 stem: the reference's resnet101() builds ResNet, not
    # ResNet3X3 (Resnet.py:552-556; the 3X3 constructor line is commented
    # out), so released R101 checkpoints are torchvision-format
    return ResNetBackbone(Bottleneck, (3, 4, 23, 3), wt_layer, variant, False, dtype=dtype)


def resnet101_3x3(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    """The reference's dead ``ResNet3X3`` stem variant (Resnet.py:219-320),
    kept working for completeness."""
    return ResNetBackbone(Bottleneck, (3, 4, 23, 3), wt_layer, variant, True, dtype=dtype)


def resnet152(wt_layer=(0,) * 7, variant="D", dtype=jnp.float32):
    return ResNetBackbone(Bottleneck, (3, 8, 36, 3), wt_layer, variant, False, dtype=dtype)


def resnext50_32x4d(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    return ResNetBackbone(Bottleneck, (3, 4, 6, 3), wt_layer, variant, False,
                          groups=32, base_width=4, dtype=dtype)


def resnext101_32x8d(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    return ResNetBackbone(Bottleneck, (3, 4, 23, 3), wt_layer, variant, False,
                          groups=32, base_width=8, dtype=dtype)


def wide_resnet50_2(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    return ResNetBackbone(Bottleneck, (3, 4, 6, 3), wt_layer, variant, False,
                          base_width=128, dtype=dtype)


def wide_resnet101_2(wt_layer=(0,) * 7, variant="D16", dtype=jnp.float32):
    return ResNetBackbone(Bottleneck, (3, 4, 23, 3), wt_layer, variant, False,
                          base_width=128, dtype=dtype)


CHANNELS = {
    # trunk -> (low_level, aux(prev_final), final)
    "resnet-18": (64, 256, 512),
    "resnet-50": (256, 1024, 2048),
    "resnet-101": (256, 1024, 2048),
    "resnet-152": (256, 1024, 2048),
}
