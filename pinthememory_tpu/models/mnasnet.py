"""MNASNet 0.5 / 1.0 backbone, NHWC Flax.

Reference: network/deepv3plus.py:210-260 builds torchvision MNASNet trunks
(``DeepMNASNet05V3PlusD``/``DeepMNASNet10V3PlusD``, deepv3plus.py:764-778)
with layer split layer0=layers[0-7], layer1=[8,9], layer2=[10,11],
layer3=[12,13], layer4=[14-16] and D16/D surgery on the strided depthwise
convs.  NB: the reference's *forward* routes mnasnet through the ResNet
branch (deepv3plus.py:494-530), which both truncates the stem and feeds
``[x, w_arr]`` lists into plain torchvision stacks -- it cannot run; this
rebuild provides a working version of the declared architecture
(see PARITY.md).  Whitening taps are not supported (as in the reference,
whose mnasnet stacks carry no iw hooks).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pinthememory_tpu.models.layers import batch_norm


def _round_to_multiple_of(val: float, divisor: int = 8) -> int:
    """torchvision mnasnet channel rounding (>= 90% of the raw value)."""
    new_val = max(divisor, int(val + divisor / 2) // divisor * divisor)
    return new_val if new_val >= 0.9 * val else new_val + divisor


def _depths(alpha: float) -> list[int]:
    return [_round_to_multiple_of(d * alpha) for d in
            (32, 16, 24, 40, 80, 96, 192, 320)]


def _conv_bn(m, x, features, kernel, stride, dilation, groups, name, train,
             relu=True):
    pad = (kernel - 1) // 2 * dilation
    y = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                kernel_dilation=(dilation, dilation),
                feature_group_count=groups, use_bias=False, dtype=m.dtype,
                name=f"{name}_conv")(x)
    y = batch_norm(m.dtype, name=f"{name}_bn")(y, use_running_average=not train)
    return nn.relu(y) if relu else y


class MNASInvertedResidual(nn.Module):
    """torchvision ``_InvertedResidual``: pw-expand -> dw kxk -> pw-linear."""

    oup: int
    kernel: int
    stride: int
    expansion: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        mid = inp * self.expansion
        use_res = self.stride == 1 and inp == self.oup
        y = _conv_bn(self, x, mid, 1, 1, 1, 1, "pw", train)
        y = _conv_bn(self, y, mid, self.kernel, self.stride, self.dilation,
                     mid, "dw", train)
        y = _conv_bn(self, y, self.oup, 1, 1, 1, 1, "pwl", train, relu=False)
        return x + y if use_res else y


# per-stack (kernel, stride, expansion, repeats); output channel =
# depths[2 + stack index] (torchvision MNASNet(...) layers 8-13)
_STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3),
           (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))


class MNASNetBackbone(nn.Module):
    """MNASNet trunk with the DeepLab layer split and dilation surgery."""

    alpha: float = 1.0
    wt_layer: Sequence[int] = (0,) * 7
    variant: str = "D16"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = _depths(self.alpha)
        # surgery (deepv3plus.py:245-256): strided convs in layer2/layer3
        # stacks become dilated.  stacks 2 (layers[10]) and 4 (layers[12])
        # hold the stride-2 entries of layer2/layer3 respectively.
        dil_of: dict[int, int] = {}
        if self.variant == "D":
            dil_of = {2: 2, 4: 4}
        elif self.variant == "D16":
            dil_of = {4: 2}

        # layer0 = layers[0-7]: conv s2 -> dw 3x3 -> pw-linear to depths[1]
        x = _conv_bn(self, x, d[0], 3, 2, 1, 1, "f0", train)
        x = _conv_bn(self, x, d[0], 3, 1, 1, d[0], "f3", train)
        x = _conv_bn(self, x, d[1], 1, 1, 1, 1, "f6", train, relu=False)
        feats = {"stem": x}

        for si, (k, s, e, n) in enumerate(_STACKS):
            oup = d[2 + si]
            for i in range(n):
                stride = s if i == 0 else 1
                dilation = 1
                if stride == 2 and si in dil_of:
                    dilation, stride = dil_of[si], 1
                x = MNASInvertedResidual(
                    oup=oup, kernel=k, stride=stride, expansion=e,
                    dilation=dilation, dtype=self.dtype,
                    name=f"stack{si}_block{i}")(x, train)
            if si == 1:
                feats["low_level"] = x   # layer1 out (deepv3plus.py:223)
            if si == 5:
                feats["aux"] = x         # layer3 out
        y = _conv_bn(self, x, 1280, 1, 1, 1, 1, "f14", train)
        feats["out"] = y
        feats["taps"] = []
        return feats
