"""ShuffleNetV2 (x1.0) backbone with whitening hooks, NHWC Flax.

Reference: network/Shufflenet.py + the DeepV3Plus shufflenet wiring
(deepv3plus.py:121-208): layer0 = conv1+maxpool (iw position 2 replaces the
stem BN), stage2/3/4 = layer1/2/3 with the iw code on each stage's
second-to-last unit (Shufflenet.py:153-160), conv5 = layer4 with position 6
applied after it.  Dilation surgery (D/D16) converts strided convs in
stage3/stage4 (deepv3plus.py:195-205).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pinthememory_tpu.models.layers import apply_iw_hook, batch_norm
from pinthememory_tpu.ops.pool import max_pool_3x3_s2


def _conv(m, x, features, kernel, stride, dilation, groups, name):
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(
        features=features, kernel_size=(kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), kernel_dilation=(dilation, dilation),
        feature_group_count=groups, use_bias=False, dtype=m.dtype, name=name,
    )(x)


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ShuffleUnit(nn.Module):
    oup: int
    stride: int
    dilation: int = 1
    iw: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, taps: list, train: bool):
        branch_features = self.oup // 2
        if self.stride > 1 or x.shape[-1] != self.oup:
            # downsample unit: both branches take the full input
            b1 = _conv(self, x, x.shape[-1], 3, self.stride, self.dilation,
                       x.shape[-1], "b1_dw")
            b1 = batch_norm(self.dtype, name="b1_dw_bn")(b1, use_running_average=not train)
            b1 = _conv(self, b1, branch_features, 1, 1, 1, 1, "b1_pw")
            b1 = nn.relu(batch_norm(self.dtype, name="b1_pw_bn")(
                b1, use_running_average=not train))
            b2_in = x
        else:
            b1, b2_in = jnp.split(x, 2, axis=-1)
        y = _conv(self, b2_in, branch_features, 1, 1, 1, 1, "b2_pw1")
        y = nn.relu(batch_norm(self.dtype, name="b2_pw1_bn")(
            y, use_running_average=not train))
        y = _conv(self, y, branch_features, 3, self.stride, self.dilation,
                  branch_features, "b2_dw")
        y = batch_norm(self.dtype, name="b2_dw_bn")(y, use_running_average=not train)
        y = _conv(self, y, branch_features, 1, 1, 1, 1, "b2_pw2")
        y = nn.relu(batch_norm(self.dtype, name="b2_pw2_bn")(
            y, use_running_average=not train))
        out = jnp.concatenate([b1, y], axis=-1)
        out = channel_shuffle(out, 2)
        return apply_iw_hook(self, out, self.iw, taps, self.oup, "post", train)


class ShuffleNetV2Backbone(nn.Module):
    """x1.0: stages (116, 232, 464) with repeats (4, 8, 4), conv5 1024."""

    wt_layer: Sequence[int] = (0,) * 7
    variant: str = "D16"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps: list = []
        wt = tuple(self.wt_layer)
        stage_channels = (116, 232, 464)
        stage_repeats = (4, 8, 4)
        # dilation for each stage's strided unit (deepv3plus.py:195-205):
        # D: stage3 d2, stage4 d4; D16: stage4 d2
        if self.variant == "D":
            stage_dil = {1: 2, 2: 4}
        elif self.variant == "D16":
            stage_dil = {2: 2}
        else:
            stage_dil = {}

        # layer0: conv1 (24ch s2) + maxpool; iw position 2 replaces stem BN
        y = _conv(self, x, 24, 3, 2, 1, 1, "conv1")
        if wt[2] in (1, 2, 3, 4, 5):
            y = apply_iw_hook(self, y, wt[2], taps, 24, "stem", train)
        else:
            y = batch_norm(self.dtype, name="conv1_bn")(y, use_running_average=not train)
        y = nn.relu(y)
        y = max_pool_3x3_s2(y)
        feats = {"stem": y}

        for si, (c, n) in enumerate(zip(stage_channels, stage_repeats)):
            dil = stage_dil.get(si, 1)
            for i in range(n):
                stride = 2 if i == 0 else 1
                d = 1
                if stride == 2 and dil > 1:
                    stride, d = 1, dil
                y = ShuffleUnit(
                    oup=c, stride=stride, dilation=d,
                    iw=wt[3 + si] if i == n - 2 else 0,
                    dtype=self.dtype, name=f"stage{si + 2}_unit{i}",
                )(y, taps, train)
            if si == 0:
                feats["low_level"] = y
            if si == 2:
                feats["aux_pre"] = y

        feats["aux"] = feats["aux_pre"]  # prev_final = 464 (stage4 out)
        del feats["aux_pre"]
        y = _conv(self, y, 1024, 1, 1, 1, 1, "conv5")
        y = nn.relu(batch_norm(self.dtype, name="conv5_bn")(
            y, use_running_average=not train))
        y = apply_iw_hook(self, y, wt[6], taps, 1024, "conv5_post", train)
        feats["out"] = y
        feats["taps"] = taps
        return feats
