"""MobileNetV2 backbone with whitening hooks, NHWC Flax.

Reference: network/Mobilenet.py (torchvision MobileNetV2 + iw hooks on
features 1, 6, 10, 17, 18 carrying wt_layer[2..6], Mobilenet.py:233-248)
and the DeepV3Plus layer split (deepv3plus.py:259-283): layer0=f0-1,
layer1=f2-6, layer2=f7-10, layer3=f11-17, layer4=f18.  Dilation surgery
(D/D16) hits only the *strided* depthwise convs (deepv3plus.py:285-295).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pinthememory_tpu.models.layers import apply_iw_hook, batch_norm, conv2d


def conv_bn_relu6(m, x, features, kernel, stride, dilation, groups, name, train):
    pad = (kernel - 1) // 2 * dilation
    y = nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=False,
        dtype=m.dtype,
        name=f"{name}_conv",
    )(x)
    y = batch_norm(m.dtype, name=f"{name}_bn")(y, use_running_average=not train)
    return jnp.clip(y, 0.0, 6.0)  # ReLU6


class InvertedResidual(nn.Module):
    oup: int
    stride: int
    expand_ratio: int
    dilation: int = 1
    iw: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, taps: list, train: bool):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.oup
        y = x
        if self.expand_ratio != 1:
            y = conv_bn_relu6(self, y, hidden, 1, 1, 1, 1, "pw", train)
        y = conv_bn_relu6(self, y, hidden, 3, self.stride, self.dilation,
                          hidden, "dw", train)
        y = nn.Conv(self.oup, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwl_conv")(y)
        y = batch_norm(self.dtype, name="pwl_bn")(y, use_running_average=not train)
        out = x + y if use_res else y
        return apply_iw_hook(self, out, self.iw, taps, self.oup, "post", train)


# (t, c, n, s) inverted residual plan (Mobilenet.py:208-216)
_PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
         (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
_IW_FEATURES = {1: 2, 6: 3, 10: 4, 17: 5, 18: 6}  # feature idx -> wt position


class MobileNetV2Backbone(nn.Module):
    wt_layer: Sequence[int] = (0,) * 7
    variant: str = "D16"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps: list = []
        wt = tuple(self.wt_layer)
        # dilation multipliers per original stride-2 feature, by variant
        # (strided convs only -- matching the reference's surgery)
        layer2_feats = range(7, 11)
        layer3_feats = range(11, 18)
        if self.variant == "D":
            dil_of = {**{f: 2 for f in layer2_feats}, **{f: 4 for f in layer3_feats}}
        elif self.variant == "D16":
            dil_of = {f: 2 for f in layer3_feats}
        else:
            dil_of = {}

        feats = {}
        x = conv_bn_relu6(self, x, 32, 3, 2, 1, 1, "f0", train)
        fc = 0
        for t, c, n, s in _PLAN:
            for i in range(n):
                fc += 1
                stride = s if i == 0 else 1
                dilation = 1
                if stride == 2 and fc in dil_of:
                    dilation, stride = dil_of[fc], 1
                x = InvertedResidual(
                    oup=c, stride=stride, expand_ratio=t, dilation=dilation,
                    iw=wt[_IW_FEATURES[fc]] if fc in _IW_FEATURES else 0,
                    dtype=self.dtype, name=f"f{fc}",
                )(x, taps, train)
                if fc == 1:
                    feats["stem"] = x
                if fc == 6:
                    feats["low_level"] = x   # 32ch end of layer1
                if fc == 17:
                    feats["aux"] = x         # 320ch end of layer3
        y = conv_bn_relu6(self, x, 1280, 1, 1, 1, 1, "f18", train)
        # NB: the reference *declares* feature 18 as an iw position but never
        # passes the code to it (Mobilenet.py:233-248), so wt_layer[6] is
        # silently ignored there; we honor it.  Shipped configs set it to 0.
        y = apply_iw_hook(self, y, wt[6], taps, 1280, "f18_post", train)
        feats["out"] = y
        feats["taps"] = taps
        return feats
