"""WiderResNet-38 A2 backbone (pre-activation identity-residual), NHWC Flax.

Reference: network/wider_resnet.py (``WiderResNetA2``; imported nowhere on
the reference's live path — SURVEY.md §2.2 marks it dead — but it is part of
the component inventory, and the reference's *default* ``--arch
network.deepv3plus.DeepWV3Plus`` (train.py:1046) names a constructor that
does not exist there; the rebuild ships a working one).

Reference semantics preserved (wider_resnet.py:267-380):

- ``mod1`` = bare 3x3 conv 3->64 (no norm);
- ``pool2``/``pool3`` = 3x3/2 max-pools before mod2 and mod3;
- six residual modules with channels (128,128) (256,256) (512,512)
  (512,1024) (512,1024,2048) (1024,2048,4096); the last two are
  bottleneck-style 3-conv blocks;
- pre-activation blocks (wider_resnet.py:64-182): BN+ReLU first, the
  projection shortcut (when shapes change) consumes the *normalized* input;
- A2 downsampling: dilated mode (the DeepLab config) strides only mod4's
  first block and dilates mod5 by 2 and mod6/mod7 by 4 -> OS 8; non-dilated
  mode strides mod4/5/6 -> OS 32;
- dropout 0.3 in mod6 and 0.5 in mod7 blocks (between conv2 and conv3),
  train-time only (OFF by default here: the framework's forward threads one
  explicit rng for the memory's gumbel read; pass ``dropout_rates`` and a
  ``dropout`` rng to enable).

Feature taps for the DeepLab heads: ``low_level`` = mod2 output (128ch,
stride 2 — the WV3Plus skip point), ``aux`` = mod6 output (2048ch),
``out`` = BN+ReLU(mod7) (4096ch).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pinthememory_tpu.models.layers import apply_iw_hook, batch_norm, conv2d
from pinthememory_tpu.ops.pool import max_pool_3x3_s2

# per-module internal channel plans (wider_resnet.py:316-317)
_CHANNELS = (
    (128, 128), (256, 256), (512, 512),
    (512, 1024), (512, 1024, 2048), (1024, 2048, 4096),
)


class IdentityResidualBlock(nn.Module):
    """Pre-activation residual block (wider_resnet.py:64-182)."""

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        is_bottleneck = len(self.channels) == 3
        need_proj = self.stride != 1 or x.shape[-1] != self.channels[-1]

        bn1 = nn.relu(batch_norm(self.dtype, name="bn1")(
            x, use_running_average=not train))
        shortcut = x
        if need_proj:
            # the projection consumes the normalized input
            # (wider_resnet.py:173-176)
            shortcut = conv2d(self.channels[-1], 1, self.stride, 0,
                              dtype=self.dtype, name="proj_conv")(bn1)

        if is_bottleneck:
            out = conv2d(self.channels[0], 1, self.stride, 0,
                         dtype=self.dtype, name="conv1")(bn1)
            out = nn.relu(batch_norm(self.dtype, name="bn2")(
                out, use_running_average=not train))
            out = conv2d(self.channels[1], 3, 1, self.dilation, self.dilation,
                         dtype=self.dtype, name="conv2")(out)
            out = nn.relu(batch_norm(self.dtype, name="bn3")(
                out, use_running_average=not train))
            if self.dropout_rate > 0:
                out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
            out = conv2d(self.channels[2], 1, 1, 0,
                         dtype=self.dtype, name="conv3")(out)
        else:
            out = conv2d(self.channels[0], 3, self.stride, self.dilation,
                         self.dilation, dtype=self.dtype, name="conv1")(bn1)
            out = nn.relu(batch_norm(self.dtype, name="bn2")(
                out, use_running_average=not train))
            if self.dropout_rate > 0:
                out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
            out = conv2d(self.channels[1], 3, 1, self.dilation, self.dilation,
                         dtype=self.dtype, name="conv2")(out)
        return out + shortcut


class WiderResNetA2Backbone(nn.Module):
    """WiderResNet A2 trunk returning the standard multi-level feature dict."""

    structure: Sequence[int] = (3, 3, 6, 3, 1, 1)   # wresnet-38
    dilated: bool = True                            # OS8 (DeepLab config)
    dropout_rates: Sequence[float] = (0.0, 0.0)     # (mod6, mod7); ref: (.3, .5)
    wt_layer: Sequence[int] = (0, 0, 0, 0, 0, 0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps: list = []
        wt = tuple(self.wt_layer)
        # mod1: bare conv, no norm (wider_resnet.py:310-312); position-2
        # whitening (stem) taps its output to match the other trunks' hook
        # placement.
        x = conv2d(64, 3, 1, 1, dtype=self.dtype, name="mod1_conv1")(x)
        x = apply_iw_hook(self, x, wt[2], taps, 64, "mod1", train)

        feats = {}
        for mod_id, num in enumerate(self.structure):
            if mod_id < 2:
                x = max_pool_3x3_s2(x)
            chans = _CHANNELS[mod_id]
            if self.dilated:
                dil = 2 if mod_id == 3 else (4 if mod_id > 3 else 1)
                first_stride = 2 if mod_id == 2 else 1
            else:
                dil = 1
                first_stride = 2 if 2 <= mod_id <= 4 else 1
            drop = 0.0
            if mod_id == 4:
                drop = float(self.dropout_rates[0])
            elif mod_id == 5:
                drop = float(self.dropout_rates[1])
            for block_id in range(num):
                x = IdentityResidualBlock(
                    channels=chans,
                    stride=first_stride if block_id == 0 else 1,
                    dilation=dil,
                    dropout_rate=drop,
                    dtype=self.dtype,
                    name=f"mod{mod_id + 2}_block{block_id + 1}",
                )(x, train)
            # whitening positions 3-6 hook mod2..mod5 outputs (the four
            # stage-level taps of the ResNet trunks)
            if mod_id < 4 and wt[3 + mod_id] != 0:
                x = apply_iw_hook(
                    self, x, wt[3 + mod_id], taps, chans[-1],
                    f"mod{mod_id + 2}", train)
            feats[f"mod{mod_id + 2}"] = x

        out = nn.relu(batch_norm(self.dtype, name="bn_out")(
            x, use_running_average=not train))
        return {
            "stem": feats["mod2"],
            "low_level": feats["mod2"],   # 128ch @ stride 2 (WV3Plus skip)
            "aux": feats["mod6"],         # 2048ch
            "out": out,                   # 4096ch
            "taps": taps,
        }


def wider_resnet38_a2(wt_layer=(0,) * 7, variant="D", dtype=jnp.float32):
    """wresnet-38 trunk; ``variant`` 'D'/'D16' -> dilated OS8, else OS32."""
    return WiderResNetA2Backbone(
        structure=(3, 3, 6, 3, 1, 1),
        dilated=variant in ("D", "D4", "D16"),
        wt_layer=tuple(wt_layer),
        dtype=dtype,
    )
