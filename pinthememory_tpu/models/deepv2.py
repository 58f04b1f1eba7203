"""DeepLabV2 head: summed 4-branch ASPP, no low-level skip, OS8 only.

Reference: network/deepv2.py.  Quirks preserved: whitening is asserted off
(deepv2.py:183); the memory hook sits right after the summed ASPP
(deepv2.py:266-273); OS8 comes from moving layer2's stride plus dilating
layer3/4 (deepv2.py:120-133).  The reference relocates layer2 block0's
stride onto the 1x1 conv1 (conv1.stride=2, conv2.stride=1) -- same output
geometry as the standard plan but numerically DIFFERENT with the same
weights (subsample before vs after the 3x3), so the backbone uses the
"D_v2" plan whose stride_on_conv1 flag reproduces it exactly (gated against
the real reference code in tests/test_parity_deepv2.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pinthememory_tpu.models.deepv3plus import make_backbone, trunk_channels
from pinthememory_tpu.models.layers import batch_norm, conv2d
from pinthememory_tpu.models.memory import MemoryModule
from pinthememory_tpu.ops.resize import resize_bilinear_align_corners


class ASPPv2(nn.Module):
    """Summed dilated 3x3 branches (deepv2.py:40-58)."""

    out_dim: int = 256
    rates: tuple = (6, 12, 18, 24)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = None
        for i, r in enumerate(self.rates):
            y = conv2d(self.out_dim, 3, 1, r, r, dtype=self.dtype,
                       name=f"branch{i}_conv")(x)
            y = batch_norm(self.dtype, name=f"branch{i}_bn")(
                y, use_running_average=not train)
            y = nn.relu(y)
            out = y if out is None else out + y
        return out


class DeepV2(nn.Module):
    num_classes: int = 19
    trunk: str = "resnet-101"
    use_memory: bool = False
    mem_slot: int = 19
    mem_dim: int = 256
    mem_momentum: float = 0.8
    mem_temp: float = 1.0
    gumbel_read: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        # whitening is unsupported with DeepV2 (deepv2.py:183).  "D_v2" is
        # OS8 with the reference's layer2 stride-on-conv1 relocation
        # (deepv2.py:122-123) -- numerically different from plain "D" with
        # the same weights, so checkpoint parity requires it.
        self.backbone = make_backbone(self.trunk, (0,) * 7, "D_v2", self.dtype)
        self.aspp = ASPPv2(256, dtype=self.dtype)
        self.final1_conv = conv2d(256, 3, 1, 1, dtype=self.dtype, name="final1_conv")
        self.final1_bn = batch_norm(self.dtype, name="final1_bn")
        self.final2_conv = conv2d(self.num_classes, 1, bias=True, dtype=self.dtype,
                                  name="final2_conv")
        self.dsn_conv1 = conv2d(512, 3, 1, 1, bias=True, dtype=self.dtype, name="dsn_conv1")
        self.dsn_bn = batch_norm(self.dtype, name="dsn_bn")
        self.dsn_conv2 = conv2d(self.num_classes, 1, bias=True, dtype=self.dtype,
                                name="dsn_conv2")
        if self.use_memory:
            self.memory = MemoryModule(
                input_dim=self.mem_dim,
                feature_dim=self.mem_dim,
                memory_size=self.mem_slot,
                momentum=self.mem_momentum,
                temperature=self.mem_temp,
                gumbel_read=self.gumbel_read,
                dtype=self.dtype,
            )

    def __call__(self, x, gts=None, m_items=None, *, memory_writing=False,
                 writing_detach=True, train=False, rng=None, with_aux=None):
        in_hw = x.shape[1:3]
        if with_aux is None:
            with_aux = train
        feats = self.backbone(x, train=train)

        dec0_up = self.aspp(feats["out"], train=train)
        inter_feature = dec0_up

        mem_out = None
        if self.use_memory:
            assert m_items is not None
            mem_out = self.memory(
                dec0_up, m_items, gts,
                memory_writing=memory_writing, writing_detach=writing_detach,
                train=train, rng=rng,
            )
            dec0_up = mem_out.fused
            m_items = mem_out.m_items

        dec1 = nn.relu(self.final1_bn(self.final1_conv(dec0_up),
                                      use_running_average=not train))
        dec2 = self.final2_conv(dec1)
        main_out = resize_bilinear_align_corners(dec2, in_hw)

        aux_out = None
        if with_aux:
            a = nn.relu(self.dsn_bn(self.dsn_conv1(feats["aux"]),
                                    use_running_average=not train))
            if train and rng is not None:
                keep = 0.9
                dmask = jax.random.bernoulli(
                    jax.random.fold_in(rng, 17), keep,
                    (a.shape[0], 1, 1, a.shape[-1]))
                a = jnp.where(dmask, a / keep, 0.0).astype(a.dtype)
            aux_out = self.dsn_conv2(a)

        return {
            "main_out": main_out,
            "aux_out": aux_out,
            "inter_feature": inter_feature,
            "taps": feats["taps"],
            "mem": mem_out,
            "m_items": m_items,
        }
