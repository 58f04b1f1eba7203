"""DeepLabV3+ head over a whitening-capable backbone, with optional
categorical memory at the ASPP bottleneck.  Reference: network/deepv3plus.py.

Design: the reference computes its losses inside ``forward`` and returns a
flag-ordered positional list (deepv3plus.py:577-615); here the module is a
pure feature extractor returning a named dict of logits/taps/memory outputs,
and all loss assembly lives in train/losses.py.  The memory state flows
in and out explicitly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pinthememory_tpu.models.aspp import ASPP
from pinthememory_tpu.models.layers import (
    ConcatSplitConv3x3,
    batch_norm,
    conv2d,
    use_split_concat,
)
from pinthememory_tpu.models.memory import MemoryModule
from pinthememory_tpu.models import resnet as resnet_lib
from pinthememory_tpu.ops.resize import resize_bilinear_align_corners


def make_backbone(trunk: str, wt_layer, variant: str, dtype):
    if trunk == "resnet-18":
        return resnet_lib.resnet18(wt_layer, variant, dtype)
    if trunk == "resnet-50":
        return resnet_lib.resnet50(wt_layer, variant, dtype)
    if trunk == "resnet-101":
        return resnet_lib.resnet101(wt_layer, variant, dtype)
    if trunk == "resnet-152":
        return resnet_lib.resnet152(wt_layer, variant, dtype)
    if trunk == "resnext-50":
        return resnet_lib.resnext50_32x4d(wt_layer, variant, dtype)
    if trunk == "resnext-101":
        return resnet_lib.resnext101_32x8d(wt_layer, variant, dtype)
    if trunk == "wide_resnet-50":
        return resnet_lib.wide_resnet50_2(wt_layer, variant, dtype)
    if trunk == "wide_resnet-101":
        return resnet_lib.wide_resnet101_2(wt_layer, variant, dtype)
    if trunk == "mobilenetv2":
        from pinthememory_tpu.models.mobilenet import MobileNetV2Backbone

        return MobileNetV2Backbone(wt_layer=tuple(wt_layer), variant=variant, dtype=dtype)
    if trunk == "shufflenetv2":
        from pinthememory_tpu.models.shufflenet import ShuffleNetV2Backbone

        return ShuffleNetV2Backbone(wt_layer=tuple(wt_layer), variant=variant, dtype=dtype)
    if trunk in ("mnasnet_05", "mnasnet_10"):
        from pinthememory_tpu.models.mnasnet import MNASNetBackbone

        return MNASNetBackbone(
            alpha=0.5 if trunk == "mnasnet_05" else 1.0,
            wt_layer=tuple(wt_layer), variant=variant, dtype=dtype)
    if trunk == "seresnext-50":
        from pinthememory_tpu.models.seresnext import se_resnext50_32x4d

        return se_resnext50_32x4d(wt_layer, variant, dtype)
    if trunk == "seresnext-101":
        from pinthememory_tpu.models.seresnext import se_resnext101_32x4d

        return se_resnext101_32x4d(wt_layer, variant, dtype)
    if trunk == "wresnet-38":
        from pinthememory_tpu.models.wider_resnet import wider_resnet38_a2

        return wider_resnet38_a2(wt_layer, variant, dtype)
    raise ValueError(f"unknown trunk {trunk!r}")


def trunk_channels(trunk: str) -> tuple[int, int, int]:
    """(low_level, prev_final, final) channels (deepv3plus.py:299-455)."""
    table = {
        "resnet-18": (64, 256, 512),
        "resnet-50": (256, 1024, 2048),
        "resnet-101": (256, 1024, 2048),
        "resnet-152": (256, 1024, 2048),
        "resnext-50": (256, 1024, 2048),
        "resnext-101": (256, 1024, 2048),
        "wide_resnet-50": (256, 1024, 2048),
        "wide_resnet-101": (256, 1024, 2048),
        "mobilenetv2": (32, 320, 1280),
        "shufflenetv2": (116, 464, 1024),
        "mnasnet_05": (24, 160, 1280),
        "mnasnet_10": (40, 320, 1280),
        "seresnext-50": (256, 1024, 2048),
        "seresnext-101": (256, 1024, 2048),
        "wresnet-38": (128, 2048, 4096),
    }
    return table[trunk]


class DeepV3Plus(nn.Module):
    """DeepLabV3+ with 48-channel low-level skip (reference: DeepV3Plus)."""

    num_classes: int = 19
    trunk: str = "resnet-50"
    variant: str = "D16"
    skip_num: int = 48
    use_memory: bool = False
    mem_slot: int = 19
    mem_dim: int = 256
    mem_momentum: float = 0.8
    mem_temp: float = 1.0
    gumbel_read: bool = True
    wt_layer: tuple = (0, 0, 0, 0, 0, 0, 0)
    use_skip: bool = True      # False = DeepV3 (network/deepv3.py)
    # --fixed_aspp_pool (eval.py:741-745): AvgPool2d(105) image pooling
    fixed_aspp_pool: int = 0
    dtype: Any = jnp.float32

    @property
    def output_stride(self) -> int:
        return {"D": 8, "D4": 4, "D16": 16}.get(self.variant, 32)

    def setup(self):
        self.backbone = make_backbone(self.trunk, self.wt_layer, self.variant, self.dtype)
        _, prev_final, final = trunk_channels(self.trunk)
        self.aspp = ASPP(256, self.output_stride, self.dtype,
                         fixed_pool=self.fixed_aspp_pool)
        self.bot_aspp_conv = conv2d(256, 1, dtype=self.dtype, name="bot_aspp_conv")
        self.bot_aspp_bn = batch_norm(self.dtype, name="bot_aspp_bn")
        if self.use_skip:
            self.bot_fine_conv = conv2d(self.skip_num, 1, dtype=self.dtype, name="bot_fine_conv")
            self.bot_fine_bn = batch_norm(self.dtype, name="bot_fine_bn")
        if self.use_skip and use_split_concat():
            # conv(concat(fine, up)) as split convs: exact math, no
            # 304-channel tile-misaligned concat materialization (~17% of
            # the eval forward in pad/copy traffic; see ConcatSplitConv3x3)
            self.final1_conv1 = ConcatSplitConv3x3(
                features=256, split=self.skip_num,
                total_in=self.skip_num + 256, dtype=self.dtype,
                name="final1_conv1")
        else:
            self.final1_conv1 = conv2d(256, 3, 1, 1, dtype=self.dtype, name="final1_conv1")
        self.final1_bn1 = batch_norm(self.dtype, name="final1_bn1")
        self.final1_conv2 = conv2d(256, 3, 1, 1, dtype=self.dtype, name="final1_conv2")
        self.final1_bn2 = batch_norm(self.dtype, name="final1_bn2")
        self.final2_conv = conv2d(self.num_classes, 1, bias=True, dtype=self.dtype,
                                  name="final2_conv")
        # aux head (dsn, deepv3plus.py:419-425)
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

    def __call__(
        self,
        x: jnp.ndarray,
        gts: jnp.ndarray | None = None,
        m_items: jnp.ndarray | None = None,
        *,
        memory_writing: bool = False,
        writing_detach: bool = True,
        train: bool = False,
        rng: jax.Array | None = None,
        with_aux: bool | None = None,
    ) -> dict:
        """Forward pass (reference: deepv3plus.py:485-630).

        Returns a dict with:
          main_out     (B, H, W, C) full-resolution logits
          aux_out      (B, h3, w3, C) aux logits (train only)
          inter_feature (B, h, w, 256) pre-memory ASPP bottleneck
          taps         list of whitening tap feature maps
          mem          MemoryOutputs or None
          m_items      updated memory (== input when not writing)
        """
        in_hw = x.shape[1:3]
        if with_aux is None:
            with_aux = train
        feats = self.backbone(x, train=train)

        y = self.aspp(feats["out"], train=train)
        y = self.bot_aspp_bn(self.bot_aspp_conv(y), use_running_average=not train)
        dec0_up = nn.relu(y)
        inter_feature = dec0_up

        mem_out = None
        if self.use_memory:
            assert m_items is not None, "memory model requires m_items"
            mem_out = self.memory(
                dec0_up,
                m_items,
                gts,
                memory_writing=memory_writing,
                writing_detach=writing_detach,
                train=train,
                rng=rng,
            )
            dec0_up = mem_out.fused
            m_items = mem_out.m_items

        if self.use_skip:
            low = feats["low_level"]
            fine = self.bot_fine_bn(self.bot_fine_conv(low), use_running_average=not train)
            fine = nn.relu(fine)
            up = resize_bilinear_align_corners(dec0_up, low.shape[1:3])
            if isinstance(self.final1_conv1, ConcatSplitConv3x3):
                dec1_pre = self.final1_conv1(fine, up)
            else:
                dec1_pre = self.final1_conv1(
                    jnp.concatenate([fine, up], axis=-1))
        else:
            dec1_pre = self.final1_conv1(dec0_up)

        dec1 = nn.relu(self.final1_bn1(dec1_pre, use_running_average=not train))
        dec1 = nn.relu(self.final1_bn2(self.final1_conv2(dec1), use_running_average=not train))
        dec2 = self.final2_conv(dec1)
        # logits keep the model compute dtype; losses/eval merges upcast at
        # their accumulation site (halves eval HBM traffic in bf16 mode)
        main_out = resize_bilinear_align_corners(dec2, in_hw)

        aux_out = None
        if with_aux:
            a = nn.relu(self.dsn_bn(self.dsn_conv1(feats["aux"]), use_running_average=not train))
            if train and rng is not None:
                # nn.Dropout2d(0.1): drop whole channels (deepv3plus.py:423)
                keep = 0.9
                dmask = jax.random.bernoulli(
                    jax.random.fold_in(rng, 17), keep, (a.shape[0], 1, 1, a.shape[-1])
                )
                a = jnp.where(dmask, a / keep, 0.0).astype(a.dtype)
            aux_out = self.dsn_conv2(a)

        return {
            "main_out": main_out,
            # pre-upsample logits (dec2, OS4 for D16): consumed by the eval
            # fast-merge path, which merges tiles at decoder resolution and
            # upsamples once per image instead of once per tile
            "low_out": dec2,
            "aux_out": aux_out,
            "inter_feature": inter_feature,
            "taps": feats["taps"],
            "mem": mem_out,
            "m_items": m_items,
        }
