"""Model factory mirroring the reference's named constructors.

Reference: network/__init__.py:12-46 resolves ``args.arch`` strings like
``network.deepv3plus.DeepR50V3PlusD`` via importlib; here the same surface is
a registry keyed by the bare constructor name (both forms accepted).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import Config, ModelConfig
from pinthememory_tpu.models.deepv3plus import DeepV3Plus
from pinthememory_tpu.models.memory import init_memory

# name -> (trunk, variant, use_skip)  [reference: deepv3plus.py:638-812,
#  deepv3.py, deepv2.py:342-357]
_V3PLUS_ARCHS = {
    "DeepR18V3PlusD": ("resnet-18", "D32", True),
    "DeepR50V3PlusD": ("resnet-50", "D16", True),
    "DeepR50V3PlusD_OS8": ("resnet-50", "D", True),
    "DeepR101V3PlusD": ("resnet-101", "D16", True),
    "DeepR101V3PlusD_OS8": ("resnet-101", "D", True),
    "DeepR152V3PlusD_OS8": ("resnet-152", "D", True),
    "DeepMobileNetV3PlusD": ("mobilenetv2", "D16", True),
    "DeepMobileNetV3PlusD_OS8": ("mobilenetv2", "D", True),
    "DeepShuffleNetV3PlusD": ("shufflenetv2", "D16", True),
    "DeepShuffleNetV3PlusD_OS8": ("shufflenetv2", "D", True),
    "DeepShuffleNetV3PlusD_OS32": ("shufflenetv2", "D32", True),
    # ResNeXt / wide-ResNet trunks (deepv3plus.py:690-753)
    "DeepResNext50V3PlusD": ("resnext-50", "D16", True),
    "DeepResNext101V3PlusD": ("resnext-101", "D16", True),
    "DeepResNext101V3PlusD_OS8": ("resnext-101", "D", True),
    "DeepResNext101V3PlusD_OS4": ("resnext-101", "D4", True),
    "DeepWideResNet50V3PlusD": ("wide_resnet-50", "D16", True),
    "DeepWideResNet50V3PlusD_OS8": ("wide_resnet-50", "D", True),
    "DeepWideResNet101V3PlusD": ("wide_resnet-101", "D16", True),
    "DeepWideResNet101V3PlusD_OS8": ("wide_resnet-101", "D", True),
    # MNASNet trunks (deepv3plus.py:764-778; dead-on-arrival in the
    # reference forward -- see PARITY.md -- working here)
    "DeepMNASNet05V3PlusD": ("mnasnet_05", "D16", True),
    "DeepMNASNet10V3PlusD": ("mnasnet_10", "D16", True),
    # DeepV3 (no low-level skip, network/deepv3.py)
    "DeepR50V3D": ("resnet-50", "D16", False),
    "DeepR101V3D": ("resnet-101", "D16", False),
    # SE-ResNeXt trunks (network/SEresnext.py — dead in the reference,
    # working here; RobustNet-lineage constructor names)
    "DeepSRNX50V3PlusD": ("seresnext-50", "D16", True),
    "DeepSRNX101V3PlusD": ("seresnext-101", "D16", True),
    # WiderResNet-38 A2 trunk (network/wider_resnet.py — dead in the
    # reference; also the reference's *default* --arch DeepWV3Plus names a
    # constructor that does not exist there, train.py:1046 — working here,
    # dilated OS8)
    "DeepWV3Plus": ("wresnet-38", "D", True),
}


def build_model(mc: ModelConfig) -> Any:
    """Build the Flax module for a :class:`ModelConfig`."""
    name = mc.arch.rsplit(".", 1)[-1]
    if name in ("DeepR50V2D", "DeepR101V2D"):
        from pinthememory_tpu.models.deepv2 import DeepV2

        trunk = "resnet-50" if name == "DeepR50V2D" else "resnet-101"
        return DeepV2(
            num_classes=mc.num_classes,
            trunk=trunk,
            use_memory=mc.memory.enabled,
            mem_slot=mc.memory.mem_slot,
            mem_dim=mc.memory.mem_dim,
            mem_momentum=mc.memory.mem_momentum,
            mem_temp=mc.memory.mem_temp,
            gumbel_read=mc.memory.gumbel_read,
            dtype=jnp.dtype(mc.dtype),
        )
    if name not in _V3PLUS_ARCHS:
        raise ValueError(f"unknown arch {mc.arch!r}")
    trunk, variant, use_skip = _V3PLUS_ARCHS[name]
    return DeepV3Plus(
        num_classes=mc.num_classes,
        trunk=trunk,
        variant=variant,
        use_skip=use_skip,
        use_memory=mc.memory.enabled,
        mem_slot=mc.memory.mem_slot,
        mem_dim=mc.memory.mem_dim,
        mem_momentum=mc.memory.mem_momentum,
        mem_temp=mc.memory.mem_temp,
        gumbel_read=mc.memory.gumbel_read,
        wt_layer=tuple(mc.whitening.wt_layer),
        fixed_aspp_pool=mc.fixed_aspp_pool,
        dtype=jnp.dtype(mc.dtype),
    )


def init_model(
    mc: ModelConfig, key: jax.Array, input_hw: tuple[int, int] = (768, 768), batch: int = 1
):
    """Initialize (model, variables, m_items)."""
    model = build_model(mc)
    kp, km, kr = jax.random.split(key, 3)
    x = jnp.zeros((batch, *input_hw, 3), jnp.float32)
    m_items = (
        init_memory(km, mc.memory.mem_slot, mc.memory.mem_dim)
        if mc.memory.enabled
        else None
    )
    gts = jnp.zeros((batch, *input_hw), jnp.int32)
    # Trace every branch (aux head, memory write path) so all params exist.
    variables = model.init(
        {"params": kp},
        x,
        gts,
        m_items,
        train=False,
        rng=kr,
        with_aux=True,
        memory_writing=mc.memory.enabled,
    )
    return model, variables, m_items


def get_net(cfg: Config, key: jax.Array, input_hw: tuple[int, int] = (768, 768)):
    """Reference-shaped entry (network/__init__.py:12-22)."""
    return init_model(cfg.model, key, input_hw)
