"""DeepV2 logit parity against the ACTUAL reference code.

The DeepLabV2 head carries two parity traps the V3Plus gate cannot catch:

  1. its layer2 surgery relocates block0's stride onto the 1x1 conv1
     (deepv2.py:122-123: ``conv1.stride=(2,2); conv2.stride=(1,1)``) --
     numerically different from torchvision's stride-on-conv2 with the same
     weights (the rebuild's ``D_v2`` stage plan / ``stride_on_conv1``);
  2. its summed ASPP lives under ``aspp.conv2d_list.{k}.{0|1}`` and its
     decoder is ``final1=Sequential(conv, bn, relu)`` (deepv2.py:40-52,
     140-143) -- a different state_dict layout the converter must map.

This test builds the real ``DeepR50V2D`` (deepv2.py:342-349; the DR101V2
script family's head -- R50 keeps the test fast), converts its state_dict,
and requires end-to-end eval logit parity from the JAX model with the
memory read enabled.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
from pinthememory_tpu.models import build_model
from pinthememory_tpu.tools.convert_torch import (
    convert_state_dict,
    merge_into_variables,
)

from ref_harness import NUM_CLASSES, build_reference_model


@pytest.fixture(scope="module")
def reference_net():
    return build_reference_model("DeepR50V2D", "deepv2", memory=True)


def test_deepv2_logit_parity(reference_net):
    """DeepR50V2D (real reference code) vs JAX model, eval + memory read.

    Reference forward: deepv2.py:231-310 (eval branch returns
    [main_out, mem_output, inter_feature])."""
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        outputs = reference_net(torch.from_numpy(x))
    ref = outputs[0].permute(0, 2, 3, 1).numpy()
    ref_inter = outputs[-1].permute(0, 2, 3, 1).numpy()

    sd = {k: v.numpy() for k, v in reference_net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(
        sd, memory=reference_net.memory.m_items.numpy())
    real_skips = [s for s in report.skipped
                  if not s.endswith("num_batches_tracked")]
    assert not real_skips, f"converter skipped reference tensors: {real_skips}"

    mc = ModelConfig(arch="DeepR50V2D", memory=MemoryConfig(enabled=True))
    model = build_model(mc)
    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, xin, jnp.zeros((1, 64, 64), jnp.int32),
            jnp.asarray(m_items), train=False, with_aux=True,
            memory_writing=True, rng=jax.random.PRNGKey(1),
        )
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)

    out = jax.jit(
        lambda v, xx, m: model.apply(v, xx, None, m, train=False,
                                     with_aux=False)
    )(variables, xin, jnp.asarray(m_items))

    inter_diff = np.abs(np.asarray(out["inter_feature"]) - ref_inter).max()
    assert inter_diff < 1e-3, f"pre-memory feature max diff {inter_diff}"

    diff = np.abs(np.asarray(out["main_out"]) - ref).max()
    assert diff < 2e-3, f"logit max diff {diff}"
    assert (np.asarray(out["main_out"]).argmax(-1)
            == ref.argmax(-1)).mean() > 0.999


def test_deepv2_converter_covers_all_tensors(reference_net):
    """Every tensor in the real DeepV2 state_dict must map (incl. the
    aspp.conv2d_list and final1 Sequential layouts)."""
    sd = {f"module.{k}": v.numpy()
          for k, v in reference_net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(sd)
    expected_skips = {k for k in sd if k.endswith("num_batches_tracked")}
    assert set(report.skipped) == expected_skips, (
        set(report.skipped) ^ expected_skips)


def test_deepv2_stride_relocation_matters(reference_net):
    """Sanity: the stride_on_conv1 quirk is numerically load-bearing -- a
    plain-"D" backbone with the SAME converted weights must NOT match the
    reference (guards against the quirk silently becoming a no-op)."""
    import pinthememory_tpu.models.deepv2 as dv2

    x = np.random.default_rng(3).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        ref = reference_net(torch.from_numpy(x))[0].permute(
            0, 2, 3, 1).numpy()

    sd = {k: v.numpy() for k, v in reference_net.state_dict().items()}
    params, stats, m_items, _ = convert_state_dict(
        sd, memory=reference_net.memory.m_items.numpy())

    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    orig = dv2.make_backbone
    dv2.make_backbone = lambda trunk, wt, variant, dtype: orig(
        trunk, wt, "D", dtype)  # drop the stride_on_conv1 quirk
    try:
        model = dv2.DeepV2(trunk="resnet-50", use_memory=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, xin,
            jnp.zeros((1, 64, 64), jnp.int32), jnp.asarray(m_items),
            train=False, with_aux=True, memory_writing=True,
            rng=jax.random.PRNGKey(1))
        variables = merge_into_variables(variables, params, stats)
        out = model.apply(variables, xin, None, jnp.asarray(m_items),
                          train=False, with_aux=False)
    finally:
        dv2.make_backbone = orig
    diff = np.abs(np.asarray(out["main_out"]) - ref).max()
    assert diff > 1e-2, (
        "plain-D backbone unexpectedly matches the reference; the "
        "stride_on_conv1 quirk has become a no-op")
