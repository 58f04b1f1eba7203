"""Logit parity against the ACTUAL reference code (VERDICT r1 item 5).

`tests/test_parity_full.py` gates the converter against a hand-restated torch
twin; a transcription error there would pass silently.  This test imports the
real `/root/reference/network/{deepv3plus,Resnet,memory}.py`, builds the live
``DeepR50V3PlusD`` (memory read enabled, gumbel off), converts its state_dict
with ``convert_state_dict``, and requires end-to-end logit parity from the
JAX model -- the strongest available substitute for running a released
checkpoint in this zero-egress environment.

Import shims (environment gaps only, no behavioral stubs on the tested path):
see ``tests/ref_harness.py`` -- shared by all reference-oracle parity tests.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
from pinthememory_tpu.models import build_model
from pinthememory_tpu.tools.convert_torch import convert_state_dict, merge_into_variables

from ref_harness import NUM_CLASSES, build_reference_deepr50


@pytest.fixture(scope="module")
def reference_net():
    return build_reference_deepr50(memory=True)


def test_reference_model_logit_parity(reference_net):
    """DeepR50V3PlusD (real reference code) vs JAX model, eval + memory read.

    Reference forward: deepv3plus.py:485-630 (eval branch returns
    [main_out, mem_output, inter_feature])."""
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outputs = reference_net(torch.from_numpy(x))
    ref = outputs[0].permute(0, 2, 3, 1).numpy()
    ref_inter = outputs[-1].permute(0, 2, 3, 1).numpy()

    sd = {k: v.numpy() for k, v in reference_net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(
        sd, memory=reference_net.memory.m_items.numpy()
    )
    real_skips = [s for s in report.skipped if not s.endswith("num_batches_tracked")]
    assert not real_skips, f"converter skipped reference tensors: {real_skips}"

    mc = ModelConfig(arch="DeepR50V3PlusD", memory=MemoryConfig(enabled=True))
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
        lambda v, xx, m: model.apply(v, xx, None, m, train=False, with_aux=False)
    )(variables, xin, jnp.asarray(m_items))

    inter_diff = np.abs(np.asarray(out["inter_feature"]) - ref_inter).max()
    assert inter_diff < 1e-3, f"pre-memory feature max diff {inter_diff}"

    diff = np.abs(np.asarray(out["main_out"]) - ref).max()
    assert diff < 2e-3, f"logit max diff {diff}"
    assert (np.asarray(out["main_out"]).argmax(-1) == ref.argmax(-1)).mean() > 0.999


def test_converter_covers_all_real_reference_tensors(reference_net):
    """Every tensor in the real model's (DDP-prefixed) state_dict must map."""
    sd = {f"module.{k}": v.numpy() for k, v in reference_net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(sd)
    expected_skips = {k for k in sd if k.endswith("num_batches_tracked")}
    assert set(report.skipped) == expected_skips, (
        set(report.skipped) ^ expected_skips)
