"""MobileNetV2 / ShuffleNetV2 trunk logit parity against the ACTUAL
reference code.

These trunks were previously gated only structurally (test_factory builds
them); this file imports the real ``DeepMobileNetV3PlusD`` /
``DeepShuffleNetV3PlusD`` (deepv3plus.py:755-790; both have live forward
routing at deepv3plus.py:494-530, unlike the dead MNASNet constructors --
PARITY.md #7), converts their state_dicts, and requires end-to-end eval
logit parity from the JAX models.  Memory is off: the memory head is
identical code already gated by test_parity_reference.py.
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

from ref_harness import build_reference_model

CASES = {
    "DeepMobileNetV3PlusD": "mobilenet",
    "DeepShuffleNetV3PlusD": "shufflenet",
}


@pytest.fixture(scope="module", params=sorted(CASES))
def pair(request):
    return request.param, build_reference_model(
        request.param, "deepv3plus", memory=False)


def test_trunk_logit_parity(pair):
    arch, net = pair
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        outputs = net(torch.from_numpy(x))
    # eval branch, no memory: [main_out, inter_feature]
    ref = outputs[0].permute(0, 2, 3, 1).numpy()

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(sd)
    real_skips = [s for s in report.skipped
                  if not s.endswith("num_batches_tracked")]
    assert not real_skips, f"converter skipped: {real_skips}"

    mc = ModelConfig(arch=arch, memory=MemoryConfig(enabled=False))
    model = build_model(mc)
    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, xin, jnp.zeros((1, 64, 64), jnp.int32), None,
            train=False, with_aux=True)
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)

    out = jax.jit(
        lambda v, xx: model.apply(v, xx, None, None, train=False,
                                  with_aux=False)
    )(variables, xin)

    diff = np.abs(np.asarray(out["main_out"]) - ref).max()
    assert diff < 2e-3, f"{arch} logit max diff {diff}"
    assert (np.asarray(out["main_out"]).argmax(-1)
            == ref.argmax(-1)).mean() > 0.999


def test_trunk_converter_covers_all_tensors(pair):
    arch, net = pair
    sd = {f"module.{k}": v.numpy() for k, v in net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(sd)
    expected_skips = {k for k in sd if k.endswith("num_batches_tracked")}
    assert set(report.skipped) == expected_skips, (
        set(report.skipped) ^ expected_skips)
