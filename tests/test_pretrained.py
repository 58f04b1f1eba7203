"""ImageNet-pretrained trunk initialization (reference Resnet.py:499-559).

Synthesizes torchvision-format ResNet state_dicts (the exact key/shape layout
of ``model_zoo.load_url`` payloads) and checks the trunk converter maps every
backbone key in both directions: no torchvision key unmapped (except fc /
num_batches_tracked), and no flax backbone leaf left at its random init.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
from pinthememory_tpu.models import build_model
from pinthememory_tpu.tools.convert_torch import (
    convert_torchvision_trunk,
    load_imagenet_trunk,
    merge_into_variables,
)


def _bn(sd, prefix, c, g):
    sd[f"{prefix}.weight"] = torch.from_numpy(g.standard_normal(c).astype(np.float32))
    sd[f"{prefix}.bias"] = torch.from_numpy(g.standard_normal(c).astype(np.float32))
    sd[f"{prefix}.running_mean"] = torch.from_numpy(
        g.standard_normal(c).astype(np.float32))
    sd[f"{prefix}.running_var"] = torch.from_numpy(
        (g.random(c) + 0.5).astype(np.float32))
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)


def tv_resnet_state_dict(layers, bottleneck=True, seed=0):
    """torchvision ResNet state_dict with correct shapes and random values."""
    g = np.random.default_rng(seed)
    sd = {}

    def conv(name, co, ci, k):
        sd[name] = torch.from_numpy(
            (g.standard_normal((co, ci, k, k)) * 0.05).astype(np.float32))

    conv("conv1.weight", 64, 3, 7)
    _bn(sd, "bn1", 64, g)
    expansion = 4 if bottleneck else 1
    inplanes = 64
    for li, n in enumerate(layers, start=1):
        planes = 64 * 2 ** (li - 1)
        for j in range(n):
            p = f"layer{li}.{j}"
            cin = inplanes if j == 0 else planes * expansion
            if bottleneck:
                conv(f"{p}.conv1.weight", planes, cin, 1)
                _bn(sd, f"{p}.bn1", planes, g)
                conv(f"{p}.conv2.weight", planes, planes, 3)
                _bn(sd, f"{p}.bn2", planes, g)
                conv(f"{p}.conv3.weight", planes * 4, planes, 1)
                _bn(sd, f"{p}.bn3", planes * 4, g)
            else:
                conv(f"{p}.conv1.weight", planes, cin, 3)
                _bn(sd, f"{p}.bn1", planes, g)
                conv(f"{p}.conv2.weight", planes, planes, 3)
                _bn(sd, f"{p}.bn2", planes, g)
            if j == 0 and (li > 1 or bottleneck):
                conv(f"{p}.downsample.0.weight", planes * expansion, cin, 1)
                _bn(sd, f"{p}.downsample.1", planes * expansion, g)
        inplanes = planes * expansion
    sd["fc.weight"] = torch.zeros(1000, inplanes)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def _zeros_variables(arch):
    model = build_model(ModelConfig(arch=arch, memory=MemoryConfig(enabled=False)))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False, with_aux=True))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), model


@pytest.mark.parametrize("arch,layers", [
    ("DeepR50V3PlusD", (3, 4, 6, 3)),
    ("DeepR101V2D", (3, 4, 23, 3)),
])
def test_trunk_converter_full_coverage(arch, layers):
    sd = tv_resnet_state_dict(layers)
    np_sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, stats, report = convert_torchvision_trunk(np_sd)

    # every torchvision key maps except fc + num_batches_tracked
    expected_skips = {k for k in sd
                      if k.startswith("fc.") or k.endswith("num_batches_tracked")}
    assert set(report.skipped) == expected_skips
    assert len(report.mapped) == len(sd) - len(expected_skips)

    # every flax backbone leaf receives a value (zero unmatched keys both ways)
    variables, _ = _zeros_variables(arch)
    merged = merge_into_variables(variables, params, stats)
    leaves_p = jax.tree.leaves(merged["params"]["backbone"])
    leaves_s = jax.tree.leaves(merged["batch_stats"]["backbone"])
    assert leaves_p and leaves_s
    for leaf in leaves_p + leaves_s:
        assert np.abs(np.asarray(leaf)).sum() > 0, "backbone leaf left at init"
    # non-backbone heads untouched
    head = [k for k in merged["params"] if k != "backbone"]
    assert head
    for k in head:
        for leaf in jax.tree.leaves(merged["params"][k]):
            assert np.abs(np.asarray(leaf)).sum() == 0


def test_load_imagenet_trunk_changes_logits(tmp_path):
    sd = tv_resnet_state_dict((2, 2, 2, 2), bottleneck=False)
    path = str(tmp_path / "resnet18-imagenet.pth")
    torch.save(sd, path)

    model = build_model(ModelConfig(arch="DeepR18V3PlusD",
                                    memory=MemoryConfig(enabled=False)))
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False, with_aux=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    before = model.apply(variables, x, train=False, with_aux=False)["main_out"]

    merged, report = load_imagenet_trunk(path, variables)
    assert not any(
        k.startswith(("layer", "conv1", "bn1"))
        and not k.endswith("num_batches_tracked")
        for k in report.skipped
    )
    after = model.apply(merged, x, train=False, with_aux=False)["main_out"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
