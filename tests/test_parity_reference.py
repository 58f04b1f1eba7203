"""Logit parity against the ACTUAL reference code (VERDICT r1 item 5).

`tests/test_parity_full.py` gates the converter against a hand-restated torch
twin; a transcription error there would pass silently.  This test imports the
real `/root/reference/network/{deepv3plus,Resnet,memory}.py`, builds the live
``DeepR50V3PlusD`` (memory read enabled, gumbel off), converts its state_dict
with ``convert_state_dict``, and requires end-to-end logit parity from the
JAX model -- the strongest available substitute for running a released
checkpoint in this zero-egress environment.

Import shims (environment gaps only, no behavioral stubs on the tested path):
  - ``kmeans1d`` / ``skimage`` / ``datasets`` are absent or heavy; the tested
    forward (eval mode, no whitening, no HideAndSeek) never calls into them.
  - ``cfg.MODEL.BNFUNC`` -> ``nn.BatchNorm2d`` (reference default is
    SyncBatchNorm, which needs a process group; config.py:111-114 makes the
    same swap for apex off).
  - ``.cuda()`` -> identity (CPU-only torch in this image).
  - ``model_zoo.load_url`` -> {} (zero egress; forgiving_state_restore then
    keeps the seeded random init, which is what we compare against).
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
from pinthememory_tpu.models import build_model
from pinthememory_tpu.tools.convert_torch import convert_state_dict, merge_into_variables

REF = "/root/reference"
NUM_CLASSES = 19


def _install_stub_modules():
    if "kmeans1d" not in sys.modules:
        fake = types.ModuleType("kmeans1d")
        fake.cluster = lambda arr, k: ([0] * len(arr), [0.0] * k)
        sys.modules["kmeans1d"] = fake
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        for sub, names in (
            ("filters", ["gaussian"]),
            ("restoration", ["denoise_bilateral"]),
            ("segmentation", ["find_boundaries"]),
            ("util", ["random_noise"]),
        ):
            mod = types.ModuleType(f"skimage.{sub}")
            for n in names:
                setattr(mod, n, lambda *a, **k: None)
            setattr(sk, sub, mod)
            sys.modules[f"skimage.{sub}"] = mod
        sys.modules["skimage"] = sk
    if "torchvision" not in sys.modules:
        # deepv3plus.py imports torchvision.models at module level but only
        # calls it for the wide-resnet trunks; transforms.transforms uses
        # torchvision.transforms inside methods the test never invokes.
        tv = types.ModuleType("torchvision")
        for sub in ("models", "transforms"):
            mod = types.ModuleType(f"torchvision.{sub}")
            mod.__getattr__ = lambda name: (lambda *a, **k: None)
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        sys.modules["torchvision"] = tv
    if "datasets" not in sys.modules:
        # network/__init__.py imports the reference datasets package (heavy,
        # data-dir probing); the model modules only need the class constants.
        ds = types.ModuleType("datasets")
        ds.num_classes = NUM_CLASSES
        ds.ignore_label = 255
        sys.modules["datasets"] = ds


@pytest.fixture(scope="module")
def reference_net():
    _install_stub_modules()
    sys.path.insert(0, REF)
    t_cuda, m_cuda = torch.Tensor.cuda, nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    try:
        from config import cfg

        cfg.immutable(False)
        cfg.MODEL.BNFUNC = nn.BatchNorm2d

        from network import Resnet

        orig_load_url = Resnet.model_zoo.load_url
        Resnet.model_zoo.load_url = lambda *a, **k: {}
        try:
            from network import deepv3plus

            args = types.SimpleNamespace(
                wt_layer=[0] * 7, use_wtloss=False, memory=True,
                mem_slot=NUM_CLASSES, mem_dim=256, mem_momentum=0.8,
                mem_temp=1.0, gumbel_off=True, relax_denom=0.0, clusters=50,
                visualize_feature=False,
            )
            torch.manual_seed(0)
            net = deepv3plus.DeepR50V3PlusD(args, NUM_CLASSES, None, None)
        finally:
            Resnet.model_zoo.load_url = orig_load_url
    finally:
        torch.Tensor.cuda, nn.Module.cuda = t_cuda, m_cuda

    torch.manual_seed(1)
    net.memory.m_items = F.normalize(torch.rand((NUM_CLASSES, 256)), dim=1)
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


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
