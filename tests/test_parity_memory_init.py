"""Memory prototype initialization parity against the ACTUAL reference code.

``MemoryMetaFrameWork.memory_initalize`` (train.py:1000-1042) makes 2
no-grad passes over the train loader, normalizes the pre-memory ASPP output,
bilinearly (align_corners=True) downsamples the one-hot GT (255 -> the extra
slot), accumulates per-class masked sums/counts, and sets
``m_items = normalize(basket / max(count, 1))``.  The rebuild expresses this
as ``make_memory_init_step`` (a jitted scan body) + ``finalize_memory_init``
(train/loops.py:330-350).  This file runs the REAL method -- imported from
/root/reference/train.py, driven through a duck-typed trainer shell so no
NCCL/loaders are needed -- on converted weights and identical batches, and
requires the resulting prototypes to match.
"""

import types

import numpy as np
import torch

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
from pinthememory_tpu.models import build_model
from pinthememory_tpu.train.loops import (
    finalize_memory_init,
    make_memory_init_step,
)
from pinthememory_tpu.tools.convert_torch import (
    convert_state_dict,
    merge_into_variables,
)

from ref_harness import (
    NUM_CLASSES,
    build_reference_deepr50,
    import_reference_module,
    reference_env,
)


class _Loader:
    """Yields FRESH tensor copies every epoch: memory_initalize mutates
    ``gt`` in place after the forward (train.py:1022), which is harmless on
    real CUDA (``.cuda()`` copies) but would alias across epochs under the
    identity-``.cuda()`` patch."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        for x, g in self.batches:
            yield (torch.from_numpy(x.copy()), torch.from_numpy(g.copy()),
                   None, torch.from_numpy(g.copy()))

    def __len__(self):
        return len(self.batches)


class _NetProxy:
    """Stand-in for the DDP wrapper: callable, eval/train, and ``.module``
    (network/__init__.py:25-33) -- deliberately NOT an nn.Module so
    attribute assignment doesn't re-register children."""

    def __init__(self, net):
        self._net = net

    def __call__(self, *a, **k):
        return self._net(*a, **k)

    def eval(self):
        self._net.eval()

    def train(self):
        self._net.train()

    @property
    def module(self):
        return self._net


def _batches(num=3, b=2, d=2, hw=64, seed=17):
    """Domain-stacked (B, D, C, H, W) batches like DomainUniformConcatDataset
    (multi_loader.py:81-102) -- memory_initalize's reshape(-1, C, H, W) is
    exercised for real."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        x = rng.standard_normal((b, d, 3, hw, hw)).astype(np.float32)
        g = rng.integers(0, NUM_CLASSES, (b, d, hw, hw)).astype(np.int64)
        g[rng.random((b, d, hw, hw)) < 0.1] = 255
        out.append((x, g))
    return out


def test_memory_init_prototype_parity():
    train_mod = import_reference_module("train")
    net = build_reference_deepr50(memory=True)

    # convert BEFORE the reference pass (it overwrites m_items in place)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(
        sd, memory=net.memory.m_items.numpy())
    assert not [s for s in report.skipped
                if not s.endswith("num_batches_tracked")]

    batches = _batches()
    shell = types.SimpleNamespace(
        net=_NetProxy(net),
        args=types.SimpleNamespace(mem_slot=NUM_CLASSES, test_mode=False),
        train_loader=_Loader(batches),
    )
    with reference_env(), torch.no_grad():
        train_mod.MemoryMetaFrameWork.memory_initalize(shell)
    ref_protos = net.memory.m_items.numpy()

    # rebuild: same 2-epoch accumulation (train/cli.py memory-init loop)
    mc = ModelConfig(arch="DeepR50V3PlusD",
                     memory=MemoryConfig(enabled=True, gumbel_read=False))
    model = build_model(mc)
    x0 = jnp.zeros((4, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, x0, jnp.zeros((4, 64, 64), jnp.int32),
            jnp.asarray(m_items), train=False, with_aux=True,
            memory_writing=True, rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)

    step = make_memory_init_step(model)
    basket = jnp.zeros((NUM_CLASSES, 256), jnp.float32)
    count = jnp.zeros((NUM_CLASSES,), jnp.float32)
    for _ in range(2):
        for x, g in batches:
            xin = jnp.asarray(
                np.transpose(x.reshape(-1, *x.shape[2:]), (0, 2, 3, 1)))
            gin = jnp.asarray(g.reshape(-1, *g.shape[2:]).astype(np.int32))
            basket, count = step(variables, jnp.asarray(m_items), xin, gin,
                                 basket, count)
    protos = np.asarray(finalize_memory_init(basket, count))

    assert protos.shape == ref_protos.shape
    diff = np.abs(protos - ref_protos).max()
    assert diff < 1e-3, f"prototype max diff {diff}"
    # prototypes are meaningful unit rows on both sides
    np.testing.assert_allclose(np.linalg.norm(protos, axis=1), 1.0, rtol=1e-4)


def test_memory_init_zero_count_class():
    """A class absent from every batch keeps a well-defined (zeroed then
    normalized... reference: count[count==0]=1 -> basket row 0/1 = 0, and
    F.normalize of a zero row is 0 (eps clamp).  Parity on the degenerate
    row."""
    train_mod = import_reference_module("train")
    net = build_reference_deepr50(memory=True)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, m_items, _ = convert_state_dict(
        sd, memory=net.memory.m_items.numpy())

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    g = rng.integers(0, 5, (2, 64, 64)).astype(np.int64)   # classes 5..18 absent
    shell = types.SimpleNamespace(
        net=_NetProxy(net),
        args=types.SimpleNamespace(mem_slot=NUM_CLASSES, test_mode=False),
        train_loader=_Loader([(x, g)]),
    )
    with reference_env(), torch.no_grad():
        train_mod.MemoryMetaFrameWork.memory_initalize(shell)
    ref_protos = net.memory.m_items.numpy()

    mc = ModelConfig(arch="DeepR50V3PlusD",
                     memory=MemoryConfig(enabled=True, gumbel_read=False))
    model = build_model(mc)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, jnp.zeros((2, 64, 64, 3), jnp.float32),
            jnp.zeros((2, 64, 64), jnp.int32), jnp.asarray(m_items),
            train=False, with_aux=True, memory_writing=True,
            rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)
    step = make_memory_init_step(model)
    basket = jnp.zeros((NUM_CLASSES, 256), jnp.float32)
    count = jnp.zeros((NUM_CLASSES,), jnp.float32)
    for _ in range(2):
        basket, count = step(
            variables, jnp.asarray(m_items),
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(g.astype(np.int32)), basket, count)
    protos = np.asarray(finalize_memory_init(basket, count))

    diff = np.abs(protos - ref_protos).max()
    assert diff < 1e-3, f"prototype max diff {diff}"
    # absent classes: all-zero rows on both sides
    assert np.abs(ref_protos[10]).max() == 0 and np.abs(protos[10]).max() == 0
