"""--restore_optimizer parity from a reference .pth: continuation
equivalence against the ACTUAL reference optimizer code on the real model.

The reference resumes torch-SGD momentum buffers and the LambdaLR step from
the checkpoint (optimizer.py:45-56); the rebuild converts them into optax
state (tools/convert_torch.convert_optimizer_state +
utils/checkpoint.load_torch_optimizer_state).  Correctness is proven by
CONTINUATION: train the real model 3 steps with scripted gradients, save a
reference-format checkpoint, restore it on both sides, take 2 more identical
steps, and require the full parameter trees to still match -- which is only
possible if every momentum buffer landed on the right (transposed) parameter
and the schedule count carried over.
"""

import types

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from pinthememory_tpu.core.config import OptimConfig
from pinthememory_tpu.tools.convert_torch import (
    convert_state_dict,
    merge_into_variables,
)
from pinthememory_tpu.train.optim import make_optimizer
from pinthememory_tpu.utils.checkpoint import load_torch_optimizer_state

from ref_harness import (
    build_reference_deepr50,
    import_reference_module,
    reference_env,
)

LR, POLY = 0.01, 9.0
PRE_STEPS, POST_STEPS = 3, 2


def _grads_for(net, t):
    """Scripted per-parameter gradients, index-keyed by named_parameters
    order (the same order torch's optimizer state uses)."""
    out = {}
    for i, (name, p) in enumerate(net.named_parameters()):
        rng = np.random.default_rng(i * 7919 + t)
        out[name] = (rng.standard_normal(tuple(p.shape)) * 0.1).astype(np.float32)
    return out


def test_restore_optimizer_continuation(tmp_path):
    ref_optim = import_reference_module("optimizer")
    net = build_reference_deepr50(memory=True)
    args = types.SimpleNamespace(sgd=True, lr=LR, momentum=0.9, poly_exp=POLY)
    with reference_env():
        optimizer, scheduler = ref_optim.get_optimizer(args, net)

    def torch_step(t):
        for name, p in net.named_parameters():
            p.grad = torch.from_numpy(_grads_for(net, t)[name])
        optimizer.step()
        scheduler.step()

    for t in range(PRE_STEPS):
        torch_step(t)

    # reference checkpoint payload (utils/misc.py:206-216)
    path = str(tmp_path / "snap.pth")
    torch.save({
        "state_dict": net.state_dict(),
        "optimizer": optimizer.state_dict(),
        "scheduler": scheduler.state_dict(),
        "epoch": 7,
        "mean_iu": 0.5,
        "memory": net.memory.m_items,
    }, path)

    # rebuild side: params from the ckpt, optimizer state restored
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, _m, report = convert_state_dict(sd)
    assert not [s for s in report.skipped
                if not s.endswith("num_batches_tracked")]
    jparams = jax.tree.map(jnp.asarray, params)

    tx = make_optimizer(OptimConfig(lr=LR, poly_exp=POLY))
    opt_state, count, epoch, mean_iu = load_torch_optimizer_state(
        path, jparams, tx)
    assert count == PRE_STEPS and epoch == 7 and abs(mean_iu - 0.5) < 1e-9
    # schedule count restored -> next lr continues the decay
    sched_states = [el for el in opt_state
                    if isinstance(el, optax.ScaleByScheduleState)]
    assert sched_states and int(sched_states[0].count) == PRE_STEPS

    # continuation: identical scripted steps on both sides
    for t in range(PRE_STEPS, PRE_STEPS + POST_STEPS):
        g = _grads_for(net, t)
        gp, gs, _gm, _rep = convert_state_dict(g)
        assert not any(gs.values())
        zeros = jax.tree.map(jnp.zeros_like, jparams)
        jgrads = merge_into_variables({"params": zeros}, gp, {})["params"]
        updates, opt_state = tx.update(jgrads, opt_state, jparams)
        jparams = optax.apply_updates(jparams, updates)
        torch_step(t)

    ref_params, _stats, _m, _rep = convert_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()})

    flat_ours = jax.tree_util.tree_leaves_with_path(jparams)
    flat_ref = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(
                    jax.tree.map(jnp.asarray, ref_params))}
    assert len(flat_ours) == len(flat_ref)
    for key, ours in flat_ours:
        ks = jax.tree_util.keystr(key)
        diff = float(jnp.abs(ours - flat_ref[ks]).max())
        assert diff < 1e-5, (ks, diff)


def test_restore_without_momentum_state(tmp_path):
    """A checkpoint saved before any optimizer.step() has an EMPTY state
    dict -- restore must produce zero momenta and count 0."""
    ref_optim = import_reference_module("optimizer")
    net = build_reference_deepr50(memory=True)
    args = types.SimpleNamespace(sgd=True, lr=LR, momentum=0.9, poly_exp=POLY)
    with reference_env():
        optimizer, scheduler = ref_optim.get_optimizer(args, net)
    path = str(tmp_path / "fresh.pth")
    torch.save({
        "state_dict": net.state_dict(),
        "optimizer": optimizer.state_dict(),
        "scheduler": scheduler.state_dict(),
        "epoch": 0,
        "mean_iu": 0.0,
    }, path)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, *_ = convert_state_dict(sd)
    jparams = jax.tree.map(jnp.asarray, params)
    tx = make_optimizer(OptimConfig(lr=LR, poly_exp=POLY))
    opt_state, count, epoch, _ = load_torch_optimizer_state(path, jparams, tx)
    assert count == 0 and epoch == 0
    traces = [el for el in opt_state if isinstance(el, optax.TraceState)]
    assert traces
    assert all(float(jnp.abs(leaf).max()) == 0.0
               for leaf in jax.tree.leaves(traces[0].trace))
