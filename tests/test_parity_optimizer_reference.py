"""Optimizer + LR-schedule parity against the ACTUAL reference optimizer.py.

The reference trains with torch.optim.SGD(momentum=0.9, weight_decay=5e-4,
nesterov=False) and a LambdaLR ``exp(-poly_exp * iter / 120000)`` stepped
once per iteration (optimizer.py:11-30, train.py:370/483/624/721).  torch
SGD couples weight decay INTO the momentum buffer (d = g + wd*p;
buf = mu*buf + d; p -= lr*buf) -- a composition that optax only reproduces
with the decay stage before the trace and the lr scaling after.  This file
runs the real ``get_optimizer`` on a toy torch model with scripted gradients
and requires the rebuild's optax chain to track the parameter trajectory
and the lr sequence step-for-step.
"""

import types

import numpy as np
import torch

import jax.numpy as jnp
import optax

from pinthememory_tpu.core.config import OptimConfig
from pinthememory_tpu.train.optim import lr_schedule, make_optimizer

from ref_harness import import_reference_module, reference_env

STEPS = 7
POLY_EXP = 9.0
LR = 0.01


def _scripted_grad(shape, t, seed):
    rng = np.random.default_rng(seed * 1000 + t)
    return rng.standard_normal(shape).astype(np.float32)


def test_sgd_trajectory_parity():
    ref_optim = import_reference_module("optimizer")
    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Conv2d(2, 3, 1), torch.nn.Linear(4, 5))
    args = types.SimpleNamespace(sgd=True, lr=LR, momentum=0.9,
                                 poly_exp=POLY_EXP)
    with reference_env():
        optimizer, scheduler = ref_optim.get_optimizer(args, net)

    params0 = {i: p.detach().clone().numpy()
               for i, p in enumerate(net.parameters())}
    shapes = {i: p.shape for i, p in enumerate(net.parameters())}

    ref_traj, ref_lrs = [], []
    for t in range(STEPS):
        ref_lrs.append(optimizer.param_groups[0]["lr"])
        for i, p in enumerate(net.parameters()):
            p.grad = torch.from_numpy(_scripted_grad(shapes[i], t, i))
        optimizer.step()
        scheduler.step()
        ref_traj.append({i: p.detach().clone().numpy()
                         for i, p in enumerate(net.parameters())})

    oc = OptimConfig(lr=LR, poly_exp=POLY_EXP)
    tx = make_optimizer(oc)
    params = {i: jnp.asarray(v) for i, v in params0.items()}
    state = tx.init(params)
    sched = lr_schedule(oc)
    for t in range(STEPS):
        # f32 schedule vs torch's f64 lambda: relative agreement
        assert abs(float(sched(t)) - ref_lrs[t]) < 1e-6 * ref_lrs[t] + 1e-10
        grads = {i: jnp.asarray(_scripted_grad(shapes[i], t, i))
                 for i in shapes}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        for i in shapes:
            diff = np.abs(np.asarray(params[i]) - ref_traj[t][i]).max()
            assert diff < 1e-6, (t, i, diff)


def test_schedule_ignores_max_iter():
    """The denominator is hardcoded 120000 in the reference regardless of
    max_iter (optimizer.py:29); pin the values at landmark iterations."""
    import math

    sched = lr_schedule(OptimConfig(lr=LR, poly_exp=POLY_EXP))
    for it in (0, 1, 1000, 60000, 120000, 240000):
        ref = LR * math.exp(-POLY_EXP * it / 120000)
        assert abs(float(sched(it)) - ref) < 1e-6 * ref + 1e-10, it
