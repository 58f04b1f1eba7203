"""MLDG episode gradient parity vs. a torch twin (SURVEY.md §7 hard part #4).

The reference episode (train.py:377-491, memory-free): inner backward on
meta-train accumulates grads, the virtual model is built from *detached*
grads (first-order, train.py:246-260), the outer backward on meta-test
accumulates on top, and SGD consumes the sum.  This test runs the ACTUAL
``make_train_step_mldg`` on a tiny conv net and checks the resulting update
against the torch episode to float tolerance -- catching any accidental
second-order term or a dropped inner-gradient contribution.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pinthememory_tpu.core.config import Config, ModelConfig, OptimConfig, TrainConfig
from pinthememory_tpu.train.loops import make_train_step_mldg
from pinthememory_tpu.train.state import create_train_state

C = 4  # classes
LR = 0.05
INNER_LR = 0.01


class TinyNet(nn.Module):
    """Minimal model exposing the framework's output-dict interface."""

    @nn.compact
    def __call__(self, x, gts=None, m_items=None, *, memory_writing=False,
                 writing_detach=True, train=False, rng=None, with_aux=None):
        y = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), name="c1")(x)
        y = nn.relu(y)
        y = nn.Conv(C, (1, 1), name="c2")(y)
        return {"main_out": y, "aux_out": None, "inter_feature": y,
                "taps": [], "mem": None, "m_items": m_items}


def _torch_twin(params):
    t1 = torch.nn.Conv2d(3, 8, 3, padding=1)
    t2 = torch.nn.Conv2d(8, C, 1)
    with torch.no_grad():
        t1.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["c1"]["kernel"]), (3, 2, 0, 1))))
        t1.bias.copy_(torch.from_numpy(np.asarray(params["c1"]["bias"])))
        t2.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["c2"]["kernel"]), (3, 2, 0, 1))))
        t2.bias.copy_(torch.from_numpy(np.asarray(params["c2"]["bias"])))

    def forward(x, p1w, p1b, p2w, p2b):
        y = F.conv2d(x, p1w, p1b, padding=1)
        return F.conv2d(F.relu(y), p2w, p2b)

    return t1, t2, forward


def test_mldg_step_matches_torch_episode():
    cfg = Config(
        model=ModelConfig(num_classes=C),
        train=TrainConfig(mldg=True, no_aux_loss=True),
        # plain SGD: no momentum/weight decay so the update is -lr * grad
        optim=OptimConfig(lr=LR, momentum=0.0, weight_decay=0.0, poly_exp=0.0),
    )
    model = TinyNet()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, 8, 8, 3)).astype(np.float32)  # (B, D, H, W, 3)
    g = rng.integers(0, C, (2, 2, 8, 8)).astype(np.int32)
    batch = {"image": jnp.asarray(x), "gts": jnp.asarray(g),
             "aux_gts": jnp.asarray(g)}

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x[:, 0]), train=True)
    variables = {"params": variables["params"], "batch_stats": {}}
    state, tx = create_train_state(cfg, variables, None)
    step = make_train_step_mldg(model, cfg, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              (0,), (1,), jnp.float32(INNER_LR))

    # ---- torch episode (train.py:414-443 semantics, memory-free)
    t1, t2, forward = _torch_twin(variables["params"])
    xt = torch.from_numpy(np.transpose(x, (1, 0, 4, 2, 3)))  # (D, B, 3, H, W)
    gt = torch.from_numpy(np.transpose(g, (1, 0, 2, 3))).long()
    meta_train_x, meta_train_y = xt[0], gt[0]
    meta_test_x, meta_test_y = xt[1], gt[1]

    params_t = [t1.weight, t1.bias, t2.weight, t2.bias]
    inner = F.cross_entropy(forward(meta_train_x, *params_t), meta_train_y,
                            ignore_index=255)
    inner.backward()  # grads accumulate on the real params

    # virtual model from DETACHED grads (first-order)
    theta_p = [p - INNER_LR * p.grad.detach() for p in params_t]
    outer = F.cross_entropy(forward(meta_test_x, *theta_p), meta_test_y,
                            ignore_index=255)
    outer.backward()  # accumulates onto the inner grads

    # f32 conv-backward accumulation order differs between XLA and torch;
    # the inner-grad noise propagates through theta' into the outer grads at
    # the few-1e-4 absolute level, so the cross-framework check is loose.
    # The strict second-order-bug discriminator is the same-backend check
    # below, which must match to float-rounding.
    np.testing.assert_allclose(float(metrics["inner"]["total"]), float(inner),
                               rtol=1e-4)
    np.testing.assert_allclose(float(metrics["outer"]["total"]), float(outer),
                               rtol=1e-3)

    expected = {
        "c1": {"kernel": t1.weight - LR * t1.weight.grad,
               "bias": t1.bias - LR * t1.bias.grad},
        "c2": {"kernel": t2.weight - LR * t2.weight.grad,
               "bias": t2.bias - LR * t2.bias.grad},
    }
    for layer in ("c1", "c2"):
        ek = expected[layer]["kernel"].detach().numpy()
        if ek.ndim == 4:
            ek = np.transpose(ek, (2, 3, 1, 0))
        np.testing.assert_allclose(
            np.asarray(new_state.params[layer]["kernel"]), ek,
            rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(new_state.params[layer]["bias"]),
            expected[layer]["bias"].detach().numpy(), rtol=1e-2, atol=1e-3)

    # ---- same-backend strict episode: hand-rolled first-order MLDG in JAX.
    # Any second-order term (missing stop_gradient on the inner grads) or a
    # dropped inner-gradient contribution diverges here far beyond rounding.
    def ce(logits, y):
        logp = jax.nn.log_softmax(logits, -1)
        return -(jax.nn.one_hot(y, C) * logp).sum(-1).mean()

    def fwd(p, xx):
        return model.apply({"params": p, "batch_stats": {}}, xx,
                           train=True)["main_out"]

    p0 = variables["params"]
    xtr, ytr = jnp.asarray(x[:, 0]), jnp.asarray(g[:, 0])
    xte, yte = jnp.asarray(x[:, 1]), jnp.asarray(g[:, 1])
    g_in = jax.grad(lambda p: ce(fwd(p, xtr), ytr))(p0)

    def outer_loss(p):
        gi = jax.grad(lambda q: ce(fwd(q, xtr), ytr))(p)
        theta = jax.tree.map(
            lambda pp, gr: pp - INNER_LR * jax.lax.stop_gradient(gr), p, gi)
        return ce(fwd(theta, xte), yte)

    g_out = jax.grad(outer_loss)(p0)
    exp_jax = jax.tree.map(lambda p, a, b: p - LR * (a + b), p0, g_in, g_out)
    for layer in ("c1", "c2"):
        for k in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(new_state.params[layer][k]),
                np.asarray(exp_jax[layer][k]), rtol=1e-5, atol=1e-7)
