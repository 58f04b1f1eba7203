"""Optimizer + LR schedule (reference: optimizer.py:11-30).

SGD(momentum=0.9, weight_decay=5e-4, nesterov=False) over *all* parameters,
with the exponential schedule ``lr * exp(-poly_exp * step / 120000)`` --
the denominator is hardcoded 120000 in the reference regardless of max_iter
(optimizer.py:29), which we preserve via ``schedule_denom``.

torch-SGD semantics: weight decay is added to the gradient *before* the
momentum buffer update, and the step is ``p -= lr * buf``.  optax's
``sgd(momentum)`` + ``add_decayed_weights`` composes to exactly this when
decay is applied first and the lr scaling last.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from pinthememory_tpu.core.config import OptimConfig


def lr_schedule(oc: OptimConfig):
    def fn(step):
        return oc.lr * jnp.exp(-oc.poly_exp * step / oc.schedule_denom)

    return fn


def make_optimizer(oc: OptimConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(oc.weight_decay),
        optax.trace(decay=oc.momentum, nesterov=oc.nesterov),
        optax.scale_by_learning_rate(lr_schedule(oc)),
    )


def sgd_step(params, grads, lr: float, momentum_buf=None, momentum: float = 0.0):
    """One plain (momentum-free when buf None) SGD step: θ' = θ - lr*g.

    Used for the MLDG inner update (train.py:246-260), which is a *first
    order* step on detached gradients -- no optimizer state involved.
    """
    import jax

    if momentum_buf is None:
        return jax.tree.map(lambda p, g: p - lr * g, params, grads)
    new_buf = jax.tree.map(lambda b, g: momentum * b + g, momentum_buf, grads)
    new_params = jax.tree.map(lambda p, b: p - lr * b, params, new_buf)
    return new_params, new_buf


def make_optimizer_unscaled(oc: OptimConfig) -> optax.GradientTransformation:
    """SGD *without* the LR scaling stage (decay + momentum trace only).

    Used by the per-domain episode (reference ``train_robustnetver``,
    train.py:729-845), which takes one optimizer step per source domain per
    iteration but ticks the LR scheduler once per *iteration* -- so the LR
    is applied outside the transformation, from the iteration counter.
    """
    return optax.chain(
        optax.add_decayed_weights(oc.weight_decay),
        optax.trace(decay=oc.momentum, nesterov=oc.nesterov),
    )
