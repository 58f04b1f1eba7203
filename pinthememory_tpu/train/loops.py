"""The four training episodes as pure jitted step functions.

Reference: train.py -- ``train_agg`` (634), ``train_memory_agg`` (284),
``train_mldg`` (377), ``train_memory_mldg`` (493).  The reference realizes
the MLDG episode with three live ``nn.Module`` clones and in-place gradient
buffers; here each episode is a single pure function
``(state, batch, rng) -> (state, metrics)`` whose dataflow makes the episode
explicit:

  inner grad at θ  ->  θ' = θ - lr·sg(g_inner)   (FIRST-order; the reference
  detaches grads at train.py:253)  ->  memory write through θ' with frozen
  encoder  ->  outer loss on held-out domain through θ' and the written
  memory  ->  optimizer step with g_inner + g_outer (the reference does not
  zero grads between the two backwards: train.py:414,422,442-443).

BN batch statistics follow the reference exactly: only the *inner* forward
(on the real net) updates running stats; the clone forwards' updates are
discarded (the clones are never state-synced: train.py:246-277 copies
parameters only).  The post-step "clean" memory write runs in eval mode from
the pre-step memory (train.py:578-583).

Meta splits: the domain permutation split (train.py:199-211) arrives as a
static tuple of domain indices, so XLA compiles one executable per split
pattern (at most D!-ish, 2 for the flagship 2-domain recipe).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import Config
from pinthememory_tpu.models.instance_whitening import instance_whitening_loss
from pinthememory_tpu.models.memory import l2_normalize, write_statistics, momentum_update
from pinthememory_tpu.train.losses import LossBundle, assemble_losses
from pinthememory_tpu.train.state import TrainState


def whitening_loss_from_taps(taps, wt_masks) -> jnp.ndarray:
    """Mean per-layer IW loss (deepv3plus.py:580-587).

    ``wt_masks``: per whitened position (mask_matrix, margin, num_remove) --
    IRW passes all-off-diagonal, ISW the sensitive-entry mask
    (models/cov.py).
    """
    if not taps or wt_masks is None:
        return jnp.zeros((), jnp.float32)
    total = jnp.zeros((), jnp.float32)
    for tap, (mask, margin, num_remove) in zip(taps, wt_masks):
        total = total + instance_whitening_loss(tap, mask, margin, num_remove)
    return total / len(taps)


def _split_params(params: dict, key: str = "memory"):
    """Partition params into (memory-subtree, rest) like the freeze loop at
    train.py:549-552 (everything whose top-level module isn't ``memory``)."""
    mem = {k: v for k, v in params.items() if k == key}
    rest = {k: v for k, v in params.items() if k != key}
    return mem, rest


def _merge_params(mem: dict, rest: dict) -> dict:
    return {**rest, **mem}


def _flatten_domains(batch: dict) -> dict:
    """(B, D, ...) -> (B*D, ...) (train.py:300-304)."""
    out = {}
    for k, v in batch.items():
        if v.ndim >= 3:
            out[k] = v.reshape((-1,) + v.shape[2:])
        else:
            out[k] = v
    return out


def _select_domains(batch: dict, idx: tuple[int, ...]) -> dict:
    """Pick domains (static indices) and flatten: (B, D, ...) -> (B*|idx|, ...).

    The reference transposes to (D, B, ...) then reshapes (train.py:398-410);
    element order differs but batch order is irrelevant to the losses.
    """
    out = {}
    for k, v in batch.items():
        sel = v[:, jnp.array(idx)] if len(idx) > 1 else v[:, idx[0] : idx[0] + 1]
        out[k] = sel.reshape((-1,) + v.shape[2:])
    return out


def make_train_step_agg(model, cfg: Config, tx, donate: bool = False) -> Callable:
    """Aggregation baseline: one CE step over the merged domain batch
    (train.py:634-729), optional in-graph memory write
    (train_memory_agg, train.py:284-374).

    ``donate=True`` donates the input ``state``'s buffers to the outputs
    (XLA aliases params/opt-state/stats in place instead of allocating a
    second copy of the training state and copying results into it).  The
    caller must rebind -- ``state, m = step(state, ...)`` -- and never
    touch the old state object again; the Trainer and bench do exactly
    that.  Off by default so tests can replay one state through several
    step calls.
    """

    use_memory = cfg.model.memory.enabled

    @functools.partial(
        jax.jit, static_argnames=("apply_wtloss", "reduce_border"),
        donate_argnames=("state",) if donate else ())
    def step(state: TrainState, batch: dict, rng: jax.Array,
             wt_masks=None, apply_wtloss: bool = True,
             reduce_border: bool = False):
        flat = _flatten_domains(batch)
        mem_t = state.m_items

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                flat["image"],
                flat["gts"],
                mem_t,
                train=True,
                rng=rng,
                memory_writing=use_memory,
                writing_detach=False,
                mutable=["batch_stats"],
            )
            wt = whitening_loss_from_taps(outputs["taps"], wt_masks)
            losses = assemble_losses(cfg, outputs, flat["gts"], flat["aux_gts"],
                                     wt_loss=wt, apply_wtloss=apply_wtloss,
                                     reduce_border=reduce_border)
            return losses.total, (losses, mutated["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        if use_memory:
            # final clean write in eval mode from the pre-step memory
            # (train.py:330-335)
            out2 = model.apply(
                {"params": new_params, "batch_stats": new_stats},
                flat["image"],
                flat["gts"],
                mem_t,
                train=False,
                memory_writing=True,
                writing_detach=True,
            )
            new_m = out2["m_items"]
        else:
            new_m = mem_t

        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            m_items=new_m,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, losses._asdict()

    return step


def make_train_step_mldg(model, cfg: Config, tx, donate: bool = False) -> Callable:
    """MLDG episode, with or without memory (train.py:377-632).

    Returns ``step(state, batch, rng, train_idx, test_idx, inner_lr)`` where
    the index tuples are static per-call (compiled per split pattern).
    ``donate``: see :func:`make_train_step_agg`.
    """

    use_memory = cfg.model.memory.enabled

    @functools.partial(
        jax.jit,
        static_argnames=("train_idx", "test_idx", "apply_wtloss",
                         "reduce_border"),
        donate_argnames=("state",) if donate else (),
    )
    def step(
        state: TrainState,
        batch: dict,
        rng: jax.Array,
        train_idx: tuple[int, ...],
        test_idx: tuple[int, ...],
        inner_lr: jnp.ndarray,
        wt_masks=None,
        apply_wtloss: bool = True,
        reduce_border: bool = False,
    ):
        rng_inner, rng_write, rng_outer = jax.random.split(rng, 3)
        meta_train = _select_domains(batch, train_idx)
        meta_test = _select_domains(batch, test_idx)
        mem_t = state.m_items

        # ---- inner step on meta-train at θ
        def inner_loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                meta_train["image"],
                meta_train["gts"],
                mem_t,
                train=True,
                rng=rng_inner,
                memory_writing=use_memory,
                writing_detach=False,
                mutable=["batch_stats"],
            )
            wt = whitening_loss_from_taps(outputs["taps"], wt_masks)
            losses = assemble_losses(
                cfg, outputs, meta_train["gts"], meta_train["aux_gts"],
                wt_loss=wt, apply_wtloss=apply_wtloss,
                reduce_border=reduce_border,
            )
            return losses.total, (losses, mutated["batch_stats"])

        (_, (inner_losses, new_stats)), g_inner = jax.value_and_grad(
            inner_loss_fn, has_aux=True
        )(state.params)

        # ---- outer loss through the virtual model θ' = θ - lr·sg(g_inner)
        def outer_loss_fn(params):
            g_const = jax.lax.stop_gradient(g_inner)
            theta_p = jax.tree.map(lambda p, g: p - inner_lr * g, params, g_const)

            if use_memory:
                # memory-write substep: encoder frozen, memory params live
                # (train.py:546-558)
                mem_sub, rest_sub = _split_params(theta_p)
                frozen = _merge_params(mem_sub, jax.lax.stop_gradient(rest_sub))
                # clone-net BN stat updates are discarded (the reference's
                # updated_net2 stats are never copied back, train.py:246-277)
                out_w, _ = model.apply(
                    {"params": frozen, "batch_stats": new_stats},
                    meta_train["image"],
                    meta_train["gts"],
                    mem_t,
                    train=True,
                    rng=rng_write,
                    memory_writing=True,
                    writing_detach=False,
                    mutable=["batch_stats"],
                )
                m_prime = out_w["m_items"]
            else:
                m_prime = mem_t

            outputs, _ = model.apply(
                {"params": theta_p, "batch_stats": new_stats},
                meta_test["image"],
                meta_test["gts"],
                m_prime,
                train=True,
                rng=rng_outer,
                memory_writing=False,
                mutable=["batch_stats"],
            )
            wt = whitening_loss_from_taps(outputs["taps"], wt_masks)
            losses = assemble_losses(cfg, outputs, meta_test["gts"], meta_test["aux_gts"],
                                     wt_loss=wt, apply_wtloss=apply_wtloss,
                                     reduce_border=reduce_border)
            return losses.total, losses

        (_, outer_losses), g_outer = jax.value_and_grad(outer_loss_fn, has_aux=True)(
            state.params
        )

        # optimizer step on the SUM of inner+outer grads (train.py:414-443)
        grads = jax.tree.map(lambda a, b: a + b, g_inner, g_outer)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        if use_memory:
            # no-grad final write in eval mode from the initial memory
            # (train.py:578-583)
            out2 = model.apply(
                {"params": new_params, "batch_stats": new_stats},
                meta_train["image"],
                meta_train["gts"],
                mem_t,
                train=False,
                memory_writing=True,
                writing_detach=True,
            )
            new_m = out2["m_items"]
        else:
            new_m = mem_t

        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            m_items=new_m,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = {
            "inner": inner_losses._asdict(),
            "outer": outer_losses._asdict(),
        }
        return new_state, metrics

    return step


def make_eval_step(model, cfg: Config) -> Callable:
    """Whole-image eval forward returning logits (for validate())."""

    @jax.jit
    def step(state: TrainState, image: jnp.ndarray):
        outputs = model.apply(
            state.variables(), image, None, state.m_items, train=False,
            with_aux=False,
        )
        return outputs["main_out"]

    return step


def make_covstat_step(model) -> Callable:
    """ISW covariance-statistics pass (train.py:941-974 +
    deepv3plus.py:542-553): forward [photometric-aug, original] pairs in
    eval mode and return each whitening tap's variance-of-covariance."""
    from pinthememory_tpu.models.instance_whitening import covariance_variance_update

    @jax.jit
    def step(variables: dict, m_items, img_aug, img_orig):
        x = jnp.concatenate([img_aug, img_orig], axis=0)
        outputs = model.apply(
            variables, x, None, m_items, train=False, with_aux=False
        )
        return [covariance_variance_update(t) for t in outputs["taps"]]

    return step


def make_memory_init_step(model) -> Callable:
    """One accumulation step of prototype initialization
    (train.py:1000-1042): eval-mode forward, normalized pre-memory features,
    GT-masked sums."""

    @jax.jit
    def step(variables: dict, m_items, image, gts, basket, count):
        outputs = model.apply(
            variables, image, gts, m_items, train=False, with_aux=False
        )
        q = l2_normalize(outputs["inter_feature"], axis=-1)
        nom, den = write_statistics(q, gts, basket.shape[0])
        return basket + nom, count + den

    return step


def finalize_memory_init(basket: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """prototypes = normalize(basket / max(count, 1)) (train.py:1038-1040)."""
    count = jnp.where(count == 0, 1.0, count)
    return l2_normalize(basket / count[:, None], axis=1)


def meta_split(rng, num_domains: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Random meta-train/meta-test domain split (train.py:199-211).

    Host-side (numpy) randomness: the result is a static jit argument.
    """
    import numpy as np

    perm = np.asarray(rng.permutation(num_domains))
    i = int(rng.integers(1, num_domains))
    return tuple(int(x) for x in perm[:i]), tuple(int(x) for x in perm[i:])


def select_meta_images(image, te: tuple[int, ...]):
    """Resolve a (B, D, 2, H, W, C) meta-pair batch (emit_meta_pair mode)
    to (B, D, H, W, C): hard-augmented version (index 1) for the episode's
    meta-test domains ``te``, normal version (index 0) elsewhere.

    Host-side numpy: runs before device transfer, so only the selected
    images cross PCIe/ICI.
    """
    import numpy as np

    if image.ndim != 6:
        return image
    d = image.shape[1]
    sel = np.zeros(d, np.int64)
    sel[list(te)] = 1
    return image[:, np.arange(d), sel]


def make_train_step_per_domain(model, cfg: Config, tx_unscaled,
                               donate: bool = False) -> Callable:
    """Per-domain episode (reference ``train_robustnetver``, train.py:729-845).

    Unreachable from the reference's ``do_epoch`` dispatch (SURVEY.md §2.1
    marks it dead) but part of the inventory: every iteration loops over the
    source domains, taking one full optimizer step per domain on
    ``main + 0.4·aux (+ wt_reg·wt)`` -- no memory write, no meta episode.
    The LR scheduler ticks once per *iteration* (train.py:840), not once per
    optimizer step, so this step uses the unscaled SGD transformation (decay
    + momentum trace) and applies the iteration LR explicitly.
    """

    from pinthememory_tpu.train.optim import lr_schedule

    lr_fn = lr_schedule(cfg.optim)
    aux_w = 0.0 if cfg.train.no_aux_loss else cfg.train.aux_loss_weight
    use_wt = cfg.model.whitening.use_wtloss
    wt_w = cfg.model.whitening.wt_reg_weight

    @functools.partial(
        jax.jit, static_argnames=("apply_wtloss", "reduce_border"),
        donate_argnames=("state",) if donate else ())
    def step(state: TrainState, batch: dict, rng: jax.Array,
             wt_masks=None, apply_wtloss: bool = True,
             reduce_border: bool = False):
        num_domains = batch["image"].shape[1]
        lr = lr_fn(state.step)
        params, stats, opt = state.params, state.batch_stats, state.opt_state
        acc = None

        for di in range(num_domains):  # static unroll, one step per domain
            dom = _select_domains(batch, (di,))
            rng, sub = jax.random.split(rng)

            def loss_fn(p, stats=stats, dom=dom, sub=sub):
                outputs, mutated = model.apply(
                    {"params": p, "batch_stats": stats},
                    dom["image"],
                    dom["gts"],
                    state.m_items,
                    train=True,
                    rng=sub,
                    memory_writing=False,  # robustnetver never writes memory
                    mutable=["batch_stats"],
                )
                wt = whitening_loss_from_taps(outputs["taps"], wt_masks)
                bundle = assemble_losses(
                    cfg, outputs, dom["gts"], dom["aux_gts"],
                    wt_loss=wt, apply_wtloss=apply_wtloss,
                    reduce_border=reduce_border)
                # robustnetver total = main + 0.4·aux + wt_reg·wt only
                # (train.py:786-796): memory read losses are NOT summed.
                total = bundle.main + aux_w * bundle.aux
                if use_wt:
                    total = total + wt_w * wt * (1.0 if apply_wtloss else 0.0)
                return total, (bundle, mutated["batch_stats"])

            (total, (bundle, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt = tx_unscaled.update(grads, opt, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            # log the running average across domain steps of the loss that
            # was actually optimized (the reference's train_total_loss meter,
            # train.py:786-806) -- bundle.total would include memory terms
            # that are not in this episode's gradient
            dom_metrics = bundle._asdict()
            dom_metrics["total"] = total
            acc = dom_metrics if acc is None else jax.tree.map(
                lambda a, b: a + b, acc, dom_metrics)

        metrics = jax.tree.map(lambda v: v / num_domains, acc)
        new_state = TrainState(
            params=params,
            batch_stats=stats,
            m_items=state.m_items,
            opt_state=opt,
            step=state.step + 1,
        )
        return new_state, metrics

    return step
