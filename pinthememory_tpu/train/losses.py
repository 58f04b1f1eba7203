"""Segmentation losses and total-loss assembly.

Reference: loss.py (criteria) and train.py:213-244 (``calculate_loss``
weighting: total = main + 0.4*aux + wt_reg*wt + 0.02*read + 0.4*div +
0.2*cls).  The reference computes losses inside the model forward; here they
are pure functions over the model's output dict.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import Config
from pinthememory_tpu.ops.resize import resize_labels_nearest
from pinthememory_tpu.ops.select import one_hot_select

# torch-standard Cityscapes class weights (loss.py:21-23)
CLASS_WEIGHTS_19 = jnp.array(
    [0.8373, 0.9180, 0.8660, 1.0345, 1.0166, 0.9969, 0.9754,
     1.0489, 0.8786, 1.0023, 0.9539, 0.9843, 1.1116, 0.9037,
     1.0865, 1.0955, 1.0865, 1.1529, 1.0507],
    dtype=jnp.float32,
)


def cross_entropy_2d(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean CE over valid pixels, NHWC logits, int labels.

    Matches ``nn.CrossEntropyLoss(weight, reduction='mean', ignore_index)``:
    with class weights the mean is weighted by the per-pixel class weight
    (torch divides by the summed weights of contributing pixels).
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    valid = (labels != ignore_index) & (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -one_hot_select(logp, safe)
    if class_weights is not None:
        wpix = one_hot_select(
            jnp.broadcast_to(class_weights.astype(jnp.float32), logp.shape),
            safe)
        nll = nll * wpix
        denom = jnp.sum(jnp.where(valid, wpix, 0.0))
    else:
        denom = jnp.sum(valid)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(denom, 1e-12)


def _class_histogram(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Scatter-free class histogram over all elements of ``labels``
    (a 2M-index scatter-add is a serial loop on TPU, see one_hot_select)."""
    in_range = (labels >= 0) & (labels < num_classes)
    safe = jnp.where(in_range, labels, num_classes).reshape(-1)
    return jnp.sum(
        (safe[:, None] == jnp.arange(num_classes)).astype(jnp.float32),
        axis=0)


def _histogram_weights(hist: jnp.ndarray, upper_bound: float,
                       norm: bool) -> jnp.ndarray:
    """``(hist != 0) * ub * (1 - density) + 1`` (loss.py:136-146)."""
    total = jnp.maximum(jnp.sum(hist), 1.0)
    density = hist / total
    if norm:
        return jnp.where(
            hist != 0, upper_bound / jnp.maximum(density, 1e-12), 0.0) + 1.0
    return (hist != 0) * upper_bound * (1.0 - density) + 1.0


def image_weighted_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int = 19,
    upper_bound: float = 1.0,
    ignore_index: int = 255,
    norm: bool = False,
    batch_weights: bool = False,
) -> jnp.ndarray:
    """Per-image histogram-weighted NLL (loss.py:120-163).

    Reference computes a normalized class histogram per image on CPU
    (np.histogram(..., normed=True)) and weights classes by
    ``(hist != 0) * ub * (1 - hist) + 1``; the per-image losses are summed.
    Here the histogram is computed on device.  NB the reference histogram
    normalization is a *density* over bin width 1, i.e. hist/total counting
    every pixel (ignore pixels fall outside bins).

    ``batch_weights`` (cfg.BATCH_WEIGHTING, --batch_weighting): one weight
    vector from the WHOLE batch histogram instead of per image
    (loss.py:151-154); the per-image losses are still summed.
    """
    shared_w = (_histogram_weights(_class_histogram(labels, num_classes),
                                   upper_bound, norm)
                if batch_weights else None)

    def one(lg, lb):
        w = (shared_w if shared_w is not None else
             _histogram_weights(_class_histogram(lb, num_classes),
                                upper_bound, norm))
        return cross_entropy_2d(lg[None], lb[None], ignore_index, w)

    losses = jax.vmap(one)(logits, labels)
    return jnp.sum(losses)


def img_wt_soft_nll(
    logits: jnp.ndarray,
    multihot: jnp.ndarray,
    upper_bound: float = 1.0,
    norm: bool = False,
    batch_weights: bool = False,
    reduce_border: bool = False,
) -> jnp.ndarray:
    """Border-relaxed multi-hot NLL (loss.py:182-263, ImgWtLossSoftNLL).

    logits: (B, H, W, C); multihot: (B, H, W, C+1) from
    :func:`pinthememory_tpu.data.transforms.relaxed_boundary_multihot`
    (ignore in the last channel).  Per-pixel: log of max(softmax,
    mask * masked-softmax-sum) summed over target classes, scaled by the
    per-image class weights and divided by the border multiplicity.

    ``batch_weights`` (cfg.BATCH_WEIGHTING): one class-weight vector from
    the whole-batch multihot histogram (loss.py:208-218, axis (0,2,3)).

    ``reduce_border`` (cfg.REDUCE_BORDER_ITER < cfg.ITER, loss.py:226-228):
    the border weights INVERT (the per-pixel scale becomes ×multiplicity
    instead of ÷multiplicity) and the multihot target is clamped to 1 for
    the loss terms — but the border weights and the class histogram keep
    the pre-clamp values (with the boundary-doubled 2s), exactly as the
    reference computes them before ``custom_nll`` mutates the target.
    """
    t_orig = multihot[..., :-1].astype(jnp.float32)     # (B, H, W, C)
    border_weights = jnp.sum(t_orig, axis=-1)           # multiplicity
    ignore = border_weights == 0
    bw = jnp.where(ignore, 1.0, border_weights)
    t = jnp.minimum(t_orig, 1.0) if reduce_border else t_orig

    soft = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    masked_sum = jnp.sum(soft * t, axis=-1, keepdims=True)
    custom = jnp.log(jnp.maximum(soft, t * masked_sum) + 1e-30)

    # class weights from the PRE-CLAMP multihot histogram (loss.py:208-218)
    if batch_weights:
        hist = jnp.sum(multihot.astype(jnp.float32), axis=(0, 1, 2))  # (C+1,)
        hist = hist / jnp.maximum(jnp.sum(hist), 1.0)
        hist = hist[None]                               # (1, C+1) broadcast
    else:
        hist = jnp.sum(multihot.astype(jnp.float32), axis=(1, 2))    # (B, C+1)
        hist = hist / jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), 1.0)
    if norm:
        cw = jnp.where(hist != 0, upper_bound / jnp.maximum(hist, 1e-12), 0.0) + 1.0
    else:
        cw = (hist != 0) * upper_bound * (1.0 - hist) + 1.0
    cw = cw[:, :-1][:, None, None, :]                   # (B|1, 1, 1, C)

    scale = bw if reduce_border else 1.0 / bw
    loss_matrix = -scale * jnp.sum(t * cw * custom, axis=-1)
    loss_matrix = jnp.where(ignore, 0.0, loss_matrix)

    # reference normalizes PER IMAGE -- custom_nll is called with a batch of
    # one, so denom_i = (1*H*W - mask_i.sum() + 1) -- then means over the
    # batch (loss.py:246-263); a combined denominator diverges whenever the
    # ignore count varies across the batch
    _, h, w = border_weights.shape
    per_img = jnp.sum(loss_matrix, axis=(1, 2)) / (
        h * w - jnp.sum(ignore, axis=(1, 2)) + 1.0)
    return jnp.mean(per_img)


class LossBundle(NamedTuple):
    total: jnp.ndarray
    main: jnp.ndarray
    aux: jnp.ndarray
    wt: jnp.ndarray
    read: jnp.ndarray
    div: jnp.ndarray
    cls: jnp.ndarray


def main_criterion(cfg: Config, reduce_border: bool = False):
    """Criterion selection (loss.py:14-43).

    ``reduce_border`` is the per-epoch ``cfg.ITER > cfg.REDUCE_BORDER_ITER``
    flip (loss.py:226, cfg.ITER updated once per epoch at train.py:147-149);
    the trainer passes it as a static jit argument.
    """
    t = cfg.train

    if t.jointwtborder:
        # border-relaxed path: gts must be multi-hot (B, H, W, C+1) produced
        # by data.transforms.relaxed_boundary_multihot.  Incompatible with
        # the memory write (which needs integer class masks) -- the
        # reference never combines them either.
        assert not cfg.model.memory.enabled, (
            "jointwtborder and memory are mutually exclusive"
        )

        def crit(logits, multihot):
            return img_wt_soft_nll(logits, multihot, t.wt_bound,
                                   batch_weights=t.batch_weighting,
                                   reduce_border=reduce_border)

        return crit

    if t.img_wt_loss:
        def crit(logits, labels):
            return image_weighted_cross_entropy(
                logits, labels, cfg.model.num_classes, t.wt_bound,
                batch_weights=t.batch_weighting,
            )
        return crit
    weights = CLASS_WEIGHTS_19 if t.cls_wt_loss else None

    def crit(logits, labels):
        return cross_entropy_2d(logits, labels, class_weights=weights)

    return crit


def aux_criterion(cfg: Config):
    """Aux CE; the reference optionally class-weights it the same way
    (loss.py:71-88)."""
    weights = CLASS_WEIGHTS_19 if cfg.train.cls_wt_loss else None

    def crit(logits, labels):
        return cross_entropy_2d(logits, labels, class_weights=weights)

    return crit


def assemble_losses(
    cfg: Config,
    outputs: dict,
    gts: jnp.ndarray,
    aux_gts: jnp.ndarray,
    wt_loss: jnp.ndarray | None = None,
    apply_wtloss: bool = True,
    reduce_border: bool = False,
) -> LossBundle:
    """Total-loss assembly mirroring calculate_loss (train.py:213-244)."""
    t = cfg.train
    main = main_criterion(cfg, reduce_border)(outputs["main_out"], gts)

    if outputs.get("aux_out") is not None:
        aux_small = resize_labels_nearest(aux_gts, outputs["aux_out"].shape[1:3])
        aux = aux_criterion(cfg)(outputs["aux_out"], aux_small)
    else:
        aux = jnp.zeros((), jnp.float32)

    aux_w = 0.0 if t.no_aux_loss else t.aux_loss_weight
    total = main + aux_w * aux

    wt = wt_loss if wt_loss is not None else jnp.zeros((), jnp.float32)
    if cfg.model.whitening.use_wtloss and apply_wtloss:
        total = total + cfg.model.whitening.wt_reg_weight * wt

    mem = outputs.get("mem")
    if mem is not None:
        total = (
            total
            + t.mem_readloss * mem.read_loss
            + t.mem_divloss * mem.div_loss
            + t.mem_clsloss * mem.cls_loss
        )
        read, div, cls = mem.read_loss, mem.div_loss, mem.cls_loss
    else:
        z = jnp.zeros((), jnp.float32)
        read, div, cls = z, z, z

    return LossBundle(total, main, aux, wt, read, div, cls)
