"""Segmentation metrics: streaming confusion matrix, IoU, precision/recall.

Reference semantics: ``fast_hist``/``per_class_iu`` (utils/misc.py:65-73)
accumulate a 19x19 confusion matrix on CPU with ``np.bincount``.  Here the
histogram is a jitted on-device scatter-free computation (one-hot matmul rides
the MXU), accumulated as a jnp carry so evaluation never syncs to host until
the final mIoU readout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jnp.ndarray, label: jnp.ndarray, num_classes: int = 19
) -> jnp.ndarray:
    """Confusion matrix hist[label, pred] over valid pixels.

    Matches ``fast_hist`` (utils/misc.py:65-70): pixels whose *label* is
    outside [0, num_classes) are dropped.  Any flattenable shapes accepted.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    valid = (label >= 0) & (label < num_classes)
    # Encode invalid pixels to a dead bin (num_classes) and slice it off.
    lab = jnp.where(valid, label, num_classes)
    prd = jnp.where(valid, jnp.clip(pred, 0, num_classes - 1), 0)
    # one-hot matmul instead of a scatter-add: an N-element scatter is a
    # serial loop on TPU (ops/select.py); the MXU does the 2M x 20 x 19
    # contraction in well under a millisecond.  bf16 one-hots are exact for
    # 0/1 and the f32 matmul accumulator is exact up to 2^24 counts per
    # cell, so the contraction runs in <=2^22-pixel chunks (statically
    # unrolled) with exact int32 accumulation between chunks.
    classes = jnp.arange(num_classes + 1, dtype=jnp.int32)
    chunk = 1 << 22
    hist = jnp.zeros((num_classes, num_classes), jnp.int32)
    for i in range(0, lab.shape[0], chunk):
        lab_c, prd_c = lab[i:i + chunk], prd[i:i + chunk]
        oh_lab = (lab_c[:, None] == classes[:num_classes]).astype(jnp.bfloat16)
        oh_prd = (prd_c[:, None] == classes[:num_classes]).astype(jnp.bfloat16)
        part = jnp.einsum("nl,np->lp", oh_lab, oh_prd,
                          preferred_element_type=jnp.float32)
        hist = hist + part.astype(jnp.int32)
    return hist


def per_class_iu(hist: jnp.ndarray) -> jnp.ndarray:
    """IoU per class from a confusion matrix (utils/misc.py:72-73)."""
    hist = hist.astype(jnp.float64) if hist.dtype == np.int64 else hist.astype(jnp.float32)
    tp = jnp.diag(hist)
    denom = hist.sum(1) + hist.sum(0) - tp
    return tp / jnp.maximum(denom, 1e-12)


def mean_iu(hist) -> float:
    """Mean IoU over classes that appear (NaN-free)."""
    hist = np.asarray(hist, dtype=np.float64)
    tp = np.diag(hist)
    denom = hist.sum(1) + hist.sum(0) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iu = tp / denom
    return float(np.nanmean(iu))


def acc_metrics(hist) -> dict:
    """Full metric dict matching ``evaluate_eval`` (utils/misc.py:152-303)."""
    hist = np.asarray(hist, dtype=np.float64)
    tp = np.diag(hist)
    sum_rows = hist.sum(axis=1)   # ground-truth counts
    sum_cols = hist.sum(axis=0)   # prediction counts
    with np.errstate(divide="ignore", invalid="ignore"):
        iu = tp / (sum_rows + sum_cols - tp)
        precision = tp / sum_cols
        recall = tp / sum_rows
    acc = tp.sum() / max(hist.sum(), 1e-12)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc_cls = np.nanmean(tp / sum_rows)
    return {
        "iu": iu,
        "precision": precision,
        "recall": recall,
        "mean_iu": float(np.nanmean(iu)),
        "acc": float(acc),
        "acc_cls": float(acc_cls),
    }


def format_class_table(hist, class_names: list[str]) -> str:
    """Per-class IoU/precision/recall table (utils/misc.py:275-303)."""
    m = acc_metrics(hist)
    hist = np.asarray(hist, dtype=np.float64)
    total = max(hist.sum(), 1e-12)
    lines = [
        f"{'label':>4} {'class':>16} {'iu':>8} {'precision':>10} "
        f"{'recall':>8} {'pct-pixels':>11}"
    ]
    for i, name in enumerate(class_names):
        lines.append(
            f"{i:>4} {name:>16} {m['iu'][i] * 100:>7.2f}% "
            f"{m['precision'][i]:>10.3f} {m['recall'][i]:>8.3f} "
            f"{hist[i].sum() / total * 100:>10.2f}%"
        )
    lines.append(f"mean iu: {m['mean_iu'] * 100:.2f}%  acc: {m['acc'] * 100:.2f}%")
    return "\n".join(lines)


streaming_hist = jax.jit(confusion_matrix, static_argnames="num_classes")
