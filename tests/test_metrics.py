"""Golden-value tests for the confusion-matrix/mIoU core (SURVEY.md §7.1)."""

import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.core.metrics import (
    acc_metrics,
    confusion_matrix,
    mean_iu,
    per_class_iu,
)


def _np_fast_hist(label, pred, n):
    """The reference's fast_hist (utils/misc.py:65-70) re-stated in numpy."""
    k = (label >= 0) & (label < n)
    return np.bincount(
        n * label[k].astype(int) + pred[k], minlength=n**2
    ).reshape(n, n)


def test_confusion_matrix_matches_reference_fast_hist():
    rng = np.random.default_rng(0)
    n = 19
    label = rng.integers(0, 256, size=5000)
    label[label > 200] = 255  # ignore pixels
    label = np.where(label < n, label, 255)
    pred = rng.integers(0, n, size=5000)
    ours = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label), n))
    ref = _np_fast_hist(label, pred, n)
    np.testing.assert_array_equal(ours, ref)


def test_perfect_prediction_iou_is_one():
    label = np.tile(np.arange(19), 10)
    hist = confusion_matrix(jnp.asarray(label), jnp.asarray(label), 19)
    iu = np.asarray(per_class_iu(hist))
    np.testing.assert_allclose(iu, 1.0, atol=1e-6)
    assert abs(mean_iu(hist) - 1.0) < 1e-9


def test_known_iou_golden():
    # 2 classes: class0 TP=2 FN=2 FP=1 -> IoU 2/5; class1 TP=1 FN=1 FP=2 -> 1/4
    label = np.array([0, 0, 0, 1, 1, 0])
    pred = np.array([0, 0, 1, 1, 0, 1])
    hist = confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 2)
    iu = np.asarray(per_class_iu(hist))
    np.testing.assert_allclose(iu, [0.4, 0.25], rtol=1e-6)


def test_acc_metrics_shapes():
    rng = np.random.default_rng(1)
    label = rng.integers(0, 19, 1000)
    pred = rng.integers(0, 19, 1000)
    hist = confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 19)
    m = acc_metrics(hist)
    assert m["iu"].shape == (19,)
    assert 0.0 <= m["mean_iu"] <= 1.0
    assert 0.0 <= m["acc"] <= 1.0
