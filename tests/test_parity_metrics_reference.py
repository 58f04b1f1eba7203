"""Gate core/metrics against the ACTUAL reference utils/misc.py.

Imports the real ``fast_hist`` / ``per_class_iu`` /
``evaluate_eval_for_inference`` (utils/misc.py:65-73, 132-150) and asserts the
rebuild's on-device confusion matrix and summary metrics reproduce them
exactly on random prediction/label maps (including ignore-label 255 and
absent classes, where the reference emits NaN IoUs that nanmean drops).
"""

from __future__ import annotations

import numpy as np
import pytest

from pinthememory_tpu.core import metrics as M

from ref_harness import import_reference_module


@pytest.fixture(scope="module")
def ref_misc():
    return import_reference_module("utils.misc")


def _rand_maps(seed, num_classes=19, absent=()):
    rng = np.random.RandomState(seed)
    pred = rng.randint(0, num_classes, size=(3, 64, 96))
    label = rng.randint(0, num_classes, size=(3, 64, 96))
    label[rng.rand(*label.shape) < 0.15] = 255  # ignore pixels
    for c in absent:  # classes missing from GT -> NaN rows in reference IoU
        label[label == c] = (c + 1) % num_classes
    return pred, label


@pytest.mark.parametrize("seed,absent", [(0, ()), (1, (3, 7)), (2, (0,))])
def test_confusion_matrix_matches_real_fast_hist(ref_misc, seed, absent):
    pred, label = _rand_maps(seed, absent=absent)
    ref = ref_misc.fast_hist(pred.flatten(), label.flatten(), 19)
    got = np.asarray(M.streaming_hist(pred, label, num_classes=19))
    np.testing.assert_array_equal(got, ref)


def test_per_class_iu_matches_real_reference(ref_misc):
    pred, label = _rand_maps(3, absent=(5,))
    hist = ref_misc.fast_hist(pred.flatten(), label.flatten(), 19)
    with np.errstate(divide="ignore", invalid="ignore"):
        ref_iu = ref_misc.per_class_iu(hist)
    got = M.acc_metrics(hist)["iu"]
    # Reference emits NaN for absent classes; rebuild must agree on the mask
    # and the finite values.
    assert np.array_equal(np.isnan(ref_iu), np.isnan(got))
    np.testing.assert_allclose(
        got[~np.isnan(ref_iu)], ref_iu[~np.isnan(ref_iu)], rtol=1e-12
    )


def test_summary_metrics_match_evaluate_eval_for_inference(ref_misc):
    """acc / acc_cls / mean_iu vs the real evaluate_eval_for_inference
    (utils/misc.py:132-150).  Its print_evaluate_results side effect needs a
    dataset with id2cat; a minimal stand-in satisfies it."""

    class _DS:
        id2cat = {i: f"c{i}" for i in range(19)}

    pred, label = _rand_maps(4, absent=(2, 11))
    hist = ref_misc.fast_hist(pred.flatten(), label.flatten(), 19)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc, acc_cls, mean_iu, fwavacc = ref_misc.evaluate_eval_for_inference(
            hist, dataset=_DS()
        )
    m = M.acc_metrics(hist)
    assert m["acc"] == pytest.approx(acc, rel=1e-12)
    assert m["acc_cls"] == pytest.approx(acc_cls, rel=1e-12)
    assert m["mean_iu"] == pytest.approx(mean_iu, rel=1e-12)
    assert M.mean_iu(hist) == pytest.approx(mean_iu, rel=1e-12)
    # fwavacc has no rebuild consumer but must be reproducible from the same
    # hist -- derive it the reference's way to document the formula.
    freq = hist.sum(axis=1) / hist.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
    assert (freq[freq > 0] * iu[freq > 0]).sum() == pytest.approx(
        fwavacc, rel=1e-12
    )
