"""Border-relaxation schedule + batch-weighting parity vs the ACTUAL
reference code.

Oracles imported from /root/reference:
  - transforms/transforms.py RelaxedBoundaryLossToTensor under
    cfg.STRICTBORDERCLASS (--strict_bdr_cls) and cfg.REDUCE_BORDER_ITER <
    cfg.ITER (--rlx_off_iter), including the skimage 'thick' boundary
    doubling (transforms.py:99-148);
  - loss.py ImgWtLossSoftNLL with the reduce-border weight inversion
    (loss.py:226-228) and cfg.BATCH_WEIGHTING (loss.py:206-221);
  - loss.py ImageBasedCrossEntropyLoss2d with cfg.BATCH_WEIGHTING
    (loss.py:133,151-154).

The rebuild equivalents are data.transforms.relaxed_boundary_multihot and
train.losses.img_wt_soft_nll / image_weighted_cross_entropy with the
explicit ``strict_classes`` / ``reduce_border`` / ``batch_weights`` knobs
(no global cfg).
"""

import contextlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pinthememory_tpu.data.transforms import relaxed_boundary_multihot
from pinthememory_tpu.train.losses import (
    image_weighted_cross_entropy,
    img_wt_soft_nll,
)

from ref_harness import (
    NUM_CLASSES,
    import_reference_module,
    numpy_normed_shim,
    reference_env,
)


@contextlib.contextmanager
def ref_cfg(**kv):
    """Temporarily mutate the reference's global cfg (the reference's own
    assert_and_infer_cfg does the same, config.py:100-133)."""
    cfg = import_reference_module("config").cfg
    cfg.immutable(False)
    old = {k: getattr(cfg, k) for k in kv}
    for k, v in kv.items():
        setattr(cfg, k, v)
    try:
        with reference_env():
            yield cfg
    finally:
        for k, v in old.items():
            setattr(cfg, k, v)


def _label_map(seed: int, h: int = 48, w: int = 64, ignore_frac: float = 0.08):
    """Blocky label map: real region boundaries, plus scattered ignore."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, NUM_CLASSES, (h // 8, w // 8))
    m = np.kron(blocks, np.ones((8, 8), np.int64))
    m[rng.random((h, w)) < ignore_frac] = 255
    return m


# ---------------------------------------------------------------------------
# transform-level parity
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "strict,reduce_border",
    [((), False), ((0, 5), False), ((), True), ((2, 13), True)],
)
def test_relaxed_boundary_transform_parity(strict, reduce_border):
    xforms = import_reference_module("transforms.transforms")
    m = _label_map(3)
    with ref_cfg(
        STRICTBORDERCLASS=list(strict) if strict else None,
        REDUCE_BORDER_ITER=10 if reduce_border else -1,
        ITER=20,
    ):
        ref = xforms.RelaxedBoundaryLossToTensor(255, NUM_CLASSES)(m).numpy()
    ours = relaxed_boundary_multihot(
        m, NUM_CLASSES, 255, border=1,
        strict_classes=strict, reduce_border=reduce_border)
    assert np.array_equal(ref.transpose(1, 2, 0), ours)
    if reduce_border:
        assert ours.max() == 2  # boundary doubling actually fired


def _soft_nll_fixture(seed: int, reduce_border: bool):
    rng = np.random.default_rng(seed)
    b, h, w = 2, 48, 64
    logits = rng.standard_normal((b, NUM_CLASSES, h, w)).astype(np.float32)
    labels = np.stack([_label_map(seed + i, h, w) for i in range(b)])
    labels[1, :12] = 255  # distinct per-image ignore counts
    multihot = np.stack([
        relaxed_boundary_multihot(l, NUM_CLASSES, 255, border=1,
                                  reduce_border=reduce_border)
        for l in labels
    ])
    return logits, multihot


# ---------------------------------------------------------------------------
# loss-level parity
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("batch_weights", [False, True])
def test_soft_nll_reduce_border_parity(batch_weights):
    """ImgWtLossSoftNLL past the rlx_off_iter threshold: boundary-doubled
    targets, inverted border weights, clamped loss terms (loss.py:226-228)."""
    ref_loss = import_reference_module("loss")
    logits, multihot = _soft_nll_fixture(11, reduce_border=True)
    with ref_cfg(REDUCE_BORDER_ITER=10, ITER=20,
                 BATCH_WEIGHTING=batch_weights):
        crit = ref_loss.ImgWtLossSoftNLL(
            classes=NUM_CLASSES, ignore_index=255, upper_bound=1.0)
        with torch.no_grad():
            ref = crit(
                torch.from_numpy(logits),
                torch.from_numpy(multihot.transpose(0, 3, 1, 2)).clone(),
            ).item()
    ours = float(img_wt_soft_nll(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(multihot),
        upper_bound=1.0, batch_weights=batch_weights, reduce_border=True))
    assert abs(ours - ref) < 1e-4, (ours, ref)


def test_soft_nll_batch_weighting_parity():
    """cfg.BATCH_WEIGHTING with the normal (non-reduced) border schedule."""
    ref_loss = import_reference_module("loss")
    logits, multihot = _soft_nll_fixture(12, reduce_border=False)
    with ref_cfg(BATCH_WEIGHTING=True, REDUCE_BORDER_ITER=-1):
        crit = ref_loss.ImgWtLossSoftNLL(
            classes=NUM_CLASSES, ignore_index=255, upper_bound=1.0)
        with torch.no_grad():
            ref = crit(
                torch.from_numpy(logits),
                torch.from_numpy(multihot.transpose(0, 3, 1, 2)).clone(),
            ).item()
    ours = float(img_wt_soft_nll(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(multihot),
        upper_bound=1.0, batch_weights=True))
    assert abs(ours - ref) < 1e-4, (ours, ref)


def test_img_wt_batch_weighting_parity():
    """ImageBasedCrossEntropyLoss2d with cfg.BATCH_WEIGHTING: one weight
    vector from the whole-batch histogram (loss.py:151-154)."""
    ref_loss = import_reference_module("loss")
    rng = np.random.default_rng(13)
    b, h, w = 3, 24, 32
    logits = rng.standard_normal((b, NUM_CLASSES, h, w)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, (b, h, w)).astype(np.int64)
    labels[rng.random((b, h, w)) < 0.1] = 255
    with ref_cfg(BATCH_WEIGHTING=True):
        crit = ref_loss.ImageBasedCrossEntropyLoss2d(
            classes=NUM_CLASSES, ignore_index=255, upper_bound=1.0)
        with torch.no_grad(), numpy_normed_shim():
            ref = crit(torch.from_numpy(logits),
                       torch.from_numpy(labels)).item()
    ours = float(image_weighted_cross_entropy(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels),
        num_classes=NUM_CLASSES, upper_bound=1.0, batch_weights=True))
    assert abs(ours - ref) < 1e-4, (ours, ref)
