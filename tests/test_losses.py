"""Loss-function tests vs torch goldens."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pinthememory_tpu.data.transforms import relaxed_boundary_multihot
from pinthememory_tpu.train.losses import (
    CLASS_WEIGHTS_19,
    cross_entropy_2d,
    img_wt_soft_nll,
    image_weighted_cross_entropy,
)


def _data(seed=0, b=2, h=8, w=8, c=19):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c + 2, (b, h, w)).astype(np.int64)
    labels[labels >= c] = 255
    return logits, labels


def test_cross_entropy_matches_torch():
    logits, labels = _data()
    ours = cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ref = F.cross_entropy(lt, torch.from_numpy(labels), ignore_index=255)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_weighted_cross_entropy_matches_torch():
    logits, labels = _data(1)
    w = np.asarray(CLASS_WEIGHTS_19)
    ours = cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels),
                            class_weights=jnp.asarray(w))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ref = F.cross_entropy(lt, torch.from_numpy(labels),
                          weight=torch.from_numpy(w), ignore_index=255)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_image_weighted_ce_runs_and_positive():
    logits, labels = _data(2)
    loss = image_weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_relaxed_multihot_and_soft_nll():
    m = np.full((8, 8), 255, np.int64)
    m[:4, :4] = 3
    m[4:, 4:] = 7
    mh = relaxed_boundary_multihot(m, 19, 255, 1)
    assert mh.shape == (8, 8, 20)
    assert mh[1, 1, 3] == 1 and mh[1, 1, 19] == 0   # interior
    assert mh[0, 0, 19] == 1                        # corner: ignore fill
    assert mh[3, 4, 3] == 1 and mh[3, 4, 19] == 1   # boundary union
    logits = np.random.default_rng(0).standard_normal((1, 8, 8, 19), dtype=np.float32)
    loss = img_wt_soft_nll(jnp.asarray(logits), jnp.asarray(mh)[None])
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_relaxed_loss_lower_for_correct_prediction():
    m = np.zeros((8, 8), np.int64)
    m[:, 4:] = 5
    mh = relaxed_boundary_multihot(m, 19, 255, 1)
    good = np.full((1, 8, 8, 19), -5.0, np.float32)
    good[0, :, :4, 0] = 5.0
    good[0, :, 4:, 5] = 5.0
    bad = np.roll(good, 3, axis=-1)
    lg = float(img_wt_soft_nll(jnp.asarray(good), jnp.asarray(mh)[None]))
    lb = float(img_wt_soft_nll(jnp.asarray(bad), jnp.asarray(mh)[None]))
    assert lg < lb
