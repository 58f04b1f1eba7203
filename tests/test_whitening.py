"""Whitening family tests: IW loss, ISW mask selection, switchable whitening."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pinthememory_tpu.models.cov import CovMatrixIRW, CovMatrixISW
from pinthememory_tpu.models.instance_whitening import (
    covariance_variance_update,
    get_covariance_matrix,
    instance_whitening_loss,
)
from pinthememory_tpu.models.switchwhiten import SyncSwitchWhiten2d, newton_inverse_sqrt


def test_covariance_matches_torch_formula():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16), dtype=np.float32)
    ours = np.asarray(get_covariance_matrix(jnp.asarray(x)))
    # torch golden (instance_whitening.py:30-39)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).contiguous().view(2, 16, -1)
    ref = torch.bmm(xt, xt.transpose(1, 2)).div(8 * 8 - 1) + 1e-5 * torch.eye(16)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_iw_loss_zero_for_whitened_input():
    # perfectly decorrelated channels -> masked off-diag ~ 0 -> loss ~ 0
    rng = np.random.default_rng(1)
    b, h, w, c = 1, 32, 32, 4
    x = rng.standard_normal((b, h * w, c)).astype(np.float32)
    # orthogonalize channels
    q, _ = np.linalg.qr(x[0])
    x = (q[:, :c] * np.sqrt(h * w)).reshape(b, h, w, c).astype(np.float32)
    mask = np.triu(np.ones((c, c), np.float32), 1)
    loss = instance_whitening_loss(jnp.asarray(x), jnp.asarray(mask), 0.0, mask.sum())
    assert float(loss) < 1e-3


def test_isw_mask_selection_picks_high_variance_entries():
    dim = 8
    isw = CovMatrixISW(dim, clusters=3)
    rng = np.random.default_rng(0)
    for _ in range(4):
        var = np.abs(rng.standard_normal((dim, dim))).astype(np.float32) * 0.01
        var[0, 1] = var[1, 0] = 5.0   # persistently sensitive entry
        var[2, 3] = var[3, 2] = 4.0
        isw.set_variance_of_covariance(var)
    isw.set_mask_matrix()
    mask, margin, num = isw.get_mask_matrix()
    assert mask[0, 1] == 1 and mask[2, 3] == 1
    assert num == mask.sum()


def test_irw_mask_is_all_offdiagonal():
    irw = CovMatrixIRW(5)
    mask, margin, num = irw.get_mask_matrix()
    assert num == 10  # upper-triangle count
    assert mask[0, 0] == 0 and mask[0, 1] == 1


def test_newton_inverse_sqrt():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((4, 4)).astype(np.float32)
    cov = a @ a.T + 4 * np.eye(4, dtype=np.float32)
    wm = np.asarray(newton_inverse_sqrt(jnp.asarray(cov)[None], T=12))[0]
    approx = wm @ cov @ wm
    np.testing.assert_allclose(approx, np.eye(4), atol=5e-2)


def test_switch_whiten_whitens_batch1():
    """With N=1, BN and IW statistics coincide -> output group cov ~ I."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 32), dtype=np.float32) * 3 + 1)
    m = SyncSwitchWhiten2d(num_features=32, num_pergroup=16, affine=False)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    y = np.asarray(y).reshape(-1, 2, 16)  # (pixels, groups, c)
    for gi in range(2):
        f = y[:, gi, :]
        cov = f.T @ f / f.shape[0]
        np.testing.assert_allclose(cov, np.eye(16), atol=0.15)


def test_covstat_variance_shapes():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 8), dtype=np.float32))
    v = covariance_variance_update(x)
    assert v.shape == (8, 8)
    assert float(jnp.tril(v).sum()) == 0.0  # only upper off-diagonal kept
