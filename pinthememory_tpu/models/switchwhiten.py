"""Switchable whitening (BW+IW mix, Newton-iteration inverse square root).

Reference: network/sync_switchwhiten.py (SyncSwitchWhiten2d).  The reference
hand-rolls a distributed all-reduce of batch mean/cov in a custom autograd
Function (SyncMeanCov, sync_switchwhiten.py:9-56); under GSPMD the batch
statistics are global reductions automatically, so the plain computation is
already "sync".  NHWC layout; groups of ``num_pergroup`` channels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def newton_inverse_sqrt(cov: jnp.ndarray, T: int = 5) -> jnp.ndarray:
    """cov^{-1/2} by coupled Newton iteration (sync_switchwhiten.py:206-215).

    cov: (..., c, c) SPD.  P_{k+1} = 1.5 P_k - 0.5 P_k^3 (cov/trace);
    result scaled by 1/sqrt(trace).
    """
    c = cov.shape[-1]
    eye = jnp.eye(c, dtype=cov.dtype)
    tr = jnp.trace(cov, axis1=-2, axis2=-1)[..., None, None]
    r_tr = 1.0 / tr
    cov_n = cov * r_tr
    p = jnp.broadcast_to(eye, cov.shape)

    def body(_, p):
        p3 = p @ p @ p
        return 1.5 * p - 0.5 * (p3 @ cov_n)

    p = jax.lax.fori_loop(0, T, body, p)
    return p * jnp.sqrt(r_tr)


class SyncSwitchWhiten2d(nn.Module):
    """sw_type=2 (BW + IW) switchable whitening, the configuration the
    reference instantiates (Resnet.py:91-99)."""

    num_features: int
    num_pergroup: int = 16
    T: int = 5
    eps: float = 1e-5
    momentum: float = 0.99  # torch convention: new = (1-m)*batch + m*old
    affine: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n, h, w, cfull = x.shape
        c = self.num_pergroup
        g = self.num_features // c
        assert cfull == self.num_features

        sw_mean_weight = self.param("sw_mean_weight", nn.initializers.ones, (2,))
        sw_var_weight = self.param("sw_var_weight", nn.initializers.ones, (2,))
        running_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((g, c), jnp.float32))
        running_cov = self.variable(
            "batch_stats", "running_cov",
            lambda: jnp.broadcast_to(jnp.eye(c, dtype=jnp.float32), (g, c, c)).copy())

        xf = x.astype(jnp.float32)
        # (N, H, W, g, c) -> group views
        xg = xf.reshape(n, h, w, g, c)

        # ---- batch (sync) statistics over (N, H, W)
        if train:
            mean_bn = jnp.mean(xg, axis=(0, 1, 2))              # (g, c)
            xc = xg - mean_bn
            cov_bn = jnp.einsum("nhwgc,nhwgd->gcd", xc, xc, precision=_HP) / (
                n * h * w)
            running_mean.value = (
                (1 - self.momentum) * mean_bn + self.momentum * running_mean.value)
            running_cov.value = (
                (1 - self.momentum) * cov_bn + self.momentum * running_cov.value)
        else:
            mean_bn = running_mean.value
            cov_bn = running_cov.value

        # ---- instance statistics over (H, W)
        mean_in = jnp.mean(xg, axis=(1, 2))                     # (N, g, c)
        xi = xg - mean_in[:, None, None]
        cov_in = jnp.einsum("nhwgc,nhwgd->ngcd", xi, xi, precision=_HP) / (h * w)

        mw = jax.nn.softmax(sw_mean_weight)
        vw = jax.nn.softmax(sw_var_weight)
        eye = jnp.eye(c, dtype=jnp.float32)
        mean = mw[0] * mean_bn[None] + mw[1] * mean_in           # (N, g, c)
        cov = vw[0] * cov_bn[None] + vw[1] * cov_in + self.eps * eye

        wm = newton_inverse_sqrt(cov, self.T)                    # (N, g, c, c)
        centered = xg - mean[:, None, None]
        x_hat = jnp.einsum("ngcd,nhwgd->nhwgc", wm, centered, precision=_HP)
        x_hat = x_hat.reshape(n, h, w, cfull)

        if self.affine:
            scale = self.param("weight", nn.initializers.ones, (cfull,))
            bias = self.param("bias", nn.initializers.zeros, (cfull,))
            x_hat = x_hat * scale + bias
        return x_hat.astype(x.dtype)
