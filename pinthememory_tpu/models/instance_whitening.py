"""Instance-whitening losses (RobustNet family).

Reference: network/instance_whitening.py.  The taps themselves are produced
inside the backbone blocks (models/resnet.py ``apply_iw_hook``); these
functions turn the taps + a covariance mask into the IW/IRW/ISW penalty.
NHWC layout throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def get_covariance_matrix(f_map: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, C): f f^T / (HW - 1) + eps*I
    (instance_whitening.py:30-39)."""
    b, h, w, c = f_map.shape
    flat = f_map.reshape(b, h * w, c).astype(jnp.float32)
    cov = jnp.einsum("bnc,bnd->bcd", flat, flat, precision=_HP) / (h * w - 1)
    return cov + eps * jnp.eye(c, dtype=jnp.float32)


def instance_whitening_loss(
    f_map: jnp.ndarray,
    mask_matrix: jnp.ndarray,
    margin: float,
    num_remove_cov: float,
) -> jnp.ndarray:
    """Masked mean |covariance| with margin (instance_whitening.py:19-27)."""
    f_cor = get_covariance_matrix(f_map)
    masked = f_cor * mask_matrix
    off_diag_sum = jnp.sum(jnp.abs(masked), axis=(1, 2)) - margin
    loss = jnp.clip(off_diag_sum / jnp.maximum(num_remove_cov, 1.0), min=0)
    return jnp.mean(loss)


def covariance_variance_update(
    f_map: jnp.ndarray, num_pairs: int = 2
) -> jnp.ndarray:
    """ISW covstat statistic: variance of off-diagonal covariance entries
    over (original, augmented) image pairs (deepv3plus.py:542-552).

    ``f_map`` stacks the pair groups along batch: [aug..., orig...].
    Returns var over the batch of the off-diagonal covariance (C, C).
    """
    cov = get_covariance_matrix(f_map)
    c = cov.shape[-1]
    reverse_eye = jnp.triu(jnp.ones((c, c), jnp.float32), k=1)
    off = cov * reverse_eye
    # torch.var default is UNBIASED (ddof=1) -- deepv3plus.py:552 uses it;
    # a uniform B/(B-1) scale would not change the ISW mask (k-means
    # assignments and top-k are scale-invariant) but exact parity is free
    return jnp.var(off, axis=0, ddof=1)
