"""Pooling primitives with torch-compatible geometry (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """``nn.MaxPool2d(kernel_size=3, stride=2, padding=1)`` on NHWC input.

    Used by every ResNet stem (reference: network/Resnet.py:254,316).
    """
    # NB: the init value must be a Python scalar literal so JAX recognizes
    # the max-pool pattern for reverse-mode autodiff.
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def max_pool_3x3_s2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """``nn.MaxPool2d(kernel_size=3, stride=2, padding=0, ceil_mode=True)``.

    The SE-ResNeXt stem pool (reference: network/SEresnext.py:271-272).
    Ceil mode adds one output row/col when (dim - 3) is odd; the clipped
    window is emulated with -inf right/bottom padding, which torch's
    ceil-mode windows (restricted to valid pixels) can never select.
    """
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    pr_h = (x.shape[1] - 3) % 2
    pr_w = (x.shape[2] - 3) % 2
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, pr_h), (0, pr_w), (0, 0)),
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """``nn.AdaptiveAvgPool2d(1)``: (B,H,W,C) -> (B,1,1,C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
