"""Gather-free index selection primitives.

``jnp.take_along_axis`` lowers to an HLO gather, which TPUs execute as a
serial per-row loop: at train shapes (4x768^2 pixels x 19 classes) the CE
gather alone was measured at ~74 ms/step on v5e -- 3x the entire model
forward -- while the one-hot multiply-reduce below fuses into the
surrounding elementwise pipeline and costs <2 ms.  Numerically identical
(one term selected, the rest are exact zeros).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_select(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``values[..., idx]`` along the last axis, TPU-fusible.

    ``values``: (..., C); ``idx``: (...) integer class per position.
    """
    classes = jax.lax.broadcasted_iota(jnp.int32, values.shape,
                                       values.ndim - 1)
    oh = classes == idx[..., None].astype(jnp.int32)
    return jnp.sum(jnp.where(oh, values, 0.0), axis=-1)
