"""Atrous Spatial Pyramid Pooling (reference: deepv3plus.py:40-101)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pinthememory_tpu.models.layers import batch_norm, conv2d
from pinthememory_tpu.ops.pool import global_avg_pool
from pinthememory_tpu.ops.resize import resize_bilinear_align_corners


def aspp_rates(output_stride: int, base=(6, 12, 18)) -> tuple[int, ...]:
    """Dilation rates scaled by output stride (deepv3plus.py:58-67)."""
    if output_stride == 8:
        return tuple(2 * r for r in base)
    if output_stride == 4:
        return tuple(4 * r for r in base)
    if output_stride == 16:
        return tuple(base)
    if output_stride == 32:
        return tuple(r // 2 for r in base)
    raise ValueError(f"output stride {output_stride} not supported")


class ASPP(nn.Module):
    """image-pool + 1x1 + three dilated 3x3 branches, concat to 5*256ch.

    Branch order in the concat matches the reference (deepv3plus.py:90-101):
    image-pooling features first, then 1x1, then the dilated branches.
    """

    reduction_dim: int = 256
    output_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rates = aspp_rates(self.output_stride)
        h, w = x.shape[1:3]

        img = global_avg_pool(x)
        img = conv2d(self.reduction_dim, 1, dtype=self.dtype, name="img_conv")(img)
        img = batch_norm(self.dtype, name="img_bn")(img, use_running_average=not train)
        img = nn.relu(img)
        img = resize_bilinear_align_corners(img, (h, w))
        outs = [img]

        y = conv2d(self.reduction_dim, 1, dtype=self.dtype, name="branch0_conv")(x)
        y = batch_norm(self.dtype, name="branch0_bn")(y, use_running_average=not train)
        outs.append(nn.relu(y))

        for i, r in enumerate(rates):
            y = conv2d(self.reduction_dim, 3, 1, r, r, dtype=self.dtype,
                       name=f"branch{i + 1}_conv")(x)
            y = batch_norm(self.dtype, name=f"branch{i + 1}_bn")(
                y, use_running_average=not train)
            outs.append(nn.relu(y))

        return jnp.concatenate(outs, axis=-1)
