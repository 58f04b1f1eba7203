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
    # --fixed_aspp_pool (eval.py:741-745): replace the adaptive global image
    # pooling with a fixed AvgPool2d(105) window -- "the tensor size if you
    # train with crop size of 840x840" (at OS8).  0 = adaptive (default).
    fixed_pool: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rates = aspp_rates(self.output_stride)
        h, w = x.shape[1:3]

        if self.fixed_pool > 0:
            # torch AvgPool2d(k): stride = k, no padding, floor output size
            img = nn.avg_pool(
                x, (self.fixed_pool, self.fixed_pool),
                strides=(self.fixed_pool, self.fixed_pool))
        else:
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
