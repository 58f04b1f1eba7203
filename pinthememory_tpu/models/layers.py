"""Shared layer primitives (NHWC, torch-compatible geometry).

The reference's ``mynn.Norm2d`` resolves to SyncBatchNorm (config.py:97-98);
under GSPMD data parallelism a plain BatchNorm's batch reduction is already a
global (cross-device) reduction, so sync-BN falls out for free -- the
``axis_name`` escape hatch is only needed under shard_map/pmap.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# whitening position codes (reference: network/Resnet.py:68-101)
IW_NONE = 0
IW_WHITEN = 1        # InstanceWhitening tap (IW / IRW loss)
IW_WHITEN_ISW = 2    # InstanceWhitening tap (ISW loss)
IW_INSTANCE = 3      # InstanceNorm, no affine
IW_INSTANCE_AFF = 4  # InstanceNorm, affine
IW_SWITCH = 5        # SyncSwitchWhiten2d

BN_EPS = 1e-5
BN_MOMENTUM = 0.9    # flax convention; == torch momentum 0.1


def torch_pad(p: int) -> Sequence[tuple[int, int]]:
    return ((p, p), (p, p))


def conv2d(
    features: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    bias: bool = False,
    dtype: Any = jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=torch_pad(padding),
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        dtype=dtype,
        name=name,
    )


def batch_norm(
    dtype: Any = jnp.float32, name: str | None = None, axis_name: str | None = None
) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=None,  # passed via call
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        axis_name=axis_name,
        name=name,
    )


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """``nn.InstanceNorm2d(affine=False)`` on NHWC input.

    torch semantics: normalize each (sample, channel) plane over H, W using
    the biased variance.
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class InstanceNormAffine(nn.Module):
    """``nn.InstanceNorm2d(affine=True)``: learnable per-channel scale/bias."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = instance_norm(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * scale + bias


def apply_iw_hook(
    module: nn.Module,
    x: jnp.ndarray,
    iw: int,
    taps: list,
    features: int,
    name: str,
    train: bool = False,
) -> jnp.ndarray:
    """Apply the position's whitening op; append the tap for codes 1/2.

    Mirrors the post-residual hook in every backbone block (reference:
    network/Resnet.py:125-132).  Code 5 (SyncSwitchWhiten) is registered as a
    child module by the caller (it has parameters/state).
    """
    if iw in (IW_WHITEN, IW_WHITEN_ISW):
        w = instance_norm(x)
        taps.append(w)
        return w
    if iw == IW_INSTANCE:
        return instance_norm(x)
    if iw == IW_INSTANCE_AFF:
        return InstanceNormAffine(features, name=f"{name}_in_affine", parent=module)(x)
    if iw == IW_SWITCH:
        from pinthememory_tpu.models.switchwhiten import SyncSwitchWhiten2d

        return SyncSwitchWhiten2d(
            num_features=features, name=f"{name}_switchwhiten", parent=module
        )(x, train=train)
    return x
