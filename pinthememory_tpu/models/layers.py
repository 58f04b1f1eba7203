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


class ShiftedDilatedConv3x3(nn.Module):
    """3x3 dilated stride-1 SAME conv as 9 shifted MXU matmuls.

    XLA lowers window-dilated convolutions via space-to-batch, which runs at
    ~50% MFU on v5e for the trunk/ASPP shapes; the algebraically identical

        y = sum_{ky,kx} shift(x, d*(ky-1), d*(kx-1)) @ W[ky, kx]

    is nine dense (N*H*W, Cin) x (Cin, Cout) matmuls and measures ~1.7x
    faster forward (82-92% MFU; ``tools/conv_bench.py``, 2026-08-19), with
    the same win in the backward pass (autodiff of pad+slice+matmul stays in
    matmul land, while dilated-conv gradients space-to-batch again).

    The parameter tree ("kernel" (3,3,Cin,Cout) [+ "bias"]) matches
    ``nn.Conv`` exactly, so checkpoints, the torch converter, and parity
    tests are unaffected.  The nine products accumulate in f32 and round
    once at the end -- at least as accurate as the conv it replaces.
    Set ``PINMEM_XLA_DILATED=1`` to fall back to ``nn.Conv``.
    """

    features: int
    dilation: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        d = self.dilation
        n, h, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        out = None
        for ky in range(3):
            for kx in range(3):
                patch = xp[:, ky * d:ky * d + h, kx * d:kx * d + w, :]
                term = jnp.einsum("nhwc,cf->nhwf", patch, kernel[ky, kx],
                                  preferred_element_type=jnp.float32)
                out = term if out is None else out + term
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)


class ConcatSplitConv3x3(nn.Module):
    """``conv(concat(a, b))`` computed as ``conv_a(a) + conv_b(b)``.

    Convolution is linear in input channels, so splitting the kernel along
    the channel axis is exact.  The win is layout traffic: the decoder's
    concat (48 fine + 256 aspp = 304 channels, deepv3plus.py:571-575) is
    tile-misaligned on TPU (304 = 2.375 x 128) and xprof shows XLA
    materializing it through a pad + two full copies -- ~17% of the
    768^2-bs4 eval forward's device time for zero FLOPs -- while the 48-
    and 256-channel halves convolve from their producers directly.

    The parameter tree ("kernel" (3,3,Ca+Cb,F)) matches ``nn.Conv`` on the
    concatenated input exactly, so checkpoints, the torch converter, and
    parity tests are unaffected.  Both halves accumulate in f32 like the
    fused conv.  Set ``PINMEM_XLA_CONCAT=1`` to fall back to concat+conv.
    """

    features: int
    split: int                   # channels of the first input (Ca)
    total_in: int                # Ca + Cb (fixes the param shape at init)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        assert a.shape[-1] == self.split, (a.shape, self.split)
        assert a.shape[-1] + b.shape[-1] == self.total_in
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.total_in, self.features))
        a, b, kernel = nn.dtypes.promote_dtype(a, b, kernel, dtype=self.dtype)
        # same compute dtype as the nn.Conv it replaces (the MXU accumulates
        # in f32 internally either way); preferred_element_type=f32 here
        # would break the conv transpose rule's dtype matching in backward
        dn = ("NHWC", "HWIO", "NHWC")
        ya = jax.lax.conv_general_dilated(
            a, kernel[:, :, : self.split], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)
        yb = jax.lax.conv_general_dilated(
            b, kernel[:, :, self.split :], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)
        return ya + yb


class SpaceToDepthStem(nn.Module):
    """7x7 stride-2 pad-3 stem conv computed on a 2x2 space-to-depth input.

    The raw stem conv reads (H, W, 3) -- 3 channels against the TPU's
    128-lane tiling, so the input tensor is ~42x padded in HBM and xprof
    shows the op HBM-bound at <5% MFU (plus a dedicated layout copy).  The
    MLPerf-ResNet trick: zero-pad the kernel to 8x8 at the top-left,
    reorder input pixels 2x2-to-depth ((H/2, W/2, 12)) and run the
    equivalent 4x4 stride-1 conv with padding ((2,1),(2,1)).  Exact math:
    output pixel i reads x rows 2i-3..2i+3 either way; the padded kernel
    row 0 multiplies row 2i-4 by zero.

    The parameter stays "kernel" (7,7,3,F) -- checkpoints/converter/parity
    tests unaffected; the reorder of the WEIGHTS is traced and constant-
    folded per compile.  Requires even H, W (the protocol's crops/images
    are; odd inputs fall back to the plain conv).
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, reorder: bool = True) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features))
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        n, h, w, c = x.shape
        if not reorder or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # input 2x2 space-to-depth: (N, H/2, W/2, 2*2*C)
        xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        # kernel: zero-pad 7x7 -> 8x8 at the top-left, then fold the 2x2
        # phase into channels to match the input reorder
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kp = kp.reshape(4, 2, 4, 2, c, self.features)
        kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        return jax.lax.conv_general_dilated(
            xs, kp, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


_STD_STEM = None


def use_std_stem(train: bool = False) -> bool:
    """Space-to-depth stem policy (both directions measured, BASELINE.md):
    the reorder LOSES on the eval tile pipeline (3.36 vs 3.56 img/s, 6d)
    but WINS on the training episode (5.06 vs 4.84 steps/s, round 5 --
    the stem's kernel-grad at 73 GiB/s plus the layout copies around the
    train-mode stem BN dominate only in the backward).  Default: reorder
    in train mode, plain conv in eval mode; PINMEM_STD_STEM=1/0 forces
    always-on/always-off."""
    global _STD_STEM
    if _STD_STEM is None:
        import os

        _STD_STEM = os.environ.get("PINMEM_STD_STEM", "")
    if _STD_STEM == "1":
        return True
    if _STD_STEM == "0":
        return False
    return train


_BLOCK_REMAT = None


def use_block_remat() -> bool:
    """Per-block rematerialization in train mode (default ON; PINMEM_REMAT=0
    opts out).  Measured on v5e (round 5, 768^2 bs4 memory-MLDG episode):
    5.01 -> 5.27 steps/s (+5%).  The fwdbwd profile shows why: ~20% of the
    step was transposed/padded copies of activations STORED for the
    backward around train-mode BN/relu sites; recomputing each residual
    block from its input replaces that HBM traffic with cheap fused
    recompute (the step is at 25% FLOPs util, so the extra FLOPs ride
    free).  Numerics are identical (same ops, re-executed)."""
    global _BLOCK_REMAT
    if _BLOCK_REMAT is None:
        import os

        _BLOCK_REMAT = os.environ.get("PINMEM_REMAT", "1") == "1"
    return _BLOCK_REMAT


_SPLIT_CONCAT = None


def use_split_concat() -> bool:
    global _SPLIT_CONCAT
    if _SPLIT_CONCAT is None:
        import os

        _SPLIT_CONCAT = os.environ.get("PINMEM_XLA_CONCAT", "0") != "1"
    return _SPLIT_CONCAT


_XLA_DILATED = None  # resolved lazily so tests can monkeypatch the env


def _use_shifted_dilated() -> bool:
    global _XLA_DILATED
    if _XLA_DILATED is None:
        import os

        _XLA_DILATED = os.environ.get("PINMEM_XLA_DILATED", "0") == "1"
    return not _XLA_DILATED


def conv2d(
    features: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    bias: bool = False,
    dtype: Any = jnp.float32,
    name: str | None = None,
) -> nn.Module:
    if (kernel == 3 and dilation > 1 and stride == 1 and padding == dilation
            and _use_shifted_dilated()):
        return ShiftedDilatedConv3x3(
            features=features, dilation=dilation, use_bias=bias,
            dtype=dtype, name=name)
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


def _bn_canonicalize_axes(ndim: int, axes) -> tuple:
    """Vendored equivalent of flax's private ``_canonicalize_axes`` so the
    folded path does not track flax internals across upgrades (ADVICE r4)."""
    if isinstance(axes, int):
        axes = (axes,)
    return tuple(sorted({ndim + ax if ax < 0 else ax for ax in axes}))


def _bn_compute_stats_f32(x, reduction_axes, axis_name, axis_index_groups,
                          use_fast_variance):
    """Batch mean/var with f32 reductions, bit-identical to flax 0.12's
    ``_compute_stats(..., force_float32_reductions=True, mask=None)``
    (flax normalization.py) including the concatenated-``pmean`` layout of
    the cross-device (SyncBN) path.  Vendored so the bf16 fold survives
    flax upgrades; the f32 config still defers to flax verbatim."""
    dtype = jnp.promote_types(jnp.result_type(x), jnp.float32)
    x = jnp.asarray(x, dtype)

    def distributed_mean(*xs):
        mus = tuple(v.mean(reduction_axes) for v in xs)
        if axis_name is None:
            return mus if len(xs) > 1 else mus[0]
        synced = jax.lax.pmean(
            jnp.concatenate([mu.reshape(-1) for mu in mus]),
            axis_name, axis_index_groups=axis_index_groups)
        split = np.cumsum([mu.size for mu in mus[:-1]])
        outs = tuple(v.reshape(mu.shape) for v, mu in
                     zip(jnp.split(synced, split), mus))
        return outs if len(xs) > 1 else outs[0]

    if use_fast_variance:
        mu, mu2 = distributed_mean(x, jnp.square(x))
        var = jnp.maximum(0.0, mu2 - jnp.square(mu))
    else:
        mu = distributed_mean(x)
        var = distributed_mean(
            jnp.square(x - jnp.expand_dims(mu, reduction_axes)))
    return mu, var


class FoldedBatchNorm(nn.BatchNorm):
    """BatchNorm whose activation math stays in the compute dtype.

    flax's ``nn.BatchNorm`` computes batch statistics in f32 (correct:
    million-element reductions) but then broadcasts the f32 stats into
    ``y = x - mean`` and multiplies by the f32 scale param, silently
    promoting the WHOLE activation to f32 even under ``dtype=bfloat16``
    (flax normalization.py:203-226).  The fwdbwd xprof capture (BASELINE.md
    6b) shows the cost on TPU: activation-sized f32 materializations plus
    the converts/transposed-copies/pads around them -- a large share of the
    episode's 33% zero-FLOP "data formatting" time.

    Here the per-channel affine is folded in f32 -- ``mul = rsqrt(var+eps)
    * scale``, ``off = bias - mean*mul`` -- and only those two C-sized
    vectors are cast to the compute dtype, so the activation op is one
    bf16 multiply-add and XLA can keep the whole chain bf16.

    Statistics computation, running-average update and checkpoint layout
    are inherited unchanged.  With ``dtype=float32`` (the parity default)
    the class defers to ``nn.BatchNorm`` verbatim, so every parity gate
    sees flax's exact numerics; the folded path runs only in the bf16
    benchmark config, where its extra per-channel f32 rounding is far
    below the conv rounding already accepted there (BASELINE.md 5c).
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None, *,
                 mask=None):
        if self.dtype is None or jnp.dtype(self.dtype) == jnp.float32:
            return super().__call__(
                x, use_running_average=use_running_average, mask=mask)
        assert mask is None, "folded bf16 path does not support mask"

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _bn_canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = _bn_compute_stats_f32(
                x, reduction_axes,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
            )
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        mul = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", self.scale_init, feature_shape,
                               self.param_dtype)
            mul = mul * scale
        off = -mean * mul
        if self.use_bias:
            bias = self.param("bias", self.bias_init, feature_shape,
                              self.param_dtype)
            off = off + bias
        shape = [1] * x.ndim
        for ax in feature_axes:
            shape[ax] = x.shape[ax]
        mul = mul.astype(self.dtype).reshape(shape)
        off = off.astype(self.dtype).reshape(shape)
        return x.astype(self.dtype) * mul + off


def batch_norm(
    dtype: Any = jnp.float32, name: str | None = None, axis_name: str | None = None
) -> nn.BatchNorm:
    return FoldedBatchNorm(
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
