"""TPU-native image resizing with PyTorch-compatible semantics.

The reference leans on ``F.interpolate(..., mode='bilinear',
align_corners=True)`` in four numerically load-bearing places (network/mynn.py
:57-62, network/memory.py:175,223, eval.py resize path) and
``mode='nearest'`` for aux labels (network/deepv3plus.py:593).
``jax.image.resize`` implements half-pixel-center sampling only, so we build
the align-corners variant ourselves -- as a *separable dense interpolation
matrix* applied with einsum.  For static shapes the (out, in) matrices are
computed once at trace time in numpy, and the gather-free matmul formulation
rides the MXU instead of scalarizing into VPU gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix for align_corners=True linear sampling.

    Output sample i reads source coordinate ``i * (in-1)/(out-1)`` (torch
    align_corners convention); rows are convex weights over the two nearest
    source samples.
    """
    a = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        a[:, 0] = 1.0
        return a
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (coords - lo).astype(np.float32)
    rows = np.arange(out_size)
    a[rows, lo] += 1.0 - frac
    a[rows, hi] += frac
    return a


@functools.lru_cache(maxsize=256)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch ``mode='nearest'`` source index: floor(i * in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


@functools.lru_cache(maxsize=256)
def _linear_matrix_half_pixel(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix for half-pixel-center linear sampling.

    Matches ``cv2.resize(..., interpolation=INTER_LINEAR)`` and torch
    ``align_corners=False``: source coordinate ``(i + 0.5) * in/out - 0.5``,
    clamped, no antialiasing.  Used by the eval merge path, which must
    reproduce the reference's per-class cv2 resize (eval.py:202-207).
    """
    a = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (coords - lo).astype(np.float32)
    rows = np.arange(out_size)
    a[rows, lo] += 1.0 - frac
    a[rows, hi] += frac
    return a


@functools.lru_cache(maxsize=256)
def _pil_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix replicating PIL ``Image.BILINEAR`` resampling.

    PIL applies an *antialiased* triangle filter whose support scales with
    the downsampling factor; the reference rescales uint8 images with it
    before tiling (eval.py:357) and in every dataset transform, so matching
    it matters for end-to-end parity.
    """
    a = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter has support 1
    for i in range(out_size):
        center = (i + 0.5) * scale
        left = max(int(center - support + 0.5), 0)
        right = min(int(center + support + 0.5), in_size)
        idx = np.arange(left, right)
        w = 1.0 - np.abs((idx + 0.5 - center) / filterscale)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            a[i, left:right] = w / s
        else:
            a[i, min(int(center), in_size - 1)] = 1.0
    return a.astype(np.float32)


def _pil_bicubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic filter (Keys, a=-0.5), support 2."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x < 1.0
    out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    m2 = (x >= 1.0) & (x < 2.0)
    out[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
    return out


@functools.lru_cache(maxsize=256)
def _pil_bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix replicating PIL ``Image.BICUBIC`` resampling.

    PIL's *default* resample filter: ``Image.resize`` with no argument is
    BICUBIC, which is what the reference's pooling-mode eval input scaling
    (datasets/cityscapes.py:250-264, ``img.resize((target_w, target_h))``)
    and the training RandomSizeAndCrop/Resize transforms actually run.
    Antialiased: the filter support scales with the downsampling factor,
    same as PIL's ImagingResampleHorizontal.
    """
    a = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale  # bicubic filter has support 2
    for i in range(out_size):
        center = (i + 0.5) * scale
        left = max(int(center - support + 0.5), 0)
        right = min(int(center + support + 0.5), in_size)
        idx = np.arange(left, right)
        w = _pil_bicubic_kernel((idx + 0.5 - center) / filterscale)
        s = w.sum()
        if s != 0:
            a[i, left:right] = w / s
        else:
            a[i, min(int(center), in_size - 1)] = 1.0
    return a.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _half_pixel_taps(in_size: int, out_size: int):
    """(lo_idx, hi_idx, frac) arrays for 2-tap half-pixel linear sampling."""
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0, in_size - 1)
    lo = np.floor(coords).astype(np.int32)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (coords - lo).astype(np.float32)
    return lo, hi, frac


def _gather_linear_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """2-tap linear resample along one axis via gathers.

    O(out) work per element instead of the O(in x out) dense matmul -- the
    right formulation for the eval merge's large class-probability maps.
    """
    lo, hi, frac = _half_pixel_taps(x.shape[axis], out_size)
    xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
    xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = jnp.asarray(frac).reshape(shape)
    return xlo * (1.0 - f) + xhi * f


def resize_bilinear_half_pixel(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR / torch align_corners=False resize (NHWC/HWC).

    Dense separable matmuls (MXU) -- measured faster than gather taps on TPU.
    """
    return _apply_separable(x, out_hw, _linear_matrix_half_pixel)


def resize_pil_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """PIL Image.BILINEAR (antialiased) resize (NHWC/HWC), float output."""
    return _apply_separable(x, out_hw, _pil_bilinear_matrix)


def resize_pil_bicubic(
    x: jnp.ndarray, out_hw: tuple[int, int], emulate_uint8: bool = True
) -> jnp.ndarray:
    """PIL Image.BICUBIC (antialiased, PIL's default) resize (NHWC/HWC).

    PIL resamples HORIZONTALLY first and materializes each pass as uint8
    (``clip8(round(v))``), so bicubic *overshoot* is clipped between passes
    -- a visible effect at sharp edges, not just rounding noise (measured
    max error 19/255 without emulation vs 1/255 with, random-noise image).
    ``emulate_uint8=True`` reproduces that pipeline for [0, 255]-range
    inputs; pass False for generic float data.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    xf = x.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    def q(v):
        return jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0) if emulate_uint8 else v

    if w != ow:
        xf = q(jnp.einsum("ow,bhwc->bhoc",
                          jnp.asarray(_pil_bicubic_matrix(w, ow), jnp.float32),
                          xf, precision=hp))
    if h != oh:
        xf = q(jnp.einsum("oh,bhwc->bowc",
                          jnp.asarray(_pil_bicubic_matrix(h, oh), jnp.float32),
                          xf, precision=hp))
    return xf[0] if squeeze else xf


def _apply_separable(x: jnp.ndarray, out_hw, matrix_fn) -> jnp.ndarray:
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x[0] if squeeze else x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    if x.dtype == jnp.bfloat16:
        # bf16 compute mode: interpolate at model precision (~6x faster MXU
        # passes); parity-mode models are f32 and take the exact branch.
        cdtype, hp = jnp.bfloat16, jax.lax.Precision.DEFAULT
    else:
        cdtype, hp = jnp.float32, jax.lax.Precision.HIGHEST
    xf = x.astype(cdtype)
    if h != oh:
        xf = jnp.einsum("oh,bhwc->bowc", jnp.asarray(matrix_fn(h, oh), cdtype),
                        xf, precision=hp)
    if w != ow:
        xf = jnp.einsum("ow,bhwc->bhoc", jnp.asarray(matrix_fn(w, ow), cdtype),
                        xf, precision=hp)
    out = xf.astype(dtype)
    return out[0] if squeeze else out


@functools.lru_cache(maxsize=256)
def _align_corners_taps(in_size: int, out_size: int):
    """(lo, hi, frac) for 2-tap align-corners linear sampling."""
    if out_size == 1 or in_size == 1:
        lo = np.zeros(out_size, np.int32)
        return lo, lo, np.zeros(out_size, np.float32)
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    lo = np.clip(np.floor(coords).astype(np.int32), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (coords - lo).astype(np.float32)
    return lo, hi, frac


def _gather_taps_axis(x: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    lo, hi, frac = taps
    xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
    xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = len(frac)
    f = jnp.asarray(frac).reshape(shape)
    return xlo * (1.0 - f) + xhi * f


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_hw: tuple[int, int]
) -> jnp.ndarray:
    """Bilinear align_corners=True resize of an NHWC (or HWC) tensor.

    Equivalent to ``F.interpolate(x_nchw, size, mode='bilinear',
    align_corners=True)``, formulated as two dense interpolation matmuls.
    Measured on v5e, the MXU matmul beats the 2-tap gather formulation by
    ~1.6x at the decoder's upsample sizes (gathers scalarize poorly on TPU).
    HIGHEST precision keeps it exact in f32.
    """
    return _apply_separable(x, out_hw, _linear_matrix_align_corners)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize matching torch ``mode='nearest'`` indexing."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        if h != oh:
            x = jnp.take(x, jnp.asarray(_nearest_index(h, oh)), axis=1)
        if w != ow:
            x = jnp.take(x, jnp.asarray(_nearest_index(w, ow)), axis=2)
    return x[0] if squeeze else x


def upsample(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Drop-in for the reference's ``mynn.Upsample`` (network/mynn.py:57-62)."""
    return resize_bilinear_align_corners(x, out_hw)


def resize_labels_nearest(labels: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize for integer (B, H, W) label maps.

    Matches the aux-label path (network/deepv3plus.py:592-594): labels are
    cast to float, nearest-resized, cast back -- indexing is what matters.
    """
    x = labels[..., None]
    out = resize_nearest(x, out_hw)
    return out[..., 0]
