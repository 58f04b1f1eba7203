"""Numerics parity for ops: resize / pooling vs. PyTorch golden behavior.

These ops gate checkpoint parity (SURVEY.md §7 hard part #1): bilinear
align_corners=True appears at 4 places in the reference forward pass.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pinthememory_tpu.ops import (
    max_pool_3x3_s2,
    max_pool_3x3_s2_ceil,
    resize_bilinear_align_corners,
    resize_nearest,
)
from pinthememory_tpu.ops.resize import resize_labels_nearest


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 9), (14, 18)), ((48, 48), (192, 192)), ((33, 17), (8, 5)),
     ((4, 4), (1, 1)), ((1, 1), (5, 7)), ((10, 10), (10, 10))],
)
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), out_hw)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 9), (14, 18)), ((48, 48), (12, 12)), ((33, 17), (8, 5))],
)
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = resize_nearest(jnp.asarray(x), out_hw)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=0, atol=0)


def test_label_nearest_resize():
    labels = np.arange(64, dtype=np.int32).reshape(1, 8, 8) % 19
    out = resize_labels_nearest(jnp.asarray(labels), (4, 4))
    lt = torch.from_numpy(labels).unsqueeze(1).float()
    ref = F.interpolate(lt, size=(4, 4), mode="nearest").squeeze(1).long().numpy()
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("hw", [(8, 8), (9, 9), (112, 112), (113, 57), (56, 55)])
def test_maxpool_ceil_matches_torch(hw):
    """SE-ResNeXt stem pool: 3x3/2 pad-0 ceil-mode (SEresnext.py:271-272)."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, *hw, 4), dtype=np.float32)
    ours = max_pool_3x3_s2_ceil(jnp.asarray(x))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.max_pool2d(xt, kernel_size=3, stride=2, padding=0, ceil_mode=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert np.asarray(ours).shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=0, atol=0)


@pytest.mark.parametrize("hw", [(8, 8), (383, 129), (100, 100)])
def test_maxpool_matches_torch(hw):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, *hw, 4), dtype=np.float32)
    ours = max_pool_3x3_s2(jnp.asarray(x))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.max_pool2d(xt, kernel_size=3, stride=2, padding=1)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert np.asarray(ours).shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=0, atol=0)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 128), (32, 64)),    # 0.5x downscale (antialiased triangle filter)
    ((64, 128), (128, 256)),  # 2.0x upscale
    ((50, 70), (33, 47)),     # non-integer ratio
])
def test_pil_bilinear_matches_pil(in_hw, out_hw):
    """resize_pil_bilinear gates eval parity: the reference rescales images
    with PIL Image.BILINEAR before tiling (eval.py:357)."""
    from PIL import Image

    from pinthememory_tpu.ops.resize import resize_pil_bilinear

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (*in_hw, 3), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(img).resize(out_hw[::-1], Image.BILINEAR),
        dtype=np.float64)
    ours = np.asarray(resize_pil_bilinear(jnp.asarray(img, jnp.float32), out_hw))
    # PIL rounds outputs to uint8 (±0.5) AND quantizes filter coefficients
    # to 8-bit fixed point (ImagingResampleHorizontal, PRECISION_BITS) --
    # the exact float filter lands within ~1.25 quanta; geometry errors
    # (wrong support/center) would show at tens of quanta.
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() <= 1.25


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 128), (32, 64)),    # 0.5x downscale (antialiased support widens)
    ((64, 128), (128, 256)),  # 2.0x upscale
    ((50, 70), (33, 47)),     # non-integer ratio
])
def test_pil_bicubic_matches_pil(in_hw, out_hw):
    """resize_pil_bicubic gates pooling-eval parity: the reference scales
    pooling inputs with PIL's DEFAULT resample -- BICUBIC
    (datasets/cityscapes.py:250-264, img.resize with no filter argument)."""
    from PIL import Image

    from pinthememory_tpu.ops.resize import resize_pil_bicubic

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (*in_hw, 3), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(img).resize(out_hw[::-1], Image.BICUBIC),
        dtype=np.float64)
    ours = np.asarray(resize_pil_bicubic(jnp.asarray(img, jnp.float32), out_hw))
    # emulate_uint8 reproduces PIL's horizontal-first passes with uint8
    # clamping between them (overshoot clipping); the residual is the 8-bit
    # filter-coefficient quantization, worth at most ~1 output quantum.
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() <= 1.0
