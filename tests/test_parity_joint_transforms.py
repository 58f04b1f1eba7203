"""Joint-transform parity against the ACTUAL reference
transforms/joint_transforms.py.

The rebuild's transforms mirror the reference's RNG draw structure
(``rng.randint``/``rng.uniform``/``rng.random`` in the same order), so
seeding the reference's global ``random`` and handing the rebuild a
``random.Random`` with the same seed must produce BIT-IDENTICAL images and
masks.  Covered: RandomCrop (centroid clamp, nopad shrink, pad path),
RandomSizeAndCrop (scale draw + crop, pre_size), RandomHorizontallyFlip,
Resize, Scale (longer-side), ResizeHeight, CenterCropPad (pad + crop
branches).  RandomRotate is excluded: the reference routes it through
torchvision.transforms.functional.affine, which this environment stubs.
"""

import random

import numpy as np
import pytest
from PIL import Image

from pinthememory_tpu.data import joint_transforms as ours

from ref_harness import import_reference_module, reference_env


@pytest.fixture(scope="module")
def ref_jt():
    with reference_env():
        return import_reference_module("transforms.joint_transforms")


def _fixture(w=97, h=61, seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    mask = Image.fromarray(rng.integers(0, 19, (h, w), np.uint8))
    return img, mask


def _assert_pair_equal(ref_out, our_out, what):
    ri, rm = ref_out[:2]
    oi, om = our_out[:2]
    np.testing.assert_array_equal(np.array(oi), np.array(ri), err_msg=what)
    np.testing.assert_array_equal(np.array(om), np.array(rm), err_msg=what)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("centroid", [None, (30, 20), (95, 60)])
def test_random_crop_parity(ref_jt, seed, centroid):
    img, mask = _fixture()
    ref_t = ref_jt.RandomCrop(32, ignore_index=255, nopad=True)
    our_t = ours.RandomCrop(32, ignore_index=255, nopad=True)
    random.seed(seed)
    with reference_env():
        ref_out = ref_t(img, mask, centroid=centroid)
    our_out = our_t(img, mask, random.Random(seed), centroid=centroid)
    _assert_pair_equal(ref_out, our_out, f"crop seed={seed} c={centroid}")


@pytest.mark.parametrize("nopad", [True, False])
def test_random_crop_small_image_paths(ref_jt, nopad):
    """crop > image: nopad shrinks to the shorter side, pad expands
    (joint_transforms.py:93-113)."""
    img, mask = _fixture(w=24, h=40, seed=3)
    ref_t = ref_jt.RandomCrop(48, ignore_index=255, nopad=nopad)
    our_t = ours.RandomCrop(48, ignore_index=255, nopad=nopad)
    random.seed(7)
    with reference_env():
        ref_out = ref_t(img, mask)
    our_out = our_t(img, mask, random.Random(7))
    _assert_pair_equal(ref_out, our_out, f"small-image nopad={nopad}")


@pytest.mark.parametrize("pre_size", [None, 48])
@pytest.mark.parametrize("seed", [0, 5])
def test_random_size_and_crop_parity(ref_jt, pre_size, seed):
    img, mask = _fixture(w=80, h=50, seed=4)
    ref_t = ref_jt.RandomSizeAndCrop(
        40, crop_nopad=False, scale_min=0.5, scale_max=2.0,
        ignore_index=255, pre_size=pre_size)
    our_t = ours.RandomSizeAndCrop(
        40, crop_nopad=False, scale_min=0.5, scale_max=2.0,
        ignore_index=255, pre_size=pre_size)
    random.seed(seed)
    with reference_env():
        ref_out = ref_t(img, mask, centroid=[33, 21])
    our_out = our_t(img, mask, random.Random(seed), centroid=[33, 21])
    _assert_pair_equal(ref_out, our_out, f"rsc pre={pre_size} seed={seed}")


def test_flip_parity_both_outcomes(ref_jt):
    img, mask = _fixture(seed=5)
    flipped = {True: 0, False: 0}
    for seed in range(6):
        random.seed(seed)
        with reference_env():
            ref_out = ref_jt.RandomHorizontallyFlip()(img, mask)
        our_out = ours.RandomHorizontallyFlip()(img, mask, random.Random(seed))
        did = not np.array_equal(np.array(ref_out[0]), np.array(img))
        flipped[did] += 1
        _assert_pair_equal(ref_out, our_out, f"flip seed={seed}")
    assert flipped[True] and flipped[False]  # both branches exercised


def test_deterministic_resizes_parity(ref_jt):
    img, mask = _fixture(w=70, h=46, seed=6)
    cases = [
        (ref_jt.Resize(32), ours.Resize(32), "Resize"),
        (ref_jt.Scale(64), ours.Scale(64), "Scale(longer side)"),
        (ref_jt.ResizeHeight(40), ours.ResizeHeight(40), "ResizeHeight"),
    ]
    for ref_t, our_t, what in cases:
        with reference_env():
            ref_out = ref_t(img, mask)
        our_out = our_t(img, mask, random.Random(0))
        _assert_pair_equal(ref_out, our_out, what)


@pytest.mark.parametrize("wh", [(70, 46), (30, 46), (70, 20), (20, 20)])
def test_center_crop_pad_parity(ref_jt, wh):
    """Both branches: image larger (center crop) and smaller (pad with
    ignore fill) than the target, per axis (joint_transforms.py:260-295 --
    including the quirk that the crop origin uses the PRE-pad size)."""
    w, h = wh
    img, mask = _fixture(w=w, h=h, seed=8)
    ref_t = ref_jt.CenterCropPad(36, ignore_index=255)
    our_t = ours.CenterCropPad(36, ignore_index=255)
    with reference_env():
        ref_out = ref_t(img, mask)
    our_out = our_t(img, mask, random.Random(0))
    _assert_pair_equal(ref_out, our_out, f"ccp {wh}")
