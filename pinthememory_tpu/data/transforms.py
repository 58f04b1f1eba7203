"""Photometric (image-only) transforms, numpy/PIL, explicit RNG.

Reference: transforms/transforms.py + the torchvision transforms the
reference composes (datasets/__init__.py:74-144).  Every transform takes a
``random.Random`` so the pipeline is replayable (the reference uses global
RNG; SURVEY.md §5 calls for explicit seeding).
"""

from __future__ import annotations

import random
from typing import Callable, Sequence

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, img, rng: random.Random):
        for t in self.transforms:
            img = t(img, rng)
        return img


class RandomApply:
    def __init__(self, transforms: Sequence[Callable], p: float = 0.5):
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, img, rng: random.Random):
        if rng.random() < self.p:
            for t in self.transforms:
                img = t(img, rng)
        return img


class ColorJitter:
    """torchvision ColorJitter semantics: factors sampled uniformly from
    [max(0, 1-v), 1+v] (hue from [-h, h]), applied in random order."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img: Image.Image, rng: random.Random) -> Image.Image:
        ops = []
        if self.brightness > 0:
            f = rng.uniform(max(0.0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast > 0:
            f = rng.uniform(max(0.0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation > 0:
            f = rng.uniform(max(0.0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue > 0:
            f = rng.uniform(-self.hue, self.hue)
            ops.append(lambda im, f=f: _adjust_hue(im, f))
        rng.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


def _adjust_hue(img: Image.Image, factor: float) -> Image.Image:
    """Shift hue by ``factor`` (in turns), torchvision-style.

    No zero-factor shortcut: the reference (transforms.py:311-316) always
    performs the RGB->HSV->RGB round trip when the hue op runs, and that
    round trip is LOSSY -- pixel parity requires doing it even for
    factor 0."""
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    np_h = (np_h.astype(np.int16) + int(factor * 255)) % 256
    h = Image.fromarray(np_h.astype(np.uint8), "L")
    return Image.merge("HSV", (h, s, v)).convert("RGB")


class RandomGaussianBlur:
    """skimage.filters.gaussian with sigma ~ U[0.15, 1.30]
    (transforms/transforms.py:179-188), via scipy."""

    def __call__(self, img: Image.Image, rng: random.Random) -> Image.Image:
        from scipy.ndimage import gaussian_filter

        sigma = 0.15 + rng.random() * 1.15
        arr = np.asarray(img, dtype=np.float64) / 255.0
        out = np.stack(
            [gaussian_filter(arr[..., c], sigma, mode="nearest") for c in range(arr.shape[-1])],
            axis=-1,
        )
        return Image.fromarray((out * 255).astype(np.uint8))


class RandomBilateralBlur:
    """Bilateral filter, sigma_spatial ~ U[0.05, 0.75]
    (transforms/transforms.py:198-206).  Approximated with a small joint
    bilateral implementation in numpy (skimage absent in this environment)."""

    def __call__(self, img: Image.Image, rng: random.Random) -> Image.Image:
        sigma_spatial = rng.uniform(0.05, 0.75)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        out = _bilateral(arr, sigma_spatial=max(sigma_spatial, 0.3), sigma_color=0.1)
        return Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))


def _bilateral(img: np.ndarray, sigma_spatial: float, sigma_color: float) -> np.ndarray:
    radius = max(int(2 * sigma_spatial), 1)
    h, w, c = img.shape
    acc = np.zeros_like(img)
    norm = np.zeros((h, w, 1), img.dtype)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sw = np.exp(-(dx * dx + dy * dy) / (2 * sigma_spatial**2))
            shifted = np.roll(img, (dy, dx), axis=(0, 1))
            cw = np.exp(-np.sum((shifted - img) ** 2, -1, keepdims=True) / (2 * sigma_color**2))
            wgt = sw * cw
            acc += wgt * shifted
            norm += wgt
    return acc / np.maximum(norm, 1e-8)


class HideAndSeek:
    """Grid occlusion (transforms/transforms.py:52-75): divide into a random
    grid and zero each cell with p=0.5.  (Declared by the reference's
    ``writeTF`` but effectively identity on the live path, memory.py:118.)"""

    def __init__(self, grids=(0, 16, 32, 44, 56), p_hide: float = 0.5):
        self.grids = grids
        self.p_hide = p_hide

    def __call__(self, img: np.ndarray, rng: random.Random) -> np.ndarray:
        grid = rng.choice(list(self.grids))
        if grid == 0:
            return img
        out = img.copy()
        h, w = img.shape[:2]
        for y in range(0, h, grid):
            for x in range(0, w, grid):
                if rng.random() <= self.p_hide:
                    out[y : y + grid, x : x + grid] = 0
        return out


def find_boundaries_thick(labels: np.ndarray) -> np.ndarray:
    """``skimage.segmentation.find_boundaries(mode='thick')`` for 2-D labels.

    A pixel is a boundary pixel iff any 4-neighbor (the default
    connectivity-1 footprint) carries a different label — pixels on BOTH
    sides of a label change are marked.  Implemented directly because
    skimage is not a dependency; used by the reduce-border schedule
    (reference transforms/transforms.py:130).
    """
    b = np.zeros(labels.shape, bool)
    d = labels[:-1, :] != labels[1:, :]
    b[:-1, :] |= d
    b[1:, :] |= d
    d = labels[:, :-1] != labels[:, 1:]
    b[:, :-1] |= d
    b[:, 1:] |= d
    return b


def relaxed_boundary_multihot(
    mask: np.ndarray,
    num_classes: int = 19,
    ignore_id: int = 255,
    border: int = 1,
    strict_classes: tuple[int, ...] = (),
    reduce_border: bool = False,
) -> np.ndarray:
    """Border-relaxed multi-hot target (transforms/transforms.py:99-148).

    Each pixel's target is the union of one-hot labels in the
    (2*border+1)^2 window around it (out-of-range shifts fill with the
    ignore slot).  Returns (H, W, num_classes+1) uint8, ignore in the last
    channel.

    ``strict_classes`` (cfg.STRICTBORDERCLASS, --strict_bdr_cls): pixels
    whose own label is in the list keep their strict one-hot target instead
    of the relaxed union (transforms.py:120-127, 139-141).

    ``reduce_border`` (cfg.REDUCE_BORDER_ITER, --rlx_off_iter): once the
    training iteration passes the threshold the window shrinks to
    ``border // 2`` and targets on label boundaries (skimage 'thick' mode)
    are DOUBLED to 2 (transforms.py:128-131, 144-146); the doubled values
    flow into ImgWtLossSoftNLL's border weights and per-image class
    histogram exactly as in the reference.
    """
    m = mask.astype(np.int64).copy()
    m[m == ignore_id] = num_classes
    h, w = m.shape

    strict_mask = None
    one_hot_orig = None
    if strict_classes:
        strict_mask = np.isin(m, np.asarray(strict_classes, np.int64))
        one_hot_orig = np.zeros((h, w, num_classes + 1), np.uint8)
        one_hot_orig.reshape(-1, num_classes + 1)[
            np.arange(h * w), m.ravel()] = 1

    boundary = None
    if reduce_border:
        border = border // 2
        boundary = find_boundaries_thick(m)

    out = np.zeros((h, w, num_classes + 1), np.uint8)
    for dy in range(-border, border + 1):
        for dx in range(-border, border + 1):
            shifted = np.full_like(m, num_classes)
            ys = slice(max(dy, 0), h + min(dy, 0))
            yd = slice(max(-dy, 0), h + min(-dy, 0))
            xs = slice(max(dx, 0), w + min(dx, 0))
            xd = slice(max(-dx, 0), w + min(-dx, 0))
            shifted[yd, xd] = m[ys, xs]
            idx = np.arange(h * w)
            flat = out.reshape(-1, num_classes + 1)
            flat[idx, shifted.ravel()] = 1
    if strict_mask is not None:
        out = np.where(strict_mask[..., None], one_hot_orig, out)
    if boundary is not None:
        out = np.where(boundary[..., None], 2 * out, out).astype(np.uint8)
    return out


def to_float01(img: Image.Image) -> np.ndarray:
    """ToTensor equivalent: HWC float32 in [0, 1]."""
    return np.asarray(img, dtype=np.float32) / 255.0


def normalize(img01: np.ndarray, image_in: bool = False) -> np.ndarray:
    """ImageNet (or per-image, cityscapes.py:300-306) normalization."""
    if image_in:
        mean = img01.mean(axis=(0, 1))
        std = img01.std(axis=(0, 1)) + 1e-5
        return (img01 - mean) / std
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD


def build_train_input_transform(color_aug: float, gblur: bool, bblur: bool) -> Compose:
    """Photometric pipeline (datasets/__init__.py:74-90).  NB the reference
    always jitters with (0.4, 0.4, 0.4, 0.1) when color_aug > 0."""
    ts: list = []
    if color_aug > 0:
        ts.append(RandomApply([ColorJitter(0.4, 0.4, 0.4, 0.1)], p=0.5))
    if bblur:
        ts.append(RandomBilateralBlur())
    elif gblur:
        ts.append(RandomGaussianBlur())
    return Compose(ts)


def build_meta_transform() -> Compose:
    """The 'hard' meta-test photometric transform
    (datasets/__init__.py:128-144)."""
    return Compose([ColorJitter(0.8, 0.8, 0.8, 0.3), RandomGaussianBlur()])
