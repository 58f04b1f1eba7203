"""Joint image+mask geometric transforms (PIL), explicit RNG.

Reference: transforms/joint_transforms.py.  Geometry must match exactly: the
random-scale BICUBIC resize + (padded) random crop defines the training
distribution, and ResizeHeight/CenterCropPad define the Mapillary eval
protocol (datasets/__init__.py:581-584).
"""

from __future__ import annotations

import random
from typing import Callable, Sequence

from PIL import Image, ImageOps


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, img, mask, rng: random.Random, centroid=None):
        for t in self.transforms:
            if isinstance(t, (RandomSizeAndCrop, RandomCrop)):
                img, mask = t(img, mask, rng, centroid)
                centroid = None  # consumed by the crop
            else:
                img, mask = t(img, mask, rng)
        return img, mask


class RandomCrop:
    """Random crop with optional centroid constraint and pad-or-shrink
    handling (joint_transforms.py:61-141)."""

    def __init__(self, size, ignore_index=255, nopad=True):
        self.size = (size, size) if isinstance(size, int) else size
        self.ignore_index = ignore_index
        self.nopad = nopad

    def __call__(self, img, mask, rng: random.Random, centroid=None):
        w, h = img.size
        th, tw = self.size
        if w == tw and h == th:
            return img, mask

        if self.nopad:
            if th > h or tw > w:
                shorter = min(w, h)
                th, tw = shorter, shorter
        else:
            pad_h = (th - h) // 2 + 1 if th > h else 0
            pad_w = (tw - w) // 2 + 1 if tw > w else 0
            if pad_h or pad_w:
                border = (pad_w, pad_h, pad_w, pad_h)
                img = ImageOps.expand(img, border=border, fill=(0, 0, 0))
                mask = ImageOps.expand(mask, border=border, fill=self.ignore_index)
                w, h = img.size

        if centroid is not None:
            c_x, c_y = centroid
            max_x, max_y = w - tw, h - th
            x1 = min(max_x, max(0, rng.randint(c_x - tw, c_x)))
            y1 = min(max_y, max(0, rng.randint(c_y - th, c_y)))
        else:
            x1 = 0 if w == tw else rng.randint(0, w - tw)
            y1 = 0 if h == th else rng.randint(0, h - th)
        box = (x1, y1, x1 + tw, y1 + th)
        return img.crop(box), mask.crop(box)


class RandomSizeAndCrop:
    """Random uniform scale (BICUBIC/NEAREST) then RandomCrop
    (joint_transforms.py:414-444)."""

    def __init__(self, size, crop_nopad=False, scale_min=0.5, scale_max=2.0,
                 ignore_index=255, pre_size=None):
        self.crop = RandomCrop(size, ignore_index=ignore_index, nopad=crop_nopad)
        self.scale_min = scale_min
        self.scale_max = scale_max
        self.pre_size = pre_size

    def __call__(self, img, mask, rng: random.Random, centroid=None):
        if self.pre_size is None:
            scale_amt = 1.0
        elif img.size[1] < img.size[0]:
            scale_amt = self.pre_size / img.size[1]
        else:
            scale_amt = self.pre_size / img.size[0]
        scale_amt *= rng.uniform(self.scale_min, self.scale_max)
        w, h = [int(i * scale_amt) for i in img.size]
        if centroid is not None:
            centroid = [int(c * scale_amt) for c in centroid]
        img = img.resize((w, h), Image.BICUBIC)
        mask = mask.resize((w, h), Image.NEAREST)
        return self.crop(img, mask, rng, centroid)


class Resize:
    """Resize both to an exact (size, size) square (joint_transforms.py:311-332)."""

    def __init__(self, size):
        self.size = (size, size)

    def __call__(self, img, mask, rng=None):
        w, h = img.size
        if w == h and (w, h) == self.size:
            return img, mask
        return img.resize(self.size, Image.BICUBIC), mask.resize(self.size, Image.NEAREST)


class ResizeHeight:
    def __init__(self, size, interpolation=Image.BICUBIC):
        self.target_h = size
        self.interpolation = interpolation

    def __call__(self, img, mask, rng=None):
        w, h = img.size
        target_w = int(w / h * self.target_h)
        return (img.resize((target_w, self.target_h), self.interpolation),
                mask.resize((target_w, self.target_h), Image.NEAREST))


class CenterCropPad:
    def __init__(self, size, ignore_index=255):
        self.size = (size, size) if isinstance(size, int) else size
        self.ignore_index = ignore_index

    def __call__(self, img, mask, rng=None):
        w, h = img.size
        tw, th = (self.size[0], self.size[1])
        pad_x = tw - w if w < tw else 0
        pad_y = th - h if h < th else 0
        if pad_x or pad_y:
            img = ImageOps.expand(img, border=(pad_x, pad_y, pad_x, pad_y), fill=0)
            mask = ImageOps.expand(mask, border=(pad_x, pad_y, pad_x, pad_y),
                                   fill=self.ignore_index)
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        return img.crop((x1, y1, x1 + tw, y1 + th)), mask.crop((x1, y1, x1 + tw, y1 + th))


class RandomHorizontallyFlip:
    def __call__(self, img, mask, rng: random.Random):
        if rng.random() < 0.5:
            return (img.transpose(Image.FLIP_LEFT_RIGHT),
                    mask.transpose(Image.FLIP_LEFT_RIGHT))
        return img, mask


class RandomRotate:
    def __init__(self, degree, ignore_index=255):
        self.degree = degree
        self.ignore_index = ignore_index

    def __call__(self, img, mask, rng: random.Random):
        deg = rng.random() * 2 * self.degree - self.degree
        return (img.rotate(deg, Image.BILINEAR),
                mask.rotate(deg, Image.NEAREST, fillcolor=self.ignore_index))


class Scale:
    """Scale the LONGER side to ``size`` keeping aspect
    (joint_transforms.py:260-281)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, img, mask, rng=None):
        w, h = img.size
        if (w >= h and w == self.size) or (h >= w and h == self.size):
            return img, mask
        if w > h:
            ow = self.size
            oh = int(self.size * h / w)
        else:
            oh = self.size
            ow = int(self.size * w / h)
        return (img.resize((ow, oh), Image.BICUBIC),
                mask.resize((ow, oh), Image.NEAREST))


def build_train_joint_transform(
    crop_size: int, crop_nopad: bool, pre_size, scale_min: float,
    scale_max: float, rrotate: int, ignore_index: int = 255,
) -> Compose:
    """datasets/__init__.py:29-60."""
    ts: list = [
        RandomSizeAndCrop(crop_size, crop_nopad=crop_nopad, pre_size=pre_size,
                          scale_min=scale_min, scale_max=scale_max,
                          ignore_index=ignore_index),
        Resize(crop_size),
        RandomHorizontallyFlip(),
    ]
    if rrotate > 0:
        ts.append(RandomRotate(degree=rrotate, ignore_index=ignore_index))
    return Compose(ts)
