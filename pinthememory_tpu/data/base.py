"""Base segmentation dataset: enumeration + decode + transform + remap.

Reference pattern: every dataset module (datasets/cityscapes.py etc.) repeats
the same ``__getitem__`` choreography -- decode, remap to trainIds, joint
geometric transform, photometric transform, normalize, emit
``(img, mask, name, aux_mask)``.  Here that choreography lives once; dataset
subclasses provide item enumeration and mask decoding only.

Samples are deterministic: the per-item RNG is seeded with
(base_seed, epoch, index), making every batch replayable (the reference
relies on global RNG).
"""

from __future__ import annotations

import os
import random
from typing import Callable, Sequence

import numpy as np
from PIL import Image

from pinthememory_tpu.data import transforms as xt


class SegmentationDataset:
    num_classes = 19
    ignore_label = 255

    def __init__(
        self,
        mode: str = "train",
        joint_transform=None,
        input_transform=None,
        image_in: bool = False,
        seed: int = 0,
        eval_mode: str | None = None,
        meta_transform=None,
        dump_images: bool = False,
        jointwtborder: bool = False,
    ):
        self.mode = mode
        self.joint_transform = joint_transform
        self.input_transform = input_transform
        self.image_in = image_in
        self.seed = seed
        self.epoch = 0
        self.eval_mode = eval_mode
        self.meta_transform = meta_transform
        self.running_metatest = False  # cityscapes.py:290-295
        # opt-in "intended" MLDG variant: emit (normal, hard-aug) image pairs
        # so the trainer can hard-augment exactly the episode's meta-test
        # domains (the reference instead flips running_metatest on domain 0
        # permanently -- train.py:199-211; see arm_meta_augmentation)
        self.emit_meta_pair = False
        self.dump_images = dump_images
        self.jointwtborder = jointwtborder
        # border-relaxation schedule state (reference cfg.STRICTBORDERCLASS /
        # cfg.BORDER_WINDOW / cfg.REDUCE_BORDER_ITER<cfg.ITER; the trainer
        # flips reduce_border per epoch exactly when the reference updates
        # cfg.ITER, train.py:147-149)
        self.strict_bdr_cls: tuple[int, ...] = ()
        self.border_window: int = 1
        self.reduce_border: bool = False
        self.imgs: list[tuple[str, str]] = []
        # extra (coarse/auxiliary) images mixed into class-uniform epochs
        # until max_cu_epoch, then dropped by build_epoch(cut=True)
        # (cityscapes.py:440-457: imgs+aug_imgs/centroids vs imgs/
        # fine_centroids) -- empty unless a dataset mode populates it
        self.aug_imgs: list[tuple[str, str]] = []
        # class-uniform build_epoch may replace this with (img, mask, centroid,
        # class) tuples (datasets/uniform.py:272-301)
        self.imgs_uniform: list | None = None

    # -- subclass surface -------------------------------------------------
    def decode_mask(self, mask_path: str) -> np.ndarray:
        """Return (H, W) uint8 trainIds."""
        raise NotImplementedError

    # ---------------------------------------------------------------------
    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.imgs_uniform if self.imgs_uniform is not None else self.imgs)

    def _load(self, index: int):
        pool = self.imgs_uniform if self.imgs_uniform is not None else self.imgs
        entry = pool[index]
        centroid = None
        if len(entry) == 4:
            img_path, mask_path, centroid, _cls = entry
        else:
            img_path, mask_path = entry[:2]
        img = Image.open(img_path).convert("RGB")
        mask = self.decode_mask(mask_path)
        name = os.path.splitext(os.path.basename(img_path))[0]
        return img, mask, name, centroid

    def __getitem__(self, index: int):
        # stable int mix: random.Random rejects tuple seeds on py3.12
        rng = random.Random((self.seed * 1_000_003 + self.epoch) * 1_000_003 + index)
        img, mask_np, name, centroid = self._load(index)
        mask = Image.fromarray(mask_np, mode="L")

        if self.eval_mode == "aug_pair":
            # ISW covstat fixture (reference: CityScapesAug,
            # datasets/cityscapes.py:524-625): (original, photometric-aug,
            # geometric-aug) triplet, each normalized independently.
            if self.joint_transform is not None:
                img, mask = self.joint_transform(img, mask, rng, centroid)
            color_t = xt.Compose([xt.ColorJitter(0.8, 0.8, 0.8, 0.3),
                                  xt.RandomGaussianBlur()])
            img_color = color_t(img, rng)
            img_geom = img.transpose(Image.FLIP_LEFT_RIGHT)
            out = []
            for im in (img, img_color, img_geom):
                out.append(xt.normalize(xt.to_float01(im), image_in=self.image_in)
                           .astype(np.float32))
            return out[0], out[1], out[2], name

        if self.eval_mode:
            # sliding/pooling eval: raw uint8 image + trainId mask; the
            # device-side evaluator handles scaling/normalization.
            return np.asarray(img, np.uint8), mask_np.astype(np.int32), name

        if self.joint_transform is not None:
            img, mask = self.joint_transform(img, mask, rng, centroid)

        if self.emit_meta_pair and self.meta_transform is not None:
            # per-episode variant: both photometric versions of the same
            # geometric crop; trainer picks index 1 for meta-test domains
            img_norm = (self.input_transform(img, rng)
                        if self.input_transform is not None else img)
            img_hard = self.meta_transform(img, rng)
            imgn = np.stack([
                xt.normalize(xt.to_float01(img_norm), image_in=self.image_in),
                xt.normalize(xt.to_float01(img_hard), image_in=self.image_in),
            ])  # (2, H, W, C)
        else:
            if self.running_metatest and self.meta_transform is not None:
                img = self.meta_transform(img, rng)
            elif self.input_transform is not None:
                img = self.input_transform(img, rng)
            img01 = xt.to_float01(img)
            imgn = xt.normalize(img01, image_in=self.image_in)
        m = np.asarray(mask, np.int32)
        if self.jointwtborder:
            # border-relaxed multi-hot main target; aux stays integer
            # (datasets/__init__.py:155-166)
            mh = xt.relaxed_boundary_multihot(
                m, self.num_classes, self.ignore_label,
                border=self.border_window,
                strict_classes=self.strict_bdr_cls,
                reduce_border=self.reduce_border)
            return imgn.astype(np.float32), mh, name, m
        return imgn.astype(np.float32), m, name, m.copy()


def find_pairs(
    img_root: str,
    mask_root: str,
    img_suffix: str,
    mask_suffix: str,
    recursive: bool = True,
) -> list[tuple[str, str]]:
    """Enumerate (image, mask) pairs by suffix substitution."""
    items = []
    if not os.path.isdir(img_root):
        return items
    for dirpath, _dirs, files in sorted(os.walk(img_root)):
        for f in sorted(files):
            if not f.endswith(img_suffix):
                continue
            rel = os.path.relpath(os.path.join(dirpath, f), img_root)
            mask_rel = rel[: -len(img_suffix)] + mask_suffix
            mask_path = os.path.join(mask_root, mask_rel)
            if os.path.exists(mask_path):
                items.append((os.path.join(dirpath, f), mask_path))
        if not recursive:
            break
    return items
