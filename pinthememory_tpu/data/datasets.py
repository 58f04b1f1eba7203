"""Dataset backends.  All emit 19-class Cityscapes trainIds, ignore=255.

Reference modules: datasets/{cityscapes,gtav,synthia,bdd100k,mapillary,idd,
kitti,camvid,video_folder,nullloader}.py.  Directory layouts follow the
reference's expectations under a shared ``dataset_root``
(config.py:68-91):

  cityscapes/leftImg8bit_trainvaltest/leftImg8bit/{train,val}/<city>/*.png
             gtFine_trainvaltest/gtFine/.../*_gtFine_labelIds.png
  GTAV/images/{train,valid,test}/<folder>/*.png + labels/... (RGB color masks)
  synthia/RGB/... + GT/LABELS/... (uint16 PNG, class in high byte)
  bdd-100k/seg/images/{train,val}/*.jpg + seg/labels/*_train_id.png
  mapillary/{training,validation}/images/*.jpg + labels/*.png (65-class ids)
  idd/leftImg8bit_trainvaltest/leftImg8bit/... (pre-mapped level-3 ids)
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from pinthememory_tpu.core import labels as L
from pinthememory_tpu.data.base import SegmentationDataset, find_pairs

_ID_LUT = L.id_to_trainid_lut()


def _lut_from_dict(d: dict[int, int], size: int = 256) -> np.ndarray:
    lut = np.full(size, 255, np.uint8)
    for k, v in d.items():
        if 0 <= k < size:
            lut[k] = v
    return lut


# Synthia 23-entry map (datasets/synthia.py:30-55)
SYNTHIA_LUT = _lut_from_dict({
    0: 255, 1: 10, 2: 2, 3: 0, 4: 1, 5: 4, 6: 8, 7: 5, 8: 13, 9: 7,
    10: 11, 11: 18, 12: 17, 13: 255, 14: 255, 15: 6, 16: 9, 17: 12,
    18: 14, 19: 15, 20: 16, 21: 3, 22: 255,
})

# Mapillary Vistas 66 -> 19 grouping (datasets/mapillary.py:39-131)
MAPILLARY_LUT = _lut_from_dict({
    13: 0, 24: 0, 41: 0, 2: 1, 15: 1, 17: 2, 6: 3, 3: 4, 45: 5, 47: 5,
    48: 6, 50: 7, 30: 8, 29: 9, 27: 10, 19: 11, 20: 12, 21: 12, 22: 12,
    55: 13, 61: 14, 54: 15, 58: 16, 57: 17, 52: 18,
})


def make_cv_splits(train_cities: list[str], val_cities: list[str],
                   num_splits: int = 3) -> list[dict]:
    """City-level cross-validation splits (cityscapes.py:85-117).

    Split 0 reproduces the official train/val; further splits rotate which
    cities act as validation.
    """
    all_cities = sorted(val_cities) + sorted(train_cities)
    num_val = len(val_cities)
    n = len(all_cities)
    splits = []
    for split_idx in range(num_splits):
        offset = split_idx * n // num_splits
        val = [all_cities[j] for j in range(n) if offset <= j < offset + num_val]
        train = [c for c in all_cities if c not in val]
        splits.append({"train": train, "val": val})
    return splits


class Cityscapes(SegmentationDataset):
    """datasets/cityscapes.py: labelIds masks remapped via label2trainid.

    ``cv_split`` selects a city-level 3-fold split (cv 0 == official
    train/val, cityscapes.py:173-181)."""

    def __init__(self, root: str, mode: str = "train", cv_split: int = 0,
                 max_skip: int = 0, aug_root: str = "", **kw):
        super().__init__(mode=mode, **kw)
        self.root = root
        base_img = os.path.join(root, "leftImg8bit_trainvaltest", "leftImg8bit")
        base_mask = os.path.join(root, "gtFine_trainvaltest", "gtFine")

        def pairs(split, cities=None):
            items = find_pairs(
                os.path.join(base_img, split), os.path.join(base_mask, split),
                "_leftImg8bit.png", "_gtFine_labelIds.png")
            if cities is not None:
                items = [p for p in items
                         if os.path.basename(os.path.dirname(p[0])) in cities]
            return items

        if mode == "trainval":
            # --city_mode trainval: train on train+val (datasets/__init__.py:339)
            self.imgs = pairs("train") + pairs("val")
        elif cv_split == 0:
            self.imgs = pairs("train" if mode == "train" else "val")
        else:
            tr_cities = _list_cities(os.path.join(base_img, "train"))
            va_cities = _list_cities(os.path.join(base_img, "val"))
            split = make_cv_splits(tr_cities, va_cities)[cv_split % 3]
            wanted = set(split["train" if mode == "train" else "val"])
            self.imgs = pairs("train", wanted) + pairs("val", wanted)

        if mode in ("train", "trainval") and max_skip > 0:
            # --maxSkip (cityscapes.py:48-80): sequence-neighbor frames at
            # frame +/- max_skip looked up under the auxiliary root
            # (cfg.DATASET.CITYSCAPES_AUG_DIR; flat leftImg8bit/<city>/ tree,
            # no split level) and kept only when image AND mask exist; they
            # land in aug_imgs, which class-uniform epochs mix in until
            # max_cu_epoch (train.py:178-183)
            self.aug_imgs = self._sequence_neighbors(
                self.imgs, aug_root, max_skip)

    @staticmethod
    def _sequence_neighbors(imgs, aug_root: str, max_skip: int):
        img_base = os.path.join(aug_root, "leftImg8bit_trainvaltest",
                                "leftImg8bit")
        mask_base = os.path.join(aug_root, "gtFine_trainvaltest", "gtFine")
        out = []
        for img_path, _mask_path in imgs:
            stem = os.path.basename(img_path)[: -len("_leftImg8bit.png")]
            parts = stem.split("_")
            if len(parts) < 3 or not parts[-1].isdigit():
                continue
            city = os.path.basename(os.path.dirname(img_path))
            for d in (-max_skip, max_skip):
                nstem = "_".join(parts[:-1]) + "_%06d" % (int(parts[-1]) + d)
                ni = os.path.join(img_base, city, nstem + "_leftImg8bit.png")
                nm = os.path.join(mask_base, city,
                                  nstem + "_gtFine_labelIds.png")
                if os.path.isfile(ni) and os.path.isfile(nm):
                    out.append((ni, nm))
        return out

    def decode_mask(self, mask_path: str) -> np.ndarray:
        raw = np.asarray(Image.open(mask_path), np.uint8)
        return _ID_LUT[raw]


def _list_cities(path: str) -> list[str]:
    return sorted(os.listdir(path)) if os.path.isdir(path) else []


class GTAV(SegmentationDataset):
    """datasets/gtav.py: RGB color masks -> trainIds via the color LUT
    (the reference's per-color Python loop, gtav.py:250-256, vectorized)."""

    def __init__(self, root: str, mode: str = "train", **kw):
        super().__init__(mode=mode, **kw)
        self.root = root
        split = {"train": "train", "val": "valid", "test": "test"}.get(mode, "train")
        img_root = os.path.join(root, "images", split)
        mask_root = os.path.join(root, "labels", split)
        self.imgs = find_pairs(img_root, mask_root, ".png", ".png")

    def decode_mask(self, mask_path: str) -> np.ndarray:
        rgb = np.asarray(Image.open(mask_path).convert("RGB"), np.uint8)
        return L.remap_color_mask(rgb)


class Synthia(SegmentationDataset):
    """datasets/synthia.py: uint16 PNGs (imageio PNG-FI); the class id lives
    in the first channel / high bits."""

    def __init__(self, root: str, mode: str = "train", **kw):
        super().__init__(mode=mode, **kw)
        self.root = root
        img_root = os.path.join(root, "RGB")
        mask_root = os.path.join(root, "GT", "LABELS")
        # the reference reads RGB/{train,val} subfolders (synthia.py:83-88),
        # materialized from split_data/synthia_split_*.txt (see
        # tools/make_splits.py); fall back to a flat RGB/ layout
        split = "train" if mode == "train" else "val"
        if os.path.isdir(os.path.join(img_root, split)):
            # only switch when BOTH sides are materialized; a missing
            # GT/LABELS/{split} must fail loudly, not yield an empty dataset
            if not os.path.isdir(os.path.join(mask_root, split)):
                raise FileNotFoundError(
                    f"Synthia: {img_root}/{split} exists but "
                    f"{mask_root}/{split} does not; run tools/make_splits.py "
                    "to materialize both sides of the split"
                )
            img_root = os.path.join(img_root, split)
            mask_root = os.path.join(mask_root, split)
        self.imgs = find_pairs(img_root, mask_root, ".png", ".png")

    def decode_mask(self, mask_path: str) -> np.ndarray:
        arr = _read_uint16_png(mask_path)
        if arr.ndim == 3:  # RGBA uint16: class id in channel 0
            arr = arr[..., 0]
        return SYNTHIA_LUT[np.clip(arr, 0, 255).astype(np.uint8)]


class BDD100K(SegmentationDataset):
    """datasets/bdd100k.py: masks are already trainIds (identity remap)."""

    def __init__(self, root: str, mode: str = "train", **kw):
        super().__init__(mode=mode, **kw)
        split = "train" if mode == "train" else "val"
        img_root = os.path.join(root, "seg", "images", split)
        mask_root = os.path.join(root, "seg", "labels", split)
        self.imgs = find_pairs(img_root, mask_root, ".jpg", "_train_id.png")

    def decode_mask(self, mask_path: str) -> np.ndarray:
        return np.asarray(Image.open(mask_path), np.uint8)


class Mapillary(SegmentationDataset):
    """datasets/mapillary.py: 66-class ids grouped to 19."""

    def __init__(self, root: str, mode: str = "train", test: bool = False, **kw):
        super().__init__(mode=mode, **kw)
        split = "training" if mode == "train" else "validation"
        img_root = os.path.join(root, split, "images")
        mask_root = os.path.join(root, split, "labels")
        self.imgs = find_pairs(img_root, mask_root, ".jpg", ".png")
        if test:  # truncate for --test_mode (mapillary.py:237-240)
            self.imgs = self.imgs[:200]

    def decode_mask(self, mask_path: str) -> np.ndarray:
        raw = np.asarray(Image.open(mask_path), np.uint8)
        return MAPILLARY_LUT[raw]


class IDD(SegmentationDataset):
    """datasets/idd.py: level-3 ids pre-mapped to trainIds (identity)."""

    def __init__(self, root: str, mode: str = "train", **kw):
        super().__init__(mode=mode, **kw)
        split = "train" if mode == "train" else "val"
        img_root = os.path.join(root, "leftImg8bit_trainvaltest", "leftImg8bit", split)
        mask_root = os.path.join(root, "gtFine_trainvaltest", "gtFine", split)
        self.imgs = find_pairs(img_root, mask_root, "_leftImg8bit.png", "_gtFine_labelids.png")
        if not self.imgs:
            self.imgs = find_pairs(img_root, mask_root, ".png", ".png")

    def decode_mask(self, mask_path: str) -> np.ndarray:
        return np.asarray(Image.open(mask_path), np.uint8)


class KITTI(SegmentationDataset):
    """datasets/kitti.py (legacy; unreachable from the reference's
    setup_loaders): KITTI-2015 semantics, Cityscapes id masks."""

    def __init__(self, root: str, mode: str = "train", **kw):
        super().__init__(mode=mode, **kw)
        img_root = os.path.join(root, "training", "image_2")
        mask_root = os.path.join(root, "training", "semantic")
        self.imgs = find_pairs(img_root, mask_root, ".png", ".png")

    def decode_mask(self, mask_path: str) -> np.ndarray:
        raw = np.asarray(Image.open(mask_path), np.uint8)
        return _ID_LUT[raw]


class CamVid(SegmentationDataset):
    """datasets/camvid.py (legacy): 11-class CamVid; masks assumed id-coded,
    mapped through the 11->19 grouping where classes correspond."""

    CAMVID_TO_TRAINID = _lut_from_dict({
        0: 10, 1: 2, 2: 5, 3: 0, 4: 1, 5: 8, 6: 7, 7: 4, 8: 13, 9: 11, 10: 18,
        11: 255,
    })

    def __init__(self, root: str, mode: str = "train", **kw):
        super().__init__(mode=mode, **kw)
        split = "train" if mode == "train" else "val"
        img_root = os.path.join(root, split)
        mask_root = os.path.join(root, split + "annot")
        self.imgs = find_pairs(img_root, mask_root, ".png", ".png")

    def decode_mask(self, mask_path: str) -> np.ndarray:
        raw = np.asarray(Image.open(mask_path), np.uint8)
        return self.CAMVID_TO_TRAINID[raw]


class VideoFolder(SegmentationDataset):
    """datasets/video_folder.py: label-free folder for qualitative demos."""

    def __init__(self, folder: str, **kw):
        super().__init__(mode="val", **kw)
        exts = (".png", ".jpg", ".jpeg")
        self.imgs = [
            (os.path.join(folder, f), os.path.join(folder, f))
            for f in sorted(os.listdir(folder))
            if f.lower().endswith(exts)
        ]

    def decode_mask(self, mask_path: str) -> np.ndarray:
        with Image.open(mask_path) as im:
            w, h = im.size
        return np.full((h, w), 255, np.uint8)


class NullLoader(SegmentationDataset):
    """Synthetic zeros dataset 'for Performance' (datasets/nullloader.py) --
    the shape/perf fixture.  Unlike the reference's (which crashes on a
    case-mismatch, SURVEY.md §2.4), this one works."""

    def __init__(self, crop_size: int = 768, length: int = 2975, classes: int = 19, **kw):
        kw.setdefault("mode", "train")
        super().__init__(**kw)
        self.crop_size = crop_size
        self.length = length
        self.classes = classes
        self.imgs = [("null", "null")] * length

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        rng = np.random.default_rng((self.seed * 1_000_003 + self.epoch) * 1_000_003 + index)
        c = self.crop_size
        img = rng.standard_normal((c, c, 3), dtype=np.float32)
        mask = rng.integers(0, self.classes, (c, c)).astype(np.int32)
        if self.eval_mode == "aug_pair":
            return img, img + 0.1, img[:, ::-1].copy(), f"null_{index}"
        if self.eval_mode:
            raw = (np.clip(img, -2, 2) * 60 + 128).astype(np.uint8)
            return raw, mask, f"null_{index}"
        return img, mask, f"null_{index}", mask.copy()

    def decode_mask(self, mask_path):
        raise NotImplementedError


class ShapesLoader(SegmentationDataset):
    """Signal-bearing synthetic fixture: colored rectangles/disks on a gray
    background, class recoverable from color alone.

    The reference's only synthetic fixture is the zeros NullLoader, so
    nothing there can demonstrate that the assembled trainer *optimizes*
    (its proof was the released checkpoints, README.md:135-138).  This
    dataset carries real signal -- a trivially learnable color->class map
    plus mild sensor noise -- so the learnability gate
    (tests/test_learnability.py) can overfit the flagship recipe shape
    end-to-end through the CLI and assert val mIoU far above chance.
    """

    # background (class 0) is gray; classes 1..5 get well-separated colors
    PALETTE = np.array([
        [96, 96, 96], [220, 40, 40], [40, 200, 60], [50, 80, 220],
        [230, 220, 50], [200, 60, 200],
    ], np.float32)

    DEFAULT_LENGTH = 2975  # reference epoch length; tests shrink this

    def __init__(self, crop_size: int = 768, length: int | None = None,
                 classes: int = 5, **kw):
        kw.setdefault("mode", "train")
        super().__init__(**kw)
        self.crop_size = crop_size
        self.classes = min(classes, len(self.PALETTE))
        length = self.DEFAULT_LENGTH if length is None else length
        self.length = length if self.mode == "train" else max(8, length // 256)
        self.imgs = [("shapes", "shapes")] * self.length

    def __len__(self):
        return self.length

    def _render(self, rng: np.random.Generator):
        c = self.crop_size
        img = np.full((c, c, 3), self.PALETTE[0], np.float32)
        mask = np.zeros((c, c), np.uint8)
        yy, xx = np.mgrid[0:c, 0:c]
        for _ in range(int(rng.integers(4, 8))):
            cls = int(rng.integers(1, self.classes))
            cy, cx = (int(v) for v in rng.integers(0, c, 2))
            r = int(rng.integers(max(2, c // 10), max(3, c // 3)))
            if rng.integers(0, 2) == 0:
                sel = (np.abs(yy - cy) <= r) & (np.abs(xx - cx) <= r)
            else:
                sel = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            img[sel] = self.PALETTE[cls]
            mask[sel] = cls
        img = img + rng.normal(0.0, 8.0, img.shape)
        return np.clip(img, 0, 255).astype(np.uint8), mask

    def __getitem__(self, index):
        from pinthememory_tpu.data import transforms as xt

        # val items draw from a disjoint stream (mode mixed into the seed)
        salt = 0 if self.mode == "train" else 7_777_777
        rng = np.random.default_rng(
            ((self.seed + salt) * 1_000_003 + self.epoch) * 1_000_003 + index)
        raw, mask = self._render(rng)
        name = f"shapes_{self.mode}_{index}"
        if self.eval_mode == "aug_pair":
            f = xt.normalize(xt.to_float01(raw), image_in=self.image_in)
            bright = np.clip(raw.astype(np.float32) * 1.2, 0, 255).astype(np.uint8)
            fb = xt.normalize(xt.to_float01(bright), image_in=self.image_in)
            return f.astype(np.float32), fb.astype(np.float32), f[:, ::-1].copy(), name
        if self.eval_mode:
            return raw, mask.astype(np.int32), name
        img = xt.normalize(xt.to_float01(raw), image_in=self.image_in)
        m = mask.astype(np.int32)
        return img.astype(np.float32), m, name, m.copy()

    def decode_mask(self, mask_path):
        raise NotImplementedError


def _read_uint16_png(path: str) -> np.ndarray:
    """Read a 16-bit PNG (Synthia GT) without imageio's FreeImage plugin."""
    img = Image.open(path)
    arr = np.asarray(img)
    return arr


DATASETS = {
    "cityscapes": (Cityscapes, "cityscapes"),
    "gtav": (GTAV, "GTAV"),
    "synthia": (Synthia, "synthia"),
    "bdd100k": (BDD100K, "bdd-100k"),
    "mapillary": (Mapillary, "mapillary"),
    "idd": (IDD, "idd"),
    "kitti": (KITTI, "kitti"),
    "camvid": (CamVid, "camvid"),
    "null_loader": (NullLoader, None),
    "shapes_loader": (ShapesLoader, None),
}
