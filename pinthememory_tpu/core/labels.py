"""Canonical Cityscapes label space shared by every dataset.

All datasets in the framework are harmonized to the 19 Cityscapes training
classes with ignore label 255, mirroring the reference's
``datasets/cityscapes_labels.py`` (which is itself the public cityscapesScripts
table).  We keep the data as plain tuples and derive fast numpy lookup tables
(LUTs) from them; the per-pixel remapping itself runs through the native C++
helper in :mod:`pinthememory_tpu.native` when available.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Label(NamedTuple):
    name: str
    id: int
    train_id: int
    category: str
    category_id: int
    has_instances: bool
    ignore_in_eval: bool
    color: tuple[int, int, int]


# The official Cityscapes 34-entry label table (public cityscapesScripts data;
# reference: datasets/cityscapes_labels.py:23-100).
LABELS: list[Label] = [
    Label("unlabeled", 0, 255, "void", 0, False, True, (0, 0, 0)),
    Label("ego vehicle", 1, 255, "void", 0, False, True, (0, 0, 0)),
    Label("rectification border", 2, 255, "void", 0, False, True, (0, 0, 0)),
    Label("out of roi", 3, 255, "void", 0, False, True, (0, 0, 0)),
    Label("static", 4, 255, "void", 0, False, True, (0, 0, 0)),
    Label("dynamic", 5, 255, "void", 0, False, True, (111, 74, 0)),
    Label("ground", 6, 255, "void", 0, False, True, (81, 0, 81)),
    Label("road", 7, 0, "flat", 1, False, False, (128, 64, 128)),
    Label("sidewalk", 8, 1, "flat", 1, False, False, (244, 35, 232)),
    Label("parking", 9, 255, "flat", 1, False, True, (250, 170, 160)),
    Label("rail track", 10, 255, "flat", 1, False, True, (230, 150, 140)),
    Label("building", 11, 2, "construction", 2, False, False, (70, 70, 70)),
    Label("wall", 12, 3, "construction", 2, False, False, (102, 102, 156)),
    Label("fence", 13, 4, "construction", 2, False, False, (190, 153, 153)),
    Label("guard rail", 14, 255, "construction", 2, False, True, (180, 165, 180)),
    Label("bridge", 15, 255, "construction", 2, False, True, (150, 100, 100)),
    Label("tunnel", 16, 255, "construction", 2, False, True, (150, 120, 90)),
    Label("pole", 17, 5, "object", 3, False, False, (153, 153, 153)),
    Label("polegroup", 18, 255, "object", 3, False, True, (153, 153, 153)),
    Label("traffic light", 19, 6, "object", 3, False, False, (250, 170, 30)),
    Label("traffic sign", 20, 7, "object", 3, False, False, (220, 220, 0)),
    Label("vegetation", 21, 8, "nature", 4, False, False, (107, 142, 35)),
    Label("terrain", 22, 9, "nature", 4, False, False, (152, 251, 152)),
    Label("sky", 23, 10, "sky", 5, False, False, (70, 130, 180)),
    Label("person", 24, 11, "human", 6, True, False, (220, 20, 60)),
    Label("rider", 25, 12, "human", 6, True, False, (255, 0, 0)),
    Label("car", 26, 13, "vehicle", 7, True, False, (0, 0, 142)),
    Label("truck", 27, 14, "vehicle", 7, True, False, (0, 0, 70)),
    Label("bus", 28, 15, "vehicle", 7, True, False, (0, 60, 100)),
    Label("caravan", 29, 255, "vehicle", 7, True, True, (0, 0, 90)),
    Label("trailer", 30, 255, "vehicle", 7, True, True, (0, 0, 110)),
    Label("train", 31, 16, "vehicle", 7, True, False, (0, 80, 100)),
    Label("motorcycle", 32, 17, "vehicle", 7, True, False, (0, 0, 230)),
    Label("bicycle", 33, 18, "vehicle", 7, True, False, (119, 11, 32)),
    Label("license plate", -1, -1, "vehicle", 7, False, True, (0, 0, 142)),
]

NUM_CLASSES = 19
IGNORE_LABEL = 255

# name <-> id maps (reference: datasets/cityscapes_labels.py:137-145)
label2trainid: dict[int, int] = {l.id: l.train_id for l in LABELS}
trainId2name: dict[int, str] = {l.train_id: l.name for l in LABELS}
trainId2color: dict[int, tuple[int, int, int]] = {
    l.train_id: l.color for l in LABELS if 0 <= l.train_id < 255
}
# Several canonical colors collide across labels (polegroup shares pole's
# (153,153,153); license plate shares car's (0,0,142)).  The reference works
# around this by editing those colors in its table
# (datasets/cityscapes_labels.py:105,121); we instead give valid trainIds
# priority over ignore entries, which yields the identical effective mapping.
color2trainId: dict[tuple[int, int, int], int] = {}
for _l in LABELS:
    if _l.color not in color2trainId or 0 <= _l.train_id < 255:
        color2trainId[_l.color] = _l.train_id

TRAINID_NAMES: list[str] = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]


def id_to_trainid_lut() -> np.ndarray:
    """256-entry uint8 LUT mapping raw Cityscapes ids -> trainIds."""
    lut = np.full(256, IGNORE_LABEL, dtype=np.uint8)
    for l in LABELS:
        if 0 <= l.id < 256:
            lut[l.id] = l.train_id if l.train_id >= 0 else IGNORE_LABEL
    return lut


def trainid_palette() -> np.ndarray:
    """(256, 3) uint8 palette for colorizing trainId maps."""
    pal = np.zeros((256, 3), dtype=np.uint8)
    for tid, color in trainId2color.items():
        if 0 <= tid < 256:
            pal[tid] = color
    return pal


def color_to_trainid_lut() -> np.ndarray:
    """2^24-entry packed-RGB LUT for color-encoded masks (GTAV).

    GTAV ships RGB color masks (reference: datasets/gtav.py:250-256); the
    reference loops over ``color2trainId`` in Python per image.  We instead
    pack RGB into a 24-bit integer and do one vectorized gather.
    """
    lut = np.full(1 << 24, IGNORE_LABEL, dtype=np.uint8)
    for (r, g, b), tid in color2trainId.items():
        if tid < 0:
            tid = IGNORE_LABEL
        lut[(r << 16) | (g << 8) | b] = tid
    return lut


def remap_color_mask(rgb: np.ndarray) -> np.ndarray:
    """Map an (H, W, 3) uint8 color mask to (H, W) trainIds."""
    packed = (
        rgb[..., 0].astype(np.int32) << 16
        | rgb[..., 1].astype(np.int32) << 8
        | rgb[..., 2].astype(np.int32)
    )
    return color_to_trainid_lut()[packed]
