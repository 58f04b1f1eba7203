"""Label-space golden tests (reference: datasets/cityscapes_labels.py)."""

import numpy as np

from pinthememory_tpu.core import labels


def test_id_to_trainid_lut_goldens():
    lut = labels.id_to_trainid_lut()
    assert lut[7] == 0      # road
    assert lut[8] == 1      # sidewalk
    assert lut[26] == 13    # car
    assert lut[33] == 18    # bicycle
    assert lut[0] == 255    # unlabeled
    assert lut[29] == 255   # caravan
    assert lut[100] == 255  # out of table


def test_19_train_classes():
    tids = sorted({l.train_id for l in labels.LABELS if 0 <= l.train_id < 255})
    assert tids == list(range(19))
    assert len(labels.TRAINID_NAMES) == 19


def test_color_collisions_resolved_in_favor_of_valid_classes():
    # pole vs polegroup, car vs license plate (reference edits its color
    # table to dodge these; we resolve by priority -- same effective map).
    assert labels.color2trainId[(153, 153, 153)] == 5
    assert labels.color2trainId[(0, 0, 142)] == 13
    assert labels.color2trainId[(0, 0, 0)] == 255


def test_remap_color_mask_vectorized_matches_reference_loop():
    rng = np.random.default_rng(0)
    colors = [l.color for l in labels.LABELS] + [(1, 2, 3)]
    idx = rng.integers(0, len(colors), size=(16, 16))
    rgb = np.array(colors, dtype=np.uint8)[idx]
    ours = labels.remap_color_mask(rgb)
    # Reference loop semantics (datasets/gtav.py:250-256): start from 255,
    # assign v for every color whose trainId is valid.
    ref = np.full(idx.shape, 255, dtype=np.uint8)
    for k, v in labels.color2trainId.items():
        if v != 255 and v != -1:
            m = (rgb == np.array(k)).all(-1)
            ref[m] = v
    np.testing.assert_array_equal(ours, ref)


def test_palette_roundtrip():
    pal = labels.trainid_palette()
    for tid in range(19):
        assert tuple(pal[tid]) == labels.trainId2color[tid]
