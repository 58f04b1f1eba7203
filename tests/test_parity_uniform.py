"""Class-uniform sampling parity against the ACTUAL reference
datasets/uniform.py.

Gates the centroid-extraction geometry (full-tiles-only iteration,
center_of_mass truncation, id2trainid remap, uniform.py:31-88) and the
build_epoch composition arithmetic (uniform.py:272-301) by running the real
reference functions on the same mask fixture.  The reference module is
loaded straight from its file (its only deps are PIL/numpy/scipy/tqdm/
imageio, all present); ``pbar`` is a module global the pool runner normally
installs, stubbed here.
"""

import importlib.util
import types

import numpy as np
import pytest
from PIL import Image

from pinthememory_tpu.data import uniform as ours

REF_UNIFORM = "/root/reference/datasets/uniform.py"
NUM_CLASSES = 19


@pytest.fixture(scope="module")
def ref_uniform():
    spec = importlib.util.spec_from_file_location("ref_uniform", REF_UNIFORM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.pbar = types.SimpleNamespace(update=lambda n: None)
    return mod


def _fixture_mask():
    """80x112 mask, tile 32: 2x3 FULL tiles + a 16-row and 16-col remainder
    that the reference never visits; raw id 50 remaps to trainId 7."""
    rng = np.random.default_rng(4)
    mask = np.full((80, 112), 255, np.uint8)
    mask[2:10, 3:12] = 0                      # tile (0,0)
    mask[5:9, 40:55] = 3                      # tile (0,1)
    mask[40:60, 70:90] = 11                   # tiles (1,2)
    mask[33:38, 2:8] = 50                     # raw id -> trainId 7
    mask[70:78, 2:30] = 5                     # remainder rows: must be IGNORED
    mask[10:30, 100:110] = 6                  # remainder cols: must be IGNORED
    mask[rng.random((80, 112)) < 0.02] = 1    # scattered class across tiles
    return mask


def test_centroid_geometry_parity(ref_uniform, tmp_path):
    mask = _fixture_mask()
    label_fn = str(tmp_path / "m.png")
    Image.fromarray(mask).save(label_fn)
    id2trainid = {50: 7}

    ref_cents = ref_uniform.class_centroids_image(
        ("img.png", label_fn), tile_size=32, num_classes=NUM_CLASSES,
        id2trainid=id2trainid)

    remapped = mask.copy()
    for k, v in id2trainid.items():
        remapped[mask == k] = v
    ours_cents = ours.class_centroids_image(
        remapped, tile_size=32, num_classes=NUM_CLASSES)

    for c in range(NUM_CLASSES):
        ref_pts = [pt for (_, _, pt, _) in ref_cents.get(c, [])]
        assert ours_cents[c] == ref_pts, (c, ours_cents[c], ref_pts)

    # the fixture's remainder-strip classes must NOT appear (full tiles only)
    assert not ours_cents[5] and not ref_cents.get(5)
    assert not ours_cents[6] and not ref_cents.get(6)
    # the remapped id DID land
    assert ours_cents[7]


def test_mask_smaller_than_tile_has_no_centroids(ref_uniform, tmp_path):
    mask = np.full((30, 30), 2, np.uint8)
    label_fn = str(tmp_path / "small.png")
    Image.fromarray(mask).save(label_fn)
    ref_cents = ref_uniform.class_centroids_image(
        ("img.png", label_fn), tile_size=32, num_classes=NUM_CLASSES,
        id2trainid=None)
    ours_cents = ours.class_centroids_image(mask, 32, NUM_CLASSES)
    assert not any(ref_cents.get(c) for c in range(NUM_CLASSES))
    assert not any(ours_cents[c] for c in range(NUM_CLASSES))


def test_build_epoch_composition_parity(ref_uniform):
    """Same epoch length and per-class centroid counts as the real
    build_epoch (uniform.py:272-301); item identity is RNG-dependent and not
    compared."""
    imgs = [(f"img{i}", f"mask{i}") for i in range(97)]
    centroids = {
        c: [(f"img{j}", f"mask{j}", (j, j), c) for j in range(3 + c % 4)]
        for c in range(NUM_CLASSES)
    }
    centroids[4] = []   # a class with no centroids contributes nothing
    pct = 0.5

    np.random.seed(0)
    ref_epoch = ref_uniform.build_epoch(imgs, centroids, NUM_CLASSES, pct)
    our_epoch = ours.build_epoch(imgs, centroids, NUM_CLASSES, pct,
                                 np.random.default_rng(0))

    assert len(ref_epoch) == len(our_epoch)

    def comp(epoch):
        rand = sum(1 for e in epoch if len(e) == 2)
        per_class = {}
        for e in epoch:
            if len(e) == 4:
                per_class[e[3]] = per_class.get(e[3], 0) + 1
        return rand, per_class

    assert comp(ref_epoch) == comp(our_epoch)
    assert comp(ref_epoch)[1].get(4) is None
