"""t-SNE basket math parity against the ACTUAL reference tsnelib.py.

The paper's qualitative evidence (pre/post-memory class-feature scatters) is
produced by ``RunTsne.input2basket`` (tsnelib.py:48-74): per-pixel L2
normalization, align-corners bilinear upsample of the features to the GT
resolution, GT-masked per-class means (ignore=255 -> the extra one-hot slot),
stored un-normalized and re-normalized at draw time (tsnelib.py:90).  This
file drives the real reference class with the rebuild's ``TsneCollector`` on
identical inputs and requires the baskets, labels, domains, and memory-slot
markers to agree.  (The embedding itself -- MulticoreTSNE vs sklearn -- is a
stochastic solver and is NOT compared; what reaches it is.)
"""

import sys
import types

import numpy as np
import pytest
import torch

from pinthememory_tpu.tools.tsne import TsneCollector

from ref_harness import reference_env

SELECTED = (0, 3, 7, 11)
NUM_CLASSES = 19
FEAT_DIM = 16


def _import_reference_tsnelib():
    # MulticoreTSNE is absent (native pip pkg); RunTsne imports it inside
    # __init__ -- the embedding solver is out of scope here, so a
    # constructor-only placeholder suffices.
    if "MulticoreTSNE" not in sys.modules:
        mod = types.ModuleType("MulticoreTSNE")
        mod.MulticoreTSNE = lambda **kw: None
        sys.modules["MulticoreTSNE"] = mod
    from ref_harness import install_stub_modules

    install_stub_modules()
    with reference_env():
        import importlib

        return importlib.import_module("tsnelib")


@pytest.fixture(scope="module")
def runners(tmp_path_factory):
    tsnelib = _import_reference_tsnelib()
    trainId2name = {i: f"c{i}" for i in range(NUM_CLASSES)}
    domId2name = {0: "gtav", 1: "cityscapes"}
    with reference_env():
        ref = tsnelib.RunTsne(
            output_dir=str(tmp_path_factory.mktemp("tsne_ref")),
            selected_cls=[f"c{i}" for i in SELECTED],
            domId2name=domId2name,
            trainId2name=trainId2name,
        )
    ours = TsneCollector(num_classes=NUM_CLASSES, selected_classes=SELECTED)
    return ref, ours


def _feed_both(ref, ours, seed, h=9, w=13, H=36, W=52, domain="gtav"):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((1, FEAT_DIM, h, w)).astype(np.float32)
    gt = rng.integers(0, NUM_CLASSES, (1, H, W)).astype(np.int64)
    gt[rng.random((1, H, W)) < 0.15] = 255
    with reference_env(), torch.no_grad():
        ref.input2basket(torch.from_numpy(feats), torch.from_numpy(gt), domain)
    ours.add_batch(np.transpose(feats[0], (1, 2, 0)), gt[0], domain)
    return gt


def test_basket_parity(runners):
    ref, ours = runners
    _feed_both(ref, ours, seed=0, domain="gtav")
    _feed_both(ref, ours, seed=1, domain="cityscapes")

    ref_vecs = ref.feat_vecs.numpy()
    ref_cls = ref.feat_vec_labels.numpy().ravel().astype(int)
    ref_dom = ref.feat_vec_domlabels.numpy().ravel().astype(int)
    ours_vecs = np.stack(ours.features)

    assert ref_vecs.shape == ours_vecs.shape
    np.testing.assert_array_equal(np.asarray(ours.class_ids), ref_cls)
    dom_map = {"gtav": 0, "cityscapes": 1}
    np.testing.assert_array_equal(
        np.asarray([dom_map[d] for d in ours.domains]), ref_dom)
    np.testing.assert_allclose(ours_vecs, ref_vecs, rtol=1e-4, atol=1e-5)

    # draw-time re-normalization (tsnelib.py:90) matches embed()'s
    ref_normed = torch.nn.functional.normalize(
        torch.from_numpy(ref_vecs), dim=1).numpy()
    ours_normed = ours_vecs / np.maximum(
        np.linalg.norm(ours_vecs, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(ours_normed, ref_normed, rtol=1e-4, atol=1e-5)


def test_memory_marker_parity(runners):
    ref, ours = runners
    rng = np.random.default_rng(5)
    m = rng.standard_normal((NUM_CLASSES, FEAT_DIM)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    with reference_env():
        ref.input_memory_item(torch.from_numpy(m))
    ours.add_memory(m)
    np.testing.assert_allclose(ours.mem_items, ref.mem_vecs.numpy())
    np.testing.assert_array_equal(
        np.asarray(ours.mem_class_ids), ref.mem_vec_labels.numpy())


def test_ignore_only_class_not_basketed(runners):
    """A selected class absent from the GT adds no vector (denominator==0
    guard, tsnelib.py:68)."""
    tsnelib = _import_reference_tsnelib()
    with reference_env():
        ref = tsnelib.RunTsne(
            output_dir="/tmp/tsne_ref2",
            selected_cls=["c0", "c3"],
            domId2name={0: "gtav"},
            trainId2name={i: f"c{i}" for i in range(NUM_CLASSES)},
        )
    ours = TsneCollector(num_classes=NUM_CLASSES, selected_classes=(0, 3))
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((1, FEAT_DIM, 6, 8)).astype(np.float32)
    gt = np.full((1, 24, 32), 3, np.int64)   # only class 3 present
    with reference_env(), torch.no_grad():
        ref.input2basket(torch.from_numpy(feats), torch.from_numpy(gt), "gtav")
    ours.add_batch(np.transpose(feats[0], (1, 2, 0)), gt[0], "gtav")
    assert ref.feat_vecs.shape[0] == 1 == len(ours.features)
    assert ours.class_ids == [3]
    np.testing.assert_allclose(
        np.stack(ours.features), ref.feat_vecs.numpy(), rtol=1e-4, atol=1e-5)
