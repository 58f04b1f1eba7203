"""Data pipeline tests: synthetic datasets, transforms, batching, sampling."""

import numpy as np
from PIL import Image

from pinthememory_tpu.core.config import Config, DataConfig, TrainConfig
from pinthememory_tpu.data import joint_transforms as jt
from pinthememory_tpu.data import transforms as xt
from pinthememory_tpu.data.datasets import MAPILLARY_LUT, SYNTHIA_LUT, NullLoader
from pinthememory_tpu.data.loader import (
    DataLoader,
    DomainUniformConcatDataset,
    ShardedSampler,
    setup_loaders,
)
from pinthememory_tpu.data.uniform import build_epoch, class_centroids_image
import random


def test_null_loader_shapes_and_determinism():
    ds = NullLoader(crop_size=64, length=10, seed=3)
    img, mask, name, aux = ds[0]
    assert img.shape == (64, 64, 3) and mask.shape == (64, 64)
    assert mask.min() >= 0 and mask.max() < 19
    img2, mask2, _, _ = ds[0]
    np.testing.assert_array_equal(mask, mask2)
    np.testing.assert_array_equal(img, img2)


def test_domain_uniform_concat_stacks_domains():
    d1 = NullLoader(crop_size=32, length=7, seed=0)
    d2 = NullLoader(crop_size=32, length=5, seed=1)
    ds = DomainUniformConcatDataset([d1, d2], seed=0)
    imgs, masks, names, auxs = ds[0]
    assert imgs.shape == (2, 32, 32, 3)
    assert masks.shape == (2, 32, 32)
    assert len(ds) == 2975  # hardcoded like the reference (multi_loader.py:55)


def test_loader_batches_bdhwc():
    d1 = NullLoader(crop_size=16, length=10, seed=0)
    d2 = NullLoader(crop_size=16, length=10, seed=1)
    ds = DomainUniformConcatDataset([d1, d2], seed=0)
    loader = DataLoader(ds, batch_size=3, num_workers=2)
    batch = next(iter(loader))
    assert batch["image"].shape == (3, 2, 16, 16, 3)
    assert batch["gts"].shape == (3, 2, 16, 16)
    assert batch["aux_gts"].shape == (3, 2, 16, 16)


def test_sharded_sampler_partitions():
    ds = NullLoader(crop_size=8, length=10)
    shards = [list(ShardedSampler(ds, shuffle=True, seed=1, num_shards=4, shard_id=i))
              for i in range(4)]
    assert all(len(s) == 3 for s in shards)  # padded to 12
    all_idx = [i for s in shards for i in s]
    assert set(all_idx) == set(range(10))


def test_sharded_sampler_modes_match_reference():
    """Both subsample modes (strided default + the fork's dead
    ``consecutive_sample`` branch, datasets/sampler.py:93-98) against the
    ACTUAL reference sampler, on the deterministic identity order
    (permutation=False) where the index streams must agree exactly."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_sampler", "/root/reference/datasets/sampler.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    ds = NullLoader(crop_size=8, length=10)
    for consecutive in (False, True):
        for shard in range(4):
            theirs = list(ref.DistributedSampler(
                ds, pad=True, consecutive_sample=consecutive,
                permutation=False, num_replicas=4, rank=shard))
            ours = list(ShardedSampler(ds, shuffle=False, num_shards=4,
                                       shard_id=shard,
                                       consecutive=consecutive))
            assert ours == [int(i) for i in theirs], (consecutive, shard)
    # shuffled consecutive mode still partitions the padded order
    shards = [list(ShardedSampler(ds, shuffle=True, seed=1, num_shards=4,
                                  shard_id=i, consecutive=True))
              for i in range(4)]
    assert all(len(s) == 3 for s in shards)
    assert set(i for s in shards for i in s) == set(range(10))


def test_setup_loaders_null():
    cfg = Config(
        train=TrainConfig(bs_mult=2, crop_size=32),
        data=DataConfig(dataset=("null_loader", "null_loader"),
                        val_dataset=("null_loader",)),
    )
    train_loader, val_loaders = setup_loaders(cfg)
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, 2, 32, 32, 3)
    assert "null_loader" in val_loaders


def test_joint_transform_geometry():
    rng = random.Random(0)
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (100, 140, 3), np.uint8))
    mask = Image.fromarray(np.random.default_rng(1).integers(0, 19, (100, 140), np.uint8), "L")
    t = jt.build_train_joint_transform(64, crop_nopad=False, pre_size=None,
                                       scale_min=0.5, scale_max=2.0, rrotate=0)
    for i in range(5):
        im2, mk2 = t(img, mask, random.Random(i))
        assert im2.size == (64, 64) and mk2.size == (64, 64)


def test_centercroppad_pads_with_ignore():
    img = Image.new("RGB", (50, 40))
    mask = Image.new("L", (50, 40), color=3)
    t = jt.CenterCropPad(64, ignore_index=255)
    im2, mk2 = t(img, mask)
    assert im2.size == (64, 64)
    m = np.asarray(mk2)
    assert (m == 255).any() and (m == 3).any()


def test_color_jitter_changes_image_but_not_shape():
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8))
    cj = xt.ColorJitter(0.8, 0.8, 0.8, 0.3)
    out = cj(img, random.Random(0))
    assert out.size == img.size
    assert not np.array_equal(np.asarray(out), np.asarray(img))


def test_synthia_and_mapillary_luts():
    assert SYNTHIA_LUT[3] == 0     # road
    assert SYNTHIA_LUT[1] == 10    # sky
    assert SYNTHIA_LUT[22] == 255  # lane marking -> ignore
    assert MAPILLARY_LUT[13] == 0  # road
    assert MAPILLARY_LUT[55] == 13  # car
    assert MAPILLARY_LUT[0] == 255


def test_class_centroids_and_build_epoch():
    mask = np.full((64, 64), 255, np.uint8)
    mask[:8, :8] = 3
    mask[40:48, 40:60] = 7
    cents = class_centroids_image(mask, tile_size=64)
    assert len(cents[3]) == 1 and len(cents[7]) == 1
    (cx, cy) = cents[3][0]
    assert cx == 3 and cy == 3
    items = [(f"img{i}", f"mask{i}") for i in range(100)]
    centroids = {c: [(f"img0", "mask0", (1, 1), c)] for c in range(19)}
    epoch = build_epoch(items, centroids, 19, 0.5, np.random.default_rng(0))
    # reference arithmetic (uniform.py:283-285): num_per_class =
    # int(100*0.5/19) = 2, num_rand = 100 - 38 = 62 -> the epoch length is
    # EXACTLY len(items)
    assert len(epoch) == 100
    assert sum(len(e) == 4 for e in epoch) == 2 * 19
    assert sum(len(e) == 2 for e in epoch) == 62


def test_max_cu_epoch_cut_switches_composition(tmp_path):
    """The class-uniform cut (train.py:178-183 + cityscapes.py:440-457):
    before max_cu_epoch the epoch mixes fine+aug images with merged
    centroids; from the cut epoch on, only fine images/centroids remain and
    the epoch length shrinks to len(imgs) -- the sampler length follows."""
    import types

    from pinthememory_tpu.train.cli import Trainer

    root = tmp_path / "tiny"
    root.mkdir()
    ds = _TinyDisk(str(root), n=6)
    ds.aug_imgs = ds.imgs[4:]       # 2 "coarse" images
    ds.imgs = ds.imgs[:4]           # 4 fine images

    cfg = Config(
        data=DataConfig(class_uniform_pct=0.5, class_uniform_tile=64,
                        max_cu_epoch=2),
        train=TrainConfig(seed=0),
    )
    loader = DataLoader(ds, batch_size=1,
                        sampler=ShardedSampler(ds, shuffle=False),
                        num_workers=1, drop_last=False)

    t = Trainer.__new__(Trainer)   # only the epoch-build path is exercised
    t.cfg = cfg
    t.train_loader = loader
    t.log = types.SimpleNamespace(exp_dir=str(tmp_path))

    t.epoch = 0
    t._build_uniform_epoch()
    assert len(ds.imgs_uniform) == 6      # fine + aug
    pre_cut_paths = {e[0] for e in ds.imgs_uniform}

    t.epoch = 2                            # >= max_cu_epoch -> cut
    t._build_uniform_epoch()
    assert len(ds.imgs_uniform) == 4      # fine only
    aug_paths = {p for p, _ in ds.aug_imgs}
    assert not aug_paths & {e[0] for e in ds.imgs_uniform}
    assert len(loader) == 4                # sampler length follows
    # sanity: aug images were eligible before the cut
    assert pre_cut_paths - {e[0] for e in ds.imgs_uniform} <= aug_paths | pre_cut_paths


# -- meta-test hard augmentation wiring (train.py:199-211) -------------------

from pinthememory_tpu.data.base import SegmentationDataset
from pinthememory_tpu.data.loader import arm_meta_augmentation
from pinthememory_tpu.train.loops import select_meta_images


class _TinyDisk(SegmentationDataset):
    """Minimal on-disk dataset flowing through the shared __getitem__."""

    def __init__(self, root, n=3, seed=0, **kw):
        super().__init__(seed=seed, **kw)
        rng = np.random.default_rng(seed)
        for i in range(n):
            ip = f"{root}/img{i}.png"
            mp = f"{root}/mask{i}.png"
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)).save(ip)
            Image.fromarray(
                rng.integers(0, 19, (40, 40)).astype(np.uint8), "L").save(mp)
            self.imgs.append((ip, mp))

    def decode_mask(self, p):
        return np.asarray(Image.open(p), np.uint8)


def _tiny_pair(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    meta = xt.build_meta_transform()
    d0 = _TinyDisk(str(a), seed=0, meta_transform=meta)
    d1 = _TinyDisk(str(b), seed=1, meta_transform=meta)
    return d0, d1


def test_meta_aug_default_reference_quirk(tmp_path):
    """Default MLDG wiring reproduces train.py:199-211: domain 0 permanently
    hard-augmented, other domains untouched."""
    d0, d1 = _tiny_pair(tmp_path)
    before = d0[0][0]
    ds = DomainUniformConcatDataset([d0, d1], seed=0)
    arm_meta_augmentation(ds, mldg=True, meta_aug_episode=False)
    assert d0.running_metatest and not d1.running_metatest
    after = d0[0][0]
    assert after.shape == before.shape
    assert not np.array_equal(after, before)  # photometrically hard-augmented
    # masks unaffected
    np.testing.assert_array_equal(d0[0][1], np.asarray(
        Image.open(d0.imgs[0][1]), np.uint8).astype(np.int32))


def test_meta_aug_armed_only_under_mldg_multidomain(tmp_path):
    d0, d1 = _tiny_pair(tmp_path)
    ds = DomainUniformConcatDataset([d0, d1], seed=0)
    arm_meta_augmentation(ds, mldg=False, meta_aug_episode=False)
    assert not d0.running_metatest
    arm_meta_augmentation(d0, mldg=True, meta_aug_episode=False)  # single set
    assert not d0.running_metatest


def test_meta_aug_episode_pairs_and_selection(tmp_path):
    d0, d1 = _tiny_pair(tmp_path)
    ds = DomainUniformConcatDataset([d0, d1], seed=0)
    arm_meta_augmentation(ds, mldg=True, meta_aug_episode=True)
    assert d0.emit_meta_pair and d1.emit_meta_pair
    img, mask, _, _ = d0[0]
    assert img.shape == (2, 40, 40, 3)
    assert not np.array_equal(img[0], img[1])  # hard differs from normal

    loader = DataLoader(ds, batch_size=2, num_workers=1)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 2, 2, 40, 40, 3)
    sel = select_meta_images(batch["image"], te=(1,))
    assert sel.shape == (2, 2, 40, 40, 3)
    np.testing.assert_array_equal(sel[:, 0], batch["image"][:, 0, 0])
    np.testing.assert_array_equal(sel[:, 1], batch["image"][:, 1, 1])
    # non-pair batches pass through unchanged
    np.testing.assert_array_equal(select_meta_images(sel, te=(0,)), sel)


# ---------------------------------------------------------------------------
# Multi-worker loader (VERDICT r1 item 6): num_workers must actually scale
# throughput while preserving the exact batch stream.
# ---------------------------------------------------------------------------


class _SlowDataset:
    """Synthetic dataset whose __getitem__ blocks (like PIL decode: the wait
    releases the GIL) for a fixed time."""

    def __init__(self, n=64, delay=0.005):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import time

        time.sleep(self.delay)
        rng = np.random.default_rng(i)
        return (rng.standard_normal((4, 4, 3)).astype(np.float32),
                np.full((4, 4), i % 19, np.uint8), f"s{i}",
                np.full((4, 4), i % 19, np.uint8))


def _collect(loader):
    return [(b["image"].copy(), b["gts"].copy(), list(b["names"])) for b in loader]


def test_loader_workers_preserve_batch_order():
    ds = _SlowDataset(n=40, delay=0.0)
    from pinthememory_tpu.data.loader import ShardedSampler

    def make(nw):
        return DataLoader(ds, batch_size=4,
                          sampler=ShardedSampler(ds, shuffle=True, seed=3),
                          num_workers=nw)

    ref = _collect(make(1))
    for nw in (2, 4, 7):
        got = _collect(make(nw))
        assert len(got) == len(ref)
        for (ia, ga, na), (ib, gb, nb) in zip(got, ref):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ga, gb)
            assert na == nb


def test_loader_workers_scale_throughput():
    import time

    ds = _SlowDataset(n=64, delay=0.005)

    def timed(nw):
        loader = DataLoader(ds, batch_size=4, num_workers=nw)
        t0 = time.perf_counter()
        n = sum(1 for _ in loader)
        assert n == 16
        return time.perf_counter() - t0

    t1 = min(timed(1) for _ in range(2))
    t4 = min(timed(4) for _ in range(2))
    assert t4 * 2.0 < t1, f"1 worker {t1:.3f}s vs 4 workers {t4:.3f}s"


def test_loader_worker_errors_propagate():
    class Boom(_SlowDataset):
        def __getitem__(self, i):
            if i == 11:
                raise RuntimeError("decode failed")
            return super().__getitem__(i)

    loader = DataLoader(Boom(n=16, delay=0.0), batch_size=4, num_workers=3)
    import pytest

    # order-faithful fail-fast: index 11 lives in batch 2, so batches 0 and
    # 1 must be YIELDED before the error surfaces at batch 2
    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for b in loader:
            got.append(b)
    assert len(got) == 2, len(got)


def test_build_centroids_parallel_matches_serial(tmp_path):
    from pinthememory_tpu.data.uniform import build_centroids

    rng = np.random.default_rng(0)
    masks = {}
    for i in range(6):
        p = str(tmp_path / f"m{i}.png")
        masks[p] = rng.integers(0, 20, (32, 32)).astype(np.uint8)

    items = [(p.replace(".png", "_img.png"), p) for p in masks]
    decode = lambda p: masks[p]
    serial = build_centroids(items, decode, tile_size=16, num_workers=1)
    parallel = build_centroids(items, decode, tile_size=16, num_workers=4)
    assert serial == parallel
    # cache round-trip stays equivalent (JSON lists vs tuples)
    cp = str(tmp_path / "cache.json")
    first = build_centroids(items, decode, tile_size=16, cache_path=cp,
                            num_workers=4)
    cached = build_centroids(items, decode, tile_size=16, cache_path=cp,
                             num_workers=4)
    assert first == cached == serial


def test_process_loader_matches_thread_loader(tmp_path):
    """Worker-subprocess loading (data/worker.py) must produce exactly the
    thread loader's stream, in order -- batch content is index-seeded, so
    worker kind can never change the data (reference parity: torch
    DataLoader processes, datasets/__init__.py:328)."""
    root = tmp_path / "p"
    root.mkdir()

    def make(procs):
        ds = _TinyDisk(str(root), n=8)
        return DataLoader(
            ds, batch_size=2,
            sampler=ShardedSampler(ds, shuffle=True, seed=3),
            num_workers=2, drop_last=True, worker_processes=procs)

    a = list(make(False))
    b = list(make(True))
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
        np.testing.assert_array_equal(x["gts"], y["gts"])
        assert x["names"] == y["names"]
