"""Input-pipeline throughput bench (VERDICT r2: measure the loader
ABSOLUTELY, not just relatively).

Writes real-size PNG fixtures (default 2048x1024 RGB + uint8 masks --
Cityscapes geometry), then measures ``DataLoader`` decode+augment
throughput through the FULL flagship train transform chain
(RandomSizeAndCrop 768 + ColorJitter(0.5)+GaussianBlur photometrics,
datasets/__init__.py:328-380) at several worker counts.  Compare the
printed images/sec against the train step's consumption rate
(BASELINE.md row 6: ~4.45 steps/s x 8 images = 35.6 img/s on v5e).

Usage: ``python -m pinthememory_tpu.tools.loader_bench [--images 24]``.
Prints one JSON line per worker count.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np
from PIL import Image

from pinthememory_tpu.data import joint_transforms as jt
from pinthememory_tpu.data import transforms as xt
from pinthememory_tpu.data.base import SegmentationDataset
from pinthememory_tpu.data.loader import DataLoader, ShardedSampler


class _FixtureDataset(SegmentationDataset):
    """On-disk PNG fixtures flowing through the shared train __getitem__."""

    def __init__(self, items, **kw):
        kw.setdefault("mode", "train")
        super().__init__(**kw)
        self.imgs = list(items)

    def decode_mask(self, p):
        return np.asarray(Image.open(p), np.uint8)


def write_fixtures(root: str, n: int, h: int, w: int, seed: int = 0):
    """Semi-realistic PNGs: smooth block-upsampled fields + mild noise --
    pure noise is a pathological PNG (no filtering wins, ~3x the bytes and
    decode time of street imagery); smooth content compresses like the real
    datasets do."""
    rng = np.random.default_rng(seed)
    items = []
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        blocks = rng.integers(0, 255, (h // 64, w // 64, 3)).astype(np.uint8)
        img = np.kron(blocks, np.ones((64, 64, 1), np.uint8))
        img = np.clip(img.astype(np.int16)
                      + rng.integers(-12, 12, img.shape), 0, 255).astype(np.uint8)
        mask = np.kron(
            rng.integers(0, 19, (h // 64, w // 64)).astype(np.uint8),
            np.ones((64, 64), np.uint8))
        ip = os.path.join(root, f"img{i}.png")
        mp = os.path.join(root, f"mask{i}.png")
        Image.fromarray(img).save(ip)
        Image.fromarray(mask, "L").save(mp)
        items.append((ip, mp))
    return items


def bench(items, crop: int, batch_size: int, workers: int, epochs: int = 2,
          processes: bool = False):
    ds = _FixtureDataset(items, seed=0)
    ds.joint_transform = jt.build_train_joint_transform(
        crop, crop_nopad=False, pre_size=None,
        scale_min=0.5, scale_max=2.0, rrotate=0)
    ds.input_transform = xt.build_train_input_transform(0.5, True, False)
    loader = DataLoader(ds, batch_size=batch_size,
                        sampler=ShardedSampler(ds, shuffle=True, seed=0),
                        num_workers=workers, drop_last=True,
                        worker_processes=processes)
    best = float("inf")
    for ep in range(epochs):
        ds.set_epoch(ep)
        loader.sampler.set_epoch(ep)
        n_img = 0
        t0 = time.time()
        for batch in loader:
            n_img += batch["image"].shape[0]
        best = min(best, (time.time() - t0) / max(n_img, 1))
    return 1.0 / best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--crop", type=int, default=768)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--workers", default="1,4,8")
    ap.add_argument("--root", default=None,
                    help="fixture dir (default: fresh tempdir)")
    args = ap.parse_args(argv)

    root = args.root or tempfile.mkdtemp(prefix="loader_bench_")
    t0 = time.time()
    items = write_fixtures(root, args.images, args.height, args.width)
    print(f"# {args.images} {args.width}x{args.height} fixtures in "
          f"{time.time() - t0:.1f}s at {root}")

    results = {}
    for w in (int(x) for x in args.workers.split(",")):
        for procs in ((False, True) if w > 1 else (False,)):
            ips = bench(items, args.crop, args.batch, w, processes=procs)
            kind = "proc" if procs else "thread"
            results[(w, kind)] = ips
            print(json.dumps({
                "metric": f"loader_decode_augment_{args.width}x{args.height}"
                          f"_crop{args.crop}_{kind}{w}",
                "value": round(ips, 2),
                "unit": "images/sec",
            }))
    return results


if __name__ == "__main__":
    main()
