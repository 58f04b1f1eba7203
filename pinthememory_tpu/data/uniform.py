"""Class-uniform sampling: per-class centroid extraction with JSON cache.

Reference: datasets/uniform.py.  Each mask is tiled (default 1024^2); for
every class present in a tile the class-pixel centroid is recorded; training
epochs then mix ``class_uniform_pct`` centroid-anchored crops with random
images (uniform.py:272-301).  The reference extracts centroids with an
80-thread pool of scipy center_of_mass calls; here it's a vectorized numpy
pass per image.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
from PIL import Image


def class_centroids_image(
    mask: np.ndarray, tile_size: int = 1024, num_classes: int = 19
) -> dict[int, list[tuple[int, int]]]:
    """Per-class centroids per tile, (x, y) pixel coords like the reference.

    Only FULL tiles are visited (uniform.py:31-45 iterates
    ``range(size // tile_size)``): edge remainders -- e.g. GTAV's 1914x1052
    masks with the default 1024 tile -- contribute no centroids, and masks
    smaller than ``tile_size`` contribute none at all."""
    h, w = mask.shape
    out: dict[int, list] = {c: [] for c in range(num_classes)}
    for y0 in range(0, (h // tile_size) * tile_size, tile_size):
        for x0 in range(0, (w // tile_size) * tile_size, tile_size):
            patch = mask[y0 : y0 + tile_size, x0 : x0 + tile_size]
            classes = np.unique(patch)
            for c in classes:
                if c >= num_classes:
                    continue
                ys, xs = np.nonzero(patch == c)
                cy = int(ys.mean()) + y0
                cx = int(xs.mean()) + x0
                out[int(c)].append((cx, cy))
    return out


def build_centroids(
    items: Sequence[tuple[str, str]],
    decode_mask,
    num_classes: int = 19,
    tile_size: int = 1024,
    cache_path: str | None = None,
    num_workers: int | None = None,
) -> dict[int, list]:
    """centroids[class] = [(img_path, mask_path, (x, y), class), ...].

    Cached as JSON keyed by mask path (uniform.py / cityscapes.py:367-380).
    Uncached masks are decoded by a thread pool (the reference uses
    multiprocessing.dummy Pool(80), uniform.py:184-210); results are merged
    in item order, so worker count never changes the output.
    """
    cache: dict = {}
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)

    todo = [(i, mp) for i, (_, mp) in enumerate(items) if mp not in cache]
    if todo:
        def one(mask_path):
            mask = decode_mask(mask_path)
            return class_centroids_image(np.asarray(mask), tile_size, num_classes)

        if num_workers is None:
            num_workers = min(32, (os.cpu_count() or 8) * 2)
        if num_workers > 1 and len(todo) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                computed = list(pool.map(one, [mp for _, mp in todo]))
        else:
            computed = [one(mp) for _, mp in todo]
        for (_, mp), per_class in zip(todo, computed):
            cache[mp] = {str(c): v for c, v in per_class.items()}

    centroids: dict[int, list] = {c: [] for c in range(num_classes)}
    for img_path, mask_path in items:
        per_class = {int(c): v for c, v in cache[mask_path].items()}
        for c, pts in per_class.items():
            for (cx, cy) in pts:
                centroids[c].append((img_path, mask_path, (cx, cy), c))

    if cache_path and todo:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        with open(cache_path, "w") as f:
            json.dump(cache, f)
    return centroids


def build_epoch(
    items: Sequence,
    centroids: dict[int, list],
    num_classes: int,
    class_uniform_pct: float,
    rng: np.random.Generator,
) -> list:
    """Mix random images with per-class centroid crops (uniform.py:272-301).

    Output entries are either (img, mask) or (img, mask, centroid, class);
    the RandomCrop consumes the centroid (joint_transforms.py:117-126).
    """
    if class_uniform_pct <= 0:
        return list(items)
    num_epoch = len(items)
    # reference arithmetic (uniform.py:283-285): the rounding remainder goes
    # to the random pool, so the epoch length is EXACTLY len(items)
    num_per_class = int((num_epoch * class_uniform_pct) / num_classes)
    num_rand = num_epoch - num_per_class * num_classes

    # random_sampling (uniform.py:255-269): shuffle once, then cycle --
    # sampling without replacement until the pool is exhausted
    def cycle_sample(pool, num):
        order = rng.permutation(len(pool))
        return [pool[order[i % len(pool)]] for i in range(num)]

    epoch = cycle_sample(items, num_rand)
    for c in range(num_classes):
        pool = centroids.get(c, [])
        if not pool:
            continue
        epoch.extend(cycle_sample(pool, num_per_class))
    return epoch
