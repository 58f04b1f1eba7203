"""Sliding-window tile geometry and jitted extract/merge.

Reference: eval.py:148-274.  The reference crops tiles in a Python loop,
runs the model per crop, then merges on CPU with threads; here the tile grid
is computed once per (image size, scale) on the host (same arithmetic), and
extraction + overlap-average merge are jitted tensor programs.

Geometry notes (must match the reference exactly):
- tile size = crop_size * max(scale, 1.0) (eval.py:153-155);
- stride = ceil(tile * (1 - overlap)) (eval.py:160);
- rows iterate over *width*, cols over *height* (eval.py:162-165);
- edge tiles are back-shifted to end at the border, clamped at 0; when the
  image is smaller than the tile, the tile truncates to the image
  (eval.py:166-175 + shape-fix at eval.py:221-223).
"""

from __future__ import annotations

import functools
from math import ceil
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TileGrid(NamedTuple):
    coords: tuple[tuple[int, int], ...]  # (y1, x1) per tile
    tile_h: int
    tile_w: int
    img_h: int
    img_w: int

    @property
    def num_tiles(self) -> int:
        return len(self.coords)


@functools.lru_cache(maxsize=256)
def compute_grid(
    img_h: int, img_w: int, crop_size: int, scale: float, overlap: float
) -> TileGrid:
    """Tile coordinates for one image at one scale (eval.py:148-194)."""
    eff_scale = max(scale, 1.0)
    tile = int(crop_size * eff_scale)
    tile_h = min(tile, img_h)
    tile_w = min(tile, img_w)
    stride = ceil(tile * (1 - overlap))

    tile_rows = int(ceil(max(img_w - tile, 0) / stride) + 1)
    tile_cols = int(ceil(max(img_h - tile, 0) / stride) + 1)
    coords = []
    for row in range(tile_rows):
        for col in range(tile_cols):
            y1 = col * stride
            x1 = row * stride
            x2 = min(x1 + tile, img_w)
            y2 = min(y1 + tile, img_h)
            x1 = max(x2 - tile, 0)
            y1 = max(y2 - tile, 0)
            coords.append((y1, x1))
    return TileGrid(tuple(coords), tile_h, tile_w, img_h, img_w)


def extract_tiles(img: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """(H, W, C) -> (T, th, tw, C) via vmapped dynamic_slice."""
    ys = jnp.array([c[0] for c in grid.coords], jnp.int32)
    xs = jnp.array([c[1] for c in grid.coords], jnp.int32)
    c = img.shape[-1]

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (grid.tile_h, grid.tile_w, c))

    return jax.vmap(one)(ys, xs)


def merge_tiles(
    tiles: jnp.ndarray, grid: TileGrid, accum_dtype=jnp.float32
) -> jnp.ndarray:
    """Overlap-average merge: (T, th, tw, C) -> (H, W, C) in ``accum_dtype``.

    Equivalent to the reference's scatter-add + count division
    (eval.py:216-229), expressed as a scan of dynamic_update_slice adds so
    XLA emits in-place updates on device.  Tiles may arrive in a lower
    precision (bf16 model output); the upcast fuses into the add, halving
    the HBM read traffic vs. materializing an f32 copy first.
    """
    c = tiles.shape[-1]
    ys = jnp.array([g[0] for g in grid.coords], jnp.int32)
    xs = jnp.array([g[1] for g in grid.coords], jnp.int32)

    full = jnp.zeros((grid.img_h, grid.img_w, c), accum_dtype)
    count = jnp.zeros((grid.img_h, grid.img_w, 1), accum_dtype)
    ones = jnp.ones((grid.tile_h, grid.tile_w, 1), accum_dtype)

    def body(carry, inp):
        full, count = carry
        tile, y, x = inp
        patch = jax.lax.dynamic_slice(full, (y, x, 0), (grid.tile_h, grid.tile_w, c))
        full = jax.lax.dynamic_update_slice(
            full, patch + tile.astype(accum_dtype), (y, x, 0))
        cpatch = jax.lax.dynamic_slice(count, (y, x, 0), (grid.tile_h, grid.tile_w, 1))
        count = jax.lax.dynamic_update_slice(count, cpatch + ones, (y, x, 0))
        return (full, count), None

    (full, count), _ = jax.lax.scan(body, (full, count), (tiles, ys, xs))
    return full / count


def grid_coords_arrays(grid: TileGrid) -> tuple[np.ndarray, np.ndarray]:
    ys = np.array([c[0] for c in grid.coords], np.int32)
    xs = np.array([c[1] for c in grid.coords], np.int32)
    return ys, xs


def _axis_segments(starts: list[int], tile: int, size: int):
    """Split [0, size) at every tile start/end; per segment, the set of
    covering tile starts."""
    bounds = sorted({0, size, *(s for s in starts), *(s + tile for s in starts)})
    bounds = [b for b in bounds if 0 <= b <= size]
    segs = []
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        cover = [s for s in starts if s <= b0 and b0 < s + tile]
        segs.append((b0, b1, cover))
    return segs


def reference_count_map(grid: TileGrid, num_classes: int) -> np.ndarray:
    """(H, 1, C) divisor replicating the reference's count indexing BUG
    (eval.py:215-228).

    The reference allocates ``count_predictions`` with shape (C, H, W) but
    increments ``count_predictions[y1:y2, x1:x2]`` -- the CLASS and HEIGHT
    dims -- while accumulating probs at ``[:, y1:y2, x1:x2]``.  The divisor
    that reaches ``full_probs / count_predictions`` is therefore class- and
    row-dependent: ``count[c, r] = #tiles with y1 <= c < y2 AND x1 <= r < x2``
    (tile X coordinates applied to ROW indices, clamped by numpy slicing).

    Consequences (and why released mIoU numbers include this):
      - for the shipped protocol (stride > num_classes, so only y1 == 0
        tiles reach any class index) the divisor is class-uniform -> the
        PER-SCALE argmax is unchanged;
      - but each row is scaled by a grid-dependent factor, so the
        multi-scale mean is row-REWEIGHTED relative to the intended average;
      - rows not covered by any tile's x-range (portrait images, h > w)
        divide by zero -> inf, exactly as the reference's float64 division.

    Returned broadcastable against the (H, W, C) merged map.  Pass
    ``count_mode='uniform'`` to SlidingEvaluator for the intended
    overlap-average instead (see PARITY.md).
    """
    cnt = np.zeros((num_classes, grid.img_h), np.float32)
    for (y1, x1) in grid.coords:
        cnt[y1 : y1 + grid.tile_h, x1 : x1 + grid.tile_w] += 1.0
    return cnt.T[:, None, :]  # (H, 1, C)


def merge_tiles_segments(
    tiles: jnp.ndarray, grid: TileGrid, accum_dtype=jnp.float32,
    divide: bool = True,
) -> jnp.ndarray:
    """Overlap-average merge via static segment gathers.

    With ``divide=False`` the per-pixel overlap SUM is returned instead
    (callers divide by their own count semantics, e.g. reference_count_map).

    Bit-identical to :func:`merge_tiles` (same f32 sum, divided by the same
    per-pixel count value), but reads each tile element exactly ONCE and
    never materializes a count map: ``compute_grid`` emits a cross product
    of y/x starts, so inside one (y-seg, x-seg) rectangle the covering tile
    set — and hence the count — is a compile-time constant.  The scan
    variant's per-tile read-modify-write of the full-image accumulator
    (~2x tile traffic + count traffic) becomes one concat of segment means;
    at the eval protocol's scale-2.0 grid this is ~8x less HBM traffic.
    """
    c = tiles.shape[-1]
    ys_starts = sorted({g[0] for g in grid.coords})
    xs_starts = sorted({g[1] for g in grid.coords})
    y_segs = _axis_segments(ys_starts, grid.tile_h, grid.img_h)
    x_segs = _axis_segments(xs_starts, grid.tile_w, grid.img_w)

    rows = []
    for y0, y1, ycov in y_segs:
        row = []
        for x0, x1, xcov in x_segs:
            total = None
            count = 0
            # iterate in grid.coords order so f32 summation order (and
            # hence the result bits) match the scan merge exactly;
            # duplicated edge-back-shifted coords sum individually like
            # the reference's scatter-add
            for ti, (sy, sx) in enumerate(grid.coords):
                if sy in ycov and sx in xcov:
                    t = tiles[ti, y0 - sy:y1 - sy, x0 - sx:x1 - sx, :]
                    total = (t.astype(accum_dtype) if total is None
                             else total + t.astype(accum_dtype))
                    count += 1
            row.append(total / count if divide else total)
        rows.append(jnp.concatenate(row, axis=1) if len(row) > 1 else row[0])
    out = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    assert out.shape == (grid.img_h, grid.img_w, c)
    return out
