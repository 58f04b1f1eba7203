"""Multi-scale + flip sliding-window inference as jitted tensor programs.

Reference: eval.py:340-405 (``inference_sliding``) + the CPU merge threads
(eval.py:210-274).  The reference protocol, preserved bit-for-bit in
structure:

  per scale s:
    image' = PIL-BILINEAR resize to (H*s, W*s)      [antialiased]
    normalize (ImageNet mean/std)
    tiles   = overlap grid of (crop*max(s,1))^2 crops
    logits  = model(tile)[main_out]  (raw logits, NOT softmax)
    merged  = overlap-summed logits at (H*s, W*s), divided by the
              reference's (buggy) class/row count map -- see
              tiling.reference_count_map; count_mode='uniform' opts into
              the intended overlap average instead
    for the flipped copy: flip back
    out_s   = mean over flips of cv2-INTER_LINEAR resize to (H, W)
  prediction = argmax(mean over scales of out_s)

Everything after the host image load runs on device in one jitted function
per (image size, scale) pair; tiles are batched through the model rather
than looped (the reference loops per crop unless --faster, eval.py:379-390).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.evalx.tiling import (
    TileGrid,
    compute_grid,
    extract_tiles,
    merge_tiles_segments,
    reference_count_map,
)
from pinthememory_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_bilinear_half_pixel,
    resize_pil_bilinear,
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] HWC -> normalized float (ToTensor + Normalize)."""
    img = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (img - mean) / std


class SlidingEvaluator:
    """Jit-compiled sliding-window evaluator.

    ``apply_fn(images_nhwc) -> logits_nhwc`` is the model forward (already
    closed over params/memory).  One XLA program is compiled per
    (image size, scale, flip) -- 6 programs for the standard protocol.
    """

    def __init__(
        self,
        apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
        num_classes: int = 19,
        crop_size: int = 768,
        overlap: float = 1.0 / 3.0,
        scales: Sequence[float] = (0.5, 1.0, 2.0),
        flip: bool = True,
        tile_batch: int = 0,
        apply_low_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
        scale_batch: dict | None = None,
        count_mode: str = "reference",
        stream_tiles: int = 0,
        aot: str | None = None,
        ctx=None,
    ):
        self.apply_fn = apply_fn
        self.num_classes = num_classes
        self.crop_size = crop_size
        self.overlap = overlap
        self.scales = tuple(scales)
        self.flip = flip
        self.tile_batch = tile_batch
        # "reference" reproduces eval.py's count-indexing bug bit-for-bit
        # (count_predictions[y1:y2, x1:x2] on a (C, H, W) array -- see
        # tiling.reference_count_map); released mIoU numbers include it.
        # "uniform" is the intended per-pixel overlap average (PARITY.md).
        assert count_mode in ("reference", "uniform"), count_mode
        self.count_mode = count_mode
        # per-scale image-batch cap for predict_batch_device: small-scale
        # programs are dispatch-bound (few tiny tiles) and want MORE images
        # per program, while scale-2.0 is HBM-bound and wants FEW; e.g.
        # {0.5: 8, 1.0: 4, 2.0: 2}.  None = run each scale on the whole
        # batch (previous behavior).
        self.scale_batch = dict(scale_batch) if scale_batch else None
        # fast-merge: apply_low_fn returns the model's PRE-upsample logits
        # (dec2, OS4 for the D16 heads); tiles merge at decoder resolution
        # and upsample once per image.  NOT the reference protocol: per-tile
        # align-corners upsample != upsample of the merged map near tile
        # seams (interior pixels match exactly), and it always uses the
        # intended uniform overlap average (never the reference count bug)
        # -- opt-in, see PARITY.md.
        self.apply_low_fn = apply_low_fn
        # stream_tiles > 0: process tiles through the model in chunks of
        # that many and accumulate each chunk straight into the merged map
        # instead of materializing ALL tile logits first -- the scale-2.0
        # working set drops from ~1.45 GB/image (tile logits) to the
        # ~0.6 GB/image merged accumulator, enabling larger image batches
        # on HBM-limited parts (BASELINE.md 5b).  Same math; f32 summation
        # order differs from the segment merge (tile-order instead of
        # segment-order adds).  Reference count mode only.
        self.stream_tiles = int(stream_tiles)
        if self.stream_tiles > 0:
            # the stream path exists only for the reference count mode and
            # the full-resolution merge; silently falling back to the
            # monolithic program would hand the user none of the promised
            # HBM reduction (ADVICE r4)
            if self.count_mode != "reference":
                raise ValueError(
                    "stream_tiles requires count_mode='reference' (the "
                    "uniform-count stream path is not implemented)")
            if self.apply_low_fn is not None:
                raise ValueError(
                    "stream_tiles is incompatible with fast_merge "
                    "(apply_low_fn): the low-res fast path would shadow "
                    "the streaming merge")
        self._programs: dict = {}
        # ctx mode: ``apply_fn(ctx, tiles)`` with ``ctx`` a pytree of arrays
        # (model variables, m_items) threaded as PROGRAM INPUTS instead of
        # jit-closure constants.  Required for useful AOT caching: closure
        # weights get baked into the serialized executable (~160 MB of
        # constants re-uploaded per load -- measured 113 s through the
        # tunnel), while argument weights stay resident on device and the
        # cached executable is checkpoint-independent.
        self.ctx = ctx
        self._ctx_cache: dict = {}
        # aot: enables the persistent executable cache so a warm process
        # skips tracing+compilation of the tile programs (VERDICT r4 #3).
        # In ctx mode pass any stable tag (weights are runtime inputs); in
        # closure mode the tag MUST be a weights digest
        # (utils/aotcache.snapshot_digest) since the weights are baked in.
        self._aot = None
        if aot is not None:
            from pinthememory_tpu.utils.aotcache import AotCache

            cfg_key = (f"sliding_c{crop_size}_o{overlap:.4f}_f{int(flip)}"
                       f"_{count_mode}_st{stream_tiles}"
                       f"_fm{int(apply_low_fn is not None)}_w{aot}")
            self._aot = AotCache(cfg_key)

    def _maybe_aot(self, jitted_fn, key: str):
        return self._aot.wrap(jitted_fn, key) if self._aot is not None else jitted_fn

    def _apply(self, ctx, tiles):
        return self.apply_fn(ctx, tiles) if self.ctx is not None else self.apply_fn(tiles)

    def _apply_low(self, ctx, tiles):
        return (self.apply_low_fn(ctx, tiles) if self.ctx is not None
                else self.apply_low_fn(tiles))

    def _ctx_arg(self):
        """The ctx pytree as passed to programs (empty tuple in closure mode:
        a zero-leaf pytree that traces to nothing)."""
        return self.ctx if self.ctx is not None else ()

    def _ctx_on(self, mesh):
        """ctx replicated over the mesh (cached; one transfer per mesh)."""
        if self.ctx is None:
            return ()
        key = id(mesh)
        if key not in self._ctx_cache:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P())
            self._ctx_cache[key] = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), self.ctx)
        return self._ctx_cache[key]

    def _low_factor(self, grid) -> int | None:
        """Output-stride factor of apply_low_fn, or None if the fast path
        cannot be used for this grid (non-divisible geometry)."""
        if self.apply_low_fn is None:
            return None
        probe = jax.eval_shape(
            lambda t: self._apply_low(self._ctx_arg(), t),
            jax.ShapeDtypeStruct((1, grid.tile_h, grid.tile_w, 3), jnp.float32))
        if grid.tile_h % probe.shape[1] or grid.tile_w % probe.shape[2]:
            return None
        f = grid.tile_h // probe.shape[1]
        if grid.tile_w // probe.shape[2] != f:
            return None
        divisible = (grid.img_h % f == 0 and grid.img_w % f == 0
                     and all(y % f == 0 and x % f == 0 for y, x in grid.coords))
        return f if divisible else None

    def _scale_program(self, img_h: int, img_w: int, scale: float):
        key = (img_h, img_w, scale)
        if key in self._programs:
            return self._programs[key]

        sh, sw = int(img_h * scale), int(img_w * scale)
        grid = compute_grid(sh, sw, self.crop_size, scale, self.overlap)
        with_flip = self.flip

        f = self._low_factor(grid)
        if f is not None and f > 1:
            lgrid = TileGrid(
                tuple((y // f, x // f) for y, x in grid.coords),
                grid.tile_h // f, grid.tile_w // f,
                grid.img_h // f, grid.img_w // f)

            @jax.jit
            def run_fast(ctx, raw_img: jnp.ndarray):
                img = resize_pil_bilinear(raw_img.astype(jnp.float32), (sh, sw))
                img = normalize_image(img)
                tiles = extract_tiles(img, grid)
                if with_flip:
                    tiles_f = extract_tiles(img[:, ::-1, :], grid)
                    logits = self._apply_low(
                        ctx, jnp.concatenate([tiles, tiles_f], axis=0))
                    lo, lf = jnp.split(logits, 2, axis=0)
                    merged = 0.5 * (merge_tiles_segments(lo, lgrid)
                                    + merge_tiles_segments(lf, lgrid)[:, ::-1, :])
                else:
                    logits = self._apply_low(ctx, tiles)
                    merged = merge_tiles_segments(logits, lgrid)
                # one per-image upsample replaces the per-tile in-model one;
                # ride the model's compute dtype (fast mode is already a
                # documented approximation) -- f32-HIGHEST matmuls here cost
                # more than the per-tile upsamples they replace
                merged = merged.astype(logits.dtype)
                merged = resize_bilinear_align_corners(merged, (sh, sw))
                return resize_bilinear_half_pixel(merged, (img_h, img_w)).astype(
                    jnp.float32)

            self._programs[key] = run_fast
            return run_fast

        if self.count_mode == "reference":
            # eval.py:215-228's buggy divisor, class/row-dependent, constant
            # over W -- it commutes with the LR flip and the W resize, so
            # dividing the flip-mean once is bit-equivalent to the
            # reference's per-flip division
            div = jnp.asarray(reference_count_map(grid, self.num_classes))
            merge = lambda t: merge_tiles_segments(t, grid, divide=False)
        else:
            div = None
            merge = lambda t: merge_tiles_segments(t, grid)

        if self.stream_tiles > 0 and div is not None:
            th, tw = grid.tile_h, grid.tile_w
            # (variant, y_src, x_src, y_dst, x_dst): flipped-image tiles
            # land mirrored in the original frame with their content
            # unflipped -- identical to merging the flipped map then [::-1]
            specs = [(0, y, x, y, x) for (y, x) in grid.coords]
            if with_flip:
                specs += [(1, y, x, y, sw - x - tw) for (y, x) in grid.coords]
            chunk_n = max(1, self.stream_tiles)

            @jax.jit
            def run_stream(ctx, raw_img: jnp.ndarray):
                img = resize_pil_bilinear(raw_img.astype(jnp.float32), (sh, sw))
                img = normalize_image(img)
                variants = (img, img[:, ::-1, :]) if with_flip else (img,)
                merged = jnp.zeros((sh, sw, self.num_classes), jnp.float32)
                for i in range(0, len(specs), chunk_n):
                    chunk = specs[i:i + chunk_n]
                    tiles = jnp.stack([
                        variants[v][y:y + th, x:x + tw] for v, y, x, _, _ in chunk])
                    logits = self._apply(ctx, tiles)
                    for j, (v, _y, _x, yd, xd) in enumerate(chunk):
                        t = logits[j]
                        if v:
                            t = t[:, ::-1, :]
                        merged = merged.at[yd:yd + th, xd:xd + tw].add(
                            t.astype(jnp.float32))
                if with_flip:
                    merged = merged * 0.5
                merged = merged / div
                return resize_bilinear_half_pixel(merged, (img_h, img_w))

            self._programs[key] = run_stream
            return run_stream

        @jax.jit
        def run(ctx, raw_img: jnp.ndarray):
            # raw_img: (H, W, 3) uint8/float [0..255] original resolution.
            # Both flip variants ride one program: the flipped image's tiles
            # are batched with the originals so the model runs once.
            img = resize_pil_bilinear(raw_img.astype(jnp.float32), (sh, sw))
            img = normalize_image(img)
            tiles = extract_tiles(img, grid)
            if with_flip:
                tiles_f = extract_tiles(img[:, ::-1, :], grid)
                logits = self._apply(ctx, jnp.concatenate([tiles, tiles_f], axis=0))
                lo, lf = jnp.split(logits, 2, axis=0)
                merged = merge(lo)
                merged_f = merge(lf)[:, ::-1, :]
                merged = 0.5 * (merged + merged_f)
            else:
                merged = merge(self._apply(ctx, tiles))
            if div is not None:
                merged = merged / div
            return resize_bilinear_half_pixel(merged, (img_h, img_w))

        self._programs[key] = run
        return run

    def predict_logits(self, raw_img) -> jnp.ndarray:
        """Mean-of-logits over scales and flips at original resolution."""
        img_h, img_w = raw_img.shape[:2]
        raw = jnp.asarray(raw_img)
        acc = None
        for scale in self.scales:
            key = ("single", img_h, img_w, scale)
            run = self._programs.get(key)
            if run is None:
                run = self._maybe_aot(
                    self._scale_program(img_h, img_w, scale),
                    f"single_{img_h}x{img_w}_s{scale}")
                self._programs[key] = run
            out = run(self._ctx_arg(), raw)
            acc = out if acc is None else acc + out
        return acc / len(self.scales)

    def _batch_program(self, n: int, img_h: int, img_w: int, scale: float):
        """vmapped per-scale program over a small image batch -- amortizes
        per-program dispatch latency and doubles the tile batch."""
        key = ("batch", n, img_h, img_w, scale)
        if key in self._programs:
            return self._programs[key]
        body = self._scale_program(img_h, img_w, scale)
        run = self._maybe_aot(jax.jit(jax.vmap(body, in_axes=(None, 0))),
                              f"batch{n}_{img_h}x{img_w}_s{scale}")
        self._programs[key] = run
        return run

    def predict_batch_device(self, raw_imgs) -> jnp.ndarray:
        """(N, H, W) uint8 predictions on device for a stacked image batch.

        With ``scale_batch`` set, each scale runs in chunks of its own batch
        cap: N can be a super-batch (e.g. 8) so the tiny scale-0.5 program
        sees 8 images in one dispatch while the HBM-heavy scale-2.0 program
        still runs 2 at a time.  Logit sums per image are unaffected by the
        chunking, so predictions are identical for any cap choice.
        """
        raws = jnp.asarray(raw_imgs)
        n, img_h, img_w = raws.shape[:3]
        acc = None
        for scale in self.scales:
            cap = n
            if self.scale_batch:
                cap = max(1, min(int(self.scale_batch.get(scale, n)), n))
            outs = []
            for i in range(0, n, cap):
                chunk = raws[i:i + cap]
                run = self._batch_program(chunk.shape[0], img_h, img_w, scale)
                outs.append(run(self._ctx_arg(), chunk))
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
            acc = out if acc is None else acc + out
        return jnp.argmax(acc, axis=-1).astype(jnp.uint8)

    def predict_batch_sharded(self, raw_imgs, mesh,
                              spatial: bool | None = None) -> jnp.ndarray:
        """Data x spatial parallel batched prediction over a device mesh.

        The image batch is sharded over the mesh's ``data`` axis (each
        device evaluates its images; no cross-device communication until the
        caller reduces, e.g. a global confusion matrix where XLA inserts the
        psum) -- the TPU-native replacement for the reference's
        multi-process DDP eval (eval.py:123-127) + hist all-reduce.

        When the mesh has a ``spatial`` axis (and ``spatial`` is not
        explicitly False), each image's H dimension is additionally sharded
        over it: GSPMD partitions the resize matmuls, the tile programs and
        the merged full-resolution logit accumulators across the spatial
        group with automatic halo exchange -- the context-parallel analogue
        for the scale-2.0 HBM wall (BASELINE.md 5b: ~2.9 GB of tile logits
        per 2 images at 2048x1024; an H-sharded spatial group splits that
        working set instead of replicating it).  Predictions are verified
        exactly equal to the unsharded program (tests/test_evalx.py).

        Per-scale ``scale_batch`` caps apply per data-axis shard: with
        ``{2.0: 2}`` and a data axis of 4, a 16-image super-batch runs the
        scale-2.0 program on 8 images at a time (2 per data row), the
        others on all 16.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_real = raw_imgs.shape[0]
        ndev = int(np.prod([mesh.shape[a] for a in ("data",) if a in mesh.shape]))
        if n_real % ndev:
            # transparent tail padding: a 500-image val set on an 8-chip
            # mesh leaves a remainder -- replicate the last image up to the
            # next data-axis multiple and truncate the predictions after
            # (VERDICT r4 #7); padded rows cost one duplicate evaluation
            pad_n = ndev - n_real % ndev
            raw_imgs = np.concatenate(
                [np.asarray(raw_imgs),
                 np.repeat(np.asarray(raw_imgs[-1:]), pad_n, axis=0)], axis=0)
        n = raw_imgs.shape[0]
        n_sp = int(mesh.shape.get("spatial", 1))
        use_spatial = n_sp > 1 if spatial is None else (spatial and n_sp > 1)
        spec = P("data", "spatial") if use_spatial else P("data")
        sharding = NamedSharding(mesh, spec)
        # already-uploaded shards (evalx.cli's async lag-one upload) pass
        # through; device_put with an equal sharding is a no-op
        dev = jax.device_put(raw_imgs, sharding)
        img_h, img_w = raw_imgs.shape[1:3]
        acc = None
        for scale in self.scales:
            cap = n
            if self.scale_batch:
                per_row = max(1, int(self.scale_batch.get(scale, n)))
                cap = max(ndev, min(per_row * ndev, n))
                cap -= cap % ndev  # chunks stay data-axis divisible
            outs = []
            for i in range(0, n, cap):
                chunk = dev[i:i + cap]
                if chunk.shape[0] != n:
                    # a slice of the data-sharded batch lives on a SUBSET of
                    # the data rows; redistribute so every device works
                    chunk = jax.device_put(chunk, sharding)
                run = self._batch_program(chunk.shape[0], img_h, img_w, scale)
                outs.append(run(self._ctx_on(mesh), chunk))
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
            acc = out if acc is None else acc + out
        preds = jnp.argmax(acc, axis=-1).astype(jnp.uint8)
        return preds[:n_real] if n_real != n else preds

    def predict_device(self, raw_img) -> jnp.ndarray:
        """(H, W) uint8 prediction left ON DEVICE (no host sync).

        Streaming evaluation should consume this asynchronously (e.g. feed
        it to an on-device confusion-matrix update) so images pipeline
        through the chip back-to-back.
        """
        logits = self.predict_logits(raw_img)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    def predict(self, raw_img) -> np.ndarray:
        """(H, W) class prediction; argmax on device, uint8 download.

        (A single fused all-scales program was measured ~1.5x SLOWER than
        dispatching the per-scale programs -- XLA pipelines the separate
        executables better -- so this stays multi-program.)
        """
        return np.asarray(self.predict_device(raw_img))
