"""Pooled (whole-image) inference with running softmax-mean fusion.

Reference: eval.py:133-146 (MeanFusion) + 277-337 (inference_pool /
pooled_eval).  Per (flip, scale): whole-image forward, bilinear
(align_corners=False, eval.py:282) resize of the logits to the scale-1.0
size, softmax, running mean; prediction = argmax of the fused mean.

The INPUT pre-resize is PIL BICUBIC, not bilinear: the reference scales
pooling inputs in the dataset (`img.resize((target_w, target_h))` with no
resample argument, datasets/cityscapes.py:250-264) and PIL's default is
Image.BICUBIC.  The sliding path, by contrast, passes Image.BILINEAR
explicitly (eval.py:357).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.evalx.sliding import normalize_image
from pinthememory_tpu.ops.resize import (
    resize_bilinear_half_pixel,
    resize_pil_bicubic,
)


class PoolingEvaluator:
    def __init__(
        self,
        apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
        num_classes: int = 19,
        scales: Sequence[float] = (1.0,),
        flip: bool = True,
        aot: str | None = None,
        ctx=None,
    ):
        self.apply_fn = apply_fn
        self.num_classes = num_classes
        self.scales = tuple(scales)
        self.flip = flip
        self._programs: dict = {}
        # ctx mode + persistent executable cache: see SlidingEvaluator --
        # ctx threads the model variables as program INPUTS so cached
        # executables carry no weight constants
        self.ctx = ctx
        self._aot = None
        if aot is not None:
            from pinthememory_tpu.utils.aotcache import AotCache

            self._aot = AotCache(f"pooling_f{int(flip)}_w{aot}")

    def _maybe_aot(self, jitted_fn, key: str):
        return self._aot.wrap(jitted_fn, key) if self._aot is not None else jitted_fn

    def _apply(self, ctx, x):
        return self.apply_fn(ctx, x) if self.ctx is not None else self.apply_fn(x)

    def _ctx_arg(self):
        return self.ctx if self.ctx is not None else ()

    def _program(self, img_h: int, img_w: int, scale: float):
        key = (img_h, img_w, scale)
        if key in self._programs:
            return self._programs[key]
        sh, sw = int(img_h * scale), int(img_w * scale)

        @jax.jit
        def run(ctx, raw_img: jnp.ndarray, do_flip: jnp.ndarray):
            img = resize_pil_bicubic(raw_img.astype(jnp.float32), (sh, sw))
            img = jnp.where(do_flip, img[:, ::-1, :], img)
            img = normalize_image(img)
            logits = self._apply(ctx, img[None])[0]
            logits = resize_bilinear_half_pixel(
                logits.astype(jnp.float32), (img_h, img_w)
            )
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.where(do_flip, probs[:, ::-1, :], probs)

        run = self._maybe_aot(run, f"single_{img_h}x{img_w}_s{scale}")
        self._programs[key] = run
        return run

    def _batch_program(self, n: int, img_h: int, img_w: int, scale: float):
        """One program per (batch, size, scale): both flip variants batched
        with the originals so the model runs once on 2N images."""
        key = ("batch", n, img_h, img_w, scale)
        if key in self._programs:
            return self._programs[key]
        sh, sw = int(img_h * scale), int(img_w * scale)
        with_flip = self.flip

        @jax.jit
        def run(ctx, raws: jnp.ndarray):  # (N, H, W, 3) uint8/float
            prep = jax.vmap(lambda r: normalize_image(
                resize_pil_bicubic(r.astype(jnp.float32), (sh, sw))))
            imgs = prep(raws)
            x = (jnp.concatenate([imgs, imgs[:, :, ::-1, :]], axis=0)
                 if with_flip else imgs)
            logits = self._apply(ctx, x)
            back = jax.vmap(lambda l: resize_bilinear_half_pixel(
                l.astype(jnp.float32), (img_h, img_w)))
            probs = jax.nn.softmax(back(logits), axis=-1)
            if with_flip:
                po, pf = jnp.split(probs, 2, axis=0)
                probs = 0.5 * (po + pf[:, :, ::-1, :])
            return probs

        run = self._maybe_aot(run, f"batch{n}_{img_h}x{img_w}_s{scale}")
        self._programs[key] = run
        return run

    def predict_batch_device(self, raw_imgs) -> jnp.ndarray:
        """(N, H, W) uint8 predictions on device for a stacked image batch.

        Identical fusion math to :meth:`predict_probs`: every scale
        contributes the same number of flip variants, so the mean over
        per-scale flip-means equals MeanFusion's running mean over all
        (scale, flip) passes (eval.py:133-146).
        """
        raws = jnp.asarray(raw_imgs)
        n, img_h, img_w = raws.shape[:3]
        acc = None
        for scale in self.scales:
            run = self._batch_program(n, img_h, img_w, scale)
            p = run(self._ctx_arg(), raws)
            acc = p if acc is None else acc + p
        return jnp.argmax(acc, axis=-1).astype(jnp.uint8)

    def predict_probs(self, raw_img) -> jnp.ndarray:
        img_h, img_w = raw_img.shape[:2]
        raw = jnp.asarray(raw_img)
        acc = None
        n = 0
        for scale in self.scales:
            run = self._program(img_h, img_w, scale)
            for f in ((False, True) if self.flip else (False,)):
                p = run(self._ctx_arg(), raw, jnp.asarray(f))
                acc = p if acc is None else acc + p
                n += 1
        return acc / n

    def predict(self, raw_img) -> np.ndarray:
        return np.asarray(
            jnp.argmax(self.predict_probs(raw_img), axis=-1).astype(jnp.int32)
        )
