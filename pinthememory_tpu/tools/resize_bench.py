"""Microbenchmark: bilinear-resize formulations at the model's hot shapes.

``stage_upsample`` in tools/train_mfu.py measured the decoder's final
align-corners upsample at ~32x its HBM roofline: the W-axis einsum
``ow,bhwc->bhoc`` contracts w with the 19-wide channel axis minor, which
XLA lowers to thousands of tiny-N GEMMs (N=19 padded to 128 lanes).  This
tool times candidate formulations:

  nhwc      -- the current pair of einsums on NHWC
  nchw      -- transpose to channels-first once, resize H and W as clean
               (M, K) x (K, N) GEMMs with large N, transpose back
  taps      -- 2-tap gather along each axis (row gathers)

at the decoder/skip/eval shapes, with chained data-dependent reps (one
scalar sync; the axon tunnel adds ~25 ms RTT per fetch).

Usage (on TPU):
  python -m pinthememory_tpu.tools.resize_bench [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.ops.resize import (
    _apply_separable,
    _gather_taps_axis,
    _align_corners_taps,
    _linear_matrix_align_corners,
)


def resize_nhwc(x, out_hw):
    return _apply_separable(x, out_hw, _linear_matrix_align_corners)


def resize_nchw(x, out_hw):
    """Channels-first formulation: both contractions get a large free dim."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    hp = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
          else jax.lax.Precision.HIGHEST)
    cd = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    y = x.astype(cd).transpose(0, 3, 1, 2)              # (b, c, h, w)
    if h != oh:
        m = jnp.asarray(_linear_matrix_align_corners(h, oh), cd)
        y = jnp.einsum("oh,bchw->bcow", m, y, precision=hp)
    if w != ow:
        m = jnp.asarray(_linear_matrix_align_corners(w, ow), cd)
        y = jnp.einsum("ow,bchw->bcho", m, y, precision=hp)
    return y.transpose(0, 2, 3, 1).astype(x.dtype)


def resize_taps(x, out_hw):
    b, h, w, c = x.shape
    oh, ow = out_hw
    y = x
    if h != oh:
        y = _gather_taps_axis(y, _align_corners_taps(h, oh), axis=1)
    if w != ow:
        y = _gather_taps_axis(y, _align_corners_taps(w, ow), axis=2)
    return y.astype(x.dtype)


def _chain(fn, out_hw, in_hw, k):
    """K data-dependent resizes: upsample then slice back to input size."""

    @jax.jit
    def run(x):
        def body(_, c):
            y = fn(c, out_hw)
            return y[:, :in_hw[0], :in_hw[1], :] * 0.999
        return jnp.sum(jax.lax.fori_loop(0, k, body, x).astype(jnp.float32))

    return run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    cases = [
        ("decoder_up_192to768_c19_bf16", (4, 192, 192, 19), (768, 768), jnp.bfloat16),
        ("skip_up_48to192_c256_bf16", (4, 48, 48, 256), (192, 192), jnp.bfloat16),
        ("readloss_up_48to768_c19_f32", (4, 48, 48, 19), (768, 768), jnp.float32),
    ]
    variants = [("nhwc", resize_nhwc), ("nchw", resize_nchw),
                ("taps", resize_taps)]

    for name, shape, out_hw, dt in cases:
        x = jnp.asarray(rng.standard_normal(shape), dt)
        ref = None
        for vname, fn in variants:
            # correctness vs the nhwc reference first
            y = fn(x, out_hw)
            if ref is None:
                ref = y.astype(jnp.float32)
            else:
                err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref)))
                if err > (0.05 if dt == jnp.bfloat16 else 1e-5):
                    print(json.dumps({"case": f"{name}:{vname}",
                                      "MISMATCH": err}), flush=True)
                    continue
            t = {}
            for k in (2, 18):
                run = _chain(fn, out_hw, shape[1:3], k)
                float(run(x))
                best = float("inf")
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(run(x))
                    best = min(best, time.perf_counter() - t0)
                t[k] = best
            per_us = (t[18] - t[2]) / 16 * 1e6
            out_bytes = int(np.prod((shape[0],) + out_hw
                                    + (shape[3],))) * jnp.dtype(dt).itemsize
            print(json.dumps({
                "case": f"{name}:{vname}", "us": round(per_us, 1),
                "write_gbps": round(out_bytes / (per_us / 1e6) / 1e9, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
