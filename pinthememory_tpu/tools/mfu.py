"""MFU probe for the headline eval pipeline (VERDICT r1 item 7).

For each (scale, program) of the sliding evaluator this AOT-compiles the
program, reads XLA's ``cost_analysis`` FLOP estimate, times the compiled
executable, and reports per-scale and end-to-end TFLOP/s and MFU against the
chip's bf16 peak.  Unlike ``tools/flops.py`` (single model forward) this
covers the real benchmarked program: resize + normalize + tile + model +
merge + resize-back, per scale.

Usage (on TPU):
  python -m pinthememory_tpu.tools.mfu [--batch 2] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak TFLOP/s per chip by TPU generation (public specs)
PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5 lite": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def chip_peak() -> tuple[str, float]:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_TFLOPS.items():
        if key in kind:
            return kind, peak
    return kind, 197.0  # conservative default


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--scales", default="0.5,1.0,2.0")
    ap.add_argument("--no_flip", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweep", default=None,
                    help="per-scale image-batch sweep, e.g. "
                         "'0.5:2,4,8;1.0:2,4;2.0:1,2' -- reports sec/image "
                         "and MFU per (scale, batch) to pick scale_batch caps")
    args = ap.parse_args(argv)

    import bench  # repo-root bench harness (model + evaluator assembly)

    model, variables, m_items = bench.build(args.dtype, 768)

    def apply_fn(tiles):
        out = model.apply(variables, tiles, None, m_items, train=False,
                          with_aux=False)
        return out["main_out"]

    from pinthememory_tpu.evalx.sliding import SlidingEvaluator

    ev = SlidingEvaluator(
        apply_fn, scales=tuple(float(s) for s in args.scales.split(",")),
        flip=not args.no_flip, crop_size=768, overlap=1.0 / 3.0)

    kind, peak = chip_peak()
    rng = np.random.default_rng(0)

    def time_program(fn, inp):
        """(best sec, flops) for a compiled vmapped program; honest sync via
        a scalar reduction fetch (block_until_ready can return early through
        the axon tunnel)."""
        compiled = fn.lower(inp).compile()
        cost = compiled.cost_analysis() or {}
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
        float(checksum(compiled(inp)))  # warmup
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(checksum(compiled(inp)))
            best = min(best, time.perf_counter() - t0)
        return best, flops

    if args.sweep:
        rows = []
        for part in args.sweep.split(";"):
            s, bs = part.split(":")
            scale = float(s)
            body = ev._scale_program(args.height, args.width, scale)
            for b in (int(x) for x in bs.split(",")):
                inp = jnp.asarray(rng.integers(
                    0, 255, (b, args.height, args.width, 3), dtype=np.uint8))
                best, flops = time_program(jax.jit(jax.vmap(body)), inp)
                tflops = flops / best / 1e12
                row = {"scale": scale, "batch": b,
                       "sec_per_image": round(best / b, 4),
                       "tflops": round(tflops, 1),
                       "mfu_pct": round(100 * tflops / peak, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)
        print(json.dumps({"device": kind, "sweep": rows}, indent=2))
        return

    raws = jnp.asarray(rng.integers(
        0, 255, (args.batch, args.height, args.width, 3), dtype=np.uint8))

    total_flops = 0.0
    total_time = 0.0
    rows = []
    for scale in ev.scales:
        body = ev._scale_program(args.height, args.width, scale)
        best, flops = time_program(jax.jit(jax.vmap(body)), raws)
        tflops = flops / best / 1e12
        rows.append({
            "scale": scale, "sec_per_batch": round(best, 4),
            "gflop_per_batch": round(flops / 1e9, 1),
            "tflops": round(tflops, 1),
            "mfu_pct": round(100 * tflops / peak, 1),
        })
        total_flops += flops
        total_time += best

    ips = args.batch / total_time
    agg_tflops = total_flops / total_time / 1e12
    print(json.dumps({
        "device": kind,
        "peak_bf16_tflops": peak,
        "per_scale": rows,
        "images_per_sec_compute_only": round(ips, 3),
        "aggregate_tflops": round(agg_tflops, 1),
        "aggregate_mfu_pct": round(100 * agg_tflops / peak, 1),
    }, indent=2))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
