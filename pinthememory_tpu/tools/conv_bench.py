"""Microbenchmark: the trunk's conv shapes, dilated vs dense vs shifted-matmul.

The DeepR50V3PlusD trunk at 768^2/OS16 spends its FLOPs in a handful of conv
shapes; this tool times each on the chip (chained data-dependent reps, one
scalar sync -- the axon tunnel adds ~25 ms RTT per fetch) and reports
achieved TFLOP/s vs the bf16 peak.  For every dilated 3x3 it also times the
equivalent "shifted matmul" formulation

    y = sum_{ky,kx} shift(x, d*(ky-1), d*(kx-1)) @ W[ky,kx]

which needs no space-to-batch rewrite: each term is an MXU-shaped
(N*H*W, Cin) x (Cin, Cout) matmul.  If XLA's native dilated-conv lowering
is the train-step bottleneck, the gap shows up here.

Usage (on TPU):
  python -m pinthememory_tpu.tools.conv_bench [--bs 4] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.tools.mfu import chip_peak


def conv(x, w, dilation: int, stride: int = 1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def shifted_matmul_conv(x, w, dilation: int):
    """SAME-padded 3x3 dilated conv as 9 shifted matmuls (stride 1)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    d = dilation
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    out = jnp.zeros((n, h, wd, cout), x.dtype)
    for ky in range(3):
        for kx in range(3):
            patch = jax.lax.dynamic_slice(
                xp, (0, ky * d, kx * d, 0), (n, h, wd, cin))
            out = out + jnp.einsum(
                "nhwc,cf->nhwf", patch, w[ky, kx],
                preferred_element_type=x.dtype)
    return out


def _chained(fn, k: int, carry_proj):
    """K data-dependent applications in one program.  ``carry_proj`` maps the
    output back to the input shape (1x1 matmul) to chain shapes that differ."""

    @jax.jit
    def run(x, w, p):
        def body(_, c):
            y = fn(c, w)
            return jnp.einsum("nhwf,fc->nhwc", y, p,
                              preferred_element_type=c.dtype)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x).astype(jnp.float32))

    return run


def time_case(name, x, w, fn, flops_once, reps, peak, k_lo=8, k_hi=136):
    # k_hi - k_lo = 128 chained iterations between the two timed programs:
    # the tunnel's multi-ms RTT jitter needs >100 ms of differenced device
    # work to vanish from the quotient
    cout, cin = w.shape[-1], w.shape[-2]
    # random, small-magnitude chain projection: an all-zeros matrix would be
    # algebraically simplified away by XLA (dot(x, 0) -> 0) and the whole
    # loop body would be dead-code-eliminated
    proj = jnp.asarray(
        np.random.default_rng(1).standard_normal((cout, cin)) * 0.02, x.dtype)
    times = {}
    for k in (k_lo, k_hi):
        run = _chained(fn, k, proj)
        float(run(x, w, proj))  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, w, proj))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    per = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    # subtract nothing for the chaining projection: report it alongside
    proj_flops = 2 * x.shape[0] * x.shape[1] * x.shape[2] * cin * cout
    tflops = flops_once / per / 1e12
    row = {"case": name, "us": round(per * 1e6, 1),
           "gflop": round(flops_once / 1e9, 2),
           "tflops": round(tflops, 1),
           "mfu_pct": round(100 * tflops / peak, 1),
           "note": f"chain adds {proj_flops/1e9:.2f} GFLOP 1x1 proj/iter"}
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    dt = jnp.dtype(args.dtype)
    kind, peak = chip_peak()
    print(json.dumps({"device": kind, "peak_bf16_tflops": peak}), flush=True)
    rng = np.random.default_rng(0)
    bs = args.bs

    # (name, H, Cin, Cout, dilation): the hot conv shapes of R50-D16 + ASPP
    cases = [
        ("layer2_3x3_d1_96x96x128", 96, 128, 128, 1),
        ("layer3_3x3_d1_48x48x256", 48, 256, 256, 1),
        ("layer4_3x3_d2_48x48x512", 48, 512, 512, 2),
        ("aspp_3x3_d6_48x48_2048to256", 48, 2048, 256, 6),
        ("aspp_3x3_d12_48x48_2048to256", 48, 2048, 256, 12),
        ("aspp_3x3_d18_48x48_2048to256", 48, 2048, 256, 18),
    ]

    rows = []
    for name, h, cin, cout, d in cases:
        x = jnp.asarray(rng.standard_normal((bs, h, h, cin)), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.01, dt)
        flops = 2 * bs * h * h * 9 * cin * cout
        rows.append(time_case(f"{name}:xla_conv", x, w,
                              lambda a, b, d=d: conv(a, b, d),
                              flops, args.reps, peak))
        if d > 1:
            rows.append(time_case(f"{name}:shifted_matmul", x, w,
                                  lambda a, b, d=d: shifted_matmul_conv(a, b, d),
                                  flops, args.reps, peak))
        else:
            # dense equivalence check of the formulation (cheap sanity)
            ref = conv(x[:1], w, 1)
            alt = shifted_matmul_conv(x[:1], w, 1)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - alt.astype(jnp.float32))))
            print(json.dumps({"case": f"{name}:parity", "max_abs_err": err}),
                  flush=True)

    print(json.dumps({"device": kind, "rows": rows}, indent=2))


if __name__ == "__main__":
    main()
