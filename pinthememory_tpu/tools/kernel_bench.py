"""Micro-benchmark: Pallas fused memory read vs the unfused XLA chain.

The categorical memory read (reference: network/memory.py:317-336) is the
one op in the hot path that XLA does not fuse end-to-end: normalize ->
cosine scores -> softmax -> weighted slot sum bounces the (N, 256) query
and (N, S) score maps through HBM between kernels.  ``ops/memory_kernel.py``
keeps a 1024-row block resident in VMEM and does all four stages in one
pass.  This tool times both implementations at the real eval/train shapes
and prints the HBM-traffic roofline for context.

Through the axon tunnel a single dispatch+sync has a ~25 ms RTT floor, so
naive per-call timing measures the tunnel, not the chip.  Instead each
measurement jits ONE program that applies the read K times in a
``lax.fori_loop`` (each iteration consuming the previous retrieval, so the
chain is data-dependent and cannot be elided), and the per-read time is the
difference quotient between two K values -- RTT and loop overhead cancel.

Usage (on TPU):
  python -m pinthememory_tpu.tools.kernel_bench [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.ops.memory_kernel import _fused_read_fwd_impl, _jnp_read


def _chained(read_fn, k: int):
    """One jitted program = K data-dependent reads + a scalar reduce."""

    @jax.jit
    def run(q, m):
        def body(_, carry):
            qn, score, retr = read_fn(carry, m)
            return retr
        return jnp.sum(jax.lax.fori_loop(0, k, body, q))

    return run


def _time(fn, q, m, reps: int) -> float:
    float(fn(q, m))  # warmup compile + honest sync (scalar fetch)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(q, m))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_read_us(read_fn, q, m, k_lo: int, k_hi: int, reps: int) -> float:
    t_lo = _time(_chained(read_fn, k_lo), q, m, reps)
    t_hi = _time(_chained(read_fn, k_hi), q, m, reps)
    return max(t_hi - t_lo, 1e-9) / (k_hi - k_lo) * 1e6


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--slots", type=int, default=19)
    args = ap.parse_args(argv)

    # N = tiles_in_program x (H/16 x W/16) queries: eval scale-1.0 program
    # runs 16 tiles of 768^2 at OS16 (48x48 queries each); the train episode
    # sees bs4 x 2304.  Sweep a few decades around those.
    shapes = [9_216, 36_864, 147_456, 589_824]

    rng = np.random.default_rng(0)
    m_items = jnp.asarray(rng.standard_normal((args.slots, args.dim)),
                          jnp.float32)

    fused = functools.partial(_fused_read_fwd_impl, interpret=False)
    plain = _jnp_read

    rows = []
    for n in shapes:
        # keep total chained work ~constant so every shape's loop body
        # dominates its program while staying well under a second
        k_lo, k_hi = 4, max(8, min(256, (1 << 23) // n) + 4)
        q = jnp.asarray(rng.standard_normal((n, args.dim)), jnp.float32)
        t_fused = _per_read_us(fused, q, m_items, k_lo, k_hi, args.reps)
        t_plain = _per_read_us(plain, q, m_items, k_lo, k_hi, args.reps)
        # minimum HBM traffic: read q once, write qn/score/retr once (f32)
        bytes_min = 4 * (n * args.dim * 3 + n * args.slots)
        rows.append({
            "n_queries": n,
            "fused_us": round(t_fused, 1),
            "plain_us": round(t_plain, 1),
            "speedup": round(t_plain / t_fused, 2),
            "fused_gbps": round(bytes_min / (t_fused / 1e6) / 1e9, 1),
            "plain_gbps": round(bytes_min / (t_plain / 1e6) / 1e9, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({
        "device": jax.devices()[0].device_kind,
        "rows": rows,
    }, indent=2))


if __name__ == "__main__":
    main()
