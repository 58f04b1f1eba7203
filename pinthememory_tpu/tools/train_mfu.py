"""Decompose train-step MFU: forward vs forward+backward vs full episode.

BASELINE.md row 6 records the flagship memory-MLDG episode at ~12.6% MFU vs
39-46% for the forward-only eval programs.  This probe isolates WHERE the
gap lives by timing, at the training crop/batch, each constituent program:

  fwd       -- one training-mode forward (memory write in graph), loss only
  fwdbwd    -- jax.value_and_grad of the same (the inner phase of MLDG)
  episode   -- the full memory-MLDG step (all four serial phases)

each with XLA cost-analysis FLOPs -> TFLOP/s -> MFU against the chip's bf16
peak.  ``--bs_sweep`` repeats fwd/fwdbwd over several batch sizes to expose
the batch-efficiency curve of the dilated-conv trunk.

Timing convention: K dispatches + ONE scalar fetch (the axon tunnel adds
~25 ms RTT per synchronous fetch, and ``block_until_ready`` can return
early through it -- see BASELINE.md row 5 notes).

Usage (on TPU):
  python -m pinthememory_tpu.tools.train_mfu [--bs 4] [--crop 768]
  python -m pinthememory_tpu.tools.train_mfu --bs_sweep 2,4,8,16 --what fwd,fwdbwd
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.tools.mfu import chip_peak


def _batch(rng, bs, hw, n_dom=None):
    shape = (bs, n_dom) if n_dom else (bs,)
    return {
        "image": jnp.asarray(
            rng.standard_normal(shape + (hw, hw, 3)).astype(np.float32)),
        "gts": jnp.asarray(rng.integers(0, 19, shape + (hw, hw)), jnp.int32),
        "aux_gts": jnp.asarray(rng.integers(0, 19, shape + (hw, hw)), jnp.int32),
    }


def _time_compiled(compiled, args_tuple, sync_scalar, reps: int, k: int = 3):
    out = compiled(*args_tuple)
    float(sync_scalar(out))  # warmup exec + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = compiled(*args_tuple)
        float(sync_scalar(out))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def _cost_flops(compiled) -> float:
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--crop", type=int, default=768)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--what", default="fwd,fwdbwd,episode")
    ap.add_argument("--bs_sweep", default=None,
                    help="comma list of batch sizes; runs --what at each")
    args = ap.parse_args(argv)

    from pinthememory_tpu.core.config import (
        Config, MemoryConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.models.memory import init_memory
    from pinthememory_tpu.train.losses import assemble_losses
    from pinthememory_tpu.train.loops import make_train_step_mldg
    from pinthememory_tpu.train.state import create_train_state

    hw = args.crop
    cfg = Config(
        model=ModelConfig(arch="DeepR50V3PlusD", num_classes=19,
                          memory=MemoryConfig(enabled=True), dtype="bfloat16"),
        train=TrainConfig(mldg=True, bs_mult=args.bs, crop_size=hw),
        optim=OptimConfig(),
    )
    model = build_model(cfg.model)
    m_items = init_memory(jax.random.PRNGKey(1), cfg.model.num_classes, 256)
    import functools as _ft
    init_fn = jax.jit(_ft.partial(
        model.init, train=False, with_aux=True, memory_writing=True))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, hw, hw, 3)),
        jnp.zeros((1, hw, hw), jnp.int32), m_items, rng=jax.random.PRNGKey(2))
    state, tx = create_train_state(cfg, variables, m_items)

    kind, peak = chip_peak()
    print(json.dumps({"device": kind, "peak_bf16_tflops": peak}),
          file=sys.stderr)
    rng = np.random.default_rng(0)
    what = args.what.split(",")
    sweep = ([int(x) for x in args.bs_sweep.split(",")]
             if args.bs_sweep else [args.bs])

    def loss_fn(params, batch, key):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], batch["gts"], state.m_items,
            train=True, rng=key, memory_writing=True, writing_detach=False,
            mutable=["batch_stats"])
        return assemble_losses(cfg, outputs, batch["gts"],
                               batch["aux_gts"]).total

    def fwd_variant(kind: str):
        """Bisection forwards: attribute train-forward MFU loss to train-mode
        BN, the memory read/write, or the loss assembly."""

        def fn(params, batch, key):
            if kind == "eval":  # eval-mode, no memory write, logits only
                outputs = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["image"], None, state.m_items,
                    train=False, with_aux=False)
                return jnp.sum(outputs["main_out"].astype(jnp.float32))
            mutated = {}
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], batch["gts"], state.m_items,
                train=True, rng=key,
                memory_writing=(kind in ("full", "noloss")),
                writing_detach=False, mutable=["batch_stats"])
            if kind in ("noloss", "nomem_noloss"):
                # consume logits + new stats so BN reductions stay live
                stats_sum = sum(jnp.sum(x.astype(jnp.float32))
                                for x in jax.tree.leaves(mutated))
                return jnp.sum(outputs["main_out"].astype(jnp.float32)) + stats_sum
            return assemble_losses(cfg, outputs, batch["gts"],
                                   batch["aux_gts"]).total
        return fn

    def stage_fn(stage: str, bs: int):
        """Isolated model stages at eval mode (attributes the forward MFU)."""
        import flax.linen as nn
        from pinthememory_tpu.ops.resize import resize_bilinear_align_corners

        h16, h4 = hw // 16, hw // 4
        vars_ = {"params": state.params, "batch_stats": state.batch_stats}
        if stage == "backbone":
            x = jnp.asarray(rng.standard_normal((bs, hw, hw, 3)), jnp.float32)

            def run(v, x):
                feats = model.apply(
                    v, x, train=False,
                    method=lambda m, x, train: m.backbone(x, train=train))
                return jnp.sum(feats["out"].astype(jnp.float32))
        elif stage == "aspp":
            x = jnp.asarray(
                rng.standard_normal((bs, h16, h16, 2048)), jnp.bfloat16)

            def run(v, x):
                y = model.apply(
                    v, x, train=False,
                    method=lambda m, f, train: m.aspp(f, train=train))
                return jnp.sum(y.astype(jnp.float32))
        elif stage == "decoder":
            x = jnp.asarray(
                rng.standard_normal((bs, h4, h4, 304)), jnp.bfloat16)

            def dec(m, d):
                y = nn.relu(m.final1_bn1(m.final1_conv1(d),
                                         use_running_average=True))
                y = nn.relu(m.final1_bn2(m.final1_conv2(y),
                                         use_running_average=True))
                return m.final2_conv(y)

            def run(v, x):
                return jnp.sum(model.apply(v, x, method=dec).astype(jnp.float32))
        elif stage == "upsample":
            x = jnp.asarray(
                rng.standard_normal((bs, h4, h4, 19)), jnp.bfloat16)

            def run(v, x):
                return jnp.sum(resize_bilinear_align_corners(
                    x, (hw, hw)).astype(jnp.float32))
        else:
            raise SystemExit(f"unknown stage: {stage}")
        return jax.jit(run), vars_, x

    def probe_one(name: str, bs: int):
        flat = _batch(rng, bs, hw)
        key = jax.random.PRNGKey(1)
        if name.startswith("stage_"):
            fn, vars_, x = stage_fn(name[6:], bs)
            compiled = fn.lower(vars_, x).compile()
            t = _time_compiled(compiled, (vars_, x), lambda o: o,
                               args.reps, k=8)
        elif name == "fwd":
            fn = jax.jit(loss_fn)
            compiled = fn.lower(state.params, flat, key).compile()
            t = _time_compiled(compiled, (state.params, flat, key),
                               lambda o: o, args.reps)
        elif name.startswith("fwd_"):
            # fwd_eval / fwd_noloss / fwd_nomem_noloss
            fn = jax.jit(fwd_variant(name[4:]))
            compiled = fn.lower(state.params, flat, key).compile()
            t = _time_compiled(compiled, (state.params, flat, key),
                               lambda o: o, args.reps)
        elif name == "fwdbwd":
            fn = jax.jit(jax.value_and_grad(loss_fn))
            compiled = fn.lower(state.params, flat, key).compile()
            t = _time_compiled(
                compiled, (state.params, flat, key),
                lambda o: o[0], args.reps)
        elif name == "episode":
            dom = _batch(rng, bs, hw, n_dom=2)
            inner_lr = jnp.float32(0.0025)
            step = make_train_step_mldg(model, cfg, tx)
            lowered = step.lower(state, dom, key, (0,), (1,), inner_lr)
            compiled = lowered.compile()
            t = _time_compiled(
                compiled, (state, dom, key, inner_lr),
                lambda o: o[1]["outer"]["total"], args.reps, k=2)
        else:
            raise SystemExit(f"unknown --what entry: {name}")
        flops = _cost_flops(compiled)
        tflops = flops / t / 1e12
        return {"what": name, "bs": bs, "sec": round(t, 4),
                "tflop": round(flops / 1e12, 2),
                "tflops": round(tflops, 1),
                "mfu_pct": round(100 * tflops / peak, 1)}

    rows = []
    for bs in sweep:
        for name in what:
            try:
                row = probe_one(name, bs)
            except Exception as e:  # keep sweeping past per-size OOMs
                row = {"what": name, "bs": bs,
                       "error": type(e).__name__ + ": " + str(e)[:160]}
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"device": kind, "rows": rows}, indent=2))


if __name__ == "__main__":
    main()
