"""Capture an XPlane profile of a training/eval program and summarize it.

``jax.profiler.trace`` writes XPlane protos; the installed ``xprof`` package
(the TensorBoard profile plugin backend) can convert them to per-HLO-op
tables without running TensorBoard.  This tool does both: run the flagship
memory-MLDG step (or the agg episode / an eval scale program) a few times
under the profiler, then print the hottest HLO ops by self time -- the
ground truth for where the 18% train-step MFU goes (BASELINE.md row 6b).

Usage (on TPU):
  python -m pinthememory_tpu.tools.xprof_summary --what episode --bs 4
  python -m pinthememory_tpu.tools.xprof_summary --summarize /tmp/xprof_dir
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile


def capture(what: str, bs: int, crop: int, logdir: str, steps: int = 3):
    import jax

    from pinthememory_tpu.tools import train_mfu as tm

    # reuse the probe's model/step builders by running its probe under the
    # profiler: build everything, compile OUTSIDE the trace, execute inside
    import jax.numpy as jnp
    import numpy as np
    from pinthememory_tpu.core.config import (
        Config, MemoryConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.models.memory import init_memory
    from pinthememory_tpu.train.losses import assemble_losses
    from pinthememory_tpu.train.loops import (
        make_train_step_agg, make_train_step_mldg,
    )
    from pinthememory_tpu.train.state import create_train_state
    import functools

    hw = crop
    cfg = Config(
        model=ModelConfig(arch="DeepR50V3PlusD", num_classes=19,
                          memory=MemoryConfig(enabled=True), dtype="bfloat16"),
        train=TrainConfig(mldg=True, bs_mult=bs, crop_size=hw),
        optim=OptimConfig(),
    )
    model = build_model(cfg.model)
    m_items = init_memory(jax.random.PRNGKey(1), cfg.model.num_classes, 256)
    init_fn = jax.jit(functools.partial(
        model.init, train=False, with_aux=True, memory_writing=True))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, hw, hw, 3)),
        jnp.zeros((1, hw, hw), jnp.int32), m_items, rng=jax.random.PRNGKey(2))
    state, tx = create_train_state(cfg, variables, m_items)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    if what == "episode":
        dom = tm._batch(rng, bs, hw, n_dom=2)
        inner_lr = jnp.float32(0.0025)
        step = make_train_step_mldg(model, cfg, tx)

        def run():
            st, m = step(state, dom, key, (0,), (1,), inner_lr)
            return float(m["outer"]["total"])
    elif what == "agg":
        dom = tm._batch(rng, bs, hw, n_dom=2)
        step = make_train_step_agg(model, cfg, tx)

        def run():
            st, m = step(state, dom, key)
            return float(m["total"])
    elif what == "fwdbwd":
        flat = tm._batch(rng, bs, hw)

        def loss_fn(params):
            outputs, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                flat["image"], flat["gts"], state.m_items,
                train=True, rng=key, memory_writing=True,
                writing_detach=False, mutable=["batch_stats"])
            return assemble_losses(cfg, outputs, flat["gts"],
                                   flat["aux_gts"]).total

        g = jax.jit(jax.value_and_grad(loss_fn))

        def run():
            val, _ = g(state.params)
            return float(val)
    elif what == "eval":
        # eval-mode forward (the per-tile program of the sliding protocol) --
        # the 25%-MFU ceiling the train episode inherits (BASELINE.md 6b)
        x = jnp.asarray(rng.standard_normal((bs, hw, hw, 3)), jnp.float32)
        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
        fwd = jax.jit(lambda img: model.apply(
            eval_vars, img, None, state.m_items,
            train=False, with_aux=False)["main_out"])

        def run():
            return float(jnp.sum(fwd(x)))
    elif what == "evalscale":
        # one full per-scale sliding program (resize+tile+model+merge) on a
        # 2048x1024 image; --bs is the image batch, --crop the tile size
        from pinthememory_tpu.evalx.sliding import SlidingEvaluator

        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}

        def apply_fn(tiles):
            return model.apply(eval_vars, tiles, None, state.m_items,
                               train=False, with_aux=False)["main_out"]

        ev = SlidingEvaluator(apply_fn, crop_size=hw, overlap=1 / 3,
                              scales=(0.5, 1.0, 2.0), flip=True)
        raws = jnp.asarray(
            rng.integers(0, 255, (bs, 1024, 2048, 3)), jnp.uint8)

        def run():
            return int(jnp.sum(ev.predict_batch_device(raws)))
    else:
        raise SystemExit(f"unknown --what: {what}")

    run()  # compile + warmup outside the trace
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            run()
    print(f"# trace written to {logdir}", file=sys.stderr)
    return logdir


def summarize(logdir: str, top: int = 30):
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    print(f"# xplane: {paths[-1]}", file=sys.stderr)
    try:
        tools = rtd.xspace_to_tool_names([paths[-1]])
        print(f"# tools: {tools}", file=sys.stderr)
    except Exception as e:
        print(f"# tool_names failed: {e}", file=sys.stderr)

    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        try:
            data, ctype = rtd.xspace_to_tool_data([paths[-1]], tool, {})
        except Exception as e:
            print(f"# {tool} failed: {e}", file=sys.stderr)
            continue
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        if tool == "hlo_stats":
            _print_hlo_stats(data, top)
        else:
            out = os.path.join(logdir, f"{tool}.{'json' if 'json' in ctype else 'txt'}")
            with open(out, "w") as f:
                f.write(data)
            print(f"# {tool} ({ctype}, {len(data)} bytes) -> {out}",
                  file=sys.stderr)


def _print_hlo_stats(data: str, top: int):
    """hlo_stats arrives as a gviz JSON table; print top ops by self time."""
    try:
        obj = json.loads(data)
        cols = [c.get("label", c.get("id", "")) for c in obj["cols"]]
        rows = [[(c or {}).get("v") for c in r["c"]] for r in obj["rows"]]
    except Exception:
        print(data[:3000])
        return
    try:
        i_time = next(i for i, c in enumerate(cols)
                      if "self" in c.lower() and "us" in c.lower())
    except StopIteration:
        i_time = None
    print("\t".join(str(c) for c in cols))
    if i_time is not None:
        rows.sort(key=lambda r: -(r[i_time] or 0.0))
    for r in rows[:top]:
        print("\t".join(str(x) for x in r))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="episode",
                    choices=["episode", "agg", "fwdbwd", "eval", "evalscale"])
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--crop", type=int, default=768)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--summarize", default=None,
                    help="skip capture; summarize an existing trace dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args(argv)

    logdir = args.summarize
    if logdir is None:
        logdir = args.logdir or tempfile.mkdtemp(prefix="xprof_")
        capture(args.what, args.bs, args.crop, logdir, args.steps)
    summarize(logdir, args.top)


if __name__ == "__main__":
    main()
