"""Measure the STRUCTURAL eval-pipeline ratio: reference eval.py (torch CPU)
vs the rebuild's evalx (jax CPU), same model weights, same protocol, same
machine (VERDICT r2: put at least one measurement under the bench.py
baseline estimate).

Both pipelines run the DeepR50V3PlusD forward on the same backend-agnostic
CPU, so the model FLOPs cancel; what remains is the pipeline structure the
A100 estimate assumes -- the reference's per-crop Python loop + CPU
numpy merge with 19 resize threads per image (eval.py:384-390, 232-243)
vs the rebuild's jitted batched tile programs.

Requires /root/reference (imports via tests/ref_harness.py).  Prints one
JSON line with both times and the ratio.

Usage: JAX_PLATFORMS=cpu python -m pinthememory_tpu.tools.ref_cpu_ratio
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--scales", default="0.5,1.0,2.0")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo, "tests"))

    import numpy as np
    import torch
    from PIL import Image

    from ref_harness import build_reference_deepr50, import_reference_eval, reference_env
    from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
    from pinthememory_tpu.evalx.sliding import SlidingEvaluator
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.tools.convert_torch import (
        convert_state_dict, merge_into_variables)

    import jax
    import jax.numpy as jnp

    scales = [float(s) for s in args.scales.split(",")]
    ref_eval = import_reference_eval(["--snapshot", "unused"])
    ref_eval.args.sliding_overlap = 1.0 / 3.0
    ref_eval.args.no_flip = False
    ref_eval.args.faster = False  # the reference default: per-crop loop
    ref_eval.args.crop_size = args.crop
    ref_eval.args.dataset_cls = types.SimpleNamespace(num_classes=19)

    net = build_reference_deepr50(memory=True)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, m_items, _ = convert_state_dict(
        sd, memory=net.memory.m_items.numpy())

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (args.height, args.width, 3), dtype=np.uint8)

    # --- reference pipeline (torch CPU) ---
    with reference_env(), torch.no_grad():
        ref_eval.inference_sliding(net, Image.fromarray(img), scales)  # warm
        t_ref = min(
            _timed(lambda: ref_eval.inference_sliding(
                net, Image.fromarray(img), scales))
            for _ in range(args.repeats))

    # --- rebuild pipeline (jax CPU) ---
    model = build_model(ModelConfig(
        arch="DeepR50V3PlusD", memory=MemoryConfig(enabled=True)))
    hw = args.crop
    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, hw, hw, 3)), jnp.zeros((1, hw, hw), jnp.int32),
        jnp.asarray(m_items), train=False, with_aux=True, memory_writing=True,
        rng=jax.random.PRNGKey(1)))(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)
    mem = jnp.asarray(m_items)

    def apply_fn(tiles):
        return model.apply(variables, tiles, None, mem,
                           train=False, with_aux=False)["main_out"]

    ev = SlidingEvaluator(apply_fn, crop_size=args.crop, overlap=1.0 / 3.0,
                          scales=tuple(scales), flip=True)
    np.asarray(ev.predict_device(img))  # warm (compiles)
    t_jax = min(_timed(lambda: np.asarray(ev.predict_device(img)))
                for _ in range(args.repeats))

    print(json.dumps({
        "metric": f"cpu_structural_ratio_{args.width}x{args.height}"
                  f"_crop{args.crop}",
        "reference_s": round(t_ref, 3),
        "rebuild_s": round(t_jax, 3),
        "ratio": round(t_ref / t_jax, 2),
        "unit": "x (reference time / rebuild time, same CPU)",
    }))


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
