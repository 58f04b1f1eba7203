"""Measure the bf16 benchmark config's fidelity against f32.

The headline eval number (BASELINE.md row 5) runs the model convs in bf16;
PARITY.md #9 claimed "~0.1 mIoU-level noise" for that choice without a
measurement.  This tool puts numbers under the claim: the SAME parameters
are run through the FULL sliding protocol (multi-scale + flip, merge,
resize) once with f32 convs and once with bf16 convs, and we report

  - argmax flip rate: fraction of pixels whose predicted class changes
  - logit delta stats (max / mean abs / p99) at original resolution
  - flip margin: among flipped pixels, the f32 logit gap between the two
    classes (flips only happen where f32 itself is nearly tied)

over a set of synthetic images.  Protocol merge/resize matmuls stay
f32-HIGHEST in BOTH runs (ops/resize.py) -- only the model compute dtype
differs, exactly like ``--model_dtype``.

Random-init nets have far smaller logit margins than trained ones (the
final conv is a random projection), so the random-init flip rate is a
PESSIMISTIC bound; pass ``--snapshot`` to measure a trained checkpoint.

Usage (single TPU chip, ~protocol shape):
  python -m pinthememory_tpu.tools.bf16_fidelity --height 1024 --width 2048 \
      --images 4 [--arch DeepR50V3PlusD --memory] [--snapshot ckpt.msgpack]
"""

from __future__ import annotations

import argparse
import functools
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax

from pinthememory_tpu.utils.compcache import enable as _enable_cache
_enable_cache()  # sitecustomize may import jax before the env var lands
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.core.config import Config, MemoryConfig, ModelConfig
from pinthememory_tpu.evalx.sliding import SlidingEvaluator
from pinthememory_tpu.models import build_model
from pinthememory_tpu.models.memory import init_memory


def build(args, dtype: str):
    mc = ModelConfig(
        arch=args.arch,
        memory=MemoryConfig(enabled=args.memory),
        dtype=dtype,
    )
    model = build_model(mc)
    m_items = init_memory(jax.random.PRNGKey(1), 19, 256) if args.memory else None
    hw = (args.crop_size, args.crop_size)
    init_fn = jax.jit(functools.partial(
        model.init, train=False, with_aux=True, memory_writing=args.memory))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, *hw, 3), jnp.float32),
        jnp.zeros((1, *hw), jnp.int32), m_items, rng=jax.random.PRNGKey(2))
    if args.snapshot:
        from pinthememory_tpu.train.state import create_train_state
        from pinthememory_tpu.utils.checkpoint import load_state

        state, _ = create_train_state(Config(model=mc), variables, m_items)
        state, _meta = load_state(args.snapshot, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        m_items = state.m_items

    def apply_fn(tiles):
        out = model.apply(variables, tiles, None, m_items, train=False,
                          with_aux=False)
        return out["main_out"]

    return SlidingEvaluator(
        apply_fn, scales=tuple(args.scales), flip=not args.no_flip,
        crop_size=args.crop_size, overlap=1.0 / 3.0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="DeepR50V3PlusD")
    p.add_argument("--memory", action="store_true", default=True)
    p.add_argument("--no_memory", dest="memory", action="store_false")
    p.add_argument("--snapshot", default=None)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--crop_size", type=int, default=768)
    p.add_argument("--scales", type=float, nargs="*", default=[0.5, 1.0, 2.0])
    p.add_argument("--no_flip", action="store_true")
    p.add_argument("--images", type=int, default=4)
    p.add_argument("--shapes", action="store_true",
                   help="use ShapesLoader scenes (in-distribution for a "
                        "shapes-trained --snapshot) instead of gradient "
                        "scenes")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    ev32 = build(args, "float32")
    ev16 = build(args, "bfloat16")

    rng = np.random.default_rng(args.seed)
    flips, n_pix = 0, 0
    max_d, sum_d, cnt_d, p99s, margins = 0.0, 0.0, 0, [], []
    shapes_ds = None
    if args.shapes:
        from pinthememory_tpu.data.datasets import ShapesLoader

        shapes_ds = ShapesLoader(crop_size=max(args.height, args.width),
                                 length=args.images, seed=args.seed,
                                 eval_mode="sliding")
    for i in range(args.images):
        h, w = args.height, args.width
        if shapes_ds is not None:
            img = shapes_ds[i][0][:h, :w]
        else:
            # structured synthetic scene: smooth color gradients + blocks,
            # more image-like than white noise (activations reach deep
            # layers intact)
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                128 + 100 * np.sin(xx / (20 + 10 * i) + i),
                128 + 100 * np.cos(yy / (30 + 5 * i)),
                rng.integers(0, 255, (h // 32 + 1, w // 32 + 1)).repeat(32, 0).repeat(32, 1)[:h, :w],
            ], axis=-1).clip(0, 255).astype(np.uint8)

        l32 = np.asarray(ev32.predict_logits(img), np.float32)
        l16 = np.asarray(ev16.predict_logits(img), np.float32)
        a32, a16 = l32.argmax(-1), l16.argmax(-1)
        flip_mask = a32 != a16
        flips += int(flip_mask.sum())
        n_pix += a32.size
        d = np.abs(l32 - l16)
        max_d = max(max_d, float(d.max()))
        sum_d += float(d.sum())
        cnt_d += d.size
        p99s.append(float(np.percentile(d, 99)))
        if flip_mask.any():
            s = np.sort(l32[flip_mask], axis=-1)
            margins.append(s[:, -1] - s[:, -2])
        print(f"# image {i}: flip_rate={flip_mask.mean():.2e} "
              f"max|dlogit|={float(d.max()):.4f}")

    margins = np.concatenate(margins) if margins else np.zeros(1)
    out = {
        "arch": args.arch,
        "snapshot": args.snapshot or "random-init (pessimistic margins)",
        "images": args.images,
        "shape": [args.height, args.width],
        "scales": args.scales,
        "flip": not args.no_flip,
        "argmax_flip_rate": flips / n_pix,
        "logit_delta_max": max_d,
        "logit_delta_mean": sum_d / cnt_d,
        "logit_delta_p99": float(np.mean(p99s)),
        "flip_margin_p50_f32": float(np.median(margins)),
        "flip_margin_p99_f32": float(np.percentile(margins, 99)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
