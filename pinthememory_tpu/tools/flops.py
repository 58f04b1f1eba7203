"""FLOPs / memory probe for any registered architecture.

Reference: the commented-out ptflops GFLOPs block (eval.py:47-58, ptflops
pinned in environment.yml).  Here the numbers come from XLA's own cost
analysis of the compiled forward: ``python -m pinthememory_tpu.tools.flops
--arch DeepR50V3PlusD --hw 768``.
"""

from __future__ import annotations

import argparse
import functools
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax

from pinthememory_tpu.utils.compcache import enable as _enable_cache
_enable_cache()  # sitecustomize may import jax before the env var lands
import jax.numpy as jnp


def analyze(arch: str, hw: int, batch: int = 1, memory: bool = False,
            dtype: str = "float32") -> dict:
    from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.models.memory import init_memory

    mc = ModelConfig(arch=arch, memory=MemoryConfig(enabled=memory), dtype=dtype)
    model = build_model(mc)
    m_items = init_memory(jax.random.PRNGKey(1), 19, 256) if memory else None
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    g = jnp.zeros((batch, hw, hw), jnp.int32)
    init_fn = jax.jit(functools.partial(
        model.init, train=False, with_aux=True, memory_writing=memory))
    variables = init_fn({"params": jax.random.PRNGKey(0)}, x, g, m_items,
                        rng=jax.random.PRNGKey(2))

    fwd = jax.jit(lambda v, xx: model.apply(v, xx, None, m_items, train=False,
                                            with_aux=False)["main_out"])
    lowered = fwd.lower(variables, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    return {
        "arch": arch,
        "input": f"{batch}x{hw}x{hw}x3",
        "params_M": round(params / 1e6, 2),
        "gflops": round(float(cost.get("flops", 0)) / 1e9, 1),
        "hbm_bytes_accessed_GB": round(
            float(cost.get("bytes accessed", 0)) / 1e9, 2),
        "peak_memory_GB": round(
            getattr(mem, "temp_size_in_bytes", 0) / 1e9, 2) if mem else None,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="DeepR50V3PlusD")
    ap.add_argument("--hw", type=int, default=768)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--memory", action="store_true")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args(argv)
    import json

    print(json.dumps(analyze(args.arch, args.hw, args.batch, args.memory,
                             args.dtype), indent=1))


if __name__ == "__main__":
    main()
