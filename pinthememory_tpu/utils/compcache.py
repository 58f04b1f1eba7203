"""Persistent XLA compilation cache activation that actually works.

Every entry point sets ``JAX_COMPILATION_CACHE_DIR`` via
``os.environ.setdefault`` before ``import jax`` -- but environments whose
``sitecustomize`` imports jax at interpreter start (the axon TPU tunnel
does) bind jax's config defaults BEFORE any user module runs, so the env
var lands after the fact and ``jax.config.jax_compilation_cache_dir`` stays
``None``: the cache silently never engages in the main process (measured:
"cache is disabled/not initialized" + full 390 s recompiles on a warm
directory).  Spawned subprocesses (multichip dryrun, data workers) DID get
the cache because they inherit the env var before their interpreter starts
-- which is how the cache directory filled up while main processes kept
recompiling.

``enable()`` sets the live config too, making the env-var convention
effective regardless of import order.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser(
    os.environ.get("PINMEM_CACHE_DIR", "~/.cache/jax_comp"))


def enable(cache_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Idempotent; respects an explicitly-set ``JAX_COMPILATION_CACHE_DIR`` or
    an already-configured ``jax_compilation_cache_dir``.
    """
    import jax

    target = (cache_dir
              or os.environ.get("JAX_COMPILATION_CACHE_DIR")
              or DEFAULT_DIR)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", target)
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", target)
    return jax.config.jax_compilation_cache_dir
