"""Persistent AOT-compiled executable cache (VERDICT r4 #3: warm-start).

The persistent *compilation* cache (`utils/compcache.py`) removes XLA
recompiles, but a warm process still pays Python tracing + lowering +
cache-deserialization for every big tile program -- measured 75-140 s of
the eval bench's warm start on this host (BASELINE.md 5d).  This module
pickles the COMPILED executables themselves
(``jax.experimental.serialize_executable``): a warm process skips tracing,
lowering and compilation entirely (measured: deserialize ~10 ms per
program vs ~60 s compile through the axon tunnel).

Cache key = (package-source digest, jax version, device kind & count,
user key, arg shapes/dtypes, weights digest).  Two safety properties:

- **code changes invalidate**: the package digest hashes every .py file's
  (path, size, mtime) in ``pinthememory_tpu``, plus the jax version and
  device kind -- any edit falls back to trace+compile+reserialize;
- **weights are part of the key**: jitted eval programs close over the
  model variables, which XLA embeds as executable constants.  The weights
  digest (device-side position-weighted bit-sums, no host download)
  guarantees a different checkpoint can never silently reuse a stale
  executable.

The reference has nothing to cache -- eager PyTorch starts instantly
(eval.py:705-782); this closes the one axis where the rebuild was behind.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

import numpy as np

_PKG_DIGEST = None


def package_digest() -> str:
    """Digest of the package source + jax version + device topology.

    Hashes file CONTENT (not mtime): a git checkout / fresh clone touches
    every mtime without changing a byte, and must not cold-start the cache.
    ``data/`` is excluded -- it is host-side IO (loaders, transforms,
    samplers) whose values enter programs as *arguments*, never as traced
    constants.  ``tools/`` stays IN the digest: ``convert_torch`` maps
    checkpoint files to parameter values, and closure-mode executables
    embed those values while their key only covers the .pth file bytes
    (``snapshot_digest``) -- a converter change must invalidate.
    """
    global _PKG_DIGEST
    if _PKG_DIGEST is None:
        import glob

        import jax

        import pinthememory_tpu

        root = os.path.dirname(os.path.abspath(pinthememory_tpu.__file__))
        skip = os.path.join(root, "data") + os.sep
        h = hashlib.sha1()
        for p in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                  recursive=True)):
            if p.startswith(skip):
                continue
            h.update(os.path.relpath(p, root).encode())
            with open(p, "rb") as f:
                h.update(f.read())
        h.update(jax.__version__.encode())
        devs = jax.devices()
        h.update(f"{devs[0].device_kind}x{len(devs)}".encode())
        _PKG_DIGEST = h.hexdigest()[:16]
    return _PKG_DIGEST


def snapshot_digest(path: str | None, extra: str = "") -> str:
    """Weights digest from the weights' ORIGIN: the checkpoint file bytes
    (local disk, ~0.3 s for 160 MB) or, with no snapshot, the init
    recipe tag in ``extra`` (init = f(seed, code); code is already in the
    package digest).  Preferred over :func:`weights_digest`: pulling the
    loaded parameters back OFF the device for hashing was measured at
    7-141 s through the axon tunnel (bandwidth weather), while the file
    the weights came from never left the host."""
    h = hashlib.sha1()
    h.update(extra.encode())
    if path:
        st = os.stat(path)
        h.update(str((os.path.abspath(path), st.st_size, st.st_mtime_ns))
                 .encode())
        with open(path, "rb") as f:
            while chunk := f.read(1 << 22):
                h.update(chunk)
    return h.hexdigest()[:16]


def weights_digest(*trees) -> str:
    """Exact digest of pytree leaves: one batched ``device_get``, then
    sha1 over the raw bytes on the host.  Prefer :func:`snapshot_digest`
    when the weights' source file/seed is known -- this fallback downloads
    the full parameter set (fast on PCIe, tunnel-variable here)."""
    import jax

    leaves = []
    for t in trees:
        leaves += [l for l in jax.tree_util.tree_leaves(t)
                   if hasattr(l, "dtype")]
    host = jax.device_get(leaves)
    h = hashlib.sha1()
    for leaf in host:
        arr = np.ascontiguousarray(leaf)
        h.update(str((arr.shape, str(arr.dtype))).encode())
        h.update(arr.view(np.uint8).reshape(-1).tobytes())
    return h.hexdigest()[:16]


class AotCache:
    """load-or-compile wrapper around jitted functions."""

    def __init__(self, base_key: str, cache_dir: str | None = None):
        self.base_key = base_key
        self.cache_dir = cache_dir or os.environ.get(
            "PINMEM_AOT_CACHE",
            os.path.expanduser("~/.cache/pinmem_aot"))
        os.makedirs(self.cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _path(self, key: str, sig) -> str:
        h = hashlib.sha1()
        h.update(package_digest().encode())
        h.update(self.base_key.encode())
        h.update(key.encode())
        h.update(repr(sig).encode())
        return os.path.join(self.cache_dir, h.hexdigest()[:24] + ".xbin")

    def wrap(self, jitted_fn, key: str, static_argnums: tuple = ()):
        """Return a callable with the same positional signature.

        On first call per argument signature: load the serialized
        executable if present, else lower+compile+serialize.  Subsequent
        calls dispatch straight into the compiled executable.
        ``static_argnums`` marks positions the jitted function treats as
        static -- they join the cache key by value, and are dropped when
        invoking the compiled executable (jax.stages.Compiled takes only
        the dynamic arguments).
        """
        from jax.experimental import serialize_executable as se

        compiled_by_sig: dict = {}
        static_set = frozenset(static_argnums)

        def call(*args):
            # args may be pytrees (e.g. a ctx of model variables); the
            # signature covers every leaf's shape/dtype AND sharding -- a
            # mesh-sharded batch must never reuse an executable compiled
            # for single-device placement
            import jax

            dyn = tuple(a for i, a in enumerate(args) if i not in static_set)
            statics = tuple(args[i] for i in sorted(static_set))
            leaves, treedef = jax.tree_util.tree_flatten(dyn)
            sig = (repr(statics), str(treedef)) + tuple(
                (tuple(a.shape), str(a.dtype), str(getattr(a, "sharding", "")))
                if hasattr(a, "shape") else ("pyleaf", repr(a))
                for a in leaves)
            c = compiled_by_sig.get(sig)
            if c is None:
                path = self._path(key, sig)
                if os.path.exists(path):
                    try:
                        with open(path, "rb") as f:
                            ser, in_tree, out_tree, dev_ids = pickle.loads(
                                f.read())
                        # deserialize_and_load defaults to ALL backend
                        # devices; restore the exact device assignment the
                        # executable was compiled for (a single-device
                        # program must not be loaded as an 8-shard one)
                        by_id = {d.id: d for d in jax.devices()}
                        c = se.deserialize_and_load(
                            ser, in_tree, out_tree,
                            execution_devices=[by_id[i] for i in dev_ids])
                        self.hits += 1
                    except Exception:
                        c = None  # topology/version mismatch: rebuild
                if c is None:
                    c = jitted_fn.lower(*args).compile()
                    self.misses += 1
                    in_shardings = c.input_shardings[0]
                    da = (getattr(in_shardings[0], "_device_assignment", None)
                          if in_shardings else None) or [jax.devices()[0]]
                    payload = pickle.dumps(
                        se.serialize(c) + (tuple(d.id for d in da),))
                    fd, tmp = tempfile.mkstemp(dir=self.cache_dir)
                    with os.fdopen(fd, "wb") as f:
                        f.write(payload)
                    os.replace(tmp, path)
                    self._evict()
                compiled_by_sig[sig] = c
            return c(*dyn)

        return call

    def _evict(self):
        """LRU size cap: closure-mode executables embed the weights
        (~0.4 GB each), so the cache is bounded (PINMEM_AOT_CACHE_GB,
        default 10) by deleting least-recently-used entries."""
        cap = float(os.environ.get("PINMEM_AOT_CACHE_GB", "10")) * 1e9
        entries = []
        total = 0
        for name in os.listdir(self.cache_dir):
            p = os.path.join(self.cache_dir, name)
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append((st.st_atime, st.st_size, p))
            total += st.st_size
        entries.sort()
        for _atime, size, p in entries:
            if total <= cap:
                break
            try:
                os.remove(p)
                total -= size
            except OSError:
                pass
