"""GSPMD data + spatial parallelism over a device mesh.

Replaces the reference's NCCL DDP stack (SURVEY.md §2.6): one process per
GPU, DDP gradient hooks, SyncBatchNorm, DistributedSampler, per-rank memory
drift.  Here a single jitted train step is partitioned by XLA over a
``jax.sharding.Mesh``:

- ``data`` axis: batch dimension.  Gradient all-reduce, BN statistics, loss
  logging, IoU histograms and the memory-write (nominator, denominator) sums
  all become global reductions *by construction* -- XLA inserts the ICI
  collectives, and ``m_items`` stays replica-identical (fixing the
  reference's silent divergence, network/memory.py:206-257).
- ``spatial`` axis (optional): the image H dimension, XLA spatial
  partitioning with automatic halo exchange for convs.  This is the spatial
  analogue of context parallelism for 2048x1024 eval (SURVEY.md §5).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
the same code runs unchanged with DCN across slices.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Sequence | None = None, spatial: int = 1, names=("data", "spatial")
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
    arr = np.array(devices).reshape(n // spatial, spatial)
    return Mesh(arr, names)


def batch_sharding(mesh: Mesh, batch: dict) -> dict:
    """Sharding specs for a train batch: B over data, H over spatial.

    Batch layouts: image (B, D, H, W, C) or (B, H, W, C); gts/aux one less
    trailing dim.
    """
    specs = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim"):
            specs[k] = None
            continue
        if v.ndim == 5:      # B, D, H, W, C
            specs[k] = P("data", None, "spatial", None, None)
        elif v.ndim == 4 and k == "image":  # B, H, W, C
            specs[k] = P("data", "spatial", None, None)
        elif v.ndim == 4:    # B, D, H, W labels
            specs[k] = P("data", None, "spatial", None)
        elif v.ndim == 3:    # B, H, W labels
            specs[k] = P("data", "spatial", None)
        else:
            specs[k] = P()
    return specs


def device_put_batch(mesh: Mesh, batch: dict) -> dict:
    specs = batch_sharding(mesh, batch)
    out = {}
    for k, v in batch.items():
        if specs.get(k) is None or not hasattr(v, "ndim"):
            out[k] = v
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, specs[k]))
    return out


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Replicate params/opt state across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)


def shard_train_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a jitted train step so batches are sharded over the mesh.

    The step function itself is unchanged -- GSPMD propagates the input
    shardings and inserts collectives.  State stays replicated.
    """

    def wrapped(state, batch, *args, **kwargs):
        batch = device_put_batch(mesh, {k: v for k, v in batch.items() if k != "names"})
        with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _nullcontext():
            return step_fn(state, batch, *args, **kwargs)

    return wrapped


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
