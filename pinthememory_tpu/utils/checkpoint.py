"""Checkpointing: save/restore the full TrainState + config.

Reference payload (utils/misc.py:206-216): ``state_dict, optimizer,
scheduler, epoch, mean_iu`` plus the raw ``'memory'`` tensor; policy keeps a
rolling ``last_*`` and a best-per-dataset copy (utils/misc.py:175-247).
Here the whole :class:`TrainState` pytree (params, batch_stats, m_items,
opt_state, step) serializes via flax msgpack; the same last/best policy is
provided by :class:`CheckpointManager`.

``load_torch_snapshot`` restores a released reference ``.pth`` through the
converter (tools/convert_torch.py), mirroring ``restore_snapshot``
(optimizer.py:45-70).
"""

from __future__ import annotations

import json
import os
from typing import Any

import flax.serialization
import jax
import numpy as np


def save_state(path: str, state: Any, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    payload = flax.serialization.to_bytes(state)
    # atomic writes: a preemption mid-save must never leave a torn
    # checkpoint (the whole point of snapshot_interval saves)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    if meta is not None:
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, path + ".json")


def load_state(path: str, template: Any) -> tuple[Any, dict]:
    with open(path, "rb") as f:
        state = flax.serialization.from_bytes(template, f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


class CheckpointManager:
    """last + best-per-dataset policy (utils/misc.py:175-247).

    Multi-host: only process 0 writes (the reference's DDP rank gating);
    best decisions stay consistent because the mIoU they use comes from the
    globally-reduced confusion matrix (Trainer._global_hist).
    """

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = ckpt_dir
        self.best: dict[str, float] = {}
        self._last_path: str | None = None
        try:
            self._is_main = jax.process_index() == 0
        except Exception:
            self._is_main = True

    def save_last(self, state, epoch: int, dataset: str = "none",
                  mean_iu: float | None = None, extra_meta: dict | None = None):
        if not self._is_main:
            return None
        name = f"last_{dataset}_epoch_{epoch}"
        if mean_iu is not None:
            name += f"_mean-iu_{mean_iu:.5f}"
        path = os.path.join(self.ckpt_dir, name + ".msgpack")
        meta = {"epoch": epoch, "dataset": dataset, "mean_iu": mean_iu}
        if extra_meta:
            meta.update(extra_meta)
        save_state(path, state, meta)
        # rotate the previous 'last' (utils/misc.py:175-247 keeps one); when
        # the new checkpoint resolves to the SAME path (save_last called
        # twice at one epoch, e.g. end-of-training), removing would delete
        # the file just written
        if (self._last_path and self._last_path != path
                and os.path.exists(self._last_path)):
            os.remove(self._last_path)
            if os.path.exists(self._last_path + ".json"):
                os.remove(self._last_path + ".json")
        self._last_path = path
        return path

    def maybe_save_best(self, state, dataset: str, epoch: int, mean_iu: float):
        if mean_iu > self.best.get(dataset, -1.0):
            self.best[dataset] = mean_iu
            if not self._is_main:
                return None
            path = os.path.join(self.ckpt_dir, f"best_{dataset}.msgpack")
            save_state(path, state, {"epoch": epoch, "dataset": dataset, "mean_iu": mean_iu})
            return path
        return None


def load_torch_snapshot(path: str, variables: dict, three_stem: bool = False):
    """Restore a reference ``.pth`` into (variables, m_items)."""
    from pinthememory_tpu.tools.convert_torch import (
        load_reference_checkpoint,
        merge_into_variables,
    )

    params, stats, m_items, report = load_reference_checkpoint(path, three_stem)
    merged = merge_into_variables(variables, params, stats)
    return merged, (None if m_items is None else np.asarray(m_items)), report


def load_torch_optimizer_state(path: str, params, tx, three_stem: bool = False):
    """Restore the torch SGD momentum + LambdaLR step of a reference
    ``.pth`` into an optax opt_state (``--restore_optimizer`` semantics,
    optimizer.py:45-56 + train.py:111-118).

    Returns ``(opt_state, count, epoch, mean_iu)`` where ``count`` is the
    iteration counter driving both the LR schedule and the max_iter gate.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from pinthememory_tpu.tools.convert_torch import (
        _torch_load_safe,
        convert_optimizer_state,
        merge_into_variables,
    )

    ckpt = _torch_load_safe(path)
    momenta, count, epoch, mean_iu, _report = convert_optimizer_state(
        ckpt, three_stem=three_stem)
    zeros = jax.tree.map(jnp.zeros_like, params)
    trace = merge_into_variables({"params": zeros}, momenta, {})["params"]

    opt_state = tx.init(params)
    rebuilt = []
    for el in opt_state:
        if isinstance(el, optax.TraceState):
            el = optax.TraceState(trace=trace)
        elif isinstance(el, optax.ScaleByScheduleState):
            el = optax.ScaleByScheduleState(count=jnp.asarray(count, jnp.int32))
        rebuilt.append(el)
    return tuple(rebuilt), count, epoch, mean_iu
