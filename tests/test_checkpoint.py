"""Checkpoint save/load roundtrip + manager policy."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.train.state import TrainState
from pinthememory_tpu.utils.checkpoint import (
    CheckpointManager,
    load_state,
    save_state,
)


def _tiny_state(seed=0):
    rng = np.random.default_rng(seed)
    params = {"a": {"kernel": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)}}
    stats = {"a": {"mean": jnp.zeros((4,)), "var": jnp.ones((4,))}}
    return TrainState(
        params=params,
        batch_stats=stats,
        m_items=jnp.asarray(rng.standard_normal((19, 8)), jnp.float32),
        opt_state=(jnp.zeros(()),),
        step=jnp.asarray(7, jnp.int32),
    )


def test_roundtrip(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "ckpt.msgpack")
    save_state(path, state, {"epoch": 3, "mean_iu": 0.5})
    template = _tiny_state(seed=1)
    loaded, meta = load_state(path, template)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(loaded.params["a"]["kernel"]),
                                  np.asarray(state.params["a"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(loaded.m_items), np.asarray(state.m_items))
    assert int(loaded.step) == 7


def test_manager_last_and_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    s = _tiny_state()
    p1 = mgr.save_last(s, epoch=1, dataset="cityscapes", mean_iu=0.4)
    assert os.path.exists(p1)
    p2 = mgr.save_last(s, epoch=2, dataset="cityscapes", mean_iu=0.5)
    assert os.path.exists(p2) and not os.path.exists(p1)  # rolling last

    b1 = mgr.maybe_save_best(s, "cityscapes", 2, 0.5)
    assert b1 and os.path.exists(b1)
    assert mgr.maybe_save_best(s, "cityscapes", 3, 0.4) is None  # not better
    assert mgr.maybe_save_best(s, "cityscapes", 4, 0.6) is not None
    assert mgr.maybe_save_best(s, "bdd100k", 4, 0.1) is not None  # per-dataset


def test_manager_save_last_twice_same_epoch_keeps_file(tmp_path):
    """Trainer.run calls save_last twice at end-of-training (break branch +
    final); the rotation must not delete the checkpoint it just wrote when
    the new path equals the previous one (regression: tests/test_isw_smoke
    found end-of-run checkpoints vanishing)."""
    mgr = CheckpointManager(str(tmp_path))
    s = _tiny_state()
    p1 = mgr.save_last(s, epoch=3)
    p2 = mgr.save_last(s, epoch=3)
    assert p1 == p2 and os.path.exists(p2)
