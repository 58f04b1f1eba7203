"""Preemption-safe training (VERDICT r4 #5): mid-epoch kill + resume.

The reference can only restart from an epoch-boundary snapshot
(utils/misc.py:175-247 saves at epoch end; train.py:111-118 recomputes
``i = epoch * len(loader)``).  The rebuild's ``--snapshot_interval N``
saves a resumable checkpoint every N steps whose meta carries the
intra-epoch position and the host rng states (jax key + numpy
bit-generator + inner_lr), and resume skips the already-consumed batches
WITHOUT loading them.

This test runs the flagship memory-MLDG configuration three ways on the
8-device CPU mesh:

  A. uninterrupted: 6 steps;
  B. "preempted": 4 steps with snapshot_interval=3 -- the step-3 mid-epoch
     checkpoint stays on disk, the run is abandoned (the state at kill
     time is irrelevant, exactly as with a real SIGKILL);
  C. resumed: restore B's step-3 checkpoint, continue to 6 steps.

C's final params / m_items / opt_state must equal A's to float
determinism -- the continued trajectory IS the unkilled one.
"""

from __future__ import annotations

import glob
import json

import numpy as np
import pytest

import jax


def _make_trainer(tmp_path, tag, extra):
    from pinthememory_tpu.data.datasets import ShapesLoader
    from pinthememory_tpu.train import cli as train_cli

    ShapesLoader.DEFAULT_LENGTH = 64
    args = train_cli.build_parser().parse_args([
        "--dataset", "shapes_loader", "shapes_loader",
        "--val_dataset", "shapes_loader",
        "--covstat_val_dataset", "shapes_loader",
        "--arch", "DeepR18V3PlusD", "--memory", "--mldg", "--test_mode",
        "--crop_size", "64", "--bs_mult", "1", "--bs_mult_val", "1",
        "--num_workers", "1",
        "--ckpt", str(tmp_path / f"ckpt_{tag}"),
        "--tb_path", str(tmp_path / f"tb_{tag}"),
        "--exp", tag,
    ] + extra)
    cfg = train_cli.config_from_args(args)
    return train_cli.Trainer(cfg)


def _drive(trainer, arm=True, init_memory=True):
    from pinthememory_tpu.data.loader import arm_meta_augmentation

    if init_memory:
        trainer.memory_initialize()
    if arm:
        arm_meta_augmentation(trainer.train_loader.dataset,
                              trainer.cfg.train.mldg,
                              trainer.cfg.train.meta_aug_episode)
    trainer.do_epoch()
    return trainer.state


def _leaf_diff(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return max(
        (float(np.abs(np.asarray(x, np.float32)
                      - np.asarray(y, np.float32)).max())
         for x, y in zip(la, lb) if hasattr(x, "dtype")),
        default=0.0)


@pytest.mark.slow
def test_mid_epoch_kill_and_resume_matches_unkilled(tmp_path):
    # A: uninterrupted, 6 steps
    tr_a = _make_trainer(tmp_path, "a", ["--max_iter", "6"])
    state_a = _drive(tr_a)
    assert int(state_a.step) == 6

    # B: preempted after 4 steps; the step-3 interval checkpoint survives
    tr_b = _make_trainer(tmp_path, "b", ["--max_iter", "4",
                                         "--snapshot_interval", "3"])
    _drive(tr_b)
    snaps = [s for s in glob.glob(
        str(tmp_path / "ckpt_b" / "**" / "last_*.msgpack"), recursive=True)]
    assert snaps, "no interval checkpoint written"
    meta = json.load(open(snaps[0] + ".json"))
    assert meta["iter_in_epoch"] == 3 and "host_rng" in meta

    # C: resume from the mid-epoch checkpoint, continue to 6 steps
    tr_c = _make_trainer(tmp_path, "c", [
        "--max_iter", "6", "--snapshot", snaps[0], "--restore_optimizer"])
    assert int(tr_c.state.step) == 3
    assert tr_c._resume_iter == 3
    state_c = _drive(tr_c, init_memory=False)  # run() skips memory init too
    assert int(state_c.step) == 6

    # the continued trajectory equals the unkilled run's
    assert _leaf_diff(state_a.params, state_c.params) < 1e-6
    assert _leaf_diff(state_a.m_items, state_c.m_items) < 1e-6
    assert _leaf_diff(state_a.batch_stats, state_c.batch_stats) < 1e-6
    assert _leaf_diff(state_a.opt_state, state_c.opt_state) < 1e-6
