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


if __name__ == "__main__":
    main()
