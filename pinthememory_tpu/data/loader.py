"""Loader assembly: domain-uniform batching, host sharding, prefetching.

Reference: datasets/__init__.py:310-668 (setup_loaders),
datasets/multi_loader.py (DomainUniformConcatDataset), datasets/sampler.py
(DistributedSampler fork).  The rebuild replaces torch DataLoader with a
thread-pool prefetch iterator producing contiguous numpy batches, and
replaces rank-sharding with ``jax.process_index()`` sharding (data
parallelism *within* a process is handled by GSPMD, so the sampler only
shards across hosts).
"""

from __future__ import annotations

import os
import sys
import threading
from typing import Iterator, Sequence

import numpy as np

from pinthememory_tpu.core.config import Config
from pinthememory_tpu.data import joint_transforms as jt
from pinthememory_tpu.data import transforms as xt
from pinthememory_tpu.data.datasets import DATASETS, NullLoader, ShapesLoader


class DomainUniformConcatDataset:
    """One sample from *every* domain per index (multi_loader.py:14-103).

    ``__getitem__`` returns stacked arrays with a leading domain axis; epoch
    length is fixed at 2975 like the reference (multi_loader.py:55).
    """

    EPOCH_LEN = 2975

    def __init__(self, datasets: Sequence, seed: int = 0):
        self.datasets = list(datasets)
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        for d in self.datasets:
            d.set_epoch(epoch)

    def __len__(self):
        return self.EPOCH_LEN

    def __getitem__(self, idx: int):
        rng = np.random.default_rng((self.seed, self.epoch, idx))
        imgs, masks, names, auxs = [], [], [], []
        for d in self.datasets:
            j = int(rng.integers(0, len(d)))
            img, mask, name, aux = d[j]
            imgs.append(img)
            masks.append(mask)
            names.append(name)
            auxs.append(aux)
        return (
            np.stack(imgs),     # (D, H, W, C)
            np.stack(masks),    # (D, H, W)
            names,
            np.stack(auxs),
        )


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def set_epoch(self, epoch: int):
        for d in self.datasets:
            d.set_epoch(epoch)

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        k = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[k][idx - int(self._offsets[k])]


class ShardedSampler:
    """Epoch-seeded shuffled index sampler sharded over hosts
    (datasets/sampler.py:43-110, pad mode).

    ``consecutive=True`` models the fork's ``consecutive_sample`` branch
    (datasets/sampler.py:93-96): each shard takes a contiguous block of the
    padded order instead of the default round-robin stride
    (sampler.py:97-98).  Every reference call site passes False
    (datasets/__init__.py:228,640,649), so this is dead code there; it is
    modeled here for surface completeness.
    """

    def __init__(self, dataset, shuffle=True, seed=0, num_shards=1, shard_id=0,
                 consecutive=False):
        self.dataset = dataset
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.consecutive = consecutive
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        # pad to a multiple of num_shards (sampler.py pad behavior)
        pad = (-len(order)) % self.num_shards
        if pad:
            order = np.concatenate([order, order[:pad]])
        if self.consecutive:
            per = len(order) // self.num_shards
            lo = per * self.shard_id
            return iter(order[lo : lo + per].tolist())
        return iter(order[self.shard_id :: self.num_shards].tolist())

    def __len__(self):
        n = len(self.dataset)
        return (n + self.num_shards - 1) // self.num_shards


class DataLoader:
    """Map-style loader with ordered prefetch; thread or process workers.

    The reference runs 8 torch DataLoader worker *processes*
    (datasets/__init__.py:328).  ``worker_processes=False`` uses
    ``num_workers`` threads (PIL decode releases the GIL, but the
    photometric chain's Python glue does not -- measured ~1.1x at 8
    threads); ``worker_processes=True`` uses a spawn-based process pool
    like the reference (the data path imports no jax, so spawned children
    are light).  Batch content is index-seeded either way, so worker
    count/kind never changes the data stream.  The pool is created per
    epoch so children always see the parent's current epoch state
    (imgs_uniform rebuilds, meta-aug arming).
    """

    def __init__(self, dataset, batch_size: int, sampler=None, num_workers: int = 2,
                 drop_last: bool = True, prefetch: int = 4,
                 worker_processes: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(dataset, shuffle=False)
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.worker_processes = worker_processes
        # one-shot batch skip for mid-epoch resume (train/cli.py): the next
        # __iter__ drops this many leading batches WITHOUT loading them
        self.skip_next = 0

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> list[list[int]]:
        indices = list(self.sampler)
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.skip_next:
            batches = batches[self.skip_next:]
            self.skip_next = 0
        return batches

    def __iter__(self) -> Iterator:
        batches = self._batches()
        if self.num_workers <= 1:
            for b in batches:
                yield _collate([self.dataset[i] for i in b])
            return
        if self.worker_processes:
            yield from self._iter_processes(batches)
        else:
            yield from self._iter_parallel(batches)

    def _iter_processes(self, batches: list[list[int]]) -> Iterator:
        """Explicit worker-subprocess loading (pinthememory_tpu.data.worker).

        The dataset is pickled ONCE to each worker's stdin; tasks carry only
        batch indices, assigned round-robin with a per-worker depth of 2 so
        every worker always has a batch in flight.  One reader thread per
        worker collects frames; the consumer receives batches strictly in
        sampler order, and a failed batch raises exactly at its index
        (order-faithful fail-fast like the thread path)."""
        import pickle
        import subprocess

        from pinthememory_tpu.data.worker import write_frame, read_frame

        n_workers = min(self.num_workers, len(batches))
        ds_bytes = pickle.dumps(self.dataset, protocol=pickle.HIGHEST_PROTOCOL)
        # unpickling the dataset must resolve the same modules the parent
        # sees (e.g. dataset classes defined outside the package)
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            [p for p in sys.path if p] + [env.get("PYTHONPATH", "")])
        procs = []
        for _ in range(n_workers):
            p = subprocess.Popen(
                [sys.executable, "-m", "pinthememory_tpu.data.worker"],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE, env=env)
            p.stdin.write(len(ds_bytes).to_bytes(8, "little"))
            p.stdin.write(ds_bytes)
            p.stdin.flush()
            procs.append(p)

        cond = threading.Condition()
        results: dict = {}
        errors: dict = {}
        dead: list = []

        def reader(p):
            while True:
                msg = read_frame(p.stdout)
                with cond:
                    if msg is None:
                        dead.append(p)
                        cond.notify_all()
                        return
                    tid, status, payload = msg
                    (results if status == "ok" else errors)[tid] = payload
                    cond.notify_all()

        threads = [threading.Thread(target=reader, args=(p,), daemon=True)
                   for p in procs]
        for t in threads:
            t.start()

        def submit(i):
            w = procs[i % n_workers]
            if w.poll() is None:
                write_frame(w.stdin, (i, batches[i]))

        try:
            depth = 2  # batches in flight per worker
            for i in range(min(n_workers * depth, len(batches))):
                submit(i)
            for i in range(len(batches)):
                with cond:
                    while (i not in results and i not in errors
                           and len(dead) < n_workers):
                        cond.wait(timeout=0.5)
                    if i in errors:
                        raise RuntimeError(
                            f"loader worker failed on batch {i}: {errors[i]}")
                    if i not in results:
                        raise RuntimeError("all loader workers exited "
                                           "unexpectedly")
                    item = results.pop(i)
                nxt = i + n_workers * depth
                if nxt < len(batches):
                    submit(nxt)
                yield item
        finally:
            for p in procs:
                try:
                    p.stdin.close()
                except Exception:
                    pass
            for p in procs:
                try:
                    p.wait(timeout=5)
                except Exception:
                    p.kill()

    def _iter_parallel(self, batches: list[list[int]]) -> Iterator:
        cond = threading.Condition()
        results: dict = {}          # batch index -> collated batch
        errors: dict = {}           # batch index -> exception
        stop = threading.Event()
        next_to_load = [0]
        # bounds (in-flight + done-but-unconsumed) batches
        budget = threading.Semaphore(max(self.prefetch, self.num_workers))
        n_workers = min(self.num_workers, len(batches))
        alive = [n_workers]

        def worker():
            try:
                while not stop.is_set():
                    budget.acquire()
                    if stop.is_set():
                        return
                    with cond:
                        i = next_to_load[0]
                        if i >= len(batches):
                            return
                        next_to_load[0] += 1
                    try:
                        item = _collate([self.dataset[j] for j in batches[i]])
                    except BaseException as e:  # surface worker failures
                        with cond:
                            errors[i] = e
                            cond.notify_all()
                        return
                    with cond:
                        results[i] = item
                        cond.notify_all()
            finally:
                with cond:
                    alive[0] -= 1
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(n_workers)
        ]
        for t in threads:
            t.start()
        try:
            for i in range(len(batches)):
                # order-faithful fail-fast: every batch that PRECEDES a
                # failure in sampler order still flows out (other workers
                # keep loading them); the error surfaces exactly at the
                # batch index that failed
                with cond:
                    while (i not in results and i not in errors
                           and alive[0] > 0):
                        cond.wait(timeout=0.5)
                    if i in results:
                        item = results.pop(i)
                    elif i in errors:
                        raise errors[i]
                    else:  # all workers exited before claiming batch i
                        raise (errors[min(errors)] if errors else
                               RuntimeError("loader workers exited "
                                            "unexpectedly"))
                budget.release()
                yield item
        finally:
            stop.set()
            for _ in threads:  # unblock any worker parked on the budget
                budget.release()


def _collate(samples):
    imgs = np.stack([s[0] for s in samples])
    masks = np.stack([s[1] for s in samples])
    names = [s[2] for s in samples]
    if len(samples[0]) > 3:
        auxs = np.stack([s[3] for s in samples])
        return {"image": imgs, "gts": masks, "names": names, "aux_gts": auxs}
    return {"image": imgs, "gts": masks, "names": names}


def arm_meta_augmentation(train_dataset, mldg: bool, meta_aug_episode: bool):
    """Enable the MLDG meta-test hard augmentation on the train datasets.

    Reference semantics (the default): ``meta_transform(justidx=False)``
    (train.py:199-211) runs before the first MLDG batch and sets
    ``datasets[0].running_metatest = True`` -- only domain 0, permanently,
    regardless of which domains land in the meta-test split
    (``if i in meteidx: ...datasets[0].running_metatest = True``).  Domain 0
    therefore trains entirely under ColorJitter(.8,.8,.8,.3)+GaussianBlur
    (cityscapes.py:290-295) while the other domains keep the normal
    photometric transform.  Memory prototype initialization happens *before*
    the first meta_transform call (train.py:121), so callers must arm this
    only after memory init.

    ``meta_aug_episode`` is the opt-in "intended" variant: every domain emits
    a (normal, hard) photometric pair and the trainer hard-augments exactly
    the episode's meta-test domains (see select_meta_images in train/loops).
    """
    datasets = getattr(train_dataset, "datasets", None)
    if not mldg or not datasets or len(datasets) < 2:
        return
    if meta_aug_episode:
        for ds in datasets:
            if getattr(ds, "meta_transform", None) is not None:
                ds.emit_meta_pair = True
    elif getattr(datasets[0], "meta_transform", None) is not None:
        datasets[0].running_metatest = True


def _expand_root(cfg: Config) -> str:
    return os.path.expanduser(cfg.data.dataset_root)


def build_dataset(name: str, cfg: Config, mode: str, **kw):
    if name not in DATASETS:
        raise ValueError(f"unknown dataset {name!r}; options: {sorted(DATASETS)}")
    cls, subdir = DATASETS[name]
    if cls is NullLoader:
        return NullLoader(crop_size=cfg.train.crop_size, seed=cfg.train.seed, **kw)
    if cls is ShapesLoader:
        return ShapesLoader(crop_size=cfg.train.crop_size, seed=cfg.train.seed,
                            mode=mode, **kw)
    root = os.path.join(_expand_root(cfg), subdir)
    return cls(root, mode=mode, seed=cfg.train.seed, **kw)


def setup_loaders(cfg: Config, batch_scale: int = 1):
    """Reference-shaped entry (datasets/__init__.py:310-668).

    ``batch_scale`` multiplies the train batch by the data-parallel degree:
    the reference's bs_mult is per GPU (datasets/__init__.py:323-326), so the
    GSPMD global batch is bs_mult x data devices.

    Returns (train_loader, val_loaders: dict, extra_val_loaders: dict).
    """
    d = cfg.data
    joint = jt.build_train_joint_transform(
        cfg.train.crop_size, crop_nopad=d.crop_nopad, pre_size=d.pre_size,
        scale_min=d.scale_min, scale_max=d.scale_max, rrotate=d.rrotate,
    )
    photo = xt.build_train_input_transform(d.color_aug, d.gblur, d.bblur)
    meta = xt.build_meta_transform()

    train_sets = []
    for name in d.dataset:
        mode = d.city_mode if name == "cityscapes" else "train"
        kw = {}
        if name == "cityscapes" and d.max_skip > 0:
            kw = {"max_skip": d.max_skip,
                  "aug_root": os.path.expanduser(d.cityscapes_aug_dir)}
        ds = build_dataset(name, cfg, mode, **kw)
        if not isinstance(ds, NullLoader):
            ds.joint_transform = joint
            ds.input_transform = photo
            ds.meta_transform = meta
            ds.image_in = d.image_in
            ds.jointwtborder = cfg.train.jointwtborder
            ds.strict_bdr_cls = tuple(cfg.train.strict_bdr_cls)
            ds.border_window = cfg.train.border_window
        train_sets.append(ds)

    num_shards = 1
    shard_id = 0
    try:
        import jax

        num_shards = jax.process_count()
        shard_id = jax.process_index()
    except Exception:
        pass

    if d.image_uniform_sampling and len(train_sets) > 1:
        # plain concatenation -- every image equally likely, no leading
        # domain axis, epoch = sum of dataset sizes
        # (--image_uniform_sampling, datasets/__init__.py:632-635)
        train_set = ConcatDataset(train_sets)
    elif len(train_sets) > 1:
        train_set = DomainUniformConcatDataset(train_sets, seed=cfg.train.seed)
    else:
        train_set = train_sets[0]

    train_loader = DataLoader(
        train_set,
        batch_size=cfg.train.bs_mult * batch_scale,
        sampler=ShardedSampler(train_set, shuffle=True, seed=cfg.train.seed,
                               num_shards=num_shards, shard_id=shard_id),
        num_workers=d.num_workers,
        drop_last=True,
        worker_processes=d.worker_processes,
    )

    val_loaders = {}
    for name in d.val_dataset:
        ds = build_dataset(name, cfg, "val", **(
            {"eval_mode": cfg.eval.inference_mode} if name != "null_loader" else {}))
        val_loaders[name] = DataLoader(
            ds, batch_size=1,
            sampler=ShardedSampler(ds, shuffle=False, num_shards=num_shards,
                                   shard_id=shard_id),
            num_workers=1, drop_last=False,
        )

    return train_loader, val_loaders
