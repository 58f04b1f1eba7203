"""Training entry point: ``python -m pinthememory_tpu.train.cli --...``.

Mirrors the reference CLI (train.py:1083-1221) flag-for-flag where the flag
is meaningful in the rebuild; orchestration follows ``MemoryMetaFrameWork``
(train.py:43-197): seed, loaders, model, optimizer, memory prototype init,
epoch loop dispatching to one of the four episodes, periodic logging,
checkpointing.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax

from pinthememory_tpu.utils.compcache import enable as _enable_cache
_enable_cache()  # sitecustomize may import jax before the env var lands
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.core.config import (
    Config,
    DataConfig,
    EvalConfig,
    MemoryConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    WhiteningConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Pin-the-Memory TPU training")
    # model / memory / whitening block (reference parse_for_modelassign,
    # train.py:1045-1079)
    p.add_argument("--arch", type=str, default="DeepR50V3PlusD")
    p.add_argument("--wt_layer", nargs="*", type=int, default=[0] * 7)
    p.add_argument("--wt_reg_weight", type=float, default=0.0)
    p.add_argument("--relax_denom", type=float, default=0.0)
    p.add_argument("--clusters", type=int, default=50)
    p.add_argument("--cov_stat_epoch", type=int, default=0)
    p.add_argument("--trials", type=int, default=10,
                   help="ISW covstat rounds (train.py:172; scripts pass 10)")
    p.add_argument("--dynamic", action="store_true",
                   help="re-gather ISW covstat every cov_stat_epoch+1 epochs "
                        "(train.py:169-170)")
    p.add_argument("--memory", action="store_true")
    p.add_argument("--mem_slot", type=int, default=19)
    p.add_argument("--mem_dim", type=int, default=256)
    p.add_argument("--mem_momentum", type=float, default=0.8)
    p.add_argument("--mem_temp", type=float, default=1.0)
    p.add_argument("--gumbel_off", action="store_true")
    # data
    p.add_argument("--dataset", nargs="*", default=["gtav", "synthia"])
    p.add_argument("--val_dataset", nargs="*", default=["cityscapes", "bdd100k", "mapillary"])
    p.add_argument("--covstat_val_dataset", nargs="*", default=["gtav"])
    p.add_argument("--dataset_root", type=str, default="~/dg_seg_dataset")
    p.add_argument("--cv", type=int, default=0)
    p.add_argument("--class_uniform_pct", type=float, default=0.0)
    p.add_argument("--class_uniform_tile", type=int, default=1024)
    p.add_argument("--max_cu_epoch", type=int, default=10000,
                   help="class-uniform cut epoch (train.py:1136): from this "
                        "epoch on, build_epoch(cut=True) uses fine images/"
                        "centroids only")
    p.add_argument("--crop_size", type=int, default=768)
    p.add_argument("--pre_size", type=int, default=None)
    p.add_argument("--scale_min", type=float, default=0.5)
    p.add_argument("--scale_max", type=float, default=2.0)
    p.add_argument("--color_aug", type=float, default=0.0)
    p.add_argument("--gblur", action="store_true")
    p.add_argument("--bblur", action="store_true")
    p.add_argument("--rrotate", type=int, default=0)
    p.add_argument("--image_in", action="store_true")
    p.add_argument("--crop_nopad", action="store_true",
                   help="RandomCrop without border padding (train.py flag)")
    p.add_argument("--city_mode", type=str, default="train",
                   choices=["train", "trainval"],
                   help="cityscapes source split (datasets/__init__.py:339)")
    p.add_argument("--num_workers", type=int, default=8)
    # optimization
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--lr_schedule", type=str, default="poly",
                   choices=["poly"],
                   help="reference flag surface (train.py:1091); poly is the "
                        "only schedule the reference implements")
    p.add_argument("--poly_exp", type=float, default=9.0)
    p.add_argument("--max_iter", type=int, default=120000)
    p.add_argument("--max_epoch", type=int, default=40)
    p.add_argument("--bs_mult", type=int, default=4)
    p.add_argument("--bs_mult_val", type=int, default=1)
    # episodes
    p.add_argument("--mldg", action="store_true")
    p.add_argument("--per_domain", action="store_true",
                   help="robustnetver per-domain episode: one optimizer step "
                        "per source domain per iteration (train.py:729-845)")
    p.add_argument("--inner_lr", type=float, default=0.001)
    p.add_argument("--inner_lr_anneal", action="store_true")
    p.add_argument("--meta_aug_episode", action="store_true",
                   help="hard-augment exactly the episode's meta-test domains "
                        "instead of the reference's domain-0-permanently quirk "
                        "(train.py:199-211); see PARITY.md")
    p.add_argument("--no_aux_loss", action="store_true")
    p.add_argument("--mem_readloss", type=float, default=0.02)
    p.add_argument("--mem_divloss", type=float, default=0.4)
    p.add_argument("--mem_clsloss", type=float, default=0.2)
    p.add_argument("--img_wt_loss", action="store_true")
    p.add_argument("--cls_wt_loss", action="store_true")
    p.add_argument("--jointwtborder", action="store_true")
    p.add_argument("--wt_bound", type=float, default=1.0)
    p.add_argument("--batch_weighting", action="store_true",
                   help="class weights from the whole-batch histogram "
                        "instead of per image (cfg.BATCH_WEIGHTING, "
                        "config.py:123-124, loss.py:151-154)")
    p.add_argument("--strict_bdr_cls", type=str, default="",
                   help="comma-separated classes that keep strict one-hot "
                        "borders under --jointwtborder "
                        "(cfg.STRICTBORDERCLASS, config.py:127-128)")
    p.add_argument("--rlx_off_iter", type=int, default=-1,
                   help="iteration after which border relaxation shrinks "
                        "and boundary targets double "
                        "(cfg.REDUCE_BORDER_ITER, config.py:129-130, "
                        "loss.py:226-228)")
    p.add_argument("--sgd", action="store_true",
                   help="SGD (the only optimizer the reference implements; "
                        "optimizer.py:20-27 raises on anything else -- "
                        "accepted for script parity, SGD is the default)")
    p.add_argument("--adam", action="store_true",
                   help="declared but unimplemented in the reference "
                        "(optimizer.py:27 raises 'Not a valid optimizer')")
    p.add_argument("--amsgrad", action="store_true",
                   help="declared but unimplemented in the reference")
    p.add_argument("--image_uniform_sampling", action="store_true",
                   help="plain ConcatDataset over domains instead of "
                        "domain-uniform batching (datasets/__init__.py:632)")
    p.add_argument("--tb_tag", type=str, default="",
                   help="TensorBoard run comment (utils/misc.py:128)")
    p.add_argument("--maxSkip", dest="max_skip", type=int, default=0,
                   help="Cityscapes sequence-neighbor frames at +/- N added "
                        "to the class-uniform aug pool (cityscapes.py:48-80)")
    p.add_argument("--cityscapes_aug_dir", type=str, default="",
                   help="root of the Cityscapes sequence tree --maxSkip "
                        "reads (cfg.DATASET.CITYSCAPES_AUG_DIR, config.py:74)")
    p.add_argument("--coarse_boost_classes", type=str, default=None,
                   help="reference flag boosting classes from gtCoarse "
                        "centroids (datasets/__init__.py:347-349); the "
                        "rebuild has no gtCoarse backend -- setting it is an "
                        "error (see PARITY.md)")
    # --epoch_per_val is declared but never read in the reference
    # (train.py:1174, dead); here it is made FUNCTIONAL: validate every N
    # epochs in addition to the end-of-training validation (0 = reference
    # behavior).  See PARITY.md.
    p.add_argument("--epoch_per_val", type=int, default=0,
                   help="validate every N epochs (0 = only at the end, the "
                        "reference behavior; the reference declares this "
                        "flag but never reads it)")
    # accepted-for-script-parity, no effect: distributed plumbing GSPMD
    # replaces (--local_rank/--dist_url/--syncbn) and flags that are declared
    # but never read in the reference either (--fp16/--start_epoch/
    # --freeze_trunk/--hardnm/--rescale/--repoly/--scf/
    # --trunk -- verified by grep over /root/reference; see PARITY.md)
    for flag in ("--local_rank", "--dist_url", "--trunk", "--start_epoch",
                 "--hardnm", "--rescale", "--repoly", "--scf"):
        p.add_argument(flag, default=None, help=argparse.SUPPRESS)
    for flag in ("--syncbn", "--fp16", "--freeze_trunk"):
        p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    # infra
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--date", type=str, default="0000")
    p.add_argument("--exp", type=str, default="default")
    p.add_argument("--ckpt", type=str, default="./logs/ckpt")
    p.add_argument("--tb_path", type=str, default="./logs/tb")
    p.add_argument("--snapshot", type=str, default=None)
    p.add_argument("--pretrained", type=str, default=None,
                   help="torchvision-format ImageNet trunk .pth for backbone "
                        "init (reference: Resnet.py:499-559)")
    p.add_argument("--restore_optimizer", action="store_true")
    p.add_argument("--test_mode", action="store_true")
    p.add_argument("--snapshot_every", type=int, default=0,
                   help="save a 'last' checkpoint every N epochs (0 = only "
                        "at the end, the reference behavior)")
    p.add_argument("--snapshot_interval", type=int, default=0,
                   help="save a mid-epoch resumable checkpoint every N "
                        "steps (0 = off); resume with --snapshot <file> "
                        "--restore_optimizer continues the exact unkilled "
                        "trajectory (intra-epoch position + rng states)")
    p.add_argument("--model_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--spatial", type=int, default=1,
                   help="shard each crop's H over a spatial mesh axis of "
                        "this size (devices = data x spatial; GSPMD halo "
                        "exchange through the trunk).  Requires crop_size "
                        ">= 64*spatial -- see parallel.mesh."
                        "validate_spatial_training")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of iterations 10-20")
    p.add_argument("--check_nan", action="store_true",
                   help="raise on non-finite loss (the reference's autograd "
                        "anomaly mode, train.py:531, repurposed)")
    p.add_argument("--dump_augmentation_images", action="store_true",
                   help="dump the first training batch's augmented images + "
                        "colorized masks (train.py:1183)")
    p.add_argument("--visualize_feature", action="store_true",
                   help="dump whitening-tap covariance matrix images at the "
                        "logging cadence (train.py:326-342, visualize_matrix)")
    # --use_wtloss / --use_isw are redundant in the reference too: it derives
    # both from --wt_layer before anything reads them (train.py:77-83), which
    # is exactly what WhiteningConfig's properties do here
    for flag in ("--use_wtloss", "--use_isw"):
        p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    if args.test_mode:
        # smoke semantics (train.py:55-60,107-109): tiny crop, tiny batch
        args.crop_size = min(args.crop_size, 240)
        args.bs_mult = min(args.bs_mult, 2)
        args.max_iter = min(args.max_iter, 60)

    # auto max_epoch per dataset combo (utils/misc.py:110-120)
    if not args.restore_optimizer:
        ds = list(args.dataset)
        if ds == ["gtav", "synthia"]:
            args.max_epoch = 94 if "V2D" in args.arch else 40
        elif ds == ["gtav", "gtav"]:
            args.max_epoch = 30
        elif ds == ["gtav", "idd", "synthia"] or ds == ["gtav", "synthia", "idd"]:
            args.max_epoch = 92
        elif ds[:1] == ["null_loader"]:
            pass  # keep user-provided epochs for the synthetic fixture
        else:
            args.max_epoch = 150

    if args.coarse_boost_classes:
        raise SystemExit(
            "--coarse_boost_classes needs a Cityscapes gtCoarse backend, "
            "which the rebuild does not ship (the reference only exercises "
            "it with coarse annotations on disk); see PARITY.md")
    if args.adam or args.amsgrad:
        # optimizer.py:20-27: only --sgd is implemented; anything else is
        # "Not a valid optimizer"
        raise SystemExit("Not a valid optimizer (the reference implements "
                         "SGD only, optimizer.py:27)")
    if args.image_uniform_sampling and args.mldg:
        # MLDG needs the leading domain axis that only domain-uniform
        # batching produces (train.py:395-400 asserts 5-D input; a plain
        # ConcatDataset batch would crash the reference there too)
        raise SystemExit("--image_uniform_sampling and --mldg are "
                         "incompatible (MLDG requires domain-uniform "
                         "batches)")
    if args.mldg and args.per_domain:
        # --mldg takes dispatch priority but step_mldg is built for the
        # scaled-SGD opt state while --per_domain re-initializes it to the
        # unscaled format; combining them would crash at the first step with
        # an opt-state pytree mismatch.  (The reference cannot combine them
        # either: do_epoch dispatches to exactly one episode, train.py:138-197.)
        raise SystemExit("--mldg and --per_domain are mutually exclusive")

    return Config(
        model=ModelConfig(
            arch=args.arch,
            memory=MemoryConfig(
                enabled=args.memory,
                mem_slot=args.mem_slot,
                mem_dim=args.mem_dim,
                mem_momentum=args.mem_momentum,
                mem_temp=args.mem_temp,
                gumbel_read=not args.gumbel_off,
            ),
            whitening=WhiteningConfig(
                wt_layer=tuple(args.wt_layer),
                wt_reg_weight=args.wt_reg_weight,
                relax_denom=args.relax_denom,
                clusters=args.clusters,
                cov_stat_epoch=args.cov_stat_epoch,
                trials=args.trials,
                dynamic=args.dynamic,
            ),
            dtype=args.model_dtype,
        ),
        optim=OptimConfig(
            lr=args.lr, momentum=args.momentum, weight_decay=args.weight_decay,
            poly_exp=args.poly_exp,
        ),
        train=TrainConfig(
            max_iter=args.max_iter, max_epoch=args.max_epoch,
            bs_mult=args.bs_mult, bs_mult_val=args.bs_mult_val,
            crop_size=args.crop_size, mldg=args.mldg,
            per_domain=args.per_domain, inner_lr=args.inner_lr,
            inner_lr_anneal=args.inner_lr_anneal,
            meta_aug_episode=args.meta_aug_episode,
            no_aux_loss=args.no_aux_loss,
            mem_readloss=args.mem_readloss, mem_divloss=args.mem_divloss,
            mem_clsloss=args.mem_clsloss, img_wt_loss=args.img_wt_loss,
            cls_wt_loss=args.cls_wt_loss, jointwtborder=args.jointwtborder,
            wt_bound=args.wt_bound, test_mode=args.test_mode, seed=args.seed,
            snapshot_every=args.snapshot_every,
            snapshot_interval=args.snapshot_interval,
            epoch_per_val=int(args.epoch_per_val or 0),
            spatial=max(args.spatial, 1),
            batch_weighting=args.batch_weighting,
            strict_bdr_cls=tuple(int(c) for c in args.strict_bdr_cls.split(",")
                                 if c.strip() != ""),
            rlx_off_iter=args.rlx_off_iter,
        ),
        data=DataConfig(
            dataset=tuple(args.dataset), val_dataset=tuple(args.val_dataset),
            covstat_val_dataset=tuple(args.covstat_val_dataset),
            cv=args.cv, class_uniform_pct=args.class_uniform_pct,
            class_uniform_tile=args.class_uniform_tile,
            max_cu_epoch=args.max_cu_epoch,
            scale_min=args.scale_min, scale_max=args.scale_max,
            crop_nopad=args.crop_nopad, city_mode=args.city_mode,
            pre_size=args.pre_size, color_aug=args.color_aug,
            gblur=args.gblur, bblur=args.bblur, rrotate=args.rrotate,
            image_in=args.image_in, num_workers=args.num_workers,
            dataset_root=args.dataset_root,
            image_uniform_sampling=args.image_uniform_sampling,
            max_skip=args.max_skip,
            cityscapes_aug_dir=args.cityscapes_aug_dir,
        ),
        exp=args.exp, date=args.date, ckpt=args.ckpt, tb_path=args.tb_path,
        tb_tag=args.tb_tag,
        snapshot=args.snapshot, restore_optimizer=args.restore_optimizer,
        pretrained=args.pretrained,
    )


class Trainer:
    """Reference MemoryMetaFrameWork, functional style (train.py:43-197)."""

    def __init__(self, cfg: Config, profile_dir: str | None = None,
                 check_nan: bool = False, dump_aug: bool = False,
                 visualize_feature: bool = False):
        self.profile_dir = profile_dir
        self.check_nan = check_nan
        self.dump_aug = dump_aug
        # --visualize_feature: whitening-tap covariance images at the log
        # cadence (train.py:326-342); meaningful only with whitening taps
        self.viz_feature = (visualize_feature
                            and cfg.model.whitening.use_wtloss)
        from pinthememory_tpu.data import setup_loaders
        from pinthememory_tpu.models import build_model
        from pinthememory_tpu.models.memory import init_memory
        from pinthememory_tpu.train.loops import (
            make_eval_step,
            make_memory_init_step,
            make_train_step_agg,
            make_train_step_mldg,
        )
        from pinthememory_tpu.train.optim import lr_schedule
        from pinthememory_tpu.train.state import create_train_state
        from pinthememory_tpu.utils.checkpoint import CheckpointManager, load_torch_snapshot
        from pinthememory_tpu.utils.logx import ExperimentLogger

        from pinthememory_tpu.parallel.mesh import (
            make_mesh,
            replicate_state,
            shard_train_step,
            validate_spatial_training,
        )

        self.cfg = cfg
        self.log = ExperimentLogger(cfg)
        # GSPMD data (x spatial) parallelism over every visible device: the
        # reference's bs_mult-per-GPU semantics (datasets/__init__.py:
        # 323-326) -- the global batch is bs_mult x data devices and XLA
        # inserts the gradient/BN/memory-write collectives (SURVEY.md §2.6).
        # --spatial > 1 additionally shards each crop's H (halo exchange
        # through the trunk); guarded against XLA's tiny-shard corner.
        validate_spatial_training(cfg.train.crop_size, cfg.train.spatial)
        self.mesh = make_mesh(jax.devices(), spatial=cfg.train.spatial)
        n_data = self.mesh.shape["data"]
        if n_data > 1 or cfg.train.spatial > 1:
            self.log.info(
                f"mesh {dict(self.mesh.shape)} over {len(jax.devices())} "
                f"devices (global batch {cfg.train.bs_mult * n_data})")
        # each process loads ITS share of the global batch (the loaders are
        # host-sharded by ShardedSampler): global = bs_mult x data devices,
        # local = global / process_count (train.py's bs-per-GPU semantics
        # carried to SPMD multi-host)
        nproc = jax.process_count()
        assert n_data % nproc == 0, (
            f"data axis {n_data} not divisible by {nproc} processes")
        self.train_loader, self.val_loaders = setup_loaders(
            cfg, batch_scale=n_data // nproc)

        self.model = build_model(cfg.model)
        key = jax.random.PRNGKey(cfg.train.seed)
        kp, km, kr = jax.random.split(key, 3)
        hw = (cfg.train.crop_size, cfg.train.crop_size)
        m_items = (
            init_memory(km, cfg.model.memory.mem_slot, cfg.model.memory.mem_dim)
            if cfg.model.memory.enabled else None
        )
        init_fn = jax.jit(functools.partial(
            self.model.init, train=False, with_aux=True,
            memory_writing=cfg.model.memory.enabled,
        ))
        variables = init_fn(
            {"params": kp}, jnp.zeros((1, *hw, 3), jnp.float32),
            jnp.zeros((1, *hw), jnp.int32), m_items, rng=kr,
        )

        if cfg.pretrained and not cfg.snapshot:
            # ImageNet trunk init (Resnet.py:499-559): torchvision-format
            # state_dict onto the backbone, forgiving semantics
            from pinthememory_tpu.tools.convert_torch import load_imagenet_trunk

            variables, report = load_imagenet_trunk(cfg.pretrained, variables)
            self.log.info(f"ImageNet trunk init from {cfg.pretrained}: {report}")

        resume_native = cfg.snapshot and not cfg.snapshot.endswith(".pth")
        if cfg.snapshot and not resume_native:
            # all live reference trunks (incl. resnet-101) use the single
            # 7x7 stem -- ResNet3X3 is dead code (Resnet.py:552-556)
            variables, loaded_m, report = load_torch_snapshot(
                cfg.snapshot, variables, three_stem=False)
            if loaded_m is not None:
                m_items = jnp.asarray(loaded_m)
            self.log.info(f"restored torch snapshot {cfg.snapshot}: {report}")

        self.state, self.tx = create_train_state(cfg, variables, m_items)
        self._resume_epoch = 0

        if cfg.snapshot and not resume_native and cfg.restore_optimizer:
            # torch .pth resume with optimizer: momentum buffers + the
            # LambdaLR step (= iterations taken) carry over, and training
            # resumes from the saved epoch (optimizer.py:45-56 +
            # train.py:111-118's i = epoch * len(loader))
            from pinthememory_tpu.utils.checkpoint import load_torch_optimizer_state

            opt_state, count, epoch, mean_iu = load_torch_optimizer_state(
                cfg.snapshot, self.state.params, self.tx, three_stem=False)
            self.state = self.state.replace(
                opt_state=opt_state, step=jnp.asarray(count, jnp.int32))
            self._resume_epoch = epoch
            self.log.info(
                f"restored torch optimizer state: step={count} epoch={epoch} "
                f"mean_iu={mean_iu:.4f}")

        self._resume_iter = 0
        self._resume_host = None  # (rng key data, np_rng state, inner_lr)
        if resume_native:
            # resume a native msgpack checkpoint; --restore_optimizer keeps
            # opt_state/step (reference: optimizer.py:45-56, train.py:111-118)
            from pinthememory_tpu.utils.checkpoint import load_state

            loaded, meta = load_state(cfg.snapshot, self.state)
            if cfg.restore_optimizer:
                self.state = loaded
                self._resume_epoch = int(meta.get("epoch", 0))
                # mid-epoch resume (snapshot_interval saves): restore the
                # intra-epoch position and the host-side rng states so the
                # continued run IS the unkilled run's trajectory
                self._resume_iter = int(meta.get("iter_in_epoch", 0))
                if "host_rng" in meta:
                    self._resume_host = meta["host_rng"]
            else:
                self.state = self.state.replace(
                    params=loaded.params, batch_stats=loaded.batch_stats,
                    m_items=loaded.m_items)
            self.log.info(f"resumed native snapshot {cfg.snapshot}: {meta}")
        if n_data > 1 or cfg.train.spatial > 1:
            self.state = replicate_state(self.mesh, self.state)
        # donate=True: the run loop rebinds (state, m = step(state, ...)) and
        # never touches the previous state again, so XLA aliases the params/
        # momentum/stats buffers in place instead of double-buffering the
        # training state and copying results out
        self.step_agg = make_train_step_agg(self.model, cfg, self.tx,
                                            donate=True)
        self.step_mldg = make_train_step_mldg(self.model, cfg, self.tx,
                                              donate=True)
        self.step_pd = None
        if cfg.train.per_domain:
            # robustnetver: unscaled SGD state (LR applied per-iteration
            # inside the step; see train/optim.py)
            from pinthememory_tpu.train.loops import make_train_step_per_domain
            from pinthememory_tpu.train.optim import make_optimizer_unscaled

            tx_pd = make_optimizer_unscaled(cfg.optim)
            self.state = self.state.replace(opt_state=tx_pd.init(self.state.params))
            self.step_pd = make_train_step_per_domain(self.model, cfg, tx_pd,
                                                      donate=True)
        self.eval_step = make_eval_step(self.model, cfg)
        self.mem_init_step = make_memory_init_step(self.model)
        if n_data > 1 or cfg.train.spatial > 1:
            self.step_agg = shard_train_step(self.step_agg, self.mesh)
            self.step_mldg = shard_train_step(self.step_mldg, self.mesh)
            if self.step_pd is not None:
                self.step_pd = shard_train_step(self.step_pd, self.mesh)

        # whitening bookkeeping (reference: deepv3plus.py:457-467,
        # train.py:163-175)
        self.cov_layers = []
        if cfg.model.whitening.use_wtloss:
            from pinthememory_tpu.models.cov import IN_CHANNEL_LIST, build_cov_layers
            from pinthememory_tpu.train.loops import make_covstat_step

            trunk = self.model.trunk
            self.cov_layers = build_cov_layers(
                cfg.model.whitening.wt_layer, IN_CHANNEL_LIST[trunk],
                cfg.model.whitening.relax_denom, cfg.model.whitening.clusters)
            self.covstat_step = make_covstat_step(self.model)
        self.lr_fn = lr_schedule(cfg.optim)
        self.ckpt_mgr = CheckpointManager(self.log.exp_dir)
        # epoch resumes only under --restore_optimizer (train.py:111-118:
        # without it the reference resets epoch to 0)
        self.epoch = self._resume_epoch
        self.rng = jax.random.PRNGKey(cfg.train.seed + 1)
        self.np_rng = np.random.default_rng(cfg.train.seed + 2)
        if self._resume_host is not None:
            key, np_state, inner = self._resume_host
            self.rng = jnp.asarray(np.asarray(key, np.uint32))
            self.np_rng.bit_generator.state = np_state
            self._resume_inner_lr = float(inner)
        # image_uniform_sampling concatenates domains with no leading domain
        # axis, so episode logic sees a single mixed domain
        self.num_domains = (1 if cfg.data.image_uniform_sampling
                            else len(cfg.data.dataset))
        self.inner_lr = getattr(self, "_resume_inner_lr", cfg.train.inner_lr)

    # -- memory prototype initialization (train.py:1000-1042) -------------
    def memory_initialize(self):
        cfg = self.cfg
        M, D = cfg.model.memory.mem_slot, cfg.model.memory.mem_dim
        basket = jnp.zeros((M, D), jnp.float32)
        count = jnp.zeros((M,), jnp.float32)
        variables = self._local_vars()
        m_items = self._local(self.state.m_items)
        epochs = 1 if cfg.train.test_mode else 2
        for ep in range(epochs):
            for it, batch in enumerate(self.train_loader):
                img = batch["image"].reshape((-1,) + batch["image"].shape[-3:])
                gts = batch["gts"].reshape((-1,) + batch["gts"].shape[-2:])
                basket, count = self.mem_init_step(
                    variables, m_items, jnp.asarray(img),
                    jnp.asarray(gts), basket, count)
                if cfg.train.test_mode and it >= 10:
                    break
        # multi-host: every process accumulated only ITS loader shard --
        # sum the (basket, count) statistics globally before normalizing,
        # so m_items stays process-identical (the reference's per-rank
        # memory drift, network/memory.py:206-257, fixed at init too)
        basket = self._global_sum(basket)
        count = self._global_sum(count)
        from pinthememory_tpu.train.loops import finalize_memory_init

        new_m = finalize_memory_init(basket, count)
        if jax.process_count() > 1 or self.mesh.shape["data"] > 1 \
                or self.cfg.train.spatial > 1:
            from pinthememory_tpu.parallel.mesh import replicate_state

            new_m = replicate_state(self.mesh, new_m)
        self.state = self.state.replace(m_items=new_m)
        self.log.info("memory prototypes initialized")

    def _local(self, tree):
        """Process-local copy of (possibly globally-replicated) arrays, for
        per-host computations like validation and memory init.  Single
        process: identity."""
        if jax.process_count() == 1:
            return tree
        return jax.tree_util.tree_map(
            lambda a: np.asarray(jax.device_get(a))
            if hasattr(a, "ndim") else a, tree)

    def _local_vars(self):
        return self._local({"params": self.state.params,
                            "batch_stats": self.state.batch_stats})

    @staticmethod
    def _global_sum(x):
        """Sum an array across processes (identity single-process)."""
        if jax.process_count() == 1:
            return x
        from jax.experimental import multihost_utils

        return jnp.sum(multihost_utils.process_allgather(jnp.asarray(x)),
                       axis=0)

    def _wt_masks(self):
        """(mask, margin, num_remove) per whitened tap, or None."""
        if not self.cov_layers:
            return None
        out = []
        for layer in self.cov_layers:
            mask, margin, num = layer.get_mask_matrix()
            out.append((jnp.asarray(mask), float(margin), float(num)))
        return tuple(out)

    def validate_for_cov_stat(self):
        """ISW covariance-statistics rounds (train.py:163-175, 941-974)."""
        from pinthememory_tpu.data.loader import build_dataset
        from pinthememory_tpu.data import joint_transforms as jt
        from pinthememory_tpu.models.cov import CovMatrixISW

        cfg = self.cfg
        isw_layers = [l for l in self.cov_layers if isinstance(l, CovMatrixISW)]
        if not isw_layers:
            return
        for l in isw_layers:
            l.reset_mask_matrix()
        variables = self._local_vars()
        trials = 1 if cfg.train.test_mode else cfg.model.whitening.trials
        max_imgs = 10 if cfg.train.test_mode else 500
        for trial in range(trials):
            for name in cfg.data.covstat_val_dataset:
                ds = build_dataset(name, cfg, "train", eval_mode="aug_pair")
                ds.joint_transform = jt.Compose([jt.Resize(cfg.train.crop_size)])
                ds.set_epoch(trial)
                n = min(len(ds), max_imgs)
                m_local = self._local(self.state.m_items)
                for i in range(n):
                    img_or, img_color, _img_geom, _ = ds[i]
                    vs = self.covstat_step(
                        variables, m_local,
                        jnp.asarray(img_color)[None], jnp.asarray(img_or)[None])
                    for l, v in zip(isw_layers, vs):
                        l.set_variance_of_covariance(np.asarray(v))
                # reference cadence: masks update after EACH covstat dataset
                # within a trial (train.py:171-175), not once per trial --
                # identical for single-dataset configs, but the mask
                # intersection count differs for multi-dataset covstat
                for l in isw_layers:
                    l.set_mask_matrix()
        self.log.info("ISW covariance masks set "
                      f"({[int(l.num_sensitive) for l in isw_layers]} sensitive)")
        # covariance-mask images (reference TB images, train.py:977-987)
        from PIL import Image

        out = os.path.join(self.log.exp_dir, "cov_masks")
        os.makedirs(out, exist_ok=True)
        for li, l in enumerate(isw_layers):
            if l.mask_matrix is not None:
                img = (np.asarray(l.mask_matrix) * 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(out, f"layer{li}.png"))
        self.log.info(f"covariance mask images written to {out}")

    def _build_uniform_epoch(self):
        """Class-uniform epoch rebuild (train.py:176-183, datasets/uniform.py).

        Extracts per-class centroids once (JSON-cached next to the exp dir)
        and re-mixes centroid crops with random images every epoch.
        """
        cfg = self.cfg
        if cfg.data.class_uniform_pct <= 0:
            return
        from pinthememory_tpu.data.uniform import build_centroids, build_epoch

        # reference cut: from max_cu_epoch on, only fine images/centroids
        # feed the class-uniform mix, and the epoch shrinks to len(imgs)
        # (train.py:178-183 + cityscapes.py:440-457; the sampler length
        # follows automatically -- ShardedSampler sizes itself per epoch,
        # the reference needed an explicit sampler.set_num_samples())
        cut = self.epoch >= cfg.data.max_cu_epoch
        datasets = getattr(self.train_loader.dataset, "datasets",
                           [self.train_loader.dataset])
        for di, ds in enumerate(datasets):
            if not getattr(ds, "imgs", None) or not hasattr(ds, "decode_mask"):
                continue
            if not hasattr(ds, "_centroids"):
                cache = os.path.join(self.log.exp_dir, f"centroids_{di}.json")
                ds._centroids = build_centroids(
                    ds.imgs, ds.decode_mask,
                    tile_size=cfg.data.class_uniform_tile, cache_path=cache)
            aug = list(getattr(ds, "aug_imgs", ()) or ())
            if aug and not cut and not hasattr(ds, "_centroids_aug"):
                cache = os.path.join(self.log.exp_dir,
                                     f"centroids_{di}_aug.json")
                ds._centroids_aug = build_centroids(
                    aug, ds.decode_mask,
                    tile_size=cfg.data.class_uniform_tile, cache_path=cache)
            if cut or not aug:
                items, cents = ds.imgs, ds._centroids
            else:
                items = list(ds.imgs) + aug
                cents = {c: ds._centroids.get(c, [])
                         + ds._centroids_aug.get(c, [])
                         for c in range(19)}
            ds.imgs_uniform = build_epoch(
                items, cents, 19, cfg.data.class_uniform_pct,
                np.random.default_rng((cfg.train.seed, self.epoch)))

    def do_epoch(self) -> bool:
        """One epoch; returns False when max_iter is reached."""
        from pinthememory_tpu.train.loops import meta_split, select_meta_images

        cfg = self.cfg
        t_ep = time.time()
        self._build_uniform_epoch()
        if hasattr(self.train_loader.dataset, "set_epoch"):
            self.train_loader.dataset.set_epoch(self.epoch)
        self.train_loader.sampler.set_epoch(self.epoch)

        wt_masks = self._wt_masks()
        apply_wt = (not cfg.model.whitening.use_isw
                    or self.epoch > cfg.model.whitening.cov_stat_epoch)

        t_iter = time.time()
        # one device sync per epoch; the in-loop counter is mirrored on the
        # host (int(self.state.step) per iteration would BLOCK on the
        # previous step's output and serialize the upload/compute pipeline)
        step_no = int(self.state.step)

        # border-relaxation schedule flip, evaluated once per epoch exactly
        # when the reference refreshes cfg.ITER (train.py:147-149;
        # loss.py:226, transforms.py:128 then read the stale value all epoch)
        reduce_border = (cfg.train.rlx_off_iter != -1
                         and step_no > cfg.train.rlx_off_iter)
        if cfg.train.jointwtborder:
            for ds in getattr(self.train_loader.dataset, "datasets",
                              [self.train_loader.dataset]):
                ds.reduce_border = reduce_border

        def prepared_batches():
            """Lag-one device prefetch (the evalx.cli pattern,
            cli.py:251-267): batch i+1's host->device upload is ISSUED
            (jax.device_put returns without waiting) before batch i is
            consumed, so the transfer rides under the step's compute instead
            of serializing with it.  rng/meta-split draws stay in batch
            order, so the data stream is unchanged."""
            import copy as _copy

            pending = None
            for batch in self.train_loader:
                self.rng, sub = jax.random.split(self.rng)
                np_batch = {k: v for k, v in batch.items() if k != "names"}
                mldg_now = cfg.train.mldg and self.num_domains > 1
                tr = te = None
                if mldg_now:
                    tr, te = meta_split(self.np_rng, self.num_domains)
                    # meta_aug_episode: pick the hard-augmented photometric
                    # version for the episode's meta-test domains
                    np_batch["image"] = select_meta_images(np_batch["image"], te)
                if np_batch["image"].ndim == 4:  # single domain -> add D axis
                    np_batch = {k: v[:, None] for k, v in np_batch.items()}
                if jax.process_count() > 1:
                    # multi-host: each process contributes its loader shard
                    # of the GLOBAL batch (jax.make_array_from_process_local
                    # _data inside device_put_batch)
                    from pinthememory_tpu.parallel.mesh import device_put_batch

                    jbatch = device_put_batch(self.mesh, np_batch)
                else:
                    jbatch = {k: jax.device_put(np.ascontiguousarray(v))
                              for k, v in np_batch.items()}
                # host-rng snapshot AFTER this batch's draws: this is the
                # state a mid-epoch resume needs to continue at batch i+1
                # (the lag-one prefetch means self.rng at consumer time has
                # already advanced past the NEXT batch's draw)
                snap = (np.asarray(self.rng).tolist(),
                        _copy.deepcopy(self.np_rng.bit_generator.state))
                item = (batch, jbatch, sub, mldg_now, tr, te, snap)
                if pending is not None:
                    yield pending
                pending = item
            if pending is not None:
                yield pending

        # mid-epoch resume: the restored snapshot was taken after batch
        # (skip-1); the loader drops those indices WITHOUT loading them and
        # the restored host-rng states make the remaining draws identical
        # to the unkilled run's
        skip = self._resume_iter
        self._resume_iter = 0
        if skip:
            self.train_loader.skip_next = skip
            self.log.info(f"mid-epoch resume: skipping {skip} batches of "
                          f"epoch {self.epoch}")

        for i, (batch, jbatch, sub, mldg_now, tr, te, snap) in enumerate(
                prepared_batches(), start=skip):
            if step_no >= cfg.train.max_iter:
                return False
            step_no += 1
            if self.profile_dir and self.epoch == 0 and i == 10:
                jax.profiler.start_trace(self.profile_dir)
            if self.profile_dir and self.epoch == 0 and i == 20:
                jax.profiler.stop_trace()
                self.log.info(f"profiler trace written to {self.profile_dir}")
            if self.dump_aug and self.epoch == 0 and i == 0:
                self._dump_augmentation(batch)

            if mldg_now:
                self.state, metrics = self.step_mldg(
                    self.state, jbatch, sub, tr, te, jnp.float32(self.inner_lr),
                    wt_masks, apply_wt, reduce_border)
                log_metrics = {f"inner_{k}": v for k, v in metrics["inner"].items()}
                log_metrics.update({f"outer_{k}": v for k, v in metrics["outer"].items()})
            elif self.step_pd is not None:
                self.state, metrics = self.step_pd(
                    self.state, jbatch, sub, wt_masks, apply_wt, reduce_border)
                log_metrics = dict(metrics)
            else:
                self.state, metrics = self.step_agg(
                    self.state, jbatch, sub, wt_masks, apply_wt, reduce_border)
                log_metrics = dict(metrics)

            if cfg.train.inner_lr_anneal:
                # inner_lr tracks lr/4 (train.py:625-626); host step mirror
                # avoids a device sync here
                self.inner_lr = float(self.lr_fn(step_no)) / 4

            if (cfg.train.snapshot_interval
                    and step_no % cfg.train.snapshot_interval == 0):
                # preemption insurance: resumable mid-epoch checkpoint
                # (epoch + intra-epoch position + host rng states)
                self.ckpt_mgr.save_last(
                    self.state, self.epoch,
                    extra_meta={"iter_in_epoch": i + 1,
                                "host_rng": [snap[0], snap[1],
                                             float(self.inner_lr)]})

            if i % 50 == 49 or (cfg.train.test_mode and i == 0):
                lr = float(self.lr_fn(step_no))
                loss_now = float(log_metrics.get(
                    "total", log_metrics.get("outer_total", 0.0)))
                if self.check_nan and not np.isfinite(loss_now):
                    raise FloatingPointError(
                        f"non-finite loss {loss_now} at step {step_no}")
                ms = (time.time() - t_iter) / (i + 1) * 1000
                self.log.info(
                    f"[epoch {self.epoch}] [it {i + 1}/{len(self.train_loader)} "
                    f": {step_no}] "
                    f"[loss {loss_now:.6f}] [lr {lr:.6f}] [time {ms:.0f} ms/it]")
                self.log.scalars(step_no, log_metrics)
                if self.viz_feature:
                    self._visualize_feature(jbatch, step_no)

            if cfg.train.test_mode and i > 5:
                return False
        self.log.info(f"epoch {self.epoch} done in {time.time() - t_ep:.1f}s")
        return True

    def _visualize_feature(self, jbatch, step_no: int):
        """Whitening-tap covariance images at the log cadence
        (train.py:326-342, visualize_matrix): per tap layer, the first batch
        element's CxC covariance rendered as RGB = [1, |clamp(|cov|,1)-1|,
        |clamp(|cov|,1)-1|] -- white diagonal, dark off-diagonal energy."""
        from PIL import Image

        from pinthememory_tpu.models.instance_whitening import (
            get_covariance_matrix,
        )

        if not hasattr(self, "_taps_cov_fn"):
            model = self.model

            @jax.jit
            def taps_cov(params, stats, m_items, image):
                out = model.apply(
                    {"params": params, "batch_stats": stats},
                    image, None, m_items, train=False, with_aux=False)
                return [get_covariance_matrix(t)[:1] for t in out["taps"]]

            self._taps_cov_fn = taps_cov

        img = jbatch["image"]
        img = img.reshape((-1,) + img.shape[-3:])[:1]
        covs = self._taps_cov_fn(self.state.params, self.state.batch_stats,
                                 self.state.m_items, img)
        out = os.path.join(self.log.exp_dir, "covariance")
        os.makedirs(out, exist_ok=True)
        for li, cov in enumerate(covs):
            m = np.clip(np.abs(np.asarray(cov[0], np.float32)), None, 1.0)
            gb = np.abs(m - 1.0)
            rgb = np.stack([np.ones_like(m), gb, gb], axis=-1)
            Image.fromarray((rgb * 255).astype(np.uint8)).save(
                os.path.join(out, f"step{step_no}_layer{li}.png"))

    def _dump_augmentation(self, batch):
        """Write the batch's augmented images + colorized masks as PNGs
        (reference --dump_augmentation_images, datasets/cityscapes.py:316-323)."""
        from PIL import Image

        from pinthememory_tpu.core.labels import trainid_palette
        from pinthememory_tpu.evalx.sliding import IMAGENET_MEAN, IMAGENET_STD

        out = os.path.join(self.log.exp_dir, "augmentation_dump")
        os.makedirs(out, exist_ok=True)
        imgs = np.asarray(batch["image"])
        gts = np.asarray(batch["gts"])
        if imgs.ndim == 6:  # meta-pair batches: dump the normal version
            imgs = imgs[:, :, 0]
        if imgs.ndim == 4:
            imgs, gts = imgs[:, None], gts[:, None]
        mean, std = np.asarray(IMAGENET_MEAN), np.asarray(IMAGENET_STD)
        for b in range(imgs.shape[0]):
            for d in range(imgs.shape[1]):
                rgb = np.clip((imgs[b, d] * std + mean) * 255.0, 0, 255)
                Image.fromarray(rgb.astype(np.uint8)).save(
                    os.path.join(out, f"b{b}_d{d}_img.png"))
                mask = np.clip(gts[b, d].astype(np.int32), 0, 255)
                Image.fromarray(trainid_palette()[mask]).save(
                    os.path.join(out, f"b{b}_d{d}_mask.png"))
        self.log.info(f"augmentation dump written to {out}")

    @staticmethod
    def _global_hist(hist):
        """Sum the confusion matrix across hosts before mIoU/best-checkpoint
        decisions (train.py:927-929 all-reduces the IoU hist).  The val
        loaders are host-sharded (ShardedSampler), so each process holds a
        partial hist; without this reduction multi-host mIoU -- and the
        best-checkpoint choice -- would be per-process.  Single-process:
        identity."""
        if jax.process_count() == 1:
            return hist
        from jax.experimental import multihost_utils

        return jnp.sum(multihost_utils.process_allgather(hist), axis=0)

    def validate(self, max_batches: int | None = None):
        """Whole-image validation on each val loader (train.py:847-939)."""
        from pinthememory_tpu.core.metrics import confusion_matrix, mean_iu
        from pinthememory_tpu.evalx.sliding import normalize_image

        results = {}
        # multi-host: each process validates its loader shard on a LOCAL
        # copy of the replicated state (a global-array jit would have to
        # run SPMD-synchronized across hosts for per-host batches)
        eval_state = (self.state if jax.process_count() == 1
                      else self._local(self.state))
        for name, loader in self.val_loaders.items():
            hist = None
            for bi, batch in enumerate(loader):
                img = jnp.asarray(batch["image"])
                if batch["image"].dtype == np.uint8:
                    img = normalize_image(img)
                img = img.astype(jnp.float32)
                if img.ndim == 3:
                    img = img[None]
                logits = self.eval_step(eval_state, img)
                pred = jnp.argmax(logits, -1)
                h = confusion_matrix(pred, jnp.asarray(batch["gts"]), 19)
                hist = h if hist is None else hist + h
                if max_batches and bi + 1 >= max_batches:
                    break
            if hist is not None:
                hist = self._global_hist(hist)
                results[name] = mean_iu(hist)
                self.log.info(f"val {name}: mIoU {results[name] * 100:.2f}")
                # per-dataset val scalar (utils/misc.py:266-269 writes
                # mean_iu to the TB writer per val set)
                self.log.scalars(int(self.state.step),
                                 {"mean_iu": results[name]},
                                 prefix=f"val_{name}")
                self.ckpt_mgr.maybe_save_best(self.state, name, self.epoch, results[name])
        return results

    def run(self):
        from pinthememory_tpu.data.loader import arm_meta_augmentation

        cfg = self.cfg
        if cfg.model.memory.enabled and cfg.snapshot is None:
            self.memory_initialize()
        # meta-test hard augmentation arms only after memory init, matching
        # the reference call order (memory_initalize at train.py:121 precedes
        # the first meta_transform() at train.py:501)
        arm_meta_augmentation(self.train_loader.dataset, cfg.train.mldg,
                              cfg.train.meta_aug_episode)
        while True:
            # ISW: gather covariance statistics at the trigger epoch
            # (train.py:169-175)
            w = cfg.model.whitening
            if w.use_isw and (
                    (w.dynamic and self.epoch % (w.cov_stat_epoch + 1) == w.cov_stat_epoch)
                    or (not w.dynamic and self.epoch == w.cov_stat_epoch)):
                self.validate_for_cov_stat()
            more = self.do_epoch()
            self.epoch += 1
            if (cfg.train.epoch_per_val and more
                    and self.epoch % cfg.train.epoch_per_val == 0
                    and not cfg.train.test_mode):
                # periodic validation (--epoch_per_val made functional; the
                # reference declares it but never reads it, train.py:1174)
                self.validate()
            if (cfg.train.snapshot_every
                    and self.epoch % cfg.train.snapshot_every == 0):
                # mid-run insurance for preemptible runs (beyond parity --
                # the reference snapshots only at max_epoch, train.py:186-191);
                # host rng rides along so the resumed trajectory matches the
                # unkilled run across the epoch boundary
                self.ckpt_mgr.save_last(
                    self.state, self.epoch,
                    extra_meta={"iter_in_epoch": 0,
                                "host_rng": [np.asarray(self.rng).tolist(),
                                             self.np_rng.bit_generator.state,
                                             float(self.inner_lr)]})
            if cfg.train.test_mode:
                self.validate(max_batches=10)
                break
            if not more or self.epoch > cfg.train.max_epoch:
                self.ckpt_mgr.save_last(self.state, self.epoch)
                self.validate()
                break
        self.ckpt_mgr.save_last(self.state, self.epoch)
        self.log.info("training complete")


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    Trainer(cfg, profile_dir=args.profile, check_nan=args.check_nan,
            dump_aug=args.dump_augmentation_images,
            visualize_feature=args.visualize_feature).run()


if __name__ == "__main__":
    main()
