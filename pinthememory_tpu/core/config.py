"""Typed configuration for the framework.

The reference drives everything through ~130 argparse flags plus a global
mutable ``cfg`` AttrDict (reference: train.py:1045-1221, config.py:47-133).
Here the same knob surface is factored into immutable dataclasses.  Flag names
are preserved where sensible so reference shell scripts translate 1:1.

Hashable static fields (e.g. :class:`ModelConfig`, :class:`MemoryConfig`) are
safe to close over in jitted functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class MemoryConfig:
    """Categorical memory knobs (reference: train.py:1067-1079)."""

    enabled: bool = False
    mem_slot: int = 19          # one slot per semantic class
    mem_dim: int = 256          # slot feature dimension
    mem_momentum: float = 0.8   # momentum of the masked-pooling write
    mem_temp: float = 1.0       # read-loss temperature
    gumbel_read: bool = True    # gumbel-softmax sampling on the read path


@dataclass(frozen=True)
class WhiteningConfig:
    """Instance-whitening / ISW knobs (reference: train.py:1060-1066).

    ``wt_layer`` has 7 positions -- stem convs 0-2, layer1-4 last blocks 3-6
    (reference: network/Resnet.py:334-350).  Codes: 0 none, 1 IW/IRW, 2 ISW,
    3 InstanceNorm, 4 InstanceNorm(affine), 5 SyncSwitchWhiten.
    """

    wt_layer: tuple[int, ...] = (0, 0, 0, 0, 0, 0, 0)
    wt_reg_weight: float = 0.0
    relax_denom: float = 0.0
    clusters: int = 50
    cov_stat_epoch: int = 0
    trials: int = 10                # covstat rounds (train.py:172)
    dynamic: bool = False           # periodic covstat (train.py:169-170)

    @property
    def use_wtloss(self) -> bool:
        return any(w in (1, 2) for w in self.wt_layer)

    @property
    def use_isw(self) -> bool:
        return any(w == 2 for w in self.wt_layer)


@dataclass(frozen=True)
class ModelConfig:
    """Network architecture (reference: network/deepv3plus.py constructors)."""

    arch: str = "DeepR50V3PlusD"    # constructor name, see models/__init__.py
    num_classes: int = 19
    # derived by the factory, but overridable:
    trunk: str = "resnet-50"
    variant: str = "D16"            # D (OS8) / D16 (OS16) / D4 / D32
    skip_num: int = 48
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9        # flax convention == 1 - torch 0.1
    memory: MemoryConfig = field(default_factory=MemoryConfig)
    whitening: WhiteningConfig = field(default_factory=WhiteningConfig)
    # --fixed_aspp_pool (eval.py:741-745): replace the ASPP's adaptive global
    # image pooling with a fixed 105x105 average-pool window at inference
    # (0 = adaptive, the default)
    fixed_aspp_pool: int = 0
    # compute dtype for the conv trunk; params always float32
    dtype: str = "float32"

    @property
    def output_stride(self) -> int:
        return {"D": 8, "D4": 4, "D16": 16}.get(self.variant, 32)


@dataclass(frozen=True)
class OptimConfig:
    """SGD + exponential schedule (reference: optimizer.py:11-30)."""

    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 5e-4
    nesterov: bool = False
    poly_exp: float = 9.0
    # The reference hardcodes the schedule denominator at 120000 regardless of
    # max_iter (optimizer.py:29) -- preserved as an explicit knob.
    schedule_denom: int = 120000


@dataclass(frozen=True)
class TrainConfig:
    max_iter: int = 120000
    max_epoch: int = 40
    bs_mult: int = 4                # per-device train batch
    bs_mult_val: int = 1
    crop_size: int = 768
    mldg: bool = False              # MLDG meta-learning episode
    per_domain: bool = False        # robustnetver per-domain episode (train.py:729)
    inner_lr: float = 0.001
    inner_lr_anneal: bool = False
    # opt-in "intended" MLDG hard-aug wiring: hard-augment exactly the
    # episode's meta-test domains instead of the reference's quirky
    # domain-0-permanently behavior (train.py:199-211); see
    # data/loader.arm_meta_augmentation
    meta_aug_episode: bool = False
    no_aux_loss: bool = False
    aux_loss_weight: float = 0.4    # train.py:222
    mem_readloss: float = 0.02
    mem_divloss: float = 0.4
    mem_clsloss: float = 0.2
    img_wt_loss: bool = False
    cls_wt_loss: bool = False
    jointwtborder: bool = False
    wt_bound: float = 1.0
    # border-relaxation schedule knobs (reference config.py:57-65,123-130)
    batch_weighting: bool = False       # cfg.BATCH_WEIGHTING (--batch_weighting)
    strict_bdr_cls: tuple[int, ...] = ()  # cfg.STRICTBORDERCLASS (--strict_bdr_cls)
    rlx_off_iter: int = -1              # cfg.REDUCE_BORDER_ITER (--rlx_off_iter)
    border_window: int = 1              # cfg.BORDER_WINDOW (fixed 1 in reference)
    test_mode: bool = False
    # beyond-parity (flag-gated, 0 = reference behavior of snapshotting only
    # at the end): save a 'last' checkpoint every N epochs so preemptible
    # runs can resume
    snapshot_every: int = 0
    # beyond-parity: save a resumable checkpoint every N STEPS (0 = off).
    # The saved meta carries the intra-epoch position and host rng states,
    # so a preempted run resumes mid-epoch on the exact trajectory of an
    # unkilled run (the reference can only restart from an epoch boundary,
    # utils/misc.py:175-247)
    snapshot_interval: int = 0
    # --epoch_per_val: declared but dead in the reference (train.py:1174);
    # functional here -- validate every N epochs (0 = end only)
    epoch_per_val: int = 0
    # spatial mesh axis for training (devices = data x spatial); guarded by
    # parallel.mesh.validate_spatial_training
    spatial: int = 1
    seed: int = 0


@dataclass(frozen=True)
class DataConfig:
    dataset: tuple[str, ...] = ("gtav", "synthia")
    val_dataset: tuple[str, ...] = ("cityscapes", "bdd100k", "mapillary")
    covstat_val_dataset: tuple[str, ...] = ("gtav",)
    cv: int = 0
    class_uniform_pct: float = 0.0
    class_uniform_tile: int = 1024
    max_cu_epoch: int = 10000       # train.py:1136: cut epoch for class-
                                    # uniform sampling (fine-only after it)
    image_uniform_sampling: bool = False
    # --maxSkip: Cityscapes sequence-neighbor frames at +/- max_skip added to
    # aug_imgs (cityscapes.py:48-80); needs the auxiliary sequence tree at
    # cityscapes_aug_dir (cfg.DATASET.CITYSCAPES_AUG_DIR, config.py:74)
    max_skip: int = 0
    cityscapes_aug_dir: str = ""
    scale_min: float = 0.5
    scale_max: float = 2.0
    pre_size: int | None = None
    color_aug: float = 0.0
    gblur: bool = False
    bblur: bool = False
    rrotate: int = 0
    image_in: bool = False          # per-image input instance norm
    crop_nopad: bool = False        # RandomCrop without border padding
    city_mode: str = "train"        # cityscapes source split (or trainval)
    num_workers: int = 8
    # spawn-based process workers for the TRAIN loader, like the reference's
    # torch DataLoader (datasets/__init__.py:328); thread workers are
    # GIL-bound on the photometric chain (measured ~1.1x at 8 threads)
    worker_processes: bool = True
    dataset_root: str = "~/dg_seg_dataset"  # config.py:68


@dataclass(frozen=True)
class EvalConfig:
    """Inference protocol (reference: eval.py:62-110)."""

    inference_mode: str = "sliding"     # sliding | pooling | whole
    scales: tuple[float, ...] = (0.5, 1.0, 2.0)
    flip: bool = True
    crop_size: int = 768
    overlap: float = 1.0 / 3.0          # sliding-window overlap ratio
    sliding_batch: int = 8              # tiles evaluated per device batch


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    # experiment infra
    exp: str = "default"
    date: str = "0000"
    ckpt: str = "./logs/ckpt"
    tb_path: str = "./logs/tb"
    tb_tag: str = ""                # TB run comment (utils/misc.py:128)
    snapshot: str | None = None
    restore_optimizer: bool = False
    # torchvision-format ImageNet trunk weights (.pth) for backbone init
    # (reference: model_zoo.load_url + forgiving_state_restore,
    # Resnet.py:499-559); ignored when a full snapshot is given
    pretrained: str | None = None


def replace(cfg: Any, **kwargs: Any) -> Any:
    """``dataclasses.replace`` that tolerates nested dotted keys."""
    flat: dict[str, Any] = {}
    for k, v in kwargs.items():
        if "." in k:
            head, rest = k.split(".", 1)
            flat[head] = replace(getattr(cfg, head), **{rest: v})
        else:
            flat[k] = v
    return dataclasses.replace(cfg, **flat)


def flagship_train_config() -> Config:
    """`train_GS_pinmem_DR50V3P.sh` translated (the paper's headline recipe)."""
    return Config(
        model=ModelConfig(
            arch="DeepR50V3PlusD",
            trunk="resnet-50",
            variant="D16",
            memory=MemoryConfig(enabled=True),
        ),
        train=TrainConfig(mldg=True, inner_lr_anneal=True),
        data=DataConfig(dataset=("gtav", "synthia"), color_aug=0.5, gblur=True),
    )


def tuplify(seq: Sequence) -> tuple:
    return tuple(seq)
