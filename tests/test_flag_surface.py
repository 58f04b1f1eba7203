"""Flag-surface completeness + behavior of the newly wired flags.

The completeness test extracts every ``add_argument`` flag the reference's
three entry points declare (train.py:1045-1221 incl. the shared
parse_for_modelassign block, eval.py:62-110, ablation.py:53-88) and asserts
the corresponding rebuild parser accepts each one -- implemented,
alias, or documented no-op (PARITY.md "Flag-surface compatibility").
"""

import os
import re

import numpy as np
import pytest

REF = "/root/reference"


def _ref_flags(path: str) -> set:
    return set(re.findall(r"add_argument\(\s*['\"](--[\w\-]+)",
                          open(path).read()))


def _shared_block_flags() -> set:
    src = open(os.path.join(REF, "train.py")).read()
    block = src[src.index("def parse_for_modelassign"):]
    block = block[: block.index("return parser")]
    return set(re.findall(r"add_argument\(\s*['\"](--[\w\-]+)", block))


def test_train_parser_accepts_every_reference_flag():
    from pinthememory_tpu.train.cli import build_parser

    accepted = set(build_parser()._option_string_actions)
    missing = sorted(f for f in _ref_flags(os.path.join(REF, "train.py"))
                     if f not in accepted)
    assert not missing, missing


def test_eval_parser_accepts_every_reference_flag():
    from pinthememory_tpu.evalx.cli import build_parser

    accepted = set(build_parser()._option_string_actions)
    ref = _ref_flags(os.path.join(REF, "eval.py")) | _shared_block_flags()
    missing = sorted(f for f in ref if f not in accepted)
    assert not missing, missing


def test_ablation_parser_accepts_every_reference_flag():
    from pinthememory_tpu.tools.ablation import build_parser

    accepted = set(build_parser()._option_string_actions)
    ref = _ref_flags(os.path.join(REF, "ablation.py")) | _shared_block_flags()
    missing = sorted(f for f in ref if f not in accepted)
    assert not missing, missing


# ---------------------------------------------------------------------------
# behavior of the wired flags
# ---------------------------------------------------------------------------
def test_adam_raises_like_reference():
    """optimizer.py:27: anything but SGD is 'Not a valid optimizer'."""
    from pinthememory_tpu.train.cli import build_parser, config_from_args

    args = build_parser().parse_args(["--adam"])
    with pytest.raises(SystemExit, match="Not a valid optimizer"):
        config_from_args(args)


def test_image_uniform_plus_mldg_rejected():
    from pinthememory_tpu.train.cli import build_parser, config_from_args

    args = build_parser().parse_args(["--image_uniform_sampling", "--mldg"])
    with pytest.raises(SystemExit, match="incompatible"):
        config_from_args(args)


def test_coarse_boost_classes_rejected():
    from pinthememory_tpu.train.cli import build_parser, config_from_args

    args = build_parser().parse_args(["--coarse_boost_classes", "3,12"])
    with pytest.raises(SystemExit, match="gtCoarse"):
        config_from_args(args)


def test_sgd_and_noop_flags_accepted():
    """A reference-script flag set parses and builds a config."""
    from pinthememory_tpu.train.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--sgd", "--syncbn", "--local_rank", "0", "--fp16",
         "--batch_weighting", "--strict_bdr_cls", "3,12",
         "--rlx_off_iter", "100", "--tb_tag", "_x",
         "--dataset", "null_loader"])
    cfg = config_from_args(args)
    assert cfg.train.batch_weighting
    assert cfg.train.strict_bdr_cls == (3, 12)
    assert cfg.train.rlx_off_iter == 100
    assert cfg.tb_tag == "_x"


def test_eval_aliases():
    from pinthememory_tpu.evalx.cli import build_parser

    p = build_parser()
    a = p.parse_args(["--mode", "test", "--videopath", "/v",
                      "--dataset_cls", "bdd100k", "--faster"])
    assert a.split == "test"
    assert a.video_folder == "/v"
    assert a.dataset == "bdd100k"
    # defaults survive when the aliases are absent
    a2 = p.parse_args([])
    assert a2.split == "val" and a2.video_folder is None
    assert a2.dataset == "cityscapes"


def test_ablation_aliases():
    from pinthememory_tpu.tools.ablation import build_parser

    p = build_parser()
    a = p.parse_args(["--imagenum_dom", "7", "--outdir", "/o",
                      "--all_class", "--tsnecuda", "--ablation_mode",
                      "tsnemem"])
    assert a.max_images == 7 and a.results_dir == "/o" and a.all_class
    a2 = p.parse_args([])
    assert a2.max_images == 50 and a2.results_dir == "./abla_results"


def test_image_uniform_sampling_loader():
    """--image_uniform_sampling: plain concat, no domain axis
    (datasets/__init__.py:632-635)."""
    from pinthememory_tpu.core.config import Config, DataConfig, TrainConfig
    from pinthememory_tpu.data.loader import ConcatDataset, setup_loaders

    cfg = Config(
        data=DataConfig(dataset=("null_loader", "null_loader"),
                        val_dataset=(), image_uniform_sampling=True,
                        num_workers=1),
        train=TrainConfig(bs_mult=2, crop_size=64),
    )
    train_loader, _ = setup_loaders(cfg)
    assert isinstance(train_loader.dataset, ConcatDataset)
    batch = next(iter(train_loader))
    assert batch["image"].ndim == 4  # (B, H, W, C): no domain axis
    assert batch["image"].shape[0] == 2


def test_cityscapes_max_skip_neighbors(tmp_path):
    """--maxSkip: +/-N sequence neighbors from the aug tree land in
    aug_imgs (cityscapes.py:48-80)."""
    from PIL import Image

    from pinthememory_tpu.data.datasets import Cityscapes

    def write(root, city, stem, is_aug):
        img_dir = os.path.join(root, "leftImg8bit_trainvaltest", "leftImg8bit")
        mask_dir = os.path.join(root, "gtFine_trainvaltest", "gtFine")
        if not is_aug:  # the main tree has a split level
            img_dir = os.path.join(img_dir, "train")
            mask_dir = os.path.join(mask_dir, "train")
        os.makedirs(os.path.join(img_dir, city), exist_ok=True)
        os.makedirs(os.path.join(mask_dir, city), exist_ok=True)
        Image.new("RGB", (8, 8)).save(
            os.path.join(img_dir, city, stem + "_leftImg8bit.png"))
        Image.new("L", (8, 8)).save(
            os.path.join(mask_dir, city, stem + "_gtFine_labelIds.png"))

    root = str(tmp_path / "cityscapes")
    aug = str(tmp_path / "aug")
    write(root, "aachen", "aachen_000001_000019", is_aug=False)
    # neighbor at frame-2 exists in the aug tree; frame+2 does not
    write(aug, "aachen", "aachen_000001_000017", is_aug=True)

    ds = Cityscapes(root, mode="train", max_skip=2, aug_root=aug)
    assert len(ds.imgs) == 1
    assert len(ds.aug_imgs) == 1
    assert ds.aug_imgs[0][0].endswith(
        "aachen_000001_000017_leftImg8bit.png")
    # without max_skip the aug pool stays empty
    assert Cityscapes(root, mode="train").aug_imgs == []


def test_fixed_aspp_pool_matches_torch_avgpool():
    """flax nn.avg_pool(k, stride=k) == torch AvgPool2d(k) (the
    --fixed_aspp_pool pooling, eval.py:744)."""
    import torch
    import jax.numpy as jnp
    import flax.linen as fnn

    x = np.random.default_rng(0).standard_normal((2, 13, 17, 5)).astype(
        np.float32)
    ours = np.asarray(fnn.avg_pool(jnp.asarray(x), (4, 4), strides=(4, 4)))
    theirs = torch.nn.AvgPool2d(4)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(
            0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_fixed_aspp_pool_model_builds():
    import jax
    import jax.numpy as jnp

    from pinthememory_tpu.core.config import ModelConfig
    from pinthememory_tpu.models import build_model

    mc = ModelConfig(arch="DeepR18V3PlusD", fixed_aspp_pool=2)
    model = build_model(mc)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, None, None,
                           train=False, with_aux=False)
    out = model.apply(variables, x, None, None, train=False, with_aux=False)
    assert out["main_out"].shape == (1, 128, 128, 19)
