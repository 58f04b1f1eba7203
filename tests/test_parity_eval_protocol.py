"""Eval-PROTOCOL parity against the ACTUAL reference eval.py (VERDICT r2 #1).

`tests/test_evalx.py` pins the rebuild's tile/merge arithmetic against its
own restatement; a transcription error in `compute_grid`/`merge` semantics
would pass there.  This file imports the real `/root/reference/eval.py`
(module-level argparse + NCCL init satisfied by `ref_harness`) and drives its
`sliding_window_cropping`, `inference_sliding` (eval.py:340-405, merge at
210-274) and `inference_pool`/`pooled_eval`/`MeanFusion` (eval.py:133-146,
277-337) directly:

  1. grid geometry: reference crop mapping == `compute_grid` coordinates and
     the actual crop tensors == `extract_tiles`, across landscape/portrait/
     smaller-than-tile shapes and all three protocol scales;
  2. full sliding chain with a shared 3x3-conv model -- scale-1.0-only is
     exact (no image resampling in play); the 0.5/1.0/2.0+flip chain agrees
     to within the PIL-uint8 image-resize quantization;
  3. full sliding chain with the real `DeepR50V3PlusD` on converted weights;
  4. pooling chain (`_eval_get_item`-style bicubic input pyramid ->
     MeanFusion) with the real model on converted weights.
"""

import types

import numpy as np
import pytest
import torch
import torch.nn as nn
from PIL import Image

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
from pinthememory_tpu.evalx.pooling import PoolingEvaluator
from pinthememory_tpu.evalx.sliding import SlidingEvaluator
from pinthememory_tpu.evalx.tiling import compute_grid, extract_tiles
from pinthememory_tpu.models import build_model
from pinthememory_tpu.tools.convert_torch import (
    convert_state_dict,
    merge_into_variables,
)

from ref_harness import (
    NUM_CLASSES,
    build_reference_deepr50,
    import_reference_eval,
    reference_env,
)

OVERLAP = 1.0 / 3.0
MEAN_STD = ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])


@pytest.fixture(scope="module")
def ref_eval():
    mod = import_reference_eval(["--snapshot", "unused"])
    # eval.py reads protocol knobs from module-global `args` (its own main()
    # relies on the same); point dataset_cls at the class-count the tests use.
    mod.args.sliding_overlap = OVERLAP
    mod.args.no_flip = False
    mod.args.faster = True  # batched tiles; identical math to the crop loop
    mod.args.dataset_cls = types.SimpleNamespace(num_classes=NUM_CLASSES)
    return mod


def _ref_sliding(ref_eval, net, img_u8: np.ndarray, crop: int, scales):
    """Run the real inference_sliding; returns (H, W, C) mean-over-scales."""
    ref_eval.args.crop_size = crop
    with reference_env(), torch.no_grad():
        preds = ref_eval.inference_sliding(
            net, Image.fromarray(img_u8), list(scales))
    return np.mean(preds, axis=0).transpose(1, 2, 0)


# ---------------------------------------------------------------------------
# 1. grid geometry + crop extraction vs the reference's cropping code
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("h,w,crop,scale", [
    (96, 160, 64, 1.0),    # landscape, overlapping grid w/ edge back-shift
    (160, 96, 64, 1.0),    # portrait (the x1-underflow clamp, eval.py:179)
    (48, 80, 64, 1.0),     # image smaller than tile in H -> truncation
    (40, 48, 64, 1.0),     # smaller than tile in both dims
    (96, 160, 64, 0.5),    # scale < 1 clamps the TILE size (eval.py:154)
    (192, 320, 64, 2.0),   # scale 2: tile doubles (caller pre-scales image)
    (100, 225, 64, 1.0),   # non-divisible geometry
])
def test_grid_and_crops_match_reference(ref_eval, h, w, crop, scale):
    ref_eval.args.crop_size = crop
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, h, w)).astype(np.float32)
    with reference_env():
        mapping, crops = ref_eval.sliding_window_cropping(
            [torch.from_numpy(img)], scale=scale)

    grid = compute_grid(h, w, crop, scale, OVERLAP)
    ref_w, ref_h, coords = mapping[0]
    assert (ref_w, ref_h) == (w, h)
    assert len(coords) == grid.num_tiles
    for (x1, y1, x2, y2), (gy, gx) in zip(coords, grid.coords):
        assert (y1, x1) == (gy, gx), (coords, grid.coords)
        assert (y2 - y1, x2 - x1) == (grid.tile_h, grid.tile_w)

    ours = np.asarray(
        extract_tiles(jnp.asarray(img.transpose(1, 2, 0)), grid))
    theirs = crops.numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(ours, theirs)


# ---------------------------------------------------------------------------
# 2. full sliding chain, shared tiny conv model (isolates the PROTOCOL)
# ---------------------------------------------------------------------------
class _TorchConvNet(nn.Module):
    """3x3 conv 'segmenter': spatial extent makes the merged output depend
    on exact tile boundaries, so any grid/merge coordinate error is loud."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(42)
        self.conv = nn.Conv2d(3, NUM_CLASSES, 3, padding=1)

    def forward(self, x):
        return [self.conv(x)]


@pytest.fixture(scope="module")
def conv_pair():
    net = _TorchConvNet().eval()
    wj = jnp.asarray(net.conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    bj = jnp.asarray(net.conv.bias.detach().numpy())

    def apply_fn(tiles):
        out = jax.lax.conv_general_dilated(
            tiles, wj, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return out + bj

    return net, apply_fn


def test_sliding_protocol_exact_scale1(ref_eval, conv_pair):
    """scales=(1.0,): no image resampling anywhere in the chain, so the
    reference and the rebuild must agree to float roundoff."""
    net, apply_fn = conv_pair
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
    ref = _ref_sliding(ref_eval, net, img, crop=64, scales=(1.0,))
    ev = SlidingEvaluator(apply_fn, crop_size=64, overlap=OVERLAP,
                          scales=(1.0,), flip=True)
    ours = np.asarray(ev.predict_logits(img))
    assert np.abs(ours - ref).max() < 1e-4


def test_sliding_protocol_multiscale(ref_eval, conv_pair):
    """Full 0.5/1.0/2.0 + flip chain.  The only tolerated divergence is the
    PIL image-resize uint8 quantization (<=1.25/255 per input pixel, see
    test_ops.py::test_pil_bilinear_matches_pil); the merge/resize-back/mean
    arithmetic itself must line up."""
    net, apply_fn = conv_pair
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
    scales = (0.5, 1.0, 2.0)
    ref = _ref_sliding(ref_eval, net, img, crop=64, scales=scales)
    ev = SlidingEvaluator(apply_fn, crop_size=64, overlap=OVERLAP,
                          scales=scales, flip=True)
    ours = np.asarray(ev.predict_logits(img))
    diff = np.abs(ours - ref)
    assert diff.max() < 0.05, diff.max()
    assert diff.mean() < 5e-3, diff.mean()
    agree = (ours.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.995, agree


# ---------------------------------------------------------------------------
# 3. + 4. full chains with the REAL reference model on converted weights
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def real_pair():
    net = build_reference_deepr50(memory=True)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(
        sd, memory=net.memory.m_items.numpy())
    real_skips = [s for s in report.skipped
                  if not s.endswith("num_batches_tracked")]
    assert not real_skips, real_skips

    mc = ModelConfig(arch="DeepR50V3PlusD", memory=MemoryConfig(enabled=True))
    model = build_model(mc)
    xin = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, xin, jnp.zeros((1, 64, 64), jnp.int32),
            jnp.asarray(m_items), train=False, with_aux=True,
            memory_writing=True, rng=jax.random.PRNGKey(1),
        )
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)
    mem = jnp.asarray(m_items)

    def apply_fn(tiles):
        out = model.apply(variables, tiles, None, mem,
                          train=False, with_aux=False)
        return out["main_out"]

    return net, apply_fn


def test_sliding_protocol_real_model(ref_eval, real_pair):
    """inference_sliding (real eval.py) vs SlidingEvaluator, real
    DeepR50V3PlusD + memory read, 0.5/1.0/2.0 + flip, converted weights."""
    net, apply_fn = real_pair
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
    scales = (0.5, 1.0, 2.0)
    ref = _ref_sliding(ref_eval, net, img, crop=64, scales=scales)
    ev = SlidingEvaluator(apply_fn, crop_size=64, overlap=OVERLAP,
                          scales=scales, flip=True)
    ours = np.asarray(ev.predict_logits(img))
    diff = np.abs(ours - ref)
    assert diff.max() < 0.05, diff.max()
    agree = (ours.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.99, agree


def _eval_get_item_pyramid(img_pil, scales, flip: bool):
    """The reference pooling input pyramid (datasets/cityscapes.py:250-264):
    flip, then `img.resize(...)` with PIL's DEFAULT resample (BICUBIC), then
    ToTensor + Normalize; batch dim added as the DataLoader's collate does."""
    from torchvision import transforms as tvt  # the faithful harness stub

    out = []
    for f in range(int(flip) + 1):
        if f:
            img_pil = img_pil.transpose(Image.FLIP_LEFT_RIGHT)
        per_scale = []
        for s in scales:
            w, h = img_pil.size
            resized = img_pil.resize((int(w * s), int(h * s)))
            t = tvt.Normalize(*MEAN_STD)(tvt.ToTensor()(resized))
            per_scale.append(t.unsqueeze(0))
        out.append(per_scale)
    return out


def test_pooling_protocol_real_model(ref_eval, real_pair):
    """inference_pool + MeanFusion (real eval.py) vs PoolingEvaluator."""
    net, apply_fn = real_pair
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
    scales = (0.5, 1.0, 2.0)

    ref_eval.args.no_flip = False
    pyramid = _eval_get_item_pyramid(Image.fromarray(img), scales, flip=True)
    with reference_env(), torch.no_grad():
        pred = ref_eval.inference_pool(net, pyramid, list(scales))
    ref_pred = np.concatenate(pred, axis=0)  # eval.py:644 (batch of 1)

    ev = PoolingEvaluator(apply_fn, scales=scales, flip=True)
    ours_probs = np.asarray(ev.predict_probs(img))
    ours_pred = ours_probs.argmax(-1)
    agree = (ours_pred == ref_pred).mean()
    assert agree > 0.995, agree
