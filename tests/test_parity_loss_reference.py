"""Train-mode LOSS-VALUE parity against the ACTUAL reference code (VERDICT
r2 #2).

`tests/test_losses.py` gates the rebuild's criteria against torch twins
restated inside the test file; a transcription error there would pass.  This
file imports the real `/root/reference/loss.py` criteria and the real
`DeepR50V3PlusD` train-mode forward (deepv3plus.py:577-615, memory write at
network/memory.py:206-253) and asserts the rebuild's LOSS VALUES match on
converted weights:

  1. criterion level: nn.CrossEntropyLoss via loss.get_loss/get_loss_aux
     (default + --cls_wt_loss), ImageBasedCrossEntropyLoss2d
     (--img_wt_loss), ImgWtLossSoftNLL (--jointwtborder) vs the rebuild's
     cross_entropy_2d / image_weighted_cross_entropy / img_wt_soft_nll;
  2. model level: real train-mode forward with memory_writing=True ->
     [main, aux, mem_output, writeloss, readloss, inter] vs the rebuild's
     `model.apply(train=True)` + `assemble_losses`, including the
     calculate_loss total (train.py:213-244: main + 0.4*aux + 0.02*read +
     0.4*div + 0.2*cls -- the flagship pinmem flag set).

Only torch's Dropout2d in the aux head is switched to eval mode on the
oracle (net.dsn[3].eval()) to make the comparison deterministic; the rebuild
side correspondingly runs with rng=None (its dropout gate).
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import Config, MemoryConfig, ModelConfig, TrainConfig
from pinthememory_tpu.data.transforms import relaxed_boundary_multihot
from pinthememory_tpu.models import build_model
from pinthememory_tpu.tools.convert_torch import (
    convert_state_dict,
    merge_into_variables,
)
from pinthememory_tpu.train.losses import (
    assemble_losses,
    cross_entropy_2d,
    CLASS_WEIGHTS_19,
    image_weighted_cross_entropy,
    img_wt_soft_nll,
)

from ref_harness import (
    NUM_CLASSES,
    build_reference_deepr50,
    import_reference_module,
    numpy_normed_shim,
    reference_env,
)


def _loss_args(**kw):
    base = dict(cls_wt_loss=False, img_wt_loss=False, jointwtborder=False,
                wt_bound=1.0, strict_bdr_cls="", rlx_off_iter=-1)
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope="module")
def ref_loss():
    return import_reference_module("loss")


def _rand_batch(seed, b=2, h=24, w=32, ignore_frac=0.1):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, NUM_CLASSES, h, w)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, (b, h, w)).astype(np.int64)
    labels[rng.random((b, h, w)) < ignore_frac] = 255
    return logits, labels


# ---------------------------------------------------------------------------
# 1. criterion-level parity against the real loss.py
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("cls_wt", [False, True])
def test_standard_ce_criterion_parity(ref_loss, cls_wt):
    """loss.get_loss (default flags) / get_loss_aux vs cross_entropy_2d."""
    with reference_env():
        crit, crit_val = ref_loss.get_loss(_loss_args(cls_wt_loss=cls_wt))
        crit_aux = ref_loss.get_loss_aux(_loss_args(cls_wt_loss=cls_wt))
    logits, labels = _rand_batch(0)
    with torch.no_grad():
        ref = crit(torch.from_numpy(logits), torch.from_numpy(labels)).item()
        ref_aux = crit_aux(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()
        ref_val = crit_val(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()

    lj = jnp.asarray(logits.transpose(0, 2, 3, 1))
    gj = jnp.asarray(labels)
    w = CLASS_WEIGHTS_19 if cls_wt else None
    ours = float(cross_entropy_2d(lj, gj, class_weights=w))
    assert abs(ours - ref) < 1e-5, (ours, ref)
    assert abs(ours - ref_aux) < 1e-5  # same criterion (loss.py:72-88)
    ours_val = float(cross_entropy_2d(lj, gj))
    assert abs(ours_val - ref_val) < 1e-5


def test_img_wt_loss_criterion_parity(ref_loss):
    """Real ImageBasedCrossEntropyLoss2d (loss.py:120-163) vs
    image_weighted_cross_entropy (per-image histogram weights, summed)."""
    with reference_env():
        crit = ref_loss.ImageBasedCrossEntropyLoss2d(
            classes=NUM_CLASSES, ignore_index=255, upper_bound=1.0)
    logits, labels = _rand_batch(1)
    # calculate_weights .cuda()s the per-image weights inside forward
    # (loss.py:158-160) -> keep the cuda-identity patch active for the call
    with reference_env(), torch.no_grad(), numpy_normed_shim():
        ref = crit(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    ours = float(image_weighted_cross_entropy(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels),
        num_classes=NUM_CLASSES, upper_bound=1.0))
    assert abs(ours - ref) < 1e-4, (ours, ref)


def test_soft_nll_criterion_parity(ref_loss):
    """Real ImgWtLossSoftNLL (loss.py:195-263) vs img_wt_soft_nll on the
    rebuild's relaxed multi-hot targets (per-image normalization)."""
    rng = np.random.default_rng(2)
    b, h, w = 2, 24, 32
    logits = rng.standard_normal((b, NUM_CLASSES, h, w)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, (b, h, w)).astype(np.int64)
    labels[rng.random((b, h, w)) < 0.15] = 255
    # different per-image ignore counts exercise the per-image denominator
    labels[1, :8] = 255
    multihot = np.stack(
        [relaxed_boundary_multihot(l, NUM_CLASSES, border=1) for l in labels])

    with reference_env():
        crit = ref_loss.ImgWtLossSoftNLL(
            classes=NUM_CLASSES, ignore_index=255, upper_bound=1.0)
    # reference target layout: (B, C+1, H, W)
    t_torch = torch.from_numpy(multihot.transpose(0, 3, 1, 2))
    with reference_env(), torch.no_grad():
        ref = crit(torch.from_numpy(logits), t_torch).item()
    ours = float(img_wt_soft_nll(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(multihot),
        upper_bound=1.0))
    assert abs(ours - ref) < 1e-4, (ours, ref)


# ---------------------------------------------------------------------------
# 2. model-level train-mode loss values on converted weights
# ---------------------------------------------------------------------------
def test_train_mode_loss_values_real_model(ref_loss):
    with reference_env():
        args = _loss_args()
        criterion, _ = ref_loss.get_loss(args)
        criterion_aux = ref_loss.get_loss_aux(args)
    net = build_reference_deepr50(
        memory=True, criterion=criterion, criterion_aux=criterion_aux)

    # convert BEFORE the train-mode forward: the reference forward mutates
    # BN running stats and m_items in place (network/memory.py:251-253)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, m_items, report = convert_state_dict(
        sd, memory=net.memory.m_items.numpy())
    assert not [s for s in report.skipped
                if not s.endswith("num_batches_tracked")]

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    gts = rng.integers(0, NUM_CLASSES, (2, 64, 64)).astype(np.int64)
    gts[rng.random((2, 64, 64)) < 0.1] = 255

    net.train()
    net.dsn[3].eval()  # Dropout2d off for determinism (see module docstring)
    with reference_env(), torch.no_grad():
        outputs = net(torch.from_numpy(x), gts=torch.from_numpy(gts),
                      aux_gts=torch.from_numpy(gts), memory_writing=True)
    # train branch returns [loss1, loss2, mem_output, writeloss, readloss,
    # inter_feature] for memory=True, use_wtloss=False (deepv3plus.py:577-615)
    ref_main = outputs[0].item()
    ref_aux = outputs[1].item()
    ref_read = outputs[-2].item()
    ref_div = outputs[-3][0].item()
    ref_cls = outputs[-3][1].item()
    # calculate_loss weighting, flagship flags (train.py:213-244 +
    # pinmem_train_scripts/train_GSI_pinmem_DR50V3P.sh)
    ref_total = (ref_main + 0.4 * ref_aux
                 + 0.02 * ref_read + 0.4 * ref_div + 0.2 * ref_cls)

    cfg = Config(
        model=ModelConfig(
            arch="DeepR50V3PlusD",
            # gumbel off: matches the oracle net (built with gumbel_off=True
            # in ref_harness) and keeps the train-mode read deterministic
            memory=MemoryConfig(enabled=True, gumbel_read=False)),
        train=TrainConfig(),
    )
    model = build_model(cfg.model)
    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    gj = jnp.asarray(gts.astype(np.int32))
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, xin, gj, jnp.asarray(m_items), train=False,
            with_aux=True, memory_writing=True, rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)

    out, _ = model.apply(
        variables, xin, gj, jnp.asarray(m_items), train=True, with_aux=True,
        memory_writing=True, rng=None, mutable=["batch_stats"])
    bundle = assemble_losses(cfg, out, gj, gj)

    assert abs(float(bundle.main) - ref_main) < 1e-3, (float(bundle.main), ref_main)
    assert abs(float(bundle.aux) - ref_aux) < 1e-3, (float(bundle.aux), ref_aux)
    assert abs(float(bundle.read) - ref_read) < 1e-3
    assert abs(float(bundle.div) - ref_div) < 1e-3
    assert abs(float(bundle.cls) - ref_cls) < 1e-3
    assert abs(float(bundle.total) - ref_total) < 2e-3, (
        float(bundle.total), ref_total)
