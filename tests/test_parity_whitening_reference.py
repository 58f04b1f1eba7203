"""Whitening-family parity against the ACTUAL reference code.

Covers the RobustNet machinery end-to-end with the real reference modules as
the oracle (previously gated only by restated torch goldens in
test_whitening.py):

  1. the ISW covstat pass — the real ``DeepR50V3PlusD`` forward with
     ``cal_covstat=True`` (deepv3plus.py:489,542-553) accumulating
     variance-of-covariance into the real ``CovMatrix_ISW``
     (cov_settings.py:16-89), then ``set_mask_matrix`` with k-means
     sensitive-entry selection AND cross-round mask intersection — vs the
     rebuild's ``make_covstat_step`` + ``CovMatrixISW`` on converted weights;
  2. the in-forward whitening loss (deepv3plus.py:580-587 +
     instance_whitening.py:19-39) for both the ISW-masked and the IRW
     all-off-diagonal variants, value-compared in train mode;
  3. the 1-D k-means itself: the reference's ``kmeans1d`` pip package is
     absent, so BOTH sides run the rebuild's exact DP
     (pinthememory_tpu.native.kmeans1d_cluster) — legitimate only because
     that DP is independently pinned here against a brute-force
     enumerate-all-contiguous-partitions oracle (1-D k-means optima are
     contiguous in sorted order).
"""

import itertools
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pinthememory_tpu.core.config import (
    Config,
    MemoryConfig,
    ModelConfig,
    TrainConfig,
    WhiteningConfig,
)
from pinthememory_tpu.models import build_model
from pinthememory_tpu.models.cov import IN_CHANNEL_LIST, build_cov_layers
from pinthememory_tpu.native import kmeans1d_cluster
from pinthememory_tpu.tools.convert_torch import (
    convert_state_dict,
    merge_into_variables,
)
from pinthememory_tpu.train.loops import make_covstat_step, whitening_loss_from_taps
from pinthememory_tpu.train.losses import assemble_losses

from ref_harness import (
    NUM_CLASSES,
    build_reference_model,
    import_reference_module,
    reference_env,
)

ISW_WT = (0, 0, 2, 2, 0, 0, 0)   # stem conv3 (dim 64) + layer1 (dim 256)
IRW_WT = (0, 0, 1, 1, 0, 0, 0)


# ---------------------------------------------------------------------------
# 0. the shared k-means is exact: brute-force oracle on tiny inputs
# ---------------------------------------------------------------------------
def _brute_force_kmeans1d(values: np.ndarray, k: int):
    """Enumerate every split of the sorted values into k contiguous groups
    (optimal 1-D k-means clusters are contiguous intervals in sorted order)
    and return the minimum-SSE assignment/centroids."""
    order = np.argsort(values, kind="stable")
    x = values[order]
    n = x.size
    best_cost, best_bounds = np.inf, None
    for cuts in itertools.combinations(range(1, n), k - 1):
        bounds = (0,) + cuts + (n,)
        cost = 0.0
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            seg = x[lo:hi]
            cost += float(((seg - seg.mean()) ** 2).sum())
        if cost < best_cost - 1e-12:
            best_cost, best_bounds = cost, bounds
    assign_sorted = np.empty(n, np.int64)
    centroids = []
    for ci, (lo, hi) in enumerate(zip(best_bounds[:-1], best_bounds[1:])):
        assign_sorted[lo:hi] = ci
        centroids.append(float(x[lo:hi].mean()))
    assign = np.empty(n, np.int64)
    assign[order] = assign_sorted
    return assign, np.asarray(centroids), best_cost


@pytest.mark.parametrize("seed,n,k", [(0, 14, 3), (1, 12, 4), (2, 16, 2)])
def test_native_kmeans_matches_brute_force(seed, n, k):
    rng = np.random.default_rng(seed)
    values = rng.standard_normal(n)
    assign, centroids = kmeans1d_cluster(values, k)
    bf_assign, bf_centroids, bf_cost = _brute_force_kmeans1d(values, k)
    # compare by SSE (ties between equal-cost partitions are acceptable)
    cost = sum(
        float(((values[assign == c] - centroids[c]) ** 2).sum())
        for c in range(k)
    )
    assert abs(cost - bf_cost) < 1e-9, (cost, bf_cost)
    np.testing.assert_array_equal(assign, bf_assign)
    np.testing.assert_allclose(centroids, bf_centroids, atol=1e-12)


# ---------------------------------------------------------------------------
# harness bits
# ---------------------------------------------------------------------------
def _kmeans_stub(var_flatten, k):
    """Adapter installed as ``kmeans1d.cluster`` for the REAL cov_settings
    path: exact DP, returning a python list so ``clusters.count(0)``
    (cov_settings.py:58) works."""
    values = np.asarray(var_flatten.detach().cpu().numpy(), np.float64)
    assign, centroids = kmeans1d_cluster(values, k)
    return list(assign), list(np.asarray(centroids))


@pytest.fixture()
def real_kmeans():
    """Swap the placeholder kmeans1d stub for the exact DP while a test
    drives the real cov_settings.set_mask_matrix."""
    import ref_harness

    ref_harness.install_stub_modules()
    mod = sys.modules["kmeans1d"]
    orig = mod.cluster
    mod.cluster = _kmeans_stub
    try:
        yield
    finally:
        mod.cluster = orig


def _build_nets(wt_layer):
    """(real reference net, rebuild model+variables) with converted weights.

    Train-mode forwards need criteria: use the real loss.py ones
    (loss.py:14-43,71-88), standard CE flags.
    """
    ref_loss = import_reference_module("loss")
    import types

    largs = types.SimpleNamespace(
        img_wt_loss=False, jointwtborder=False, cls_wt_loss=False,
        batch_weighting=False, dataset=["gtav"], strict_bdr_cls="",
        rlx_off_iter=-1,
    )
    with reference_env():
        criterion, _ = ref_loss.get_loss(largs)
        criterion_aux = ref_loss.get_loss_aux(largs)
    net = build_reference_model(
        "DeepR50V3PlusD", memory=False, criterion=criterion,
        criterion_aux=criterion_aux, wt_layer=wt_layer, use_wtloss=True)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, stats, _m, report = convert_state_dict(sd)
    real_skips = [s for s in report.skipped
                  if not s.endswith("num_batches_tracked")]
    assert not real_skips, f"converter skipped: {real_skips}"

    cfg = Config(
        model=ModelConfig(
            arch="DeepR50V3PlusD",
            memory=MemoryConfig(enabled=False),
            whitening=WhiteningConfig(wt_layer=wt_layer, wt_reg_weight=0.6),
        ),
        train=TrainConfig(),
    )
    model = build_model(cfg.model)
    xin = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k}, xin, jnp.zeros((2, 64, 64), jnp.int32), None,
            train=False, with_aux=True)
    )(jax.random.PRNGKey(0))
    variables = merge_into_variables(variables, params, stats)
    return net, cfg, model, variables


def _covstat_batches(num_rounds=2, batches_per_round=2, b=2, hw=64):
    rng = np.random.default_rng(11)
    rounds = []
    for _ in range(num_rounds):
        rounds.append([
            (rng.standard_normal((b, 3, hw, hw)).astype(np.float32),
             rng.standard_normal((b, 3, hw, hw)).astype(np.float32))
            for _ in range(batches_per_round)
        ])
    return rounds


# ---------------------------------------------------------------------------
# 1. ISW covstat pass + mask selection + cross-round intersection
# ---------------------------------------------------------------------------
def test_isw_covstat_mask_parity(real_kmeans):
    net, cfg, model, variables = _build_nets(ISW_WT)
    net.eval()
    rounds = _covstat_batches()

    # rebuild side state
    layers = build_cov_layers(
        ISW_WT, IN_CHANNEL_LIST["resnet-50"],
        cfg.model.whitening.relax_denom, cfg.model.whitening.clusters)
    covstat_step = make_covstat_step(model)

    for rnd in rounds:
        for aug, orig in rnd:
            with reference_env(), torch.no_grad():
                net([torch.from_numpy(aug), torch.from_numpy(orig)],
                    cal_covstat=True)
            vs = covstat_step(
                variables, None,
                jnp.asarray(np.transpose(aug, (0, 2, 3, 1))),
                jnp.asarray(np.transpose(orig, (0, 2, 3, 1))))
            assert len(vs) == len(layers) == len(net.cov_matrix_layer)
            for layer, v in zip(layers, vs):
                layer.set_variance_of_covariance(np.asarray(v))
        # accumulated variance-of-covariance parity BEFORE the k-means
        # (deepv3plus.py:552 torch.var is unbiased; ddof=1 on our side)
        for ref_l, our_l in zip(net.cov_matrix_layer, layers):
            np.testing.assert_allclose(
                our_l.var_matrix, ref_l.var_matrix.numpy(),
                rtol=2e-3, atol=1e-5)
        with reference_env():
            net.set_mask_matrix()          # deepv3plus.py:475-477
        for layer in layers:
            layer.set_mask_matrix()

    # final masks (after 2 rounds of intersection, cov_settings.py:69-76)
    for i, (ref_l, our_l) in enumerate(zip(net.cov_matrix_layer, layers)):
        ref_mask = ref_l.mask_matrix.numpy()
        np.testing.assert_array_equal(
            our_l.mask_matrix, ref_mask, err_msg=f"layer {i} mask")
        assert float(our_l.num_sensitive) == float(ref_l.num_sensitive)
        assert ref_mask.sum() > 0          # masks must be non-trivial


# ---------------------------------------------------------------------------
# 2. in-forward whitening loss values, train mode
# ---------------------------------------------------------------------------
def _train_mode_losses(net, cfg, model, variables, wt_masks):
    rng = np.random.default_rng(21)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    gts = rng.integers(0, NUM_CLASSES, (2, 64, 64)).astype(np.int64)
    gts[rng.random((2, 64, 64)) < 0.1] = 255

    net.train()
    net.dsn[3].eval()  # Dropout2d off for determinism
    with reference_env(), torch.no_grad():
        outputs = net(torch.from_numpy(x), gts=torch.from_numpy(gts),
                      aux_gts=torch.from_numpy(gts))
    # train branch, use_wtloss, no memory: [loss1, loss2, wt_loss,
    # inter_feature] (deepv3plus.py:597-615)
    ref_main, ref_aux, ref_wt = (outputs[0].item(), outputs[1].item(),
                                 outputs[2].item())

    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    gj = jnp.asarray(gts.astype(np.int32))
    out, _ = model.apply(variables, xin, gj, None, train=True, with_aux=True,
                         mutable=["batch_stats"])
    wt = whitening_loss_from_taps(out["taps"], wt_masks)
    bundle = assemble_losses(cfg, out, gj, gj, wt_loss=wt)
    return (ref_main, ref_aux, ref_wt,
            float(bundle.main), float(bundle.aux), float(bundle.wt))


def test_isw_wt_loss_value_parity(real_kmeans):
    net, cfg, model, variables = _build_nets(ISW_WT)
    net.eval()
    # one covstat round so ISW masks exist on both sides
    layers = build_cov_layers(
        ISW_WT, IN_CHANNEL_LIST["resnet-50"],
        cfg.model.whitening.relax_denom, cfg.model.whitening.clusters)
    covstat_step = make_covstat_step(model)
    (aug, orig), = _covstat_batches(num_rounds=1, batches_per_round=1)[0]
    with reference_env(), torch.no_grad():
        net([torch.from_numpy(aug), torch.from_numpy(orig)],
            cal_covstat=True)
    for layer, v in zip(layers, covstat_step(
            variables, None, jnp.asarray(np.transpose(aug, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(orig, (0, 2, 3, 1))))):
        layer.set_variance_of_covariance(np.asarray(v))
    with reference_env():
        net.set_mask_matrix()
    wt_masks = []
    for layer in layers:
        layer.set_mask_matrix()
        wt_masks.append(layer.get_mask_matrix())

    ref_main, ref_aux, ref_wt, main, aux, wt = _train_mode_losses(
        net, cfg, model, variables, wt_masks)
    assert abs(wt - ref_wt) < 1e-3, (wt, ref_wt)
    assert abs(main - ref_main) < 1e-3
    assert abs(aux - ref_aux) < 1e-3
    assert ref_wt > 0          # the masked penalty must be live


def test_irw_wt_loss_value_parity():
    net, cfg, model, variables = _build_nets(IRW_WT)
    layers = build_cov_layers(
        IRW_WT, IN_CHANNEL_LIST["resnet-50"],
        cfg.model.whitening.relax_denom, cfg.model.whitening.clusters)
    wt_masks = [layer.get_mask_matrix() for layer in layers]

    ref_main, ref_aux, ref_wt, main, aux, wt = _train_mode_losses(
        net, cfg, model, variables, wt_masks)
    assert abs(wt - ref_wt) < 1e-3, (wt, ref_wt)
    assert abs(main - ref_main) < 1e-3
    assert abs(aux - ref_aux) < 1e-3
    assert ref_wt > 0
