"""ISW/whitening recipe end-to-end through the Trainer.

The round-3 suite gated every ISW piece in isolation (covstat math,
kmeans1d mask selection, whitening loss values) but never ran the
robustnet recipe shape -- covstat trigger -> kmeans mask selection ->
masked wt loss entering the optimized total -> checkpoint -- as one
assembled run.  Reference counterpart: train.py:163-183 (trigger + mask
refresh), train.py:941-974 (validate_for_cov_stat),
network/cov_settings.py:52-89.
"""

from __future__ import annotations

import glob
import json
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_isw_recipe_end_to_end(tmp_path, monkeypatch):
    from pinthememory_tpu.data.datasets import ShapesLoader
    from pinthememory_tpu.data.loader import DomainUniformConcatDataset
    from pinthememory_tpu.models.cov import CovMatrixISW
    from pinthememory_tpu.train import cli as train_cli

    # short epochs so the run crosses cov_stat_epoch: the wt loss is gated
    # OFF until epoch > cov_stat_epoch (train.py apply_wtloss; the rebuild's
    # do_epoch mirrors it), so the recipe only optimizes it from epoch 1 on
    monkeypatch.setattr(DomainUniformConcatDataset, "EPOCH_LEN", 64)
    monkeypatch.setattr(ShapesLoader, "DEFAULT_LENGTH", 64)

    # the robustnet ISW recipe shape (train_r50os16_gtav_isw.sh):
    # --wt_layer 0 0 2 2 2 0 0, aggregation episode, covstat at epoch 0
    args = train_cli.build_parser().parse_args([
        "--dataset", "shapes_loader", "shapes_loader",
        "--val_dataset", "shapes_loader",
        "--covstat_val_dataset", "shapes_loader",
        "--arch", "DeepR18V3PlusD",
        "--wt_layer", "0", "0", "2", "2", "2", "0", "0",
        "--wt_reg_weight", "0.6", "--relax_denom", "0.0",
        "--clusters", "3", "--cov_stat_epoch", "0", "--trials", "1",
        "--crop_size", "64", "--bs_mult", "1",
        "--bs_mult_val", "1", "--num_workers", "1", "--max_iter", "20",
        "--ckpt", str(tmp_path / "ckpt"), "--tb_path", str(tmp_path / "tb"),
        "--exp", "isw",
    ])
    cfg = train_cli.config_from_args(args)
    assert cfg.model.whitening.use_isw and cfg.model.whitening.use_wtloss
    trainer = train_cli.Trainer(cfg)
    trainer.run()
    assert trainer.epoch >= 2, trainer.epoch  # crossed the covstat epoch

    # covstat ran at the trigger epoch and kmeans selected a non-trivial
    # sensitive-entry mask on every ISW layer
    isw_layers = [l for l in trainer.cov_layers if isinstance(l, CovMatrixISW)]
    assert len(isw_layers) == 3  # wt_layer codes 2,2,2
    for layer in isw_layers:
        assert layer.mask_matrix is not None, "covstat never set masks"
        n_sens = float(layer.num_sensitive)
        assert 0 < n_sens < layer.num_off_diagonal, (
            n_sens, layer.num_off_diagonal)

    # the masked wt loss on the final state is nonzero-finite and enters
    # the optimized total at wt_reg_weight exactly (the post-covstat
    # epochs ran with apply_wtloss=True)
    rngb = np.random.default_rng(5)
    b = max(8, jax.device_count())  # divisible by the GSPMD data axis
    batch = {
        "image": rngb.standard_normal((b, 2, 64, 64, 3)).astype(np.float32),
        "gts": rngb.integers(0, 5, (b, 2, 64, 64)).astype(np.int32),
        "aux_gts": rngb.integers(0, 5, (b, 2, 64, 64)).astype(np.int32),
    }
    _, metrics = trainer.step_agg(
        trainer.state, batch, jax.random.PRNGKey(0), trainer._wt_masks(),
        True, False)
    wt = float(metrics["wt"])
    assert math.isfinite(wt) and wt > 0, wt
    expect = (float(metrics["main"]) + 0.4 * float(metrics["aux"]) + 0.6 * wt)
    np.testing.assert_allclose(float(metrics["total"]), expect, rtol=1e-5)

    # validation scalars were written and are finite
    rows = [json.loads(l)
            for f in glob.glob(str(tmp_path / "ckpt" / "**" / "scalars.jsonl"),
                               recursive=True)
            for l in Path(f).read_text().splitlines()]
    miou = [v for r in rows for k, v in r.items() if k.endswith("mean_iu")]
    assert miou and all(math.isfinite(v) for v in miou), rows[:3]

    # checkpoint round-trips
    snaps = [s for s in glob.glob(str(tmp_path / "ckpt" / "**" / "last_*"),
                                  recursive=True) if not s.endswith(".json")]
    assert snaps
    from pinthememory_tpu.utils.checkpoint import load_state

    loaded, meta = load_state(snaps[0], trainer.state)
    np.testing.assert_array_equal(
        np.asarray(loaded.params["backbone"]["conv1"]["kernel"]),
        np.asarray(trainer.state.params["backbone"]["conv1"]["kernel"]))
