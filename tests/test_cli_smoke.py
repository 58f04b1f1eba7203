"""End-to-end CLI smoke tests: the two entry points users actually run.

Everything below runs the REAL ``main()`` functions (argparse included) on
synthetic data -- the same invocations the README documents -- so a refactor
that breaks the CLI wiring (flag plumbing, Trainer.run choreography,
checkpoint writing, eval dump files) fails the suite even when every unit
test stays green.  Reference counterparts: train.py ``main()`` (argparse at
module level + MemoryMetaFrameWork) and eval.py ``main()``/``RunEval.inf``.
"""

from __future__ import annotations

import glob
import json
import math
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    """README smoke recipe: null_loader x2 domains, memory + MLDG,
    test_mode.  Covers memory init, the jitted MLDG episode under the
    8-device GSPMD mesh, validation, and the last-checkpoint write."""
    from pinthememory_tpu.train import cli as train_cli

    ckpt = tmp_path / "ckpt"
    train_cli.main([
        "--dataset", "null_loader", "null_loader",
        "--val_dataset", "null_loader",
        "--covstat_val_dataset", "null_loader",
        "--arch", "DeepR18V3PlusD", "--memory", "--mldg", "--test_mode",
        "--crop_size", "64", "--bs_mult", "1", "--bs_mult_val", "1",
        "--num_workers", "1", "--max_iter", "40",
        "--ckpt", str(ckpt), "--tb_path", str(tmp_path / "tb"),
        "--exp", "smoke",
    ])

    # last_* checkpoint written by Trainer.run
    snaps = glob.glob(str(ckpt / "**" / "last_*"), recursive=True)
    snaps = [s for s in snaps if not s.endswith(".json")]
    assert snaps, f"no last_* checkpoint under {ckpt}"

    # scalars.jsonl carries train losses and a finite validation mIoU
    scalar_files = glob.glob(str(ckpt / "**" / "scalars.jsonl"), recursive=True)
    assert scalar_files
    rows = [json.loads(l)
            for f in scalar_files
            for l in Path(f).read_text().splitlines()]
    assert rows, "no scalars logged"
    miou = [v for r in rows for k, v in r.items() if k.endswith("mean_iu")]
    losses = [r for r in rows if any("loss" in str(k) for k in r)]
    assert losses, f"no loss scalars in {rows[:3]}"
    assert miou, f"no val mean_iu scalar in {rows[:3]}"
    assert all(math.isfinite(v) for v in miou), miou

    # the checkpoint restores into the eval CLI (native msgpack path)
    from pinthememory_tpu.evalx import cli as eval_cli

    vf = tmp_path / "frames"
    vf.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, size=(56, 96, 3), dtype=np.uint8)
        ).save(vf / f"f{i}.png")

    results = tmp_path / "eval_out"
    eval_cli.main([
        "--video_folder", str(vf), "--arch", "DeepR18V3PlusD", "--memory",
        "--snapshot", snaps[0],
        "--crop_size", "64", "--scales", "1.0", "--no_flip",
        "--eval_batch", "1", "--results_dir", str(results),
    ])
    preds = sorted(glob.glob(str(results / "*_pred.png")))
    composes = sorted(glob.glob(str(results / "*_compose.png")))
    assert len(preds) == 2 and len(composes) == 2, os.listdir(results)
    # dumps are valid images of the input size with trainId-palette colors
    im = np.asarray(Image.open(preds[0]))
    assert im.shape == (56, 96, 3)


@pytest.mark.slow
def test_eval_cli_pooling_no_snapshot(tmp_path):
    """Pooling mode + random init + flip: the no-checkpoint qualitative path
    (reference eval.py runs the same way when --snapshot restore is skipped)."""
    from pinthememory_tpu.evalx import cli as eval_cli

    vf = tmp_path / "frames"
    vf.mkdir()
    Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (48, 64, 3), dtype=np.uint8)
    ).save(vf / "a.png")

    results = tmp_path / "pool_out"
    eval_cli.main([
        "--video_folder", str(vf), "--arch", "DeepR18V3PlusD",
        "--inference_mode", "pooling", "--scales", "0.5,1.0",
        "--crop_size", "64", "--eval_batch", "1",
        "--results_dir", str(results),
    ])
    assert glob.glob(str(results / "*_pred.png"))
