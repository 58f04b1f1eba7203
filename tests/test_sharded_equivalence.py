"""Sharded == unsharded numerical equivalence of the TRAIN step.

The reference's DDP contract is that every rank takes the same step with the
same averaged gradient (network/__init__.py:25-33).  The rebuild's
equivalent claim -- GSPMD sharding does not change the step -- is asserted
here numerically: the full memory-MLDG episode runs on one device and on the
8-device CPU mesh (both ``data=8,spatial=1`` and ``data=4,spatial=2``) with
the same batch/rng/state, and the new params, ``m_items``, batch_stats and
loss metrics must agree to reduction-noise tolerance.  The spatial case
exercises conv halo exchange through the whole trunk -- the most error-prone
sharding path.

Measured noise floor (CPU mesh, f32, HW=96-128): params ~1e-5 abs,
stats/m_items ~5e-6, metrics ~2e-6 -- identical for the data and spatial
axes.  Tolerances are ~20x that; real sharding breaks measure O(1e-2..1).

The file also pins the one configuration class where XLA itself breaks:
with only ONE row of a conv's output per spatial shard, the GSPMD backward
of ``conv3x3(s2) -> conv3x3(s1)`` + parallel strided conv (every ResNet
downsampling block) returns gradients wrong by O(1) relative while the
forward stays bit-exact (jax 0.9.0 CPU).  ``validate_spatial_training``
rejects such configs; the repro is kept here so a future XLA that fixes it
is noticed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pinthememory_tpu.core.config import (
    Config,
    MemoryConfig,
    ModelConfig,
    TrainConfig,
)
from pinthememory_tpu.models import build_model
from pinthememory_tpu.models.memory import init_memory
from pinthememory_tpu.parallel.mesh import (
    device_put_batch,
    make_mesh,
    replicate_state,
    validate_spatial_training,
)
from pinthememory_tpu.train.loops import make_train_step_agg, make_train_step_mldg
from pinthememory_tpu.train.state import create_train_state

HW = (128, 128)  # smallest shape validate_spatial_training admits at
                 # spatial=2 (crop >= 64*spatial); HW=96 was MEASURED to
                 # corrupt the sharded step's m_items by 3e-2 (the clean-
                 # write forward inside the fused program -- another tiny-
                 # shape GSPMD corner), while 128/160/192 sit at the ~1e-5
                 # noise floor -- the guard's boundary is empirically right


@functools.lru_cache(maxsize=1)
def _setup():
    cfg = Config(
        model=ModelConfig(arch="DeepR18V3PlusD", memory=MemoryConfig(enabled=True)),
        train=TrainConfig(mldg=True),
    )
    model = build_model(cfg.model)
    m_items = init_memory(jax.random.PRNGKey(1), 19, 256)
    init_fn = jax.jit(functools.partial(
        model.init, train=False, with_aux=True, memory_writing=True))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, *HW, 3), jnp.float32),
        jnp.zeros((1, *HW), jnp.int32), m_items, rng=jax.random.PRNGKey(2))
    state, tx = create_train_state(cfg, variables, m_items)

    rng = np.random.default_rng(0)
    b = 8
    batch = {
        "image": rng.standard_normal((b, 2, *HW, 3)).astype(np.float32),
        "gts": rng.integers(0, 19, (b, 2, *HW)).astype(np.int32),
        "aux_gts": rng.integers(0, 19, (b, 2, *HW)).astype(np.int32),
    }
    return cfg, model, state, tx, batch


@functools.lru_cache(maxsize=1)
def _single_device_step():
    """Reference result: the MLDG episode on ONE device."""
    cfg, model, state, tx, batch = _setup()
    step = make_train_step_mldg(model, cfg, tx)
    d0 = jax.devices()[0]
    batch1 = {k: jax.device_put(v, d0) for k, v in batch.items()}
    state1 = jax.device_put(state, d0)
    new_state, metrics = step(state1, batch1, jax.random.PRNGKey(3),
                              (0,), (1,), jnp.float32(1e-3))
    return jax.device_get((new_state, metrics))


def _max_abs_dev(a, b) -> float:
    fa, _ = jax.tree.flatten(a)
    fb, _ = jax.tree.flatten(b)
    return max(
        float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))))
        for x, y in zip(fa, fb))


@pytest.mark.slow
@pytest.mark.parametrize("spatial", [1, 2], ids=["data8", "data4_spatial2"])
def test_mldg_step_sharded_matches_single_device(spatial):
    cfg, model, state, tx, batch = _setup()
    validate_spatial_training(HW[0], spatial)
    mesh = make_mesh(jax.devices(), spatial=spatial)
    step = make_train_step_mldg(model, cfg, tx)

    bm = device_put_batch(mesh, dict(batch))
    sm = replicate_state(mesh, state)
    new_state, metrics = step(sm, bm, jax.random.PRNGKey(3),
                              (0,), (1,), jnp.float32(1e-3))
    new_state, metrics = jax.device_get((new_state, metrics))
    ref_state, ref_metrics = _single_device_step()

    devs = {
        "params": _max_abs_dev(ref_state.params, new_state.params),
        "batch_stats": _max_abs_dev(ref_state.batch_stats, new_state.batch_stats),
        "m_items": _max_abs_dev(ref_state.m_items, new_state.m_items),
        "metrics": _max_abs_dev(ref_metrics, metrics),
    }
    # ~20x the measured reduction-noise floor; real sharding bugs are O(1e-2+)
    assert devs["params"] < 3e-4, devs
    assert devs["batch_stats"] < 1e-4, devs
    assert devs["m_items"] < 1e-4, devs
    assert devs["metrics"] < 1e-4, devs


@pytest.mark.slow
def test_agg_step_sharded_matches_single_device():
    """The aggregation episode under data x spatial sharding."""
    cfg, model, state, tx, batch = _setup()
    step = make_train_step_agg(model, cfg, tx)
    d0 = jax.devices()[0]
    s1, m1 = jax.device_get(step(
        jax.device_put(state, d0),
        {k: jax.device_put(v, d0) for k, v in batch.items()},
        jax.random.PRNGKey(3)))

    mesh = make_mesh(jax.devices(), spatial=2)
    s2, m2 = jax.device_get(step(
        replicate_state(mesh, state), device_put_batch(mesh, dict(batch)),
        jax.random.PRNGKey(3)))
    assert _max_abs_dev(s1.params, s2.params) < 3e-4
    assert _max_abs_dev(s1.m_items, s2.m_items) < 1e-4
    assert _max_abs_dev(m1, m2) < 1e-4


def test_validate_spatial_training_rejects_one_row_shards():
    with pytest.raises(ValueError, match="rows"):
        validate_spatial_training(64, 2, max_output_stride=32)
    validate_spatial_training(128, 2, max_output_stride=32)   # ok
    validate_spatial_training(768, 8, max_output_stride=32)   # real recipes ok
    validate_spatial_training(64, 1, max_output_stride=32)    # no spatial: ok


def test_xla_one_row_shard_backward_repro():
    """Pin the XLA GSPMD corner validate_spatial_training guards against.

    conv3x3(s2) -> conv3x3(s1), summed with a parallel 1x1 strided conv
    (the ResNet downsample pattern), input H=4 over spatial=2 -> output has
    1 row/device.  Forward is bit-exact; the weight gradient deviates by
    O(1) relative (measured rel=3.0, jax 0.9.0 CPU).  At H=8 (2 rows per
    device) the same program matches to reduction noise.  If this test ever
    FAILS (i.e. XLA fixed the corner), the guard can be relaxed.
    """
    mesh = make_mesh(jax.devices(), spatial=2)
    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")
    wc1 = rng.standard_normal((3, 3, 8, 16)).astype(np.float32) * 0.2
    wc2 = rng.standard_normal((3, 3, 16, 16)).astype(np.float32) * 0.2
    wdn = rng.standard_normal((1, 1, 8, 16)).astype(np.float32) * 0.2

    def loss(ws, x):
        a, b, c = ws
        out = jax.lax.conv_general_dilated(x, a, (2, 2), ((1, 1), (1, 1)),
                                           dimension_numbers=dn)
        out = jax.lax.conv_general_dilated(out, b, (1, 1), ((1, 1), (1, 1)),
                                           dimension_numbers=dn)
        res = jax.lax.conv_general_dilated(x, c, (2, 2), ((0, 0), (0, 0)),
                                           dimension_numbers=dn)
        return jnp.mean((out + res) ** 2)

    gf = jax.jit(jax.grad(loss, argnums=0))

    def rel_dev(H):
        x = rng.standard_normal((8, H, 16, 8)).astype(np.float32)
        ws = (wc1, wc2, wdn)
        d0 = jax.devices()[0]
        g1 = jax.device_get(gf(jax.device_put(ws, d0), jax.device_put(x, d0)))
        g2 = jax.device_get(gf(
            jax.device_put(ws, NamedSharding(mesh, P())),
            jax.device_put(x, NamedSharding(mesh, P("data", "spatial", None, None)))))
        return max(
            float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))
                  / max(float(np.max(np.abs(np.asarray(a)))), 1e-30))
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)))

    assert rel_dev(8) < 1e-5          # 2 rows/device: exact to noise
    assert rel_dev(4) > 1e-2          # 1 row/device: XLA backward is wrong


def test_train_cli_spatial_flag_wiring():
    """--spatial reaches the config and the guard rejects unsafe crops at
    Trainer construction time (before any compile)."""
    from pinthememory_tpu.train import cli as train_cli

    args = train_cli.build_parser().parse_args(
        ["--spatial", "2", "--crop_size", "128"])
    cfg = train_cli.config_from_args(args)
    assert cfg.train.spatial == 2
    validate_spatial_training(cfg.train.crop_size, cfg.train.spatial)

    args = train_cli.build_parser().parse_args(
        ["--spatial", "2", "--crop_size", "64"])
    cfg = train_cli.config_from_args(args)
    with pytest.raises(ValueError, match="rows"):
        validate_spatial_training(cfg.train.crop_size, cfg.train.spatial)
