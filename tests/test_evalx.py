"""Sliding/pooling evaluator correctness tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.evalx.sliding import SlidingEvaluator, normalize_image
from pinthememory_tpu.evalx.pooling import PoolingEvaluator
from pinthememory_tpu.evalx.tiling import (
    compute_grid,
    extract_tiles,
    merge_tiles,
    merge_tiles_segments,
)


def test_grid_matches_reference_arithmetic():
    # 2048x1024 image, crop 768, overlap 1/3 -> stride 512
    g = compute_grid(1024, 2048, 768, 1.0, 1.0 / 3.0)
    assert g.tile_h == g.tile_w == 768
    xs = sorted({c[1] for c in g.coords})
    ys = sorted({c[0] for c in g.coords})
    assert xs == [0, 512, 1024, 1280]  # back-shifted last tile: 2048-768
    assert ys == [0, 256]              # 1024-768
    assert g.num_tiles == 8


def test_grid_small_image_truncates_tile():
    # scale 0.5 Cityscapes: 512x1024, tile 768 -> tile truncated to 512 rows
    g = compute_grid(512, 1024, 768, 0.5, 1.0 / 3.0)
    assert g.tile_h == 512 and g.tile_w == 768
    assert all(y == 0 for (y, x) in g.coords)


def test_extract_merge_roundtrip_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((100, 160, 5), dtype=np.float32))
    g = compute_grid(100, 160, 64, 1.0, 0.25)
    tiles = extract_tiles(img, g)
    assert tiles.shape == (g.num_tiles, 64, 64, 5)
    merged = merge_tiles(tiles, g)
    # overlap-averaging identical values reconstructs the input exactly
    np.testing.assert_allclose(np.asarray(merged), np.asarray(img), rtol=1e-5, atol=1e-5)


def test_segment_merge_bitequal_scan_merge():
    """merge_tiles_segments must match the scan merge BIT-for-bit (same f32
    summation order, same count value division) on every protocol grid shape
    incl. truncated tiles and back-shifted edges."""
    rng = np.random.default_rng(4)
    cases = [
        (1024, 2048, 768, 1.0, 1 / 3),   # scale-1.0 Cityscapes grid (8 tiles)
        (2048, 4096, 768, 2.0, 1 / 3),   # scale-2.0 grid (big tiles)
        (512, 1024, 768, 0.5, 1 / 3),    # truncated tile rows
        (100, 160, 64, 1.0, 0.25),
        (64, 96, 48, 1.0, 0.5),          # heavier overlap (up to 4x coverage)
        (50, 40, 64, 1.0, 1 / 3),        # image smaller than tile
    ]
    for (h, w, crop, scale, ov) in cases:
        g = compute_grid(h, w, crop, scale, ov)
        # keep the big grids cheap: shrink via a proportional fake grid
        if h > 256:
            g = compute_grid(h // 8, w // 8, crop // 8, scale, ov)
        tiles = jnp.asarray(
            rng.standard_normal((g.num_tiles, g.tile_h, g.tile_w, 3)).astype(np.float32))
        a = np.asarray(merge_tiles(tiles, g))
        b = np.asarray(merge_tiles_segments(tiles, g))
        np.testing.assert_array_equal(a, b, err_msg=f"grid {(h, w, crop, scale, ov)}")


def test_segment_merge_bf16_tiles_upcast():
    rng = np.random.default_rng(5)
    g = compute_grid(100, 160, 64, 1.0, 0.25)
    tiles_f32 = rng.standard_normal((g.num_tiles, 64, 64, 2)).astype(np.float32)
    tiles = jnp.asarray(tiles_f32).astype(jnp.bfloat16)
    out = merge_tiles_segments(tiles, g)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(merge_tiles(tiles, g)))


def _identity_apply(tiles):
    """Fake model: logits = first input channel broadcast to 19 classes."""
    return jnp.repeat(tiles[..., :1], 19, axis=-1)


def test_sliding_evaluator_scale1_identity():
    """count_mode='uniform' (the INTENDED average): merging identical values
    reconstructs the input exactly.  The default 'reference' mode instead
    reproduces eval.py's count-indexing bug -- gated end-to-end against the
    real reference code in test_parity_eval_protocol.py."""
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    ev = SlidingEvaluator(_identity_apply, crop_size=64, overlap=0.25,
                          scales=(1.0,), flip=True, count_mode="uniform")
    logits = np.asarray(ev.predict_logits(raw))
    expect = np.asarray(normalize_image(jnp.asarray(raw)))[..., 0]
    np.testing.assert_allclose(logits[..., 0], expect, rtol=1e-4, atol=1e-4)
    # all 19 channels identical -> argmax ties resolve to 0
    assert (np.asarray(ev.predict(raw)) == 0).all()


def test_reference_count_map_semantics():
    """Pin the reproduced count bug's shape directly: counts depend on the
    class index through y-starts and on the ROW index through x-starts
    (eval.py:215-228)."""
    from pinthememory_tpu.evalx.tiling import reference_count_map

    g = compute_grid(96, 160, 64, 1.0, 1 / 3)  # y starts {0,32}, x {0,43,86,96}
    cnt = reference_count_map(g, 19)           # (H, 1, C)
    assert cnt.shape == (96, 1, 19)
    # only y1=0 tiles cover class indices (stride 43 > 19): class-uniform
    assert (cnt == cnt[:, :, :1]).all()
    # row r counts x-ranges covering r: r=0 -> only x1=0; r=50 -> x1 in {0,43}
    assert cnt[0, 0, 0] == 1.0
    assert cnt[50, 0, 0] == 2.0


def test_sliding_evaluator_multiscale_shapes():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    ev = SlidingEvaluator(_identity_apply, crop_size=32, overlap=1 / 3,
                          scales=(0.5, 1.0, 2.0), flip=True)
    logits = ev.predict_logits(raw)
    assert logits.shape == (64, 96, 19)
    assert np.isfinite(np.asarray(logits)).all()


def test_batch_device_scale_chunking_identical():
    """Per-scale image-batch caps (scale_batch) must not change predictions:
    chunking only regroups which images share a dispatch."""
    rng = np.random.default_rng(7)
    raws = rng.integers(0, 255, (4, 64, 96, 3), dtype=np.uint8)

    def model(tiles):  # non-trivial logits so argmax is data-dependent
        base = jnp.concatenate(
            [tiles, tiles[..., :1] * tiles[..., 1:2], -tiles,
             tiles[..., ::-1]], axis=-1)  # 10 channels
        return jnp.concatenate([base, base], axis=-1)[..., :19]

    kw = dict(crop_size=32, overlap=1 / 3, scales=(0.5, 1.0, 2.0), flip=True)
    whole = SlidingEvaluator(model, **kw)
    chunked = SlidingEvaluator(model, scale_batch={0.5: 4, 1.0: 2, 2.0: 1}, **kw)
    a = np.asarray(whole.predict_batch_device(raws))
    b = np.asarray(chunked.predict_batch_device(raws))
    np.testing.assert_array_equal(a, b)


def test_batch_sharded_matches_unsharded():
    """Data-parallel eval over the 8-device mesh (conftest forces the CPU
    mesh) must produce exactly the unsharded predictions."""
    from pinthememory_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    raws = rng.integers(0, 255, (8, 64, 96, 3), dtype=np.uint8)

    def model(tiles):
        base = jnp.concatenate([tiles, -tiles, tiles[..., ::-1]], axis=-1)
        return jnp.concatenate([base, base, base], axis=-1)[..., :19]

    ev = SlidingEvaluator(model, crop_size=32, overlap=1 / 3,
                          scales=(0.5, 1.0), flip=True)
    mesh = make_mesh(jax.devices()[:8], spatial=1)
    a = np.asarray(ev.predict_batch_device(jnp.asarray(raws)))
    b = np.asarray(ev.predict_batch_sharded(raws, mesh))
    np.testing.assert_array_equal(a, b)


def test_batch_sharded_pads_nondivisible_tail():
    """A batch not divisible by the data axis (e.g. 500 Cityscapes images on
    8 chips) is transparently padded and truncated -- predictions identical
    to the unsharded path (VERDICT r4 #7)."""
    from pinthememory_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(13)
    raws = rng.integers(0, 255, (5, 64, 96, 3), dtype=np.uint8)

    def model(tiles):
        base = jnp.concatenate([tiles, -tiles, tiles[..., ::-1]], axis=-1)
        return jnp.concatenate([base, base, base], axis=-1)[..., :19]

    ev = SlidingEvaluator(model, crop_size=32, overlap=1 / 3,
                          scales=(0.5, 1.0), flip=True)
    mesh = make_mesh(jax.devices()[:8], spatial=1)
    a = np.asarray(ev.predict_batch_device(jnp.asarray(raws)))
    b = np.asarray(ev.predict_batch_sharded(raws, mesh))
    assert b.shape == a.shape
    np.testing.assert_array_equal(a, b)


def test_stream_tiles_rejects_uniform_and_fast_merge():
    """stream_tiles would be silently ignored under count_mode='uniform' or
    fast_merge; both now raise at construction (ADVICE r4)."""
    import pytest

    with pytest.raises(ValueError):
        SlidingEvaluator(_identity_apply, stream_tiles=4,
                         count_mode="uniform")
    with pytest.raises(ValueError):
        SlidingEvaluator(_identity_apply, stream_tiles=4,
                         apply_low_fn=_identity_apply)


def test_pooling_evaluator_probs_normalized():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    ev = PoolingEvaluator(_identity_apply, scales=(1.0, 0.5), flip=True)
    probs = np.asarray(ev.predict_probs(raw))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_pooling_batched_matches_per_image():
    """Batched pooled inference must reproduce per-image MeanFusion argmax
    (and probs up to float tolerance)."""
    rng = np.random.default_rng(12)
    raws = rng.integers(0, 255, (3, 48, 64, 3), dtype=np.uint8)
    # 19 DISTINCT linear channel mixes: duplicated logits would tie at
    # argmax and break bitwise comparison on summation-order noise
    w = jnp.asarray(rng.standard_normal((3, 19)).astype(np.float32))

    def model(x):
        return x @ w

    ev = PoolingEvaluator(model, scales=(1.0, 0.5), flip=True)
    batched = np.asarray(ev.predict_batch_device(raws))
    for i in range(raws.shape[0]):
        per = np.asarray(ev.predict_probs(raws[i]))
        np.testing.assert_array_equal(batched[i], per.argmax(-1))


def test_fast_merge_matches_exact_in_tile_interiors():
    """Fast merge (merge at decoder res, upsample once) vs the exact path
    (upsample per tile, merge): identical away from tile seams, close
    overall, on a linear toy model whose low_out is random at OS4."""
    import jax

    from pinthememory_tpu.ops.resize import resize_bilinear_align_corners

    rng = np.random.default_rng(8)
    f = 4
    w = jnp.asarray(rng.standard_normal((3, 19)).astype(np.float32) * 0.3)

    def low_fn(tiles):  # (T, th, tw, 3) -> (T, th/f, tw/f, 19)
        t = tiles.reshape(tiles.shape[0], tiles.shape[1] // f, f,
                          tiles.shape[2] // f, f, 3).mean((2, 4))
        return t @ w

    def full_fn(tiles):
        return resize_bilinear_align_corners(low_fn(tiles), tiles.shape[1:3])

    raw = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    kw = dict(crop_size=32, overlap=1 / 3, scales=(1.0, 2.0), flip=True)
    exact = SlidingEvaluator(full_fn, **kw)
    fast = SlidingEvaluator(full_fn, apply_low_fn=low_fn, **kw)
    a = np.asarray(exact.predict_logits(raw))
    b = np.asarray(fast.predict_logits(raw))
    assert np.abs(a - b).mean() < 0.05 * np.abs(a).mean()
    # the overwhelming majority of pixels agree exactly at argmax
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.97, agree


def test_fast_merge_falls_back_on_indivisible_grid():
    """Odd geometry must silently use the exact path."""
    def low_fn(tiles):
        return tiles[:, ::4, ::4, :1]

    def full_fn(tiles):
        return jnp.repeat(tiles[..., :1], 19, axis=-1)

    rng = np.random.default_rng(9)
    raw = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    ev = SlidingEvaluator(full_fn, apply_low_fn=low_fn, crop_size=30,
                          overlap=1 / 3, scales=(1.0,), flip=False)
    out = np.asarray(ev.predict_logits(raw))   # 30/4 etc. not divisible
    assert out.shape == (50, 70, 19)


def test_batch_sharded_spatial_matches_unsharded():
    """data x spatial sharded eval (H split over the spatial axis, halo
    exchange through the tile programs) must produce exactly the unsharded
    predictions, with and without per-scale scale_batch caps."""
    from pinthememory_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(13)
    raws = rng.integers(0, 255, (8, 64, 96, 3), dtype=np.uint8)

    def model(tiles):
        base = jnp.concatenate([tiles, -tiles, tiles[..., ::-1]], axis=-1)
        return jnp.concatenate([base, base, base], axis=-1)[..., :19]

    kw = dict(crop_size=32, overlap=1 / 3, scales=(0.5, 1.0, 2.0), flip=True)
    ev = SlidingEvaluator(model, **kw)
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    a = np.asarray(ev.predict_batch_device(jnp.asarray(raws)))
    b = np.asarray(ev.predict_batch_sharded(raws, mesh))
    np.testing.assert_array_equal(a, b)

    # caps per data row: scale-2.0 runs 4 images/dispatch (1 x 4 rows)
    capped = SlidingEvaluator(model, scale_batch={2.0: 1, 1.0: 2}, **kw)
    c = np.asarray(capped.predict_batch_sharded(raws, mesh))
    np.testing.assert_array_equal(a, c)

    # real trunk: spatially sharded R18 forward through the full sliding
    # program (conv halo exchange), exact vs the single-device program
    import functools

    from pinthememory_tpu.models.resnet import resnet18

    bb = resnet18()
    v = jax.jit(functools.partial(bb.init, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    def trunk_apply(tiles):
        out, _ = bb.apply(v, tiles, train=False, mutable=[])
        logits = out["out"][..., :19]
        return jax.image.resize(logits, tiles.shape[:3] + (19,), "bilinear")

    ev2 = SlidingEvaluator(trunk_apply, crop_size=32, overlap=1 / 3,
                           scales=(1.0,), flip=False)
    a2 = np.asarray(ev2.predict_batch_device(jnp.asarray(raws)))
    b2 = np.asarray(ev2.predict_batch_sharded(raws, mesh))
    np.testing.assert_array_equal(a2, b2)


def test_stream_tiles_matches_segment_merge():
    """stream_tiles (chunked model calls accumulating straight into the
    merged map) must reproduce the default segment-merge predictions; only
    the f32 summation order differs (measured <1e-6 logit delta)."""
    rng = np.random.default_rng(17)
    raws = rng.integers(0, 255, (2, 64, 96, 3), dtype=np.uint8)

    def model(tiles):
        base = jnp.concatenate([tiles, -tiles, tiles[..., ::-1]], axis=-1)
        return jnp.concatenate([base, base, base], axis=-1)[..., :19]

    kw = dict(crop_size=32, overlap=1 / 3, scales=(0.5, 1.0, 2.0), flip=True)
    a = SlidingEvaluator(model, **kw)
    b = SlidingEvaluator(model, stream_tiles=4, **kw)
    la = np.asarray(a.predict_logits(raws[0]))
    lb = np.asarray(b.predict_logits(raws[0]))
    np.testing.assert_allclose(la, lb, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.predict_batch_device(raws)),
                                  np.asarray(b.predict_batch_device(raws)))


def test_ctx_mode_matches_closure_mode():
    """ctx-threaded weights (program arguments) produce exactly the
    closure-mode predictions."""
    rng = np.random.default_rng(21)
    raws = rng.integers(0, 255, (2, 64, 96, 3), dtype=np.uint8)
    w = jnp.asarray(rng.standard_normal((3, 19)).astype(np.float32))

    closure = SlidingEvaluator(lambda t: t @ w, crop_size=32, overlap=1 / 3,
                               scales=(0.5, 1.0), flip=True)
    ctxmode = SlidingEvaluator(lambda c, t: t @ c["w"], crop_size=32,
                               overlap=1 / 3, scales=(0.5, 1.0), flip=True,
                               ctx={"w": w})
    np.testing.assert_array_equal(
        np.asarray(closure.predict_batch_device(jnp.asarray(raws))),
        np.asarray(ctxmode.predict_batch_device(jnp.asarray(raws))))
    np.testing.assert_array_equal(
        np.asarray(closure.predict(raws[0])),
        np.asarray(ctxmode.predict(raws[0])))


def test_aot_cache_roundtrip(tmp_path, monkeypatch):
    """The persistent executable cache: a fresh evaluator loads the cached
    executable (hit) and produces identical predictions; NEW weights through
    the same cached executable change the output (weights are inputs, not
    baked constants)."""
    monkeypatch.setenv("PINMEM_AOT_CACHE", str(tmp_path))
    rng = np.random.default_rng(22)
    raws = rng.integers(0, 255, (2, 64, 96, 3), dtype=np.uint8)
    w1 = jnp.asarray(rng.standard_normal((3, 19)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((3, 19)).astype(np.float32))
    kw = dict(crop_size=32, overlap=1 / 3, scales=(1.0,), flip=True,
              aot="test")

    ev1 = SlidingEvaluator(lambda c, t: t @ c["w"], ctx={"w": w1}, **kw)
    a = np.asarray(ev1.predict_batch_device(jnp.asarray(raws)))
    assert ev1._aot.misses >= 1 and ev1._aot.hits == 0

    ev2 = SlidingEvaluator(lambda c, t: t @ c["w"], ctx={"w": w1}, **kw)
    b = np.asarray(ev2.predict_batch_device(jnp.asarray(raws)))
    assert ev2._aot.hits >= 1 and ev2._aot.misses == 0
    np.testing.assert_array_equal(a, b)

    ev3 = SlidingEvaluator(lambda c, t: t @ c["w"], ctx={"w": w2}, **kw)
    c = np.asarray(ev3.predict_batch_device(jnp.asarray(raws)))
    assert ev3._aot.hits >= 1  # same executable...
    assert (a != c).any()      # ...different weights, different output


def test_aot_package_digest_semantics(tmp_path, monkeypatch):
    """The cache-key package digest hashes source CONTENT: a git checkout
    that touches every mtime must not invalidate, a one-byte source edit
    must, and host-side ``data/`` edits (loaders/transforms feed programs
    through *arguments*) must not."""
    import os
    import shutil
    import pinthememory_tpu
    from pinthememory_tpu.utils import aotcache

    root = tmp_path / "pkg"
    (root / "models").mkdir(parents=True)
    (root / "data").mkdir()
    (root / "__init__.py").write_text("")
    (root / "models" / "layers.py").write_text("A = 1\n")
    (root / "data" / "loader.py").write_text("B = 1\n")

    def digest():
        aotcache._PKG_DIGEST = None
        monkeypatch.setattr(pinthememory_tpu, "__file__",
                            str(root / "__init__.py"))
        try:
            return aotcache.package_digest()
        finally:
            aotcache._PKG_DIGEST = None

    d0 = digest()
    # mtime churn, same bytes (fresh clone / branch switch)
    os.utime(root / "models" / "layers.py", ns=(1, 1))
    assert digest() == d0
    # data/ edit: host-side only
    (root / "data" / "loader.py").write_text("B = 2  # changed\n")
    assert digest() == d0
    # compute-path content edit
    (root / "models" / "layers.py").write_text("A = 2\n")
    assert digest() != d0
    shutil.rmtree(root)
