"""ShiftedDilatedConv3x3 == nn.Conv (values and gradients).

The shifted-matmul formulation (models/layers.py) replaces XLA's
space-to-batch dilated-conv lowering on the hot path; these tests pin that
it is a drop-in: same parameter tree, same outputs, same gradients.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinthememory_tpu.models.layers import ShiftedDilatedConv3x3, torch_pad


def _ref_conv(features, dilation, bias):
    return nn.Conv(
        features=features, kernel_size=(3, 3), strides=(1, 1),
        padding=torch_pad(dilation), kernel_dilation=(dilation, dilation),
        use_bias=bias)


@pytest.mark.parametrize("dilation", [1, 2, 6, 18])
@pytest.mark.parametrize("bias", [False, True])
def test_matches_nn_conv(dilation, bias):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 24, 8)), jnp.float32)
    ref = _ref_conv(16, dilation, bias)
    alt = ShiftedDilatedConv3x3(features=16, dilation=dilation, use_bias=bias)

    params = ref.init(jax.random.PRNGKey(0), x)
    # identical param tree: the alt module consumes the ref's params as-is
    assert jax.tree.structure(params) == jax.tree.structure(
        alt.init(jax.random.PRNGKey(0), x))

    y_ref = ref.apply(params, x)
    y_alt = alt.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_alt), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    ref = _ref_conv(8, 2, False)
    alt = ShiftedDilatedConv3x3(features=8, dilation=2)
    params = ref.init(jax.random.PRNGKey(0), x)

    def loss(module):
        def f(p, xin):
            return jnp.sum(module.apply(p, xin) ** 2)
        return jax.grad(f, argnums=(0, 1))(params, x)

    (gp_ref, gx_ref), (gp_alt, gx_alt) = loss(ref), loss(alt)
    np.testing.assert_allclose(np.asarray(gx_alt), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp_alt), jax.tree.leaves(gp_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_conv2d_dispatch():
    """conv2d picks the shifted form only for 3x3/stride-1/SAME dilated."""
    from pinthememory_tpu.models.layers import conv2d

    assert isinstance(conv2d(8, 3, 1, 2, 2), ShiftedDilatedConv3x3)
    assert isinstance(conv2d(8, 3, 2, 2, 2), nn.Conv)   # strided
    assert isinstance(conv2d(8, 3, 1, 1, 1), nn.Conv)   # dense
    assert isinstance(conv2d(8, 1, 1, 0, 1), nn.Conv)   # 1x1


def test_concat_split_conv_matches_fused_conv():
    """ConcatSplitConv3x3 == nn.Conv on the concatenated input (linearity
    of convolution in input channels); parameter tree identical."""
    import flax.linen as nn

    from pinthememory_tpu.models.layers import ConcatSplitConv3x3, torch_pad

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 12, 16, 11)).astype(np.float32))
    m = ConcatSplitConv3x3(features=8, split=5, total_in=16)
    v = m.init(jax.random.PRNGKey(0), a, b)
    assert v["params"]["kernel"].shape == (3, 3, 16, 8)

    fused = nn.Conv(8, (3, 3), padding=torch_pad(1), use_bias=False)
    ref = fused.apply({"params": {"kernel": v["params"]["kernel"]}},
                      jnp.concatenate([a, b], axis=-1))
    out = m.apply(v, a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_space_to_depth_stem_matches_conv7x7():
    """SpaceToDepthStem == 7x7 stride-2 pad-3 conv (zero-padded kernel +
    2x2 pixel/weight reorder); odd sizes fall back to the plain conv."""
    from pinthememory_tpu.models.layers import SpaceToDepthStem

    rng = np.random.default_rng(1)
    m = SpaceToDepthStem(features=16)
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    k = v["params"]["kernel"]
    assert k.shape == (7, 7, 3, 16)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    x_odd = x[:, :31, :47, :]
    ref_odd = jax.lax.conv_general_dilated(
        x_odd, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(m.apply(v, x_odd)),
                               np.asarray(ref_odd), rtol=1e-5, atol=1e-5)


def test_folded_batch_norm_f32_bit_identical_to_flax():
    """FoldedBatchNorm defers to nn.BatchNorm verbatim under f32 (the
    parity default): outputs, updated running stats and the param tree are
    bit-identical in train and eval mode."""
    from pinthememory_tpu.models.layers import batch_norm

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 8, 8, 16)) * 3 + 1,
        jnp.float32)
    ref = nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32)
    got = batch_norm(jnp.float32)
    vr = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    vg = got.init(jax.random.PRNGKey(0), x, use_running_average=False)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vg)
    yr, sr = ref.apply(vr, x, use_running_average=False, mutable=["batch_stats"])
    yg, sg = got.apply(vg, x, use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(yr), np.asarray(yg))
    np.testing.assert_array_equal(np.asarray(sr["batch_stats"]["mean"]),
                                  np.asarray(sg["batch_stats"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(ref.apply(vr, x, use_running_average=True)),
        np.asarray(got.apply(vg, x, use_running_average=True)))


def test_folded_batch_norm_bf16_matches_flax_within_rounding():
    """The bf16 folded path: f32 statistics identical to flax; outputs
    within bf16 rounding of flax's (f32-promoted) result; output dtype is
    the compute dtype (the whole point -- no silent f32 materialization)."""
    from pinthememory_tpu.models.layers import batch_norm

    x32 = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 8, 8, 16)) * 3 + 1,
        jnp.float32)
    x = x32.astype(jnp.bfloat16)
    ref = nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.bfloat16)
    got = batch_norm(jnp.bfloat16)
    vr = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    vg = got.init(jax.random.PRNGKey(0), x, use_running_average=False)
    yr, sr = ref.apply(vr, x, use_running_average=False, mutable=["batch_stats"])
    yg, sg = got.apply(vg, x, use_running_average=False, mutable=["batch_stats"])
    assert yg.dtype == jnp.bfloat16
    # batch statistics are computed identically (f32 reductions)
    np.testing.assert_array_equal(np.asarray(sr["batch_stats"]["mean"]),
                                  np.asarray(sg["batch_stats"]["mean"]))
    np.testing.assert_array_equal(np.asarray(sr["batch_stats"]["var"]),
                                  np.asarray(sg["batch_stats"]["var"]))
    # normalized values agree to bf16 rounding of the unit-variance output
    d = np.abs(np.asarray(yr, np.float32) - np.asarray(yg, np.float32))
    assert d.max() < 0.05, d.max()
