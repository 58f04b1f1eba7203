"""Pallas fused memory-read kernel vs. the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.ops.memory_kernel import _jnp_read, fused_memory_read


def _data(n=300, d=64, s=19, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, d)).astype(np.float32)
    m = rng.standard_normal((s, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(m)


def test_kernel_matches_reference_forward():
    q, m = _data()
    qn_k, score_k, retr_k = fused_memory_read(q, m, True)
    qn_r, score_r, retr_r = _jnp_read(q, m)
    np.testing.assert_allclose(np.asarray(qn_k), np.asarray(qn_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(score_k), np.asarray(score_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(retr_k), np.asarray(retr_r), rtol=1e-5, atol=1e-5)


def test_kernel_handles_nonmultiple_rows():
    q, m = _data(n=1025)
    qn, score, retr = fused_memory_read(q, m, True)
    assert qn.shape == (1025, 64) and score.shape == (1025, 19)


def test_custom_vjp_matches_autodiff_of_reference():
    q, m = _data(n=64, d=32)

    def loss_fused(q, m):
        qn, score, retr = fused_memory_read(q, m, True)
        return jnp.sum(retr * 0.7) + jnp.sum(score * 0.1) + jnp.sum(qn * 0.05)

    def loss_ref(q, m):
        qn, score, retr = _jnp_read(q, m)
        return jnp.sum(retr * 0.7) + jnp.sum(score * 0.1) + jnp.sum(qn * 0.05)

    gq_f, gm_f = jax.grad(loss_fused, argnums=(0, 1))(q, m)
    gq_r, gm_r = jax.grad(loss_ref, argnums=(0, 1))(q, m)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm_f), np.asarray(gm_r), rtol=1e-4, atol=1e-5)
