"""Fused Pallas TPU kernel for the categorical memory read.

The read (reference: network/memory.py:317-336) is a tiny attention:
(B*H*W) 256-d queries against 19 slot keys -- L2-normalize, cosine scores,
softmax over slots, weighted slot sum.  Unfused, the chain bounces the
(N, 256) query and (N, S) score through HBM between ops; the kernel keeps a
row-block resident in VMEM and does normalize -> MXU matmul -> masked
softmax -> MXU matmul in one pass.

The slot axis is padded to the 128-lane width (masked with -inf before the
softmax), so both matmuls are MXU-shaped.  A ``jax.custom_vjp`` provides the
analytic backward in plain jnp (XLA fuses it), so the same entry point works
on the training path.  Non-TPU backends fall back to the jnp reference
implementation; ``interpret=True`` covers the kernel in CPU tests.

MEASURED on TPU v5e (tools/kernel_bench.py, chained-reads timing, 2026-08-19):
XLA already fuses this chain to HBM speed-of-light (~820 GB/s at every shape
from 9k to 590k queries) because when only ``retr`` is consumed it never
materializes the intermediates, while the hand-written kernel must write all
three outputs and tops out at ~350-400 GB/s at large N.  Per the design rule
"don't hand-schedule what the compiler already does", the DEFAULT on every
backend is therefore the jnp chain; set ``PINMEM_PALLAS_READ=1`` to use the
Pallas kernel (bit-identical to <1e-6 -- tests/test_memory_kernel.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_HP = jax.lax.Precision.HIGHEST
_LANE = 128
_ROW_BLOCK = 1024
_EPS = 1e-12
_USE_PALLAS = os.environ.get("PINMEM_PALLAS_READ", "0") == "1"


def _read_kernel(q_ref, m_ref, qn_ref, score_ref, retr_ref, *, num_slots: int):
    q = q_ref[:].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
    qn = q / jnp.maximum(norm, _EPS)
    qn_ref[:] = qn

    m = m_ref[:].astype(jnp.float32)  # (LANE, D), rows >= num_slots are zero
    # HIGHEST keeps the cosine scores in true f32 on the MXU (default would
    # round operands to bf16 -- visible against the jnp reference).
    score = jnp.dot(qn, m.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (BN, LANE)
    score_ref[:] = score

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, score.shape, dimension=1)
    masked = jnp.where(slot_ids < num_slots, score, -jnp.inf)
    probs = jax.nn.softmax(masked, axis=1)
    retr_ref[:] = jnp.dot(probs, m, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _fused_read_fwd_impl(query: jnp.ndarray, m_items: jnp.ndarray, interpret: bool):
    n, d = query.shape
    s = m_items.shape[0]
    n_pad = -(-n // _ROW_BLOCK) * _ROW_BLOCK
    q = jnp.pad(query.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    m_pad = jnp.pad(m_items.astype(jnp.float32), ((0, _LANE - s), (0, 0)))

    qn, score, retr = pl.pallas_call(
        functools.partial(_read_kernel, num_slots=s),
        grid=(n_pad // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0)),
            pl.BlockSpec((_LANE, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_BLOCK, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, m_pad)
    return qn[:n], score[:n, :s], retr[:n]


def _jnp_read(query: jnp.ndarray, m_items: jnp.ndarray):
    """Reference implementation (also the autodiff primal)."""
    q = query.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
    qn = q / jnp.maximum(norm, _EPS)
    score = jnp.einsum("nd,sd->ns", qn, m_items.astype(jnp.float32), precision=_HP)
    probs = jax.nn.softmax(score, axis=1)
    retr = jnp.einsum("ns,sd->nd", probs, m_items.astype(jnp.float32), precision=_HP)
    return qn, score, retr


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_memory_read(query: jnp.ndarray, m_items: jnp.ndarray, interpret: bool = False):
    """(N, D) queries x (S, D) memory -> (qn, score, retrieved).

    Plain-softmax read path (the gumbel variant perturbs ``score`` outside).
    """
    if interpret or (_USE_PALLAS and jax.default_backend() == "tpu"):
        return _fused_read_fwd_impl(query, m_items, interpret)
    return _jnp_read(query, m_items)


def _fwd(query, m_items, interpret):
    out = fused_memory_read(query, m_items, interpret)
    qn, score, _ = out
    norm = jnp.sqrt(jnp.sum(query.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    return out, (qn, score, m_items, norm)


def _bwd(interpret, residuals, cotangents):
    qn, score, m_items, norm = residuals
    g_qn, g_score, g_retr = cotangents
    m = m_items.astype(jnp.float32)
    probs = jax.nn.softmax(score, axis=1)

    # retrieved = probs @ m
    d_probs = jnp.einsum("nd,sd->ns", g_retr, m, precision=_HP)
    d_m = jnp.einsum("ns,nd->sd", probs, g_retr, precision=_HP)

    # softmax vjp
    inner = jnp.sum(probs * d_probs, axis=1, keepdims=True)
    d_score = probs * (d_probs - inner) + g_score

    # score = qn @ m^T
    d_qn = jnp.einsum("ns,sd->nd", d_score, m, precision=_HP) + g_qn
    d_m = d_m + jnp.einsum("ns,nd->sd", d_score, qn, precision=_HP)

    # qn = q / max(|q|, eps)
    safe = jnp.maximum(norm, _EPS)
    d_q = (d_qn - qn * jnp.sum(d_qn * qn, axis=1, keepdims=True)) / safe
    return d_q, d_m


fused_memory_read.defvjp(_fwd, _bwd)
