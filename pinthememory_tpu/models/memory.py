"""Categorical memory: class-supervised slots with attention read and
momentum masked-pooling write.  Reference: network/memory.py (Memory_sup).

TPU-native design
-----------------
The reference mutates ``self.m_items`` in place across forwards; here the
memory is an explicit ``(M, D)`` array threaded through every call -- the
train step carries it as state, which makes the meta-episode's triple
write/reset choreography (train.py:530-583) visible dataflow instead of
hidden mutation.

The read is a tiny attention: (B*H*W) queries x M=19 keys of width 256.  The
score/softmax/gather chain is matmul-shaped and fuses onto the MXU; XLA fuses
it to HBM speed-of-light (~820 GB/s measured, tools/kernel_bench.py), so the
jnp chain is the default.  A hand-written Pallas kernel for the same pipeline
lives in ops/memory_kernel.py (opt-in via PINMEM_PALLAS_READ=1).

Under data parallelism the write statistics (nominator/denominator) are batch
sums; with GSPMD batch sharding those sums are global collectives, so
``m_items`` stays replica-identical by construction (fixing the reference's
per-rank memory drift noted in SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pinthememory_tpu.models.layers import batch_norm, conv2d
from pinthememory_tpu.ops.resize import resize_bilinear_align_corners
from pinthememory_tpu.ops.select import one_hot_select

_HP = jax.lax.Precision.HIGHEST


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch ``F.normalize(p=2)``: x / max(||x||, eps).

    The squared-sum is clamped *before* the sqrt: ``sqrt`` at exactly 0 has
    an infinite gradient, and an all-zero feature row (possible post-ReLU)
    would otherwise poison the whole gradient with 0*inf = NaN.
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / norm


def init_memory(key: jax.Array, memory_size: int, feature_dim: int) -> jnp.ndarray:
    """Random L2-normalized slots (reference: memory.py:120-121)."""
    m = jax.random.uniform(key, (memory_size, feature_dim), jnp.float32)
    return l2_normalize(m, axis=1)


class MemoryOutputs(NamedTuple):
    fused: jnp.ndarray                 # (B, H, W, input_dim) refined features
    score_query: jnp.ndarray           # (B, H, W, M) softmax over pixels
    score_memory: jnp.ndarray          # (B, H, W, M) softmax over slots
    read_loss: jnp.ndarray             # scalar CE(score/T vs mask)
    div_loss: jnp.ndarray              # scalar slot-diversity loss
    cls_loss: jnp.ndarray              # scalar slot-classification loss
    m_items: jnp.ndarray               # (M, D) possibly-updated memory


def gumbel_softmax(key: jax.Array, logits: jnp.ndarray, axis: int) -> jnp.ndarray:
    """torch ``F.gumbel_softmax(tau=1, hard=False)`` with explicit rng."""
    u = jax.random.uniform(key, logits.shape, jnp.float32, 1e-10, 1.0)
    g = -jnp.log(-jnp.log(u))
    return jax.nn.softmax(logits + g, axis=axis)


def read_loss_from_score(
    score: jnp.ndarray, mask: jnp.ndarray, temperature: float, num_slots: int,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """CE(upsample(score/T), mask) with ignore=255 (memory.py:173-177).

    score: (B, h, w, M); mask: (B, H, W) int labels.  Under a bf16
    ``compute_dtype`` the (B, H, W, M) upsampled-score materialization and
    its interpolation matmuls ride bf16 (the f32-HIGHEST einsum pair was
    ~3.4 ms/step of the fwdbwd profile, round 5); the log-softmax/CE stays
    f32.  f32 models are bit-identical to the original path.
    """
    logits = (score / temperature).astype(compute_dtype)
    logits = resize_bilinear_align_corners(logits, mask.shape[1:3])
    logits = logits.astype(jnp.float32)
    valid = (mask != 255) & (mask < num_slots)
    safe = jnp.where(valid, mask, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot select instead of take_along_axis: a full-res gather is a
    # serial loop on TPU (measured ~74 ms/step -- ops/select.py)
    nll = -one_hot_select(logp, safe)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def memory_read(
    m_items: jnp.ndarray,
    query: jnp.ndarray,
    mask: jnp.ndarray | None,
    *,
    temperature: float,
    gumbel: bool,
    rng: jax.Array | None,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Memory read (memory.py:317-336 + get_score 167-189).

    query: (B, H, W, D) *unnormalized* features.  Returns
    (query_n, retrieved, score_query, score_memory, read_loss).
    """
    b, h, w, d = query.shape
    m = m_items.shape[0]
    if gumbel:
        # gumbel path: noise perturbs the scores before both softmaxes, so
        # the plain jnp chain is used (XLA fuses it adequately).
        assert rng is not None, "gumbel read requires an rng key"
        query_n = l2_normalize(query, axis=-1)
        score = jnp.einsum("bhwd,md->bhwm", query_n, m_items, precision=_HP)
        flat = score.reshape(b * h * w, m)
        kq, km = jax.random.split(rng)
        score_query = gumbel_softmax(kq, flat, axis=0)
        score_memory = gumbel_softmax(km, flat, axis=1)
        retrieved = jnp.einsum("nm,md->nd", score_memory, m_items, precision=_HP)
    else:
        # XLA-fused chain by default; Pallas kernel behind PINMEM_PALLAS_READ=1
        # (measured slower on v5e -- see ops/memory_kernel.py docstring)
        from pinthememory_tpu.ops.memory_kernel import fused_memory_read

        qn_flat, flat, retrieved = fused_memory_read(
            query.reshape(b * h * w, d), m_items
        )
        query_n = qn_flat.reshape(b, h, w, d)
        score = flat.reshape(b, h, w, m)
        score_query = jax.nn.softmax(flat, axis=0)
        score_memory = jax.nn.softmax(flat, axis=1)

    if mask is not None:
        rloss = read_loss_from_score(score, mask, temperature, m,
                                     compute_dtype=compute_dtype)
    else:
        rloss = jnp.zeros((), jnp.float32)
    return (
        query_n,
        retrieved.reshape(b, h, w, d),
        score_query.reshape(b, h, w, m),
        score_memory.reshape(b, h, w, m),
        rloss,
    )


def write_statistics(
    write_query: jnp.ndarray, mask: jnp.ndarray, num_slots: int,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked per-slot sums (memory.py:219-231).

    write_query: (B, h, w, D) normalized writing features; mask: (B, H, W).
    The GT one-hot (255 -> extra slot) is bilinearly downsampled with
    align_corners=True to (h, w) -- soft class weights near boundaries,
    exactly as the reference.  Returns (nominator (M, D), denominator (M,)),
    extra ignore slot already dropped.

    Under a bf16 ``compute_dtype`` the full-resolution one-hot tensor and
    its downsample matmuls ride bf16 (interior one-hot entries are exact in
    bf16; only boundary interpolation weights round) while both statistics
    ACCUMULATE in f32 on the MXU (``preferred_element_type``) -- f32 models
    keep the original bit-exact HIGHEST path.
    """
    b, h, w, d = write_query.shape
    mask = jnp.where(mask == 255, num_slots, mask).astype(jnp.int32)
    onehot = jax.nn.one_hot(mask, num_slots + 1, dtype=compute_dtype)
    onehot = resize_bilinear_align_corners(onehot, (h, w))
    flat_mask = onehot.reshape(b, h * w, num_slots + 1)
    flat_q = write_query.reshape(b, h * w, d).astype(compute_dtype)
    prec = _HP if jnp.dtype(compute_dtype) == jnp.float32 else None
    # (B, D, M+1) summed over batch -> (M+1, D), f32 accumulation either way
    nominator = jnp.einsum("bpd,bpm->md", flat_q, flat_mask, precision=prec,
                           preferred_element_type=jnp.float32)
    denominator = jnp.sum(flat_mask.astype(jnp.float32), axis=(0, 1))
    return nominator[:num_slots], denominator[:num_slots]


def momentum_update(
    m_items: jnp.ndarray,
    nominator: jnp.ndarray,
    denominator: jnp.ndarray,
    momentum: float,
) -> jnp.ndarray:
    """Momentum write for slots present in the batch (memory.py:233-239).

    The old memory enters detached (memory.py:233: ``clone().detach()``), so
    gradients only flow through the nominator/denominator statistics.
    """
    old = jax.lax.stop_gradient(m_items)
    present = denominator > 0
    mean = nominator / jnp.maximum(denominator, 1e-12)[:, None]
    updated = jnp.where(
        present[:, None], momentum * old + (1.0 - momentum) * mean, old
    )
    return l2_normalize(updated, axis=1)


def diversity_loss(m_items: jnp.ndarray) -> jnp.ndarray:
    """Clamped off-diagonal cosine similarity mean (memory.py:264-272)."""
    m = m_items.shape[0]
    cos = jnp.einsum("md,nd->mn", m_items, m_items, precision=_HP)
    pos = jnp.maximum(cos, 0.0)
    return (jnp.sum(pos) - jnp.trace(pos)) / (m * (m - 1))


class MemoryModule(nn.Module):
    """Parameterized pieces of the memory: writenet, output fusion, clsfier.

    Reference: Writingnet (memory.py:67-87), ``self.output`` (103-107),
    ``self.clsfier`` (112).
    """

    input_dim: int = 256
    feature_dim: int = 256
    memory_size: int = 19
    momentum: float = 0.8
    temperature: float = 1.0
    gumbel_read: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.write_conv = conv2d(self.feature_dim, 1, dtype=self.dtype, name="writenet_conv")
        self.write_bn = batch_norm(self.dtype, name="writenet_bn")
        self.out_conv = conv2d(self.input_dim, 1, dtype=self.dtype, name="output_conv")
        self.out_bn = batch_norm(self.dtype, name="output_bn")
        self.clsfier = nn.Dense(self.memory_size, dtype=self.dtype, name="clsfier")

    def write_features(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Writingnet: relu(x + BN(conv1x1(x))), then L2-normalize."""
        y = self.write_bn(self.write_conv(x), use_running_average=not train)
        y = nn.relu(x + y)
        return l2_normalize(y, axis=-1)

    def fuse(self, query_n: jnp.ndarray, retrieved: jnp.ndarray, train: bool) -> jnp.ndarray:
        """concat -> 1x1 conv -> BN -> ReLU (memory.py:330-334)."""
        cat = jnp.concatenate([query_n, retrieved], axis=-1)
        y = self.out_bn(self.out_conv(cat), use_running_average=not train)
        return nn.relu(y)

    def classification_loss(self, m_items: jnp.ndarray) -> jnp.ndarray:
        """CE(clsfier(m_items), arange(M)) (memory.py:259-262)."""
        logits = self.clsfier(m_items.astype(self.dtype)).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.diag(logp))

    def __call__(
        self,
        query: jnp.ndarray,
        m_items: jnp.ndarray,
        mask: jnp.ndarray | None,
        *,
        memory_writing: bool,
        writing_detach: bool,
        train: bool,
        rng: jax.Array | None = None,
    ) -> MemoryOutputs:
        """Full memory forward: read then (optionally) write.

        Mirrors Memory_sup.forward (memory.py:191-204) including the detach
        discipline: when writing, the read uses a detached memory
        (memory.py:323-324); the write always starts from a detached old
        memory; ``writing_detach`` controls whether the *returned* memory
        stays in the graph (gradients to writenet via the outer meta-loss).
        """
        read_items = jax.lax.stop_gradient(m_items) if memory_writing else m_items
        # NOTE: torch's F.gumbel_softmax samples noise in eval mode too, so the
        # reference's inference is stochastic when --gumbel_off is not passed
        # (memory.py:181-187).  We deliberately gate sampling on ``train`` for
        # deterministic, reproducible evaluation.
        query_n, retrieved, s_query, s_memory, read_loss = memory_read(
            read_items,
            query,
            mask,
            temperature=self.temperature,
            gumbel=self.gumbel_read and train,
            rng=rng,
            compute_dtype=self.dtype,
        )
        fused = self.fuse(query_n, retrieved, train)

        if memory_writing:
            assert mask is not None, "memory write requires labels"
            wq = self.write_features(query, train)
            nom, den = write_statistics(wq, mask, self.memory_size,
                                        compute_dtype=self.dtype)
            updated = momentum_update(read_items, nom, den, self.momentum)
            div_loss = diversity_loss(updated)
            cls_loss = self.classification_loss(updated)
            new_items = jax.lax.stop_gradient(updated) if writing_detach else updated
        else:
            div_loss = jnp.zeros((), jnp.float32)
            cls_loss = jnp.zeros((), jnp.float32)
            new_items = m_items

        return MemoryOutputs(
            fused=fused,
            score_query=s_query,
            score_memory=s_memory,
            read_loss=read_loss,
            div_loss=div_loss,
            cls_loss=cls_loss,
            m_items=new_items,
        )


# ---------------------------------------------------------------------------
# Auxiliary memory losses / updates from the reference that are NOT on its
# live training path (SURVEY.md §2.2 marks them dead-but-present).  Provided
# as pure functions for API completeness; all are jit-compatible.
# ---------------------------------------------------------------------------


def memory_orthogonality_loss(m_items: jnp.ndarray) -> jnp.ndarray:
    """``MemoryLoss`` (memory.py:58-65): mean |(M Mᵀ)/2 + 1/2 − I| off the
    identity, summed over all entries / (m(m−1))."""
    m = m_items.shape[0]
    sim = jnp.matmul(m_items, m_items.T, precision=_HP) / 2.0 + 0.5
    dev = jnp.abs(sim - jnp.eye(m, dtype=sim.dtype))
    return jnp.sum(dev) / (m * (m - 1))


def gather_loss(query: jnp.ndarray, m_items: jnp.ndarray) -> jnp.ndarray:
    """``Memory_sup.gather_loss`` (memory.py:300-315): MSE between each pixel
    query and its top-1 (softmax-over-slots) memory slot, slots detached.

    query: (B, H, W, D) unnormalized features (the reference normalizes
    inside get_score's caller; scores here use raw dot products exactly as
    memory.py:305 does on the already-viewed query)."""
    d = query.shape[-1]
    flat = query.reshape(-1, d)
    score = jnp.matmul(flat, jax.lax.stop_gradient(m_items).T, precision=_HP)
    top1 = jnp.argmax(score, axis=1)
    target = jax.lax.stop_gradient(m_items)[top1]
    return jnp.mean(jnp.square(flat - target))


def pointwise_gather_loss(query: jnp.ndarray, m_items: jnp.ndarray) -> jnp.ndarray:
    """``pointwise_gather_loss`` (memory.py:292-298): the unreduced
    (per-element) variant of :func:`gather_loss`."""
    d = query.shape[-1]
    flat = query.reshape(-1, d)
    score = jnp.matmul(flat, jax.lax.stop_gradient(m_items).T, precision=_HP)
    top1 = jnp.argmax(score, axis=1)
    target = jax.lax.stop_gradient(m_items)[top1]
    return jnp.square(flat - target)


def spread_loss(
    query: jnp.ndarray, m_items: jnp.ndarray, margin: float = 1.0
) -> jnp.ndarray:
    """``spread_loss`` (memory.py:274-290): triplet margin loss with the
    1st/2nd-closest slots as positive/negative (both detached).

    torch ``TripletMarginLoss`` semantics: mean(max(‖a−p‖₂ − ‖a−n‖₂ + m, 0)),
    with the distance's eps folded in as torch does (1e-6 inside the norm)."""
    d = query.shape[-1]
    flat = query.reshape(-1, d)
    keys = jax.lax.stop_gradient(m_items)
    score = jnp.matmul(flat, keys.T, precision=_HP)
    _, idx = jax.lax.top_k(score, 2)
    pos, neg = keys[idx[:, 0]], keys[idx[:, 1]]
    eps = 1e-6
    d_pos = jnp.sqrt(jnp.sum(jnp.square(flat - pos + eps), axis=1))
    d_neg = jnp.sqrt(jnp.sum(jnp.square(flat - neg + eps), axis=1))
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def unsupervised_memory_update(
    m_items: jnp.ndarray, query: jnp.ndarray, momentum: float
) -> jnp.ndarray:
    """``unsupervised_memupdate`` (memory.py:339-361): label-free write.

    Each pixel soft-assigns to slots (softmax over slots); per-slot update
    vector = attention-weighted mean of queries (columns normalized by their
    total weight); momentum blend + renormalize, detached."""
    d = query.shape[-1]
    qn = l2_normalize(query, axis=-1).reshape(-1, d)
    score = jnp.matmul(qn, m_items.T, precision=_HP)
    attn = jax.nn.softmax(score, axis=1)
    attn = attn / jnp.maximum(jnp.sum(attn, axis=0, keepdims=True), 1e-12)
    update = l2_normalize(jnp.matmul(attn.T, qn, precision=_HP), axis=1)
    new = (1.0 - momentum) * update + momentum * m_items
    return jax.lax.stop_gradient(l2_normalize(new, axis=1))


def top_scoring_update(
    m_items: jnp.ndarray, query: jnp.ndarray
) -> jnp.ndarray:
    """``get_update_query`` (memory.py:147-165), corrected and vectorized.

    Per slot: sum of the queries whose argmax slot is that slot, each scaled
    by score/max-score-of-that-slot; absent slots get zeros.  (The reference
    version has a ``return`` inside its loop so it only ever computes slot 0
    — a bug on dead code; this is the intended full computation, documented
    in PARITY.md.)"""
    m, d = m_items.shape
    flat = query.reshape(-1, d)
    score = jnp.matmul(flat, m_items.T, precision=_HP)
    top1 = jnp.argmax(score, axis=1)
    assign = jax.nn.one_hot(top1, m, dtype=score.dtype)          # (N, M)
    col_max = jnp.maximum(jnp.max(score, axis=0), 1e-12)          # (M,)
    weights = assign * score / col_max[None, :]                   # (N, M)
    return jnp.matmul(weights.T, flat, precision=_HP)             # (M, D)
