"""Numerical parity of the categorical memory vs. the reference math.

The torch golden below restates the reference formulas (network/memory.py:
get_score 167-189, read 317-336, write 206-257, diversityloss 264-272) on
CPU; the JAX implementation must match to float tolerance.  Gumbel sampling
is turned off for determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pinthememory_tpu.models.memory import (
    diversity_loss,
    l2_normalize,
    memory_read,
    momentum_update,
    read_loss_from_score,
    write_statistics,
)

M, D = 19, 32
B, H, W = 2, 6, 8
MH, MW = 24, 32  # full-res mask size


def _setup():
    rng = np.random.default_rng(0)
    query = rng.standard_normal((B, H, W, D), dtype=np.float32)
    mem = rng.standard_normal((M, D), dtype=np.float32)
    mem = mem / np.linalg.norm(mem, axis=1, keepdims=True)
    mask = rng.integers(0, M + 2, size=(B, MH, MW)).astype(np.int64)
    mask[mask >= M] = 255
    return query, mem, mask


def test_read_scores_and_retrieval_match_torch():
    query, mem, mask = _setup()
    qn, retrieved, sq, sm, rloss = memory_read(
        jnp.asarray(mem), jnp.asarray(query), jnp.asarray(mask),
        temperature=1.0, gumbel=False, rng=None,
    )

    # torch golden (memory.py:317-336)
    qt = torch.from_numpy(query).permute(0, 3, 1, 2)  # B,D,H,W
    qt = F.normalize(qt, dim=1).permute(0, 2, 3, 1).contiguous()
    mt = torch.from_numpy(mem)
    score = torch.matmul(qt, mt.t())  # B,H,W,M
    flat = score.view(B * H * W, M)
    sq_t = F.softmax(flat, dim=0).view(B, H, W, M)
    sm_t = F.softmax(flat, dim=1)
    retr_t = torch.matmul(sm_t, mt).view(B, H, W, D)

    np.testing.assert_allclose(np.asarray(qn), qt.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sq), sq_t.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(retrieved), retr_t.numpy(), rtol=1e-4, atol=1e-5)


def test_read_loss_matches_torch_ce_with_upsample():
    query, mem, mask = _setup()
    qn = l2_normalize(jnp.asarray(query), axis=-1)
    score = jnp.einsum("bhwd,md->bhwm", qn, jnp.asarray(mem))
    rloss = read_loss_from_score(score, jnp.asarray(mask), 0.7, M)

    qt = F.normalize(torch.from_numpy(query).permute(0, 3, 1, 2), dim=1)
    st = torch.matmul(qt.permute(0, 2, 3, 1), torch.from_numpy(mem).t())
    st = (st / 0.7).permute(0, 3, 1, 2).contiguous()
    st = F.interpolate(st, size=(MH, MW), mode="bilinear", align_corners=True)
    ref = F.cross_entropy(st, torch.from_numpy(mask), ignore_index=255)
    np.testing.assert_allclose(float(rloss), float(ref), rtol=1e-4, atol=1e-5)


def test_write_statistics_and_momentum_update_match_torch():
    query, mem, mask = _setup()
    wq = l2_normalize(jnp.asarray(query), axis=-1)  # stand-in for writenet output
    nom, den = write_statistics(wq, jnp.asarray(mask), M)
    updated = momentum_update(jnp.asarray(mem), nom, den, momentum=0.8)

    # torch golden (memory.py:206-239)
    qt = F.normalize(torch.from_numpy(query).permute(0, 3, 1, 2), dim=1)
    b, d, h, w = qt.shape
    qflat = qt.reshape(b, d, -1)
    tm = torch.from_numpy(mask).clone()
    tm[tm == 255] = M
    onehot = F.one_hot(tm, num_classes=M + 1)
    onehot = F.interpolate(
        onehot.permute(0, 3, 1, 2).contiguous().float(), [h, w],
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).contiguous()
    onehot = onehot.view(b, -1, M + 1)
    denominator = onehot.sum(1).unsqueeze(1).sum(0).squeeze()
    nominator = torch.matmul(qflat, onehot).sum(0).t()  # (M+1, D)

    np.testing.assert_allclose(np.asarray(nom), nominator[:M].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(den), denominator[:M].numpy(), rtol=1e-4, atol=1e-5)

    updated_t = torch.from_numpy(mem).clone()
    for slot in range(M):
        if denominator[slot] != 0:
            updated_t[slot] = 0.8 * torch.from_numpy(mem)[slot] + (
                0.2 * nominator[slot] / denominator[slot]
            )
    updated_t = F.normalize(updated_t, dim=1)
    np.testing.assert_allclose(np.asarray(updated), updated_t.numpy(), rtol=1e-4, atol=1e-5)


def test_diversity_loss_matches_torch():
    _, mem, _ = _setup()
    ours = diversity_loss(jnp.asarray(mem))
    mt = torch.from_numpy(mem)
    cos = torch.matmul(mt, mt.t())
    cos = torch.clamp(cos, min=0)
    ref = (cos.sum() - torch.trace(cos)) / (M * (M - 1))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_momentum_update_gradient_only_through_statistics():
    """The old memory enters the update detached (memory.py:233)."""
    query, mem, mask = _setup()

    def f(m):
        wq = l2_normalize(jnp.asarray(query), axis=-1)
        nom, den = write_statistics(wq, jnp.asarray(mask), M)
        return jnp.sum(momentum_update(m, nom, den, 0.8))

    g = jax.grad(f)(jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    def f2(q):
        wq = l2_normalize(q, axis=-1)
        nom, den = write_statistics(wq, jnp.asarray(mask), M)
        return jnp.sum(momentum_update(jnp.asarray(mem), nom, den, 0.8))

    g2 = jax.grad(f2)(jnp.asarray(query))
    assert float(jnp.max(jnp.abs(g2))) > 0.0


# ---------------------------------------------------------------------------
# Auxiliary (dead-on-the-reference-live-path) memory helpers vs torch goldens
# restating memory.py:58-65, 274-315, 339-361.
# ---------------------------------------------------------------------------


def test_memory_orthogonality_loss_matches_torch():
    from pinthememory_tpu.models.memory import memory_orthogonality_loss

    _, mem, _ = _setup()
    mt = torch.from_numpy(mem)
    sim = torch.matmul(mt, mt.t()) / 2 + 0.5
    ref = torch.sum(torch.abs(sim - torch.eye(M))) / (M * (M - 1))
    got = memory_orthogonality_loss(jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5)


def test_gather_and_spread_losses_match_torch():
    from pinthememory_tpu.models.memory import gather_loss, spread_loss

    query, mem, _ = _setup()
    qt = torch.from_numpy(query.reshape(-1, D))
    mt = torch.from_numpy(mem)
    score = torch.matmul(qt, mt.t())
    # gather: MSE vs top-1 slot (memory.py:300-315)
    _, gi = torch.topk(F.softmax(score, dim=1), 1, dim=1)
    ref_g = F.mse_loss(qt, mt[gi[:, 0]].detach())
    got_g = gather_loss(jnp.asarray(query), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(got_g), ref_g.numpy(), rtol=1e-5)
    # spread: triplet(top1, top2) (memory.py:274-290)
    _, gi2 = torch.topk(F.softmax(score, dim=1), 2, dim=1)
    trip = torch.nn.TripletMarginLoss(margin=1.0)
    ref_s = trip(qt, mt[gi2[:, 0]].detach(), mt[gi2[:, 1]].detach())
    got_s = spread_loss(jnp.asarray(query), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(got_s), ref_s.numpy(), rtol=1e-5)


def test_unsupervised_update_matches_torch():
    from pinthememory_tpu.models.memory import unsupervised_memory_update

    query, mem, _ = _setup()
    momentum = 0.8
    # torch golden restating memory.py:339-361
    qt = F.normalize(torch.from_numpy(query), dim=-1).reshape(-1, D)
    mt = torch.from_numpy(mem)
    score = torch.matmul(qt, mt.t())
    sm = F.softmax(score, dim=1)
    sm = sm / sm.sum(dim=0, keepdim=True)
    upd = F.normalize(torch.matmul(sm.t(), qt), dim=1)
    ref = F.normalize((1 - momentum) * upd + momentum * mt, dim=1)
    got = unsupervised_memory_update(jnp.asarray(mem), jnp.asarray(query), momentum)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_top_scoring_update_shapes_and_assignment():
    from pinthememory_tpu.models.memory import top_scoring_update

    query, mem, _ = _setup()
    got = np.asarray(top_scoring_update(jnp.asarray(mem), jnp.asarray(query)))
    assert got.shape == (M, D)
    # slots that win no argmax stay zero; winners aggregate their queries
    flat = query.reshape(-1, D)
    top1 = np.argmax(flat @ mem.T, axis=1)
    for slot in range(M):
        if not np.any(top1 == slot):
            np.testing.assert_array_equal(got[slot], np.zeros(D, np.float32))
        else:
            assert np.linalg.norm(got[slot]) > 0
