"""FULL memory-MLDG episode parity vs. a torch twin (VERDICT r1 item 4).

The reference episode (train.py:493-632) choreographs THREE memory writes per
iteration, each with specific m_items provenance:

  1. inner forward on the real net, ``memory_writing=True,
     writing_detach=False`` -- read detaches memory (memory.py:323-324), the
     write stays in-graph, div/cls losses flow to writenet (train.py:534-541);
  2. frozen-encoder write through the virtual model theta' = theta -
     lr*sg(g_inner), starting AGAIN from the initial memory ``mem_t``
     (train.py:546-558: ``updated_net2.module.memory.m_items = mem_t``);
  3. post-step no-grad clean write in eval mode from ``mem_t`` with the
     updated parameters (train.py:578-583).

The outer loss reads through the substep-written memory with
``memory_writing=False`` -- so its read gradient flows INTO the written
memory and back to the memory params through theta' (train.py:566-575); the
optimizer consumes the SUM of inner+outer grads (zero_grad only at episode
start, train.py:531-576).

This test replays the whole choreography in torch (functional twin with the
reference's exact detach points) on a tiny conv+memory net and asserts the
parameter updates AND the final m_items of ``make_train_step_mldg`` match.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pinthememory_tpu.core.config import (
    Config, MemoryConfig, ModelConfig, OptimConfig, TrainConfig,
)
from pinthememory_tpu.models.memory import MemoryModule, l2_normalize
from pinthememory_tpu.train.loops import make_train_step_mldg
from pinthememory_tpu.train.state import create_train_state

C = 4        # classes == memory slots (class-supervised memory)
D = 8        # feature dim
HW = 8
LR = 0.05
INNER_LR = 0.01
W_READ, W_DIV, W_CLS = 0.02, 0.4, 0.2
MOM = 0.8    # memory momentum


class TinyMemNet(nn.Module):
    """conv encoder -> categorical memory (read+write) -> 1x1 head."""

    @nn.compact
    def __call__(self, x, gts=None, m_items=None, *, memory_writing=False,
                 writing_detach=True, train=False, rng=None, with_aux=None):
        q = nn.Conv(D, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    name="enc")(x)
        mem = MemoryModule(
            input_dim=D, feature_dim=D, memory_size=C, momentum=MOM,
            temperature=1.0, gumbel_read=False, name="memory",
        )(q, m_items, gts, memory_writing=memory_writing,
          writing_detach=writing_detach, train=train, rng=rng)
        y = nn.Conv(C, (1, 1), use_bias=True, name="head")(mem.fused)
        return {"main_out": y, "aux_out": None, "inter_feature": q,
                "taps": [], "mem": mem, "m_items": mem.m_items}


def _to_torch_params(params):
    """Flax param tree -> dict of torch leaf tensors (requires_grad)."""
    def conv_w(k):  # HWIO -> OIHW
        return torch.from_numpy(np.transpose(np.asarray(k), (3, 2, 0, 1)))

    p = {
        "enc.w": conv_w(params["enc"]["kernel"]),
        "enc.b": torch.from_numpy(np.asarray(params["enc"]["bias"])),
        "head.w": conv_w(params["head"]["kernel"]),
        "head.b": torch.from_numpy(np.asarray(params["head"]["bias"])),
        "mem.wconv.w": conv_w(params["memory"]["writenet_conv"]["kernel"]),
        "mem.wbn.w": torch.from_numpy(np.asarray(params["memory"]["writenet_bn"]["scale"])),
        "mem.wbn.b": torch.from_numpy(np.asarray(params["memory"]["writenet_bn"]["bias"])),
        "mem.oconv.w": conv_w(params["memory"]["output_conv"]["kernel"]),
        "mem.obn.w": torch.from_numpy(np.asarray(params["memory"]["output_bn"]["scale"])),
        "mem.obn.b": torch.from_numpy(np.asarray(params["memory"]["output_bn"]["bias"])),
        # flax Dense kernel is (in, out); torch Linear weight is (out, in)
        "mem.cls.w": torch.from_numpy(np.asarray(params["memory"]["clsfier"]["kernel"]).T),
        "mem.cls.b": torch.from_numpy(np.asarray(params["memory"]["clsfier"]["bias"])),
    }
    return {k: v.clone().detach().requires_grad_(True) for k, v in p.items()}


MEM_KEYS = frozenset(k for k in (
    "mem.wconv.w", "mem.wbn.w", "mem.wbn.b", "mem.oconv.w", "mem.obn.w",
    "mem.obn.b", "mem.cls.w", "mem.cls.b",
))


def _bufs():
    return {
        "wbn.rm": torch.zeros(D), "wbn.rv": torch.ones(D),
        "obn.rm": torch.zeros(D), "obn.rv": torch.ones(D),
    }


def _twin_forward(p, bufs, x, mask, m_in, *, memory_writing, writing_detach,
                  training):
    """Reference-semantics forward (deepv3plus memory hook, memory.py:191-257).

    Returns (main_logits, new_m_items, (main, read, div, cls) losses).
    """
    q = F.conv2d(x, p["enc.w"], p["enc.b"], padding=1)          # B,D,H,W

    # ---- read (memory.py:317-336): detach memory when writing
    m_read = m_in.detach() if memory_writing else m_in
    qn = F.normalize(q, dim=1)
    qn_hw = qn.permute(0, 2, 3, 1).contiguous()                 # B,H,W,D
    score = torch.matmul(qn_hw, m_read.t())                     # B,H,W,M
    read_loss = F.cross_entropy(
        score.permute(0, 3, 1, 2).contiguous(), mask, ignore_index=255)
    flat = score.reshape(-1, C)
    s_mem = F.softmax(flat, dim=1)
    retrieved = torch.matmul(s_mem, m_read)                     # N,D
    cat = torch.cat([qn_hw.reshape(-1, D), retrieved], dim=1)
    cat = cat.view(x.shape[0], HW, HW, 2 * D).permute(0, 3, 1, 2).contiguous()
    y = F.conv2d(cat, p["mem.oconv.w"])
    y = F.batch_norm(y, bufs["obn.rm"], bufs["obn.rv"], p["mem.obn.w"],
                     p["mem.obn.b"], training=training, momentum=0.1, eps=1e-5)
    fused = F.relu(y)
    out = F.conv2d(fused, p["head.w"], p["head.b"])
    main = F.cross_entropy(out, mask, ignore_index=255)

    # ---- write (memory.py:206-257)
    if memory_writing:
        wy = F.conv2d(q, p["mem.wconv.w"])
        wy = F.batch_norm(wy, bufs["wbn.rm"], bufs["wbn.rv"], p["mem.wbn.w"],
                          p["mem.wbn.b"], training=training, momentum=0.1,
                          eps=1e-5)
        wq = F.normalize(F.relu(q + wy), dim=1)                 # B,D,H,W
        tm = mask.clone()
        tm[tm == 255] = C
        onehot = F.one_hot(tm, C + 1).float()                   # B,H,W,M+1
        flat_m = onehot.view(x.shape[0], -1, C + 1)
        flat_q = wq.view(x.shape[0], D, -1)
        nom = torch.matmul(flat_q, flat_m).sum(0).t()           # M+1,D
        den = flat_m.sum(1).sum(0)                              # M+1
        updated = m_in.clone().detach()
        for s in range(C):
            if den[s] != 0:
                updated[s] = MOM * m_in[s] + (1 - MOM) * nom[s] / den[s]
        updated = F.normalize(updated, dim=1)
        cos = torch.matmul(updated, updated.t()).clamp(min=0)
        div = (cos.sum() - cos.trace()) / (C * (C - 1))
        cls = F.cross_entropy(F.linear(updated, p["mem.cls.w"], p["mem.cls.b"]),
                              torch.arange(C))
        new_m = updated.detach() if writing_detach else updated
    else:
        div = torch.zeros(())
        cls = torch.zeros(())
        new_m = m_in
    return out, new_m, (main, read_loss, div, cls)


def _total(losses):
    main, read, div, cls = losses
    return main + W_READ * read + W_DIV * div + W_CLS * cls


def test_memory_mldg_full_episode_matches_torch():
    cfg = Config(
        model=ModelConfig(num_classes=C, memory=MemoryConfig(
            enabled=True, mem_slot=C, mem_dim=D, mem_momentum=MOM,
            gumbel_read=False)),
        train=TrainConfig(mldg=True, no_aux_loss=True, mem_readloss=W_READ,
                          mem_divloss=W_DIV, mem_clsloss=W_CLS),
        optim=OptimConfig(lr=LR, momentum=0.0, weight_decay=0.0, poly_exp=0.0),
    )
    model = TinyMemNet()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, HW, HW, 3)).astype(np.float32)
    g = rng.integers(0, C, (2, 2, HW, HW)).astype(np.int32)
    g[0, 0, :2, :2] = 255  # exercise the ignore path
    m0 = np.asarray(l2_normalize(
        jax.random.uniform(jax.random.PRNGKey(7), (C, D)), axis=1))
    batch = {"image": jnp.asarray(x), "gts": jnp.asarray(g),
             "aux_gts": jnp.asarray(g)}

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x[:, 0]),
        jnp.asarray(g[:, 0]), jnp.asarray(m0), memory_writing=True,
        writing_detach=False, train=True)
    state, tx = create_train_state(cfg, variables, jnp.asarray(m0))
    step = make_train_step_mldg(model, cfg, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              (0,), (1,), jnp.float32(INNER_LR))

    # ================= torch twin of train.py:493-632 =================
    p = _to_torch_params(variables["params"])
    bufs = _bufs()
    xt = torch.from_numpy(np.transpose(x, (1, 0, 4, 2, 3)))  # D,B,3,H,W
    gt = torch.from_numpy(np.transpose(g, (1, 0, 2, 3))).long()
    x_tr, y_tr, x_te, y_te = xt[0], gt[0], xt[1], gt[1]
    mem_t = torch.from_numpy(m0).clone()

    # 1. inner forward+backward on the real net (train.py:534-541)
    _, _, inner_losses = _twin_forward(
        p, bufs, x_tr, y_tr, mem_t, memory_writing=True,
        writing_detach=False, training=True)
    inner_total = _total(inner_losses)
    inner_total.backward(retain_graph=True)

    # 2. theta' from DETACHED grads (get_updated_network, train.py:246-260)
    theta = {k: v - INNER_LR * v.grad.detach() for k, v in p.items()}

    # 3. frozen-encoder write substep from mem_t (train.py:546-558);
    #    clone BN stats -- updated_net2's stats are never copied back
    theta_frozen = {k: (v if k in MEM_KEYS else v.detach())
                    for k, v in theta.items()}
    _, m_prime, _ = _twin_forward(
        theta_frozen, {k: v.clone() for k, v in bufs.items()},
        x_tr, y_tr, mem_t, memory_writing=True, writing_detach=False,
        training=True)

    # 4. outer loss on meta-test through theta' and the written memory
    #    (train.py:566-575); read grads flow INTO m_prime
    _, _, outer_losses = _twin_forward(
        theta, {k: v.clone() for k, v in bufs.items()},
        x_te, y_te, m_prime, memory_writing=False, writing_detach=True,
        training=True)
    outer_total = _total(outer_losses)
    outer_total.backward()  # accumulates onto inner grads

    # 5. SGD on summed grads (train.py:576)
    new_p = {k: (v - LR * v.grad).detach() for k, v in p.items()}

    # 6. post-step clean write, eval mode, from mem_t (train.py:578-583)
    _, m_final, _ = _twin_forward(
        new_p, bufs, x_tr, y_tr, mem_t, memory_writing=True,
        writing_detach=True, training=False)

    # ================= compare =================
    np.testing.assert_allclose(float(metrics["inner"]["total"]),
                               float(inner_total), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["outer"]["total"]),
                               float(outer_total), rtol=1e-5)

    got = new_state.params
    exp = {
        ("enc", "kernel"): ("enc.w", "conv"),
        ("enc", "bias"): ("enc.b", None),
        ("head", "kernel"): ("head.w", "conv"),
        ("head", "bias"): ("head.b", None),
        ("memory", "writenet_conv", "kernel"): ("mem.wconv.w", "conv"),
        ("memory", "writenet_bn", "scale"): ("mem.wbn.w", None),
        ("memory", "writenet_bn", "bias"): ("mem.wbn.b", None),
        ("memory", "output_conv", "kernel"): ("mem.oconv.w", "conv"),
        ("memory", "output_bn", "scale"): ("mem.obn.w", None),
        ("memory", "output_bn", "bias"): ("mem.obn.b", None),
        ("memory", "clsfier", "kernel"): ("mem.cls.w", "linT"),
        ("memory", "clsfier", "bias"): ("mem.cls.b", None),
    }
    for path, (tk, kind) in exp.items():
        node = got
        for kpart in path:
            node = node[kpart]
        e = new_p[tk].numpy()
        if kind == "conv":
            e = np.transpose(e, (2, 3, 1, 0))
        elif kind == "linT":
            e = e.T
        # f32 conv-backward accumulation order differs between XLA and torch;
        # observed cross-framework noise is ~1e-5 absolute.  A semantic bug
        # (wrong m_items provenance, second-order term, dropped grad path)
        # shifts these by 1e-2+.
        np.testing.assert_allclose(
            np.asarray(node), e, rtol=1e-4, atol=1e-5,
            err_msg=f"param mismatch at {'/'.join(path)}")

    np.testing.assert_allclose(np.asarray(new_state.m_items),
                               m_final.numpy(), rtol=2e-4, atol=1e-5)

    # the episode must actually move the memory params through the outer path
    assert float(np.abs(
        np.asarray(got["memory"]["writenet_conv"]["kernel"])
        - np.asarray(variables["params"]["memory"]["writenet_conv"]["kernel"])
    ).max()) > 0
