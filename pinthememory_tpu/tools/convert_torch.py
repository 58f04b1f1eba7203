"""PyTorch checkpoint -> JAX state converter.

Maps the reference's ``state_dict`` naming (network/deepv3plus.py +
network/Resnet.py module tree, checkpoint payload per utils/misc.py:206-216)
onto this package's param/batch_stats pytrees.  Works straight off a
released ``.pth`` (keys may carry the DDP ``module.`` prefix,
optimizer.py:45-70), including the raw ``'memory'`` tensor.

Layout conversions:
  conv   weight (O, I, kH, kW)  -> kernel (kH, kW, I, O)
  linear weight (O, I)          -> kernel (I, O)
  BN     weight/bias            -> params  {scale, bias}
         running_mean/var       -> batch_stats {mean, var}
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def _dense(w) -> np.ndarray:
    return np.transpose(np.asarray(w, dtype=np.float32), (1, 0))


def _set(tree: dict, path: tuple[str, ...], leaf_name: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


class ConversionReport:
    def __init__(self):
        self.mapped: list[str] = []
        self.skipped: list[str] = []

    def __repr__(self):
        return f"<ConversionReport mapped={len(self.mapped)} skipped={len(self.skipped)}>"


def _map_mobilenet(parts, leaf, value, put) -> bool:
    """MobileNetV2 trunk keys (reference Mobilenet.py wrapped by the
    DeepV3Plus layer split, deepv3plus.py:259-283: layer0=f0-1, layer1=f2-6,
    layer2=f7-10, layer3=f11-17, layer4=f18).

    torchvision layouts: stem/f18 are ConvBNReLU ``{0|1}``; InvertedResidual
    ``conv`` is [pw CBR, dw CBR, pwl conv, pwl bn] (or [dw CBR, pwl conv,
    pwl bn] for the expand-ratio-1 f1).  Rebuild names: models/mobilenet.py
    (f{k}/{pw,dw,pwl}_{conv,bn}).
    """
    L, j = parts[0], parts[1]
    if L == "layer0" and j == "0":      # stem ConvBNReLU: layer0.0.{0|1}
        kind = "conv" if parts[2] == "0" else "bn"
        return put(("backbone", f"f0_{kind}"), kind, leaf, value)
    if L == "layer4":                    # f18 ConvBNReLU: layer4.0.{0|1}
        kind = "conv" if parts[2] == "0" else "bn"
        return put(("backbone", f"f18_{kind}"), kind, leaf, value)
    if parts[2] != "conv":
        return False
    base = {"layer0": 0, "layer1": 2, "layer2": 7, "layer3": 11}.get(L)
    if base is None:
        return False
    block = f"f{base + int(j)}"
    if block == "f1":                    # expand_ratio 1: no pw stage
        entry = {"0": ("dw", True), "1": ("pwl_conv", False),
                 "2": ("pwl_bn", False)}.get(parts[3])
    else:
        entry = {"0": ("pw", True), "1": ("dw", True),
                 "2": ("pwl_conv", False), "3": ("pwl_bn", False)}.get(parts[3])
    if entry is None:
        return False
    name, is_cbr = entry
    if is_cbr:                           # ConvBNReLU: parts[4] = 0|1
        kind = "conv" if parts[4] == "0" else "bn"
        return put(("backbone", block, f"{name}_{kind}"), kind, leaf, value)
    kind = "conv" if name.endswith("_conv") else "bn"
    return put(("backbone", block, name), kind, leaf, value)


def _map_shufflenet(parts, leaf, value, put) -> bool:
    """ShuffleNetV2 trunk keys (reference Shufflenet.py wrapped by the
    DeepV3Plus Layer0-4 classes, deepv3plus.py:121-208: layer0.layer =
    conv1+maxpool, layer1/2/3 = stage2/3/4, layer4.layer = conv5).

    Rebuild names: models/shufflenet.py (stage{s}_unit{j}/b1_*, b2_*).
    """
    L = parts[0]
    if L == "layer0":                    # layer0.layer.0.{0|1}
        if parts[1] != "layer":
            return False
        kind = "conv" if parts[3] == "0" else "bn"
        return put(("backbone", "conv1" if kind == "conv" else "conv1_bn"),
                   kind, leaf, value)
    if L == "layer4":                    # layer4.layer.{0|1}
        if parts[1] != "layer":
            return False
        kind = "conv" if parts[2] == "0" else "bn"
        return put(("backbone", "conv5" if kind == "conv" else "conv5_bn"),
                   kind, leaf, value)
    stage = {"layer1": 2, "layer2": 3, "layer3": 4}.get(L)
    if stage is None or parts[2] not in ("branch1", "branch2"):
        return False
    block = f"stage{stage}_unit{parts[1]}"
    table = ({"0": ("b1_dw", "conv"), "1": ("b1_dw_bn", "bn"),
              "2": ("b1_pw", "conv"), "3": ("b1_pw_bn", "bn")}
             if parts[2] == "branch1" else
             {"0": ("b2_pw1", "conv"), "1": ("b2_pw1_bn", "bn"),
              "3": ("b2_dw", "conv"), "4": ("b2_dw_bn", "bn"),
              "5": ("b2_pw2", "conv"), "6": ("b2_pw2_bn", "bn")})
    entry = table.get(parts[3])
    if entry is None:
        return False
    return put(("backbone", block, entry[0]), entry[1], leaf, value)


def _stem_map(three_stem: bool) -> dict[str, str]:
    if three_stem:  # ResNet3X3 (resnet-101): Sequential indices 0,1,3,4,6,7
        return {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2", "6": "conv3", "7": "bn3"}
    return {"0": "conv1", "1": "bn1"}


def convert_state_dict(
    state_dict: Mapping[str, Any],
    three_stem: bool = False,
    memory: np.ndarray | None = None,
) -> tuple[dict, dict, np.ndarray | None, ConversionReport]:
    """Convert a reference DeepV3Plus/DeepV3/DeepV2 state_dict.

    Returns (params, batch_stats, m_items, report).  Tensors that have no
    counterpart (``num_batches_tracked``, the unused ``mem_cls`` buffer...)
    are recorded as skipped, mirroring ``forgiving_state_restore``.
    """
    params: dict = {}
    stats: dict = {}
    report = ConversionReport()
    stem = _stem_map(three_stem)
    # DeepV2 sniff: its summed ASPP is an nn.ModuleList of Sequential
    # (conv, bn, relu) under ``aspp.conv2d_list`` (deepv2.py:40-52) and its
    # decoder is final1=Sequential(conv, bn, relu) (deepv2.py:140-143) --
    # different key layout AND different rebuild module names than V3Plus
    is_v2 = any("conv2d_list" in k for k in state_dict)
    # trunk sniffs (key shapes are mutually exclusive):
    # MobileNetV2's layer0.1 is an InvertedResidual with a .conv Sequential;
    # ShuffleNetV2 blocks carry .branch2. and its stem is layer0.layer.*
    is_mobilenet = any(
        k.removeprefix("module.").startswith("layer0.1.conv.")
        for k in state_dict)
    is_shufflenet = any(".branch2." in k for k in state_dict)

    def put(path: tuple[str, ...], kind: str, leaf: str, value):
        """kind: conv|bn|dense; leaf: torch leaf name."""
        value = np.asarray(value, dtype=np.float32)
        if kind == "conv":
            if leaf == "weight":
                _set(params, path, "kernel", _conv(value))
            else:
                _set(params, path, "bias", value)
        elif kind == "dense":
            if leaf == "weight":
                _set(params, path, "kernel", _dense(value))
            else:
                _set(params, path, "bias", value)
        elif kind == "bn":
            if leaf == "weight":
                _set(params, path, "scale", value)
            elif leaf == "bias":
                _set(params, path, "bias", value)
            elif leaf == "running_mean":
                _set(stats, path, "mean", value)
            elif leaf == "running_var":
                _set(stats, path, "var", value)
            else:
                return False
        return True

    for key, value in state_dict.items():
        k = key
        if k.startswith("module."):
            k = k[len("module."):]
        parts = k.split(".")
        leaf = parts[-1]
        ok = False

        if leaf == "num_batches_tracked" or parts[0] in ("mem_cls", "celoss"):
            report.skipped.append(key)
            continue

        # ---- non-ResNet trunks (distinct key shapes, see the sniffs)
        if is_mobilenet and parts[0].startswith("layer"):
            ok = _map_mobilenet(parts, leaf, value, put)

        elif is_shufflenet and parts[0].startswith("layer"):
            ok = _map_shufflenet(parts, leaf, value, put)

        # ---- backbone stem: layer0.{i}.<leaf>
        elif parts[0] == "layer0" and len(parts) == 3:
            idx = parts[1]
            if idx in stem:
                name = stem[idx]
                kind = "conv" if name.startswith("conv") else "bn"
                ok = put(("backbone", name), kind, leaf, value)

        # ---- backbone stages: layer{L}.{j}.<mod>...<leaf>
        elif re.fullmatch(r"layer[1-4]", parts[0]) and len(parts) >= 3:
            layer, j = parts[0], parts[1]
            base = ("backbone", layer, f"block{j}")
            mod = parts[2]
            if mod.startswith("conv"):
                ok = put(base + (mod,), "conv", leaf, value)
            elif mod.startswith("bn"):
                ok = put(base + (mod,), "bn", leaf, value)
            elif mod == "downsample":
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                kind = "conv" if parts[3] == "0" else "bn"
                ok = put(base + (sub,), kind, leaf, value)
            elif mod == "instance_norm_layer":
                # affine InstanceNorm (iw==4) or SyncSwitchWhiten (iw==5)
                ok = put(base + ("post_in_affine",), "bn", leaf, value)

        # ---- ASPP: aspp.features.{k}.{0|1}.*  /  aspp.img_conv.{0|1}.*
        elif parts[0] == "aspp":
            if parts[1] == "features":
                branch = f"branch{parts[2]}"
                sub, kind = (f"{branch}_conv", "conv") if parts[3] == "0" else (f"{branch}_bn", "bn")
                ok = put(("aspp", sub), kind, leaf, value)
            elif parts[1] == "img_conv":
                sub, kind = ("img_conv", "conv") if parts[2] == "0" else ("img_bn", "bn")
                ok = put(("aspp", sub), kind, leaf, value)
            elif parts[1] == "conv2d_list":
                # DeepV2 summed ASPP: aspp.conv2d_list.{k}.{0|1}.*
                branch = f"branch{parts[2]}"
                sub, kind = ((f"{branch}_conv", "conv") if parts[3] == "0"
                             else (f"{branch}_bn", "bn"))
                ok = put(("aspp", sub), kind, leaf, value)

        # ---- decoder heads
        elif parts[0] in ("bot_fine", "bot_aspp"):
            sub, kind = (f"{parts[0]}_conv", "conv") if parts[1] == "0" else (f"{parts[0]}_bn", "bn")
            ok = put((sub,), kind, leaf, value)
        elif parts[0] == "final1":
            if is_v2:  # Sequential(conv, bn, relu) -> final1_conv/final1_bn
                sub = {"0": ("final1_conv", "conv"),
                       "1": ("final1_bn", "bn")}.get(parts[1])
            else:
                sub = {"0": ("final1_conv1", "conv"), "1": ("final1_bn1", "bn"),
                       "3": ("final1_conv2", "conv"), "4": ("final1_bn2", "bn")}.get(parts[1])
            if sub:
                ok = put((sub[0],), sub[1], leaf, value)
        elif parts[0] == "final2":
            ok = put(("final2_conv",), "conv", leaf, value)
        elif parts[0] == "dsn":
            sub = {"0": ("dsn_conv1", "conv"), "1": ("dsn_bn", "bn"),
                   "4": ("dsn_conv2", "conv")}.get(parts[1])
            if sub:
                ok = put((sub[0],), sub[1], leaf, value)

        # ---- memory module
        elif parts[0] == "memory":
            if parts[1] == "writenet":  # memory.writenet.writefeat.{0|1}
                sub, kind = ("writenet_conv", "conv") if parts[3] == "0" else ("writenet_bn", "bn")
                ok = put(("memory", sub), kind, leaf, value)
            elif parts[1] == "output":
                sub, kind = ("output_conv", "conv") if parts[2] == "0" else ("output_bn", "bn")
                ok = put(("memory", sub), kind, leaf, value)
            elif parts[1] == "clsfier":
                ok = put(("memory", "clsfier"), "dense", leaf, value)
            elif parts[1] == "m_items":
                memory = np.asarray(value, dtype=np.float32)
                ok = True

        (report.mapped if ok else report.skipped).append(key)

    m_items = np.asarray(memory, dtype=np.float32) if memory is not None else None
    return params, stats, m_items, report


def _torch_load_safe(path: str):
    """torch.load preferring ``weights_only=True`` (no arbitrary pickle code
    execution from an untrusted .pth); falls back to unsafe loading only for
    legacy checkpoints whose payload contains non-tensor objects, with a
    loud warning."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(
            f"{path}: weights_only load failed; falling back to full pickle "
            "loading -- only do this for checkpoints you trust")
        return torch.load(path, map_location="cpu", weights_only=False)


def load_reference_checkpoint(path: str, three_stem: bool = False):
    """Load a released ``.pth`` (payload: utils/misc.py:206-216)."""
    ckpt = _torch_load_safe(path)
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items() if hasattr(v, "numpy")}
    memory = ckpt.get("memory")
    if memory is not None:
        memory = memory.cpu().numpy()
    return convert_state_dict(state_dict, three_stem=three_stem, memory=memory)


def convert_optimizer_state(ckpt: Mapping[str, Any], three_stem: bool = False):
    """Convert the torch-SGD + LambdaLR payload of a reference checkpoint
    (saved as ``'optimizer'``/``'scheduler'``/``'epoch'``/``'mean_iu'``,
    utils/misc.py:206-212; restored by optimizer.py:45-56) into the
    rebuild's optax pieces.

    Returns ``(momenta, count, epoch, mean_iu, report)``:
      - ``momenta``: SGD momentum buffers as a params-shaped nested dict.
        torch indexes optimizer state by position in ``named_parameters()``
        order, which equals the state_dict's parameter order (per module,
        ``_parameters`` precede ``_buffers``); each buffer has its
        parameter's shape, so it converts through the SAME
        :func:`convert_state_dict` machinery keyed by the parameter name
        (transposes ride along).
      - ``count``: LambdaLR ``last_epoch`` = number of scheduler.step()
        calls = training iterations taken (train.py:370/483/624/721 step it
        once per iteration) -- becomes the optax schedule count AND the
        resume iteration (reference resume: ``i = epoch * len(loader)``,
        train.py:111-118).
    """
    sd = ckpt.get("state_dict", {})
    opt_sd = ckpt.get("optimizer") or {}
    buffer_leaves = ("running_mean", "running_var", "num_batches_tracked")
    param_keys = [
        k for k in sd
        if not k.endswith(buffer_leaves)
        # criterion modules registered on the net contribute BUFFERS only
        # (CrossEntropyLoss class-weight), never optimizer params
        and ".criterion" not in k and not k.startswith("criterion")
    ]
    idx2key: dict[int, str] = {}
    n = 0
    for group in opt_sd.get("param_groups", []):
        for idx in group.get("params", []):
            if n < len(param_keys):
                idx2key[int(idx)] = param_keys[n]
            n += 1

    mom_sd: dict[str, Any] = {}
    for idx, st in (opt_sd.get("state") or {}).items():
        buf = st.get("momentum_buffer")
        if buf is None:
            continue
        key = idx2key.get(int(idx))
        if key is not None:
            mom_sd[key] = (buf.cpu().numpy() if hasattr(buf, "cpu")
                           else np.asarray(buf))
    momenta, mom_stats, _m, report = convert_state_dict(
        mom_sd, three_stem=three_stem)
    # a momentum buffer that converts into batch_stats would mean the index
    # mapping slipped onto a BN running stat -- that must never happen
    assert not any(mom_stats.values()), "momentum buffer mapped to a buffer path"

    sched = ckpt.get("scheduler") or {}
    count = int(sched.get("last_epoch", 0))
    return (momenta, count, int(ckpt.get("epoch", 0)),
            float(ckpt.get("mean_iu", 0.0)), report)


def convert_torchvision_trunk(
    state_dict: Mapping[str, Any],
    three_stem: bool = False,
) -> tuple[dict, dict, ConversionReport]:
    """Convert a torchvision-format ResNet ImageNet state_dict to backbone
    params/stats (trunk only).

    Reference: every training recipe starts from ImageNet weights via
    ``model_zoo.load_url`` + ``forgiving_state_restore``
    (Resnet.py:499-559); the classifier ``fc`` head and
    ``num_batches_tracked`` counters are dropped, and whitening-replaced
    norms simply fail the name/shape match downstream (forgiving
    semantics).  torchvision keys (``conv1.*``, ``bn1.*``, ``layerL.j.*``)
    are rewritten to the reference's wrapped-``layer0`` layout and fed
    through :func:`convert_state_dict`.
    """
    remapped: dict[str, Any] = {}
    skipped: list[str] = []
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("fc.") or k.endswith("num_batches_tracked"):
            skipped.append(k)
        elif k.startswith("conv1."):
            remapped["layer0.0." + k[len("conv1."):]] = v
        elif k.startswith("bn1."):
            remapped["layer0.1." + k[len("bn1."):]] = v
        elif re.match(r"layer[1-4]\.", k):
            remapped[k] = v
        else:
            skipped.append(k)
    params, stats, _, report = convert_state_dict(remapped, three_stem=three_stem)
    report.skipped.extend(skipped)
    return params, stats, report


def load_imagenet_trunk(path: str, variables: dict) -> tuple[dict, ConversionReport]:
    """Load a torchvision ResNet ImageNet ``.pth`` into the backbone of
    ``variables`` with forgiving-restore semantics (Resnet.py:499-559)."""
    ckpt = _torch_load_safe(path)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state_dict = {k: v.numpy() for k, v in state_dict.items() if hasattr(v, "numpy")}
    params, stats, report = convert_torchvision_trunk(state_dict)
    merged = merge_into_variables(variables, params, stats)
    return merged, report


def merge_into_variables(variables: dict, params: dict, stats: dict) -> dict:
    """Forgiving merge (optimizer.py:73-89): copy where name+shape match."""
    import jax

    def merge(dst, src, path=""):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {}), path + k + "/")
            else:
                s = src.get(k)
                if s is not None and tuple(np.shape(s)) == tuple(np.shape(v)):
                    out[k] = jax.numpy.asarray(s, dtype=v.dtype)
                else:
                    out[k] = v
        return out

    return {
        "params": merge(variables["params"], params),
        "batch_stats": merge(variables.get("batch_stats", {}), stats),
    }


def main(argv=None):
    """CLI: convert a released reference ``.pth`` into a native msgpack
    checkpoint of ``{params, batch_stats, m_items}`` for a chosen arch."""
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a PintheMemory torch .pth to a native checkpoint")
    ap.add_argument("snapshot", help="input .pth path")
    ap.add_argument("output", help="output .msgpack path")
    ap.add_argument("--arch", default="DeepR50V3PlusD")
    ap.add_argument("--memory", action="store_true",
                    help="build the model with the categorical memory head")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.models.memory import init_memory
    from pinthememory_tpu.utils.checkpoint import load_torch_snapshot, save_state

    mc = ModelConfig(arch=args.arch, memory=MemoryConfig(enabled=args.memory))
    model = build_model(mc)
    three_stem = False  # live reference trunks all use the 7x7 stem
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    kw = {}
    if args.memory:
        kw = dict(gts=jnp.zeros((1, 64, 64), jnp.int32),
                  m_items=init_memory(jax.random.PRNGKey(1), 19, 256),
                  rng=jax.random.PRNGKey(2), memory_writing=True)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False, with_aux=True, **kw))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    merged, m_items, report = load_torch_snapshot(
        args.snapshot, variables, three_stem=three_stem)
    payload = {"variables": merged, "m_items": m_items}
    save_state(args.output, payload, meta={"arch": args.arch, "report": repr(report)})
    print(f"converted {args.snapshot} -> {args.output}  ({report!r})")


if __name__ == "__main__":
    main()
