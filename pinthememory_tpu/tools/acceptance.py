"""One-command mIoU acceptance harness (VERDICT r4 #2; BASELINE.md rows 1-4).

Runs the BASELINE eval protocols on the REBUILD and (optionally) the actual
REFERENCE code (`/root/reference/eval.py`, imported through the same shim
machinery the parity tests use, `tests/ref_harness.py`) side by side on the
same images and the same checkpoint, and prints the per-protocol mIoU delta
table against the 0.2-point acceptance band.

Protocol sources:
  sliding:  eval.py:340-405 (scale set + flip from the shipped scripts,
            crop 768, overlap 1/3) -- BASELINE rows 1/2/4
  pooling:  eval.py:133-146 + 277-337 (whole-image BICUBIC pyramid,
            MeanFusion softmax mean), no-flip -- BASELINE row 3

Usage, the moment data + a released checkpoint exist:

  python -m pinthememory_tpu.tools.acceptance \
      --dataset_root ~/dg_seg_dataset --dataset cityscapes \
      --snapshot pinmem_GS_DR50V3P.pth --protocols sliding,pooling

  # BDD/Mapillary rows: --dataset bdd100k / mapillary (Mapillary applies
  # its ResizeHeight(1536)+CenterCropPad(1536) protocol automatically)

Without datasets on disk, ``--selftest`` proves the whole chain end-to-end:
it builds the real reference ``DeepR50V3PlusD`` (random init, seeded),
converts its weights, evaluates N synthetic images through BOTH pipelines
and reports the deltas (expected ~0; the band still applies).

The reference side needs torch-loadable weights (``.pth``); given a native
``.msgpack`` snapshot the tool runs the rebuild side only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _ref_harness():
    """Import tests/ref_harness.py (repo checkout; not part of the wheel)."""
    here = os.path.dirname(os.path.abspath(__file__))
    tests = os.path.join(os.path.dirname(os.path.dirname(here)), "tests")
    if not os.path.isdir(tests):
        raise SystemExit(
            "reference-side eval needs the repo checkout (tests/ref_harness.py "
            "import machinery); rerun from the repo or pass --skip_reference")
    if tests not in sys.path:
        sys.path.insert(0, tests)
    import ref_harness

    return ref_harness


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", default="~/dg_seg_dataset")
    p.add_argument("--dataset", default="cityscapes",
                   help="cityscapes | bdd100k | mapillary | ... (rows 1-4)")
    p.add_argument("--split", default="val")
    p.add_argument("--snapshot", default=None,
                   help=".pth (both sides) or .msgpack (rebuild only)")
    p.add_argument("--arch", default="DeepR50V3PlusD")
    p.add_argument("--memory", action="store_true", default=True)
    p.add_argument("--no_memory", dest="memory", action="store_false")
    p.add_argument("--protocols", default="sliding,pooling",
                   help="comma list: sliding (flip, crop 768) and/or "
                        "pooling (no-flip)")
    p.add_argument("--scales", default="1.0",
                   help="the shipped eval scripts use 1.0 (BASELINE rows "
                        "1-3); pass 0.5,1.0,2.0 for the multi-scale default")
    p.add_argument("--crop_size", type=int, default=768)
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--tolerance", type=float, default=0.2,
                   help="acceptance band in mIoU points (driver north star)")
    p.add_argument("--skip_reference", action="store_true",
                   help="rebuild side only")
    p.add_argument("--selftest", action="store_true",
                   help="synthetic end-to-end proof: random-init reference "
                        "model, converted weights, synthetic images")
    p.add_argument("--selftest_images", type=int, default=4)
    p.add_argument("--model_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="rebuild compute dtype (f32 = parity default)")
    return p


def _build_rebuild(args, m_items_np=None, torch_sd=None):
    """Rebuild model + variables; returns (apply_fn, m_items)."""
    import functools

    import jax
    import jax.numpy as jnp

    from pinthememory_tpu.core.config import MemoryConfig, ModelConfig
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.models.memory import init_memory

    mc = ModelConfig(arch=args.arch,
                     memory=MemoryConfig(enabled=args.memory),
                     dtype=args.model_dtype)
    model = build_model(mc)
    m_items = (init_memory(jax.random.PRNGKey(1), 19, 256)
               if args.memory else None)
    hw = min(args.crop_size, 256)
    init_fn = jax.jit(functools.partial(
        model.init, train=False, with_aux=True, memory_writing=args.memory))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, hw, hw, 3), jnp.float32),
        jnp.zeros((1, hw, hw), jnp.int32), m_items,
        rng=jax.random.PRNGKey(2))

    if torch_sd is not None:
        from pinthememory_tpu.tools.convert_torch import (
            convert_state_dict, merge_into_variables)

        params, stats, mem, report = convert_state_dict(
            torch_sd, memory=m_items_np)
        variables = merge_into_variables(variables, params, stats)
        if mem is not None:
            m_items = jnp.asarray(mem)
    elif args.snapshot:
        from pinthememory_tpu.utils.checkpoint import load_state, load_torch_snapshot

        if args.snapshot.endswith(".pth"):
            variables, loaded_m, report = load_torch_snapshot(
                args.snapshot, variables)
            if loaded_m is not None:
                m_items = jnp.asarray(loaded_m)
        else:
            from pinthememory_tpu.core.config import Config
            from pinthememory_tpu.train.state import create_train_state

            state, _ = create_train_state(Config(model=mc), variables, m_items)
            state, _meta = load_state(args.snapshot, state)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            m_items = state.m_items
    if m_items_np is not None and torch_sd is None:
        m_items = jnp.asarray(m_items_np)

    def apply_fn(tiles):
        out = model.apply(variables, tiles, None, m_items,
                          train=False, with_aux=False)
        return out["main_out"]

    return apply_fn


def _build_reference(args, harness, torch_sd=None):
    """Real reference net (+ eval module) with the checkpoint loaded."""
    import torch

    net = harness.build_reference_deepr50(memory=args.memory)
    if torch_sd is not None:
        sd = {k.removeprefix("module."): torch.from_numpy(np.asarray(v))
              for k, v in torch_sd.items()}
        missing = net.load_state_dict(
            {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")},
            strict=False)
        del missing
    m_items = None
    if args.snapshot and args.snapshot.endswith(".pth"):
        ckpt = torch.load(args.snapshot, map_location="cpu", weights_only=True)
        sd = {k.removeprefix("module."): v
              for k, v in ckpt.get("state_dict", ckpt).items()}
        net.load_state_dict(sd, strict=False)
        if args.memory and "memory" in ckpt:
            net.memory.m_items = ckpt["memory"].cpu()
            m_items = ckpt["memory"].cpu().numpy()
    net.eval()
    return net, m_items


def _ref_predict_sliding(harness, ref_eval, net, img_u8, crop, scales):
    import torch
    from PIL import Image

    with harness.reference_env(), torch.no_grad():
        preds = ref_eval.inference_sliding(
            net, Image.fromarray(img_u8), list(scales))
    return np.mean(preds, axis=0).transpose(1, 2, 0).argmax(-1)


def _ref_predict_pooling(harness, ref_eval, net, img_u8, scales, flip):
    import torch
    from PIL import Image
    from torchvision import transforms as tvt  # harness's faithful stub

    mean_std = ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])
    img_pil = Image.fromarray(img_u8)
    pyramid = []
    cur = img_pil
    for f in range(int(flip) + 1):
        if f:
            cur = img_pil.transpose(Image.FLIP_LEFT_RIGHT)
        per_scale = []
        for s in scales:
            w, h = cur.size
            resized = cur.resize((int(w * s), int(h * s)))
            t = tvt.Normalize(*mean_std)(tvt.ToTensor()(resized))
            per_scale.append(t.unsqueeze(0))
        pyramid.append(per_scale)
    with harness.reference_env(), torch.no_grad():
        pred = ref_eval.inference_pool(net, pyramid, list(scales))
    # pred is (1, H, W); the concatenate mirrors eval.py:644's batch handling
    return np.concatenate(pred, axis=0)


def _iter_images(args):
    """Yield (raw_u8, gt_i32, name) per the dataset's eval protocol."""
    if args.selftest:
        rng = np.random.default_rng(7)
        for i in range(args.selftest_images):
            raw = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
            gt = rng.integers(0, 19, (96, 160)).astype(np.int32)
            gt[(raw[..., 0] > 240)] = 255  # some ignore pixels
            yield raw, gt, f"selftest_{i}"
        return

    from pinthememory_tpu.core.config import Config, DataConfig
    from pinthememory_tpu.data.loader import build_dataset

    cfg = Config(data=DataConfig(dataset_root=args.dataset_root))
    ds = build_dataset(args.dataset, cfg, args.split, eval_mode="sliding")
    n = len(ds)
    if args.max_images:
        n = min(n, args.max_images)
    eval_joint = None
    if args.dataset == "mapillary":
        from PIL import Image as PILImage

        from pinthememory_tpu.data.joint_transforms import (
            CenterCropPad, ResizeHeight)

        def eval_joint(raw, gt):
            pim = PILImage.fromarray(raw)
            pma = PILImage.fromarray(gt.astype(np.uint8))
            pim, pma = ResizeHeight(1536)(pim, pma)
            pim, pma = CenterCropPad(1536, ignore_index=255)(pim, pma)
            return np.asarray(pim), np.asarray(pma).astype(np.int32)

    for i in range(n):
        raw, gt, name = ds[i]
        if eval_joint is not None:
            raw, gt = eval_joint(raw, gt)
        yield raw, gt, name


def main(argv=None):
    args = build_parser().parse_args(argv)
    scales = tuple(float(s) for s in args.scales.split(","))
    protocols = [p.strip() for p in args.protocols.split(",") if p.strip()]
    crop = args.crop_size if not args.selftest else 64

    if (not args.selftest and not args.snapshot):
        raise SystemExit("pass --snapshot <ckpt> (or --selftest)")
    if (not args.selftest
            and not os.path.isdir(os.path.expanduser(args.dataset_root))):
        raise SystemExit(
            f"dataset_root {args.dataset_root} does not exist; point it at "
            "the reference layout (~/dg_seg_dataset/<dataset>/...) or use "
            "--selftest for the synthetic end-to-end proof")

    from pinthememory_tpu.core.metrics import confusion_matrix, mean_iu
    import jax.numpy as jnp

    with_ref = not args.skip_reference
    if with_ref and args.snapshot and not args.snapshot.endswith(".pth"):
        print("# reference side skipped: snapshot is not torch-loadable "
              "(.msgpack); rebuild side only")
        with_ref = False

    torch_sd = m_items_np = None
    harness = ref_eval = net = None
    if with_ref:
        harness = _ref_harness()
        if args.selftest:
            net = harness.build_reference_deepr50(memory=args.memory)
            net.eval()
            torch_sd = {k: v.numpy() for k, v in net.state_dict().items()}
            if args.memory:
                m_items_np = net.memory.m_items.numpy()
        else:
            net, m_items_np = _build_reference(args, harness)
        ref_eval = harness.import_reference_eval(["--snapshot", "unused"])
        ref_eval.args.sliding_overlap = 1.0 / 3.0
        ref_eval.args.no_flip = False
        ref_eval.args.faster = True
        import types as _t

        ref_eval.args.dataset_cls = _t.SimpleNamespace(num_classes=19)
        ref_eval.args.crop_size = crop

    apply_fn = _build_rebuild(args, m_items_np=m_items_np, torch_sd=torch_sd)

    from pinthememory_tpu.evalx.pooling import PoolingEvaluator
    from pinthememory_tpu.evalx.sliding import SlidingEvaluator

    results = {}
    for proto in protocols:
        flip = proto == "sliding"  # rows 1/2/4 flip; row 3 pooling no-flip
        if proto == "sliding":
            ev = SlidingEvaluator(apply_fn, crop_size=crop, overlap=1 / 3,
                                  scales=scales, flip=flip)
            predict = lambda raw: np.asarray(ev.predict_device(raw))
        elif proto == "pooling":
            ev = PoolingEvaluator(apply_fn, scales=scales, flip=flip)
            predict = lambda raw: np.asarray(ev.predict_probs(raw)).argmax(-1)
        else:
            raise SystemExit(f"unknown protocol {proto!r}")

        hist = np.zeros((19, 19), np.int64)
        hist_ref = np.zeros((19, 19), np.int64)
        t0 = time.time()
        n = 0
        for raw, gt, name in _iter_images(args):
            pred = predict(raw)
            hist += np.asarray(confusion_matrix(
                jnp.asarray(pred), jnp.asarray(gt), 19))
            if with_ref:
                if proto == "sliding":
                    rp = _ref_predict_sliding(
                        harness, ref_eval, net, raw, crop, scales)
                else:
                    ref_eval.args.no_flip = not flip
                    rp = _ref_predict_pooling(
                        harness, ref_eval, net, raw, scales, flip)
                hist_ref += np.asarray(confusion_matrix(
                    jnp.asarray(rp), jnp.asarray(gt), 19))
            n += 1
        ours = mean_iu(hist) * 100
        row = {"protocol": proto, "images": n, "scales": list(scales),
               "flip": flip, "rebuild_miou": round(float(ours), 4),
               "seconds": round(time.time() - t0, 1)}
        if with_ref:
            theirs = mean_iu(hist_ref) * 100
            row["reference_miou"] = round(float(theirs), 4)
            row["delta"] = round(float(ours - theirs), 4)
            row["pass"] = bool(abs(ours - theirs) <= args.tolerance)
        results[proto] = row
        print(json.dumps(row))

    fails = [p for p, r in results.items() if r.get("pass") is False]
    if with_ref:
        verdict = "FAIL" if fails else "PASS"
        print(f"# acceptance {verdict}: "
              + ", ".join(f"{p}: Δ{r.get('delta', 'n/a')}"
                          for p, r in results.items())
              + f" (band ±{args.tolerance})")
    if fails:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
