"""Ablation / visualization CLI: t-SNE baskets + memory activation maps.

Reference: ablation.py (RunAbla.tsne_memact, 317-399): per image, collect
class-mean features pre/post memory read into t-SNE baskets, and dump
per-slot memory-activation heatmaps (the softmax_score_memory channel,
viridis colormap blended over the image).

Usage: ``python -m pinthememory_tpu.tools.ablation --memory --tsne
--mem_actmap --dataset cityscapes --snapshot ...``.
"""

from __future__ import annotations

import argparse
import functools
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax

from pinthememory_tpu.utils.compcache import enable as _enable_cache
_enable_cache()  # sitecustomize may import jax before the env var lands
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Pin-the-Memory TPU ablation")
    p.add_argument("--arch", type=str, default="DeepR50V3PlusD")
    p.add_argument("--memory", action="store_true")
    p.add_argument("--snapshot", type=str, default=None)
    p.add_argument("--dataset", nargs="*", default=["cityscapes"])
    p.add_argument("--source_domain", nargs="*", default=[],
                   help="domains drawn as circles in the t-SNE (others: crosses)")
    p.add_argument("--dataset_root", type=str, default="~/dg_seg_dataset")
    p.add_argument("--tsne", action="store_true")
    p.add_argument("--mem_actmap", action="store_true")
    p.add_argument("--crop_size", type=int, default=768)
    p.add_argument("--max_images", type=int, default=50)
    p.add_argument("--results_dir", type=str, default="./abla_results")
    p.add_argument("--test_mode", action="store_true")
    # reference flag-surface parity (ablation.py:53-88) -----------------
    p.add_argument("--all_class", action="store_true",
                   help="basket all 19 classes instead of the reference's "
                        "6-class 'good memory learning' selection "
                        "(ablation.py:448-454)")
    p.add_argument("--duplication", type=int, default=1,
                   help="re-embed/re-plot the t-SNE N times (tsnelib.py:151; "
                        "reference default 10 -- each try re-inits t-SNE)")
    p.add_argument("--imagenum_dom", dest="max_images", type=int,
                   default=argparse.SUPPRESS,
                   help="alias of --max_images: images per domain "
                        "(ablation.py:87, reference default 600)")
    p.add_argument("--outdir", dest="results_dir", default=argparse.SUPPRESS,
                   help="alias of --results_dir (ablation.py:434-435)")
    p.add_argument("--ablation_mode", nargs="*", type=str,
                   default=["tsnemem"],
                   help="accepted for script parity; stored but never "
                        "consumed in the reference either (ablation.py:295)")
    p.add_argument("--tsnecuda", action="store_true",
                   help="reference backend switch (tsnelib.py:29-33); the "
                        "rebuild embeds with sklearn either way (analysis is "
                        "off the hot path)")
    # shared model-assign block (train.py:1045-1079, reused by
    # ablation.py:54); wt_layer / memory knobs are REAL -- whitening archs
    # carry extra normalization params the checkpoint loader must rebuild
    p.add_argument("--wt_layer", nargs="*", type=int, default=[0] * 7)
    p.add_argument("--mem_slot", type=int, default=19)
    p.add_argument("--mem_dim", type=int, default=256)
    p.add_argument("--mem_momentum", type=float, default=0.8)
    p.add_argument("--mem_temp", type=float, default=1.0)
    p.add_argument("--gumbel_off", action="store_true")
    p.add_argument("--relax_denom", type=float, default=0.0)
    p.add_argument("--clusters", type=int, default=50)
    p.add_argument("--exp", type=str, default="default",
                   help="experiment tag in output naming (ablation.py:62)")
    # accepted-for-script-parity no-ops: loss flags are train-only, --image_in
    # is eval-inert (datasets skip normalization in eval modes,
    # cityscapes.py:299-306), distributed plumbing is GSPMD's job
    for flag in ("--local_rank", "--dist_url", "--num_workers", "--trunk"):
        p.add_argument(flag, default=None, help=argparse.SUPPRESS)
    for flag in ("--syncbn", "--image_in", "--img_wt_loss", "--cls_wt_loss",
                 "--jointwtborder", "--use_wtloss"):
        p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    return p


# the reference's default t-SNE class selection, "good memory learning for
# tsne" (ablation.py:453-454); --all_class switches to all 19
SELECTED_CLS_DEFAULT = ("building", "vegetation", "sky", "car", "sidewalk",
                        "pole")


def memact_heatmaps(raw_img: np.ndarray, score_memory: np.ndarray, out_dir: str,
                    name: str, alpha: float = 0.5):
    """Per-slot activation heatmaps blended over the image
    (ablation.py:371-399)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    h, w = raw_img.shape[:2]
    viridis = matplotlib.colormaps["viridis"]
    for slot in range(score_memory.shape[-1]):
        act = score_memory[..., slot]
        act = (act - act.min()) / max(act.max() - act.min(), 1e-8)
        heat = (viridis(act)[..., :3] * 255).astype(np.uint8)
        heat = np.asarray(Image.fromarray(heat).resize((w, h), Image.BILINEAR))
        blend = (alpha * heat + (1 - alpha) * raw_img).astype(np.uint8)
        Image.fromarray(blend).save(os.path.join(out_dir, f"{name}_slot{slot:02d}.png"))


def main(argv=None):
    args = build_parser().parse_args(argv)

    from pinthememory_tpu.core.config import Config, DataConfig, MemoryConfig, ModelConfig
    from pinthememory_tpu.data.loader import build_dataset
    from pinthememory_tpu.evalx.sliding import normalize_image
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.models.memory import init_memory
    from pinthememory_tpu.tools.tsne import TsneCollector
    from pinthememory_tpu.utils.checkpoint import load_torch_snapshot

    if args.test_mode:
        args.max_images = 5

    from pinthememory_tpu.core.config import WhiteningConfig

    mc = ModelConfig(
        arch=args.arch,
        memory=MemoryConfig(enabled=args.memory, mem_slot=args.mem_slot,
                            mem_dim=args.mem_dim,
                            mem_momentum=args.mem_momentum,
                            mem_temp=args.mem_temp,
                            gumbel_read=not args.gumbel_off),
        whitening=WhiteningConfig(wt_layer=tuple(args.wt_layer),
                                  relax_denom=args.relax_denom,
                                  clusters=args.clusters))
    model = build_model(mc)
    m_items = (init_memory(jax.random.PRNGKey(1), args.mem_slot, args.mem_dim)
               if args.memory else None)
    hw = (args.crop_size, args.crop_size)
    init_fn = jax.jit(functools.partial(
        model.init, train=False, with_aux=True, memory_writing=args.memory))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, *hw, 3)),
        jnp.zeros((1, *hw), jnp.int32), m_items, rng=jax.random.PRNGKey(2))
    if args.snapshot:
        variables, loaded_m, _ = load_torch_snapshot(
            args.snapshot, variables, three_stem=False)
        if loaded_m is not None:
            m_items = jnp.asarray(loaded_m)

    # variables/m_items are ARGUMENTS, not closure captures: closed-over
    # arrays are inlined into the HLO as constants, and constant-folding
    # ~40M parameters takes XLA minutes (measured 460s vs seconds on a
    # 1-core CPU host) for zero runtime benefit here
    @jax.jit
    def _forward(variables, m_items, raw):
        img = normalize_image(raw)
        return model.apply(variables, img[None], None, m_items,
                           train=False, with_aux=False)

    def forward(raw):
        return _forward(variables, m_items, raw)

    from pinthememory_tpu.core.labels import TRAINID_NAMES

    if args.all_class:
        selected = None  # every trainId (ablation.py:448-451)
    else:
        name2id = {n: i for i, n in enumerate(TRAINID_NAMES)}
        selected = tuple(name2id[n] for n in SELECTED_CLS_DEFAULT)
    collector = TsneCollector(selected_classes=selected)
    # second basket: the memory-REFINED features (the reference's
    # tsne_runner_updated, ablation.py:356-359 -- updated_features =
    # mem_outputs[-1], the post-read fused dec0_up).  The pre/post scatter
    # pair is the paper's core qualitative evidence that the memory pulls
    # class features together across domains.
    collector_updated = (TsneCollector(selected_classes=selected)
                         if args.memory else None)
    cfg = Config(model=mc, data=DataConfig(dataset_root=args.dataset_root))
    from pinthememory_tpu.data.joint_transforms import CenterCropPad, ResizeHeight

    for ds_name in args.dataset:
        ds = build_dataset(ds_name, cfg, "val", eval_mode="pooling")
        n = min(len(ds), args.max_images)
        for i in range(n):
            raw, gt, name = ds[i]
            # center-crop-pad to a fixed size (ablation.py:160-163)
            from PIL import Image as PILImage

            pim = PILImage.fromarray(raw)
            pma = PILImage.fromarray(gt.astype(np.uint8))
            pim, pma = CenterCropPad(args.crop_size)(pim, pma)
            raw = np.asarray(pim)
            gt = np.asarray(pma).astype(np.int32)

            out = forward(jnp.asarray(raw))
            feat = np.asarray(out["inter_feature"][0])
            if args.tsne:
                # full-res GT: the collector upsamples the normalized
                # features to the mask size (tsnelib.py:62-66)
                collector.add_batch(feat, gt, ds_name)
                if collector_updated is not None and out["mem"] is not None:
                    collector_updated.add_batch(
                        np.asarray(out["mem"].fused[0]), gt, ds_name)
            if args.mem_actmap and out["mem"] is not None:
                memact_heatmaps(
                    raw, np.asarray(out["mem"].score_memory[0]),
                    os.path.join(args.results_dir, "memact"), f"{ds_name}_{name}")

    if args.tsne and collector.features:
        if m_items is not None:
            collector.add_memory(np.asarray(m_items))
        collector.draw(os.path.join(args.results_dir, "tsne"),
                       source_domains=tuple(args.source_domain),
                       duplication=args.duplication)
        print(f"t-SNE written to {args.results_dir}/tsne")
        if collector_updated is not None and collector_updated.features:
            if m_items is not None:
                collector_updated.add_memory(np.asarray(m_items))
            collector_updated.draw(
                os.path.join(args.results_dir, "tsne_updated"),
                source_domains=tuple(args.source_domain),
                duplication=args.duplication)
            print(f"post-memory t-SNE written to {args.results_dir}/tsne_updated")
    return collector, collector_updated


if __name__ == "__main__":
    main()
