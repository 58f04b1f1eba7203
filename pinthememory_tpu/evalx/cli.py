"""Evaluation entry point: ``python -m pinthememory_tpu.evalx.cli --...``.

Mirrors the reference eval CLI (eval.py:62-110,705-789): restore a snapshot
(msgpack or reference ``.pth``), run sliding or pooling inference over the
chosen dataset, stream the confusion matrix, report per-class IoU and mIoU,
optionally dump colorized predictions.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax

from pinthememory_tpu.utils.compcache import enable as _enable_cache
_enable_cache()  # sitecustomize may import jax before the env var lands
import jax.numpy as jnp
import numpy as np

from pinthememory_tpu.core.labels import TRAINID_NAMES, trainid_palette
from pinthememory_tpu.core.metrics import confusion_matrix, format_class_table, mean_iu


def build_parser():
    p = argparse.ArgumentParser(description="Pin-the-Memory TPU evaluation")
    p.add_argument("--arch", type=str, default="DeepR50V3PlusD")
    p.add_argument("--memory", action="store_true")
    p.add_argument("--mem_slot", type=int, default=19)
    p.add_argument("--mem_dim", type=int, default=256)
    p.add_argument("--dataset", type=str, default="cityscapes")
    p.add_argument("--video_folder", type=str, default=None,
                   help="label-free image folder for qualitative inference "
                        "(reference: eval.py:544-561, datasets/video_folder.py)")
    p.add_argument("--dataset_root", type=str, default="~/dg_seg_dataset")
    p.add_argument("--snapshot", type=str, default=None,
                   help=".pth (reference) or .msgpack (native) checkpoint")
    p.add_argument("--inference_mode", default="sliding",
                   choices=["sliding", "pooling"])
    p.add_argument("--scales", type=str, default="1.0")
    p.add_argument("--no_flip", action="store_true")
    p.add_argument("--crop_size", type=int, default=768)
    p.add_argument("--sliding_overlap", type=float, default=1 / 3)
    p.add_argument("--no_aot", action="store_true",
                   help="disable the persistent compiled-executable cache "
                        "(utils/aotcache.py); warm starts then re-trace + "
                        "re-compile every tile program")
    p.add_argument("--ctx_weights", action="store_true",
                   help="thread model weights as program arguments: AOT "
                        "executables become checkpoint-independent and warm "
                        "start fastest, at a measured -3%% throughput "
                        "(BASELINE.md 5d)")
    p.add_argument("--dump_images", action="store_true")
    p.add_argument("--results_dir", type=str, default="./eval_results")
    p.add_argument("--fast_merge", action="store_true",
                   help="merge tiles at decoder resolution and upsample once "
                        "per image (NOT the reference protocol near tile "
                        "seams; see PARITY.md)")
    p.add_argument("--merge_count", default="reference",
                   choices=["reference", "uniform"],
                   help="'reference' reproduces eval.py:215-228's count-"
                        "indexing bug (released numbers include it); "
                        "'uniform' is the intended overlap average "
                        "(PARITY.md)")
    p.add_argument("--test_mode", action="store_true")
    p.add_argument("--split", type=str, default="val",
                   help="dataset split to evaluate (eval.py:80)")
    p.add_argument("--cv_split", type=int, default=0,
                   help="Cityscapes 3-fold CV split (eval.py:88)")
    p.add_argument("--split_index", type=int, default=0,
                   help="shard index for parallel eval jobs (eval.py:91)")
    p.add_argument("--split_count", type=int, default=1,
                   help="number of parallel eval shards (eval.py:92)")
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--eval_batch", type=int, default=2,
                   help="same-shape images batched through one vmapped "
                        "program (sliding mode; bench.py's measured path)")
    p.add_argument("--scale_batch", default=None,
                   help="per-scale image-batch caps, e.g. '0.5:8,1.0:4,2.0:2'"
                        " (eval_batch becomes the super-batch; identical "
                        "predictions, better dispatch amortization at small "
                        "scales)")
    p.add_argument("--stream_tiles", type=int, default=0,
                   help="run tiles through the model in chunks of N, "
                        "accumulating into the merged map (drops the tile-"
                        "logit working set; slower on v5e -- BASELINE 5b -- "
                        "but enables larger batches on bigger-HBM parts)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard eval batches over all visible devices "
                        "(GSPMD data axis; the reference's DDP eval + hist "
                        "all-reduce, eval.py:123-127). eval_batch becomes "
                        "the per-device batch")
    p.add_argument("--spatial", type=int, default=1,
                   help="with --data_parallel: shard each image's H over a "
                        "spatial mesh axis of this size (GSPMD halo "
                        "exchange; splits the scale-2.0 HBM working set "
                        "across the spatial group -- BASELINE.md 5b). "
                        "devices = data x spatial")
    p.add_argument("--model_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    # reference flag-surface parity -------------------------------------
    # shared model-assign block (train.py:1045-1079, reused by eval.py:63);
    # wt_layer / memory knobs are REAL here -- whitening archs carry extra
    # normalization params the checkpoint loader must rebuild
    p.add_argument("--wt_layer", nargs="*", type=int, default=[0] * 7)
    p.add_argument("--mem_momentum", type=float, default=0.8)
    p.add_argument("--mem_temp", type=float, default=1.0)
    p.add_argument("--gumbel_off", action="store_true")
    p.add_argument("--relax_denom", type=float, default=0.0)
    p.add_argument("--clusters", type=int, default=50)
    p.add_argument("--dataset_cls", dest="dataset", default=argparse.SUPPRESS,
                   help="alias of --dataset (eval.py:76; the reference "
                        "overwrites it with the dataset module internally)")
    p.add_argument("--exp", type=str, default="default",
                   help="experiment tag in output naming (eval.py:85)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of the first batches "
                        "(the reference declares --profile but never "
                        "consumes it, eval.py:67)")
    p.add_argument("--mode", dest="split", default=argparse.SUPPRESS,
                   help="alias of --split (the reference passes the split "
                        "as --mode, eval.py:80,426)")
    p.add_argument("--videopath", dest="video_folder",
                   default=argparse.SUPPRESS,
                   help="alias of --video_folder (eval.py:555-561)")
    p.add_argument("--fixed_aspp_pool", action="store_true",
                   help="fix the ASPP image pooling to AvgPool2d(105) -- "
                        "the tensor size when trained at crop 840x840 "
                        "(eval.py:741-745)")
    p.add_argument("--faster", action="store_true",
                   help="reference flag that batches crops through the model "
                        "(eval.py:379-381); the rebuild ALWAYS batches tiles "
                        "(evalx/sliding.py), so this is accepted as a no-op")
    # accepted-for-script-parity, no effect here: distributed plumbing that
    # GSPMD replaces (--local_rank/--dist_url/--syncbn/--dist_bn, see
    # PARITY.md) and flags that are declared but dead in the reference too
    # (--resume is never read, eval.py:94-95; --trunk / --visualize_feature
    # have no eval-path consumer)
    for flag in ("--local_rank", "--dist_url", "--trunk", "--dataset_dir",
                 "--num_workers", "--trials"):
        p.add_argument(flag, default=None, help=argparse.SUPPRESS)
    # --image_in is eval-inert in the reference too: datasets skip
    # normalization entirely in eval modes (cityscapes.py:299-306 is behind
    # ``if not self.eval_mode``) and the protocols normalize with the
    # ImageNet constants (eval.py:366-367)
    for flag in ("--syncbn", "--dist_bn", "--resume", "--visualize_feature",
                 "--image_in", "--img_wt_loss", "--cls_wt_loss",
                 "--jointwtborder", "--use_wtloss"):
        p.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from pinthememory_tpu.core.config import Config, DataConfig, MemoryConfig, ModelConfig
    from pinthememory_tpu.data.loader import build_dataset
    from pinthememory_tpu.evalx.pooling import PoolingEvaluator
    from pinthememory_tpu.evalx.sliding import SlidingEvaluator
    from pinthememory_tpu.models import build_model
    from pinthememory_tpu.models.memory import init_memory
    from pinthememory_tpu.utils.checkpoint import load_state, load_torch_snapshot

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
                                  clusters=args.clusters),
        fixed_aspp_pool=105 if args.fixed_aspp_pool else 0,
        dtype=args.model_dtype,
    )
    model = build_model(mc)
    m_items = (init_memory(jax.random.PRNGKey(1), args.mem_slot, args.mem_dim)
               if args.memory else None)
    hw = (args.crop_size, args.crop_size)
    init_fn = jax.jit(functools.partial(
        model.init, train=False, with_aux=True, memory_writing=args.memory))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, *hw, 3), jnp.float32),
        jnp.zeros((1, *hw), jnp.int32), m_items, rng=jax.random.PRNGKey(2))

    if args.snapshot:
        if args.snapshot.endswith(".pth"):
            variables, loaded_m, report = load_torch_snapshot(
                args.snapshot, variables, three_stem=False)
            if loaded_m is not None:
                m_items = jnp.asarray(loaded_m)
            print(f"restored {args.snapshot}: {report}")
        else:
            from pinthememory_tpu.train.state import create_train_state

            cfg_t = Config(model=mc)
            state, _ = create_train_state(cfg_t, variables, m_items)
            state, meta = load_state(args.snapshot, state)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            m_items = state.m_items
            print(f"restored {args.snapshot}: {meta}")

    # closure mode (default): weights are jit constants, +3% throughput
    # from XLA constant folding; --ctx_weights threads them as program
    # ARGUMENTS instead -- AOT executables carry no weights and survive
    # checkpoint changes, warm start is fastest (BASELINE.md 5d)
    if args.ctx_weights:
        ctx = {"v": variables, "m": m_items}

        def apply_fn(c, tiles):
            out = model.apply(c["v"], tiles, None, c["m"],
                              train=False, with_aux=False)
            return out["main_out"]

        def apply_low_fn(c, tiles):
            out = model.apply(c["v"], tiles, None, c["m"],
                              train=False, with_aux=False)
            return out["low_out"]
    else:
        ctx = None

        def apply_fn(tiles):
            out = model.apply(variables, tiles, None, m_items,
                              train=False, with_aux=False)
            return out["main_out"]

        def apply_low_fn(tiles):
            out = model.apply(variables, tiles, None, m_items,
                              train=False, with_aux=False)
            return out["low_out"]

    scales = tuple(float(s) for s in args.scales.split(","))
    scale_batch = None
    if args.scale_batch:
        scale_batch = {float(k): int(v) for k, v in
                       (kv.split(":") for kv in args.scale_batch.split(","))}
    aot = None
    if not args.no_aot:
        # the tag covers the non-shape config constants that trace into
        # the programs; in closure mode the weights are baked into the
        # executables, so the snapshot FILE digest (local disk -- never
        # pull params back through the device link) must join the key
        cfg_tag = (f"{args.arch}_m{int(args.memory)}_{args.model_dtype}"
                   f"_wt{''.join(map(str, args.wt_layer))}"
                   f"_slot{args.mem_slot}x{args.mem_dim}"
                   f"_t{args.mem_temp}_ap{int(args.fixed_aspp_pool)}")
        if args.ctx_weights:
            aot = cfg_tag
        else:
            from pinthememory_tpu.utils.aotcache import snapshot_digest

            aot = snapshot_digest(args.snapshot, extra=cfg_tag)
    if args.inference_mode == "sliding":
        ev = SlidingEvaluator(
            apply_fn, scales=scales, flip=not args.no_flip,
            crop_size=args.crop_size, overlap=args.sliding_overlap,
            apply_low_fn=apply_low_fn if args.fast_merge else None,
            scale_batch=scale_batch, count_mode=args.merge_count,
            stream_tiles=args.stream_tiles, aot=aot, ctx=ctx)
    else:
        ev = PoolingEvaluator(apply_fn, scales=scales, flip=not args.no_flip,
                              aot=aot, ctx=ctx)

    cfg = Config(model=mc, data=DataConfig(dataset_root=args.dataset_root))
    if args.video_folder:
        from pinthememory_tpu.data.datasets import VideoFolder

        ds = VideoFolder(args.video_folder, eval_mode=args.inference_mode)
        args.dump_images = True
    else:
        kw = {"cv_split": args.cv_split} if args.dataset == "cityscapes" else {}
        ds = build_dataset(args.dataset, cfg, args.split,
                           eval_mode=args.inference_mode, **kw)
    if args.test_mode:
        args.max_images = args.max_images or 6

    eval_joint = None
    if args.dataset == "mapillary":
        # Mapillary protocol: ResizeHeight(1536) + CenterCropPad(1536)
        # (datasets/__init__.py:581-584)
        from pinthememory_tpu.data.joint_transforms import CenterCropPad, ResizeHeight

        def eval_joint(raw, gt):
            from PIL import Image as PILImage

            pim = PILImage.fromarray(raw)
            pma = PILImage.fromarray(gt.astype(np.uint8))
            pim, pma = ResizeHeight(1536)(pim, pma)
            pim, pma = CenterCropPad(1536, ignore_index=255)(pim, pma)
            return np.asarray(pim), np.asarray(pma).astype(np.int32)

    palette = trainid_palette()
    os.makedirs(args.results_dir, exist_ok=True)
    hist = jnp.zeros((19, 19), jnp.int32)
    hist_update = jax.jit(lambda h, p, g: h + confusion_matrix(p, g, 19))
    times = []
    done = [0]
    n = len(ds)
    if args.max_images:
        n = min(n, args.max_images)
    # contiguous shard [index*n/count, (index+1)*n/count) (eval.py:744-748)
    lo = (n * args.split_index) // args.split_count
    hi = (n * (args.split_index + 1)) // args.split_count

    def dump(name, pred, raw, gt_np):
        # colorized / blend / diff dumps (reference: eval.py:662-693)
        from PIL import Image

        color = palette[pred]
        Image.fromarray(color).save(
            os.path.join(args.results_dir, f"{name}_pred.png"))
        blend = (0.5 * color + 0.5 * np.asarray(raw)).astype(np.uint8)
        Image.fromarray(blend).save(
            os.path.join(args.results_dir, f"{name}_compose.png"))
        valid = gt_np != 255
        diff = np.where((valid & (pred != gt_np))[..., None], color, 0).astype(np.uint8)
        Image.fromarray(diff).save(
            os.path.join(args.results_dir, f"{name}_diff.png"))

    batched = hasattr(ev, "predict_batch_device") and not args.dump_images
    batch_n = max(args.eval_batch, 1) if batched else 1
    mesh = None
    if args.spatial > 1 and not args.data_parallel:
        # the mesh is only built under --data_parallel; silently running
        # single-device would ignore the requested sharding (ADVICE r4)
        raise SystemExit("--spatial requires --data_parallel (the spatial "
                         "axis is part of the data x spatial device mesh)")
    if args.data_parallel and batched:
        from pinthememory_tpu.parallel.mesh import make_mesh

        # scale_batch caps compose with sharding now: predict_batch_sharded
        # chunks per data row and redistributes each chunk over the mesh
        mesh = make_mesh(jax.devices(), spatial=max(args.spatial, 1))
        ndev = mesh.shape["data"]
        batch_n = max(batch_n, 1) * ndev
        print(f"data{'x spatial' if args.spatial > 1 else ''}-parallel eval "
              f"over {len(jax.devices())} devices (mesh {dict(mesh.shape)}, "
              f"global batch {batch_n})")

    def flush(group, hist, raws_dev=None):
        """Run one same-shape group; hist stays on device (no sync)."""
        t0 = time.time()
        if batched and len(group) > 1:
            raws = (raws_dev if raws_dev is not None
                    else np.stack([g[0] for g in group]))
            if mesh is not None and hasattr(ev, "predict_batch_sharded"):
                # non-divisible tail groups are transparently padded and
                # truncated inside predict_batch_sharded (VERDICT r4 #7)
                preds = ev.predict_batch_sharded(raws, mesh)
            else:
                preds = ev.predict_batch_device(raws)
            gts = jnp.asarray(np.stack([g[1] for g in group]))
            hist = hist_update(hist, preds, gts)
        else:
            for raw, gt, name in group:
                pred_dev = (ev.predict_device(raw)
                            if hasattr(ev, "predict_device")
                            else jnp.asarray(ev.predict(raw)))
                hist = hist_update(hist, pred_dev, jnp.asarray(gt))
                if args.dump_images:
                    dump(name, np.asarray(pred_dev), raw, np.asarray(gt))
        times.append((time.time() - t0) / len(group))
        done[0] += len(group)
        if (done[0] // 10) != ((done[0] - len(group)) // 10):
            # progress WITHOUT a device sync (no mean_iu here): images keep
            # pipelining through the chip back-to-back
            print(f"[{done[0]}/{hi - lo}] {group[-1][2]}: "
                  f"{1.0 / np.mean(times):.2f} img/s")
        return hist

    def upload(group):
        """Async device placement of a stacked group; sharded over the data
        axis in data-parallel mode so each device receives only its shard."""
        if not (batched and len(group) > 1):
            return None
        arr = np.stack([g[0] for g in group])
        if mesh is not None and len(group) % mesh.shape["data"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = (P("data", "spatial") if mesh.shape.get("spatial", 1) > 1
                    else P("data"))
            return jax.device_put(arr, NamedSharding(mesh, spec))
        return jax.device_put(arr)

    # lag-one flush with async upload: when a group completes, its stacked
    # images start streaming to the device (jax.device_put returns without
    # waiting) while the PREVIOUS group is still computing -- the upload
    # rides under the compute instead of serializing with it
    group: list = []
    ready = None  # (group, device_array) waiting to be flushed
    profiling = False
    for i in range(lo, hi):
        if args.profile and i - lo == 1 and not profiling:
            # skip image 0 (compile); trace steady-state batches 1-4
            jax.profiler.start_trace(args.profile)
            profiling = True
        if profiling and i - lo == 5:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace written to {args.profile}")
        raw, gt, name = ds[i]
        if eval_joint is not None:
            raw, gt = eval_joint(raw, gt)
        if group and (len(group) >= batch_n
                      or group[-1][0].shape != raw.shape):
            dev = upload(group)
            if ready is not None:
                hist = flush(ready[0], hist, ready[1])
            ready = (group, dev)
            group = []
        group.append((raw, gt, name))
    if ready is not None:
        hist = flush(ready[0], hist, ready[1])
    if group:
        hist = flush(group, hist)
    if profiling:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}")

    if done[0]:
        print(format_class_table(np.asarray(hist), TRAINID_NAMES))
        print(f"mIoU {mean_iu(np.asarray(hist)) * 100:.2f}")
        print(f"throughput: {1.0 / np.mean(times):.3f} images/sec"
              f" (first batch includes compile)")


if __name__ == "__main__":
    main()
