"""Shared machinery for importing the ACTUAL reference code as a parity oracle.

Parity tests (`test_parity_reference.py`, `test_parity_eval_protocol.py`,
`test_parity_loss_reference.py`) import modules from `/root/reference`
(PyTorch/CUDA) and compare the rebuild's outputs against them.  That requires
shimming environment gaps -- CUDA, torchvision, NCCL -- WITHOUT stubbing
anything on the numerically tested path.

Shim inventory (environment gaps only):
  - ``kmeans1d`` / ``skimage``: absent; mostly import-time placeholders --
    EXCEPT ``skimage.segmentation.find_boundaries``, which IS on a tested
    path (the reduce-border branch of RelaxedBoundaryLossToTensor,
    transforms/transforms.py:130) and is implemented faithfully for the one
    call signature the reference uses (2-D labels, mode='thick',
    connectivity=1).  ``scipy.ndimage.interpolation`` (removed namespace)
    re-exposes the REAL ``scipy.ndimage.shift``.
  - ``torchvision``: absent.  ``transforms.ToTensor/Normalize/Compose``
    ARE on the tested path (eval.py:362-365 builds the per-tile transform),
    so the stub implements their documented semantics faithfully:
    ToTensor = PIL/ndarray HWC uint8 -> CHW float32 / 255; Normalize =
    (x - mean) / std per channel; Compose = left-to-right chain.
  - ``datasets`` (reference package): probes data roots at import; the
    tested code needs only ``num_classes``/``ignore_label`` and named
    submodule attributes.
  - ``.cuda()`` / ``torch.cuda.set_device`` -> identity (CPU-only torch).
  - ``torch.distributed.init_process_group`` -> no-op (eval.py:124-127
    hardcodes NCCL at import time; no collective is exercised in tests).
  - ``model_zoo.load_url`` -> {} (zero egress; forgiving_state_restore then
    keeps the seeded random init, which is what we compare against).
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF = "/root/reference"
NUM_CLASSES = 19


# ---------------------------------------------------------------------------
# faithful torchvision.transforms stand-ins (documented torchvision semantics)
# ---------------------------------------------------------------------------
class _Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class _ToTensor:
    """PIL image / HWC uint8 ndarray -> CHW float32 tensor in [0, 1]."""

    def __call__(self, pic):
        arr = np.array(pic, copy=True)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
        if t.dtype == torch.uint8:
            return t.to(torch.float32).div(255.0)
        return t.to(torch.float32)


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class _Lambda:
    """torchvision.transforms.Lambda: apply a user function (used by the
    reference ColorJitter.get_params, transforms/transforms.py:349-366)."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)


class _ToPILImage:
    """CHW float tensor in [0,1] -> PIL RGB (torchvision: mul(255).byte())."""

    def __call__(self, t):
        from PIL import Image

        arr = (t.detach() * 255).to(torch.uint8).permute(1, 2, 0).numpy()
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        return Image.fromarray(arr)


def _module_getattr(attr: str):
    """PEP-562 fallback for permissive stub modules.  Dunders must raise:
    ``inspect.getmodule`` walks sys.modules probing ``__file__`` on every
    module, and a callable ``__file__`` crashes it (seen via torch's lazy
    ``_functional_collectives`` import)."""
    if attr.startswith("__") and attr.endswith("__"):
        raise AttributeError(attr)
    return lambda *a, **k: None


def _permissive(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__getattr__ = _module_getattr
    return mod


def install_stub_modules() -> None:
    """Idempotently install the environment-gap shims into sys.modules."""
    if "kmeans1d" not in sys.modules:
        fake = types.ModuleType("kmeans1d")
        fake.cluster = lambda arr, k: ([0] * len(arr), [0.0] * k)
        sys.modules["kmeans1d"] = fake

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        for sub, names in (
            ("filters", ["gaussian"]),
            ("restoration", ["denoise_bilateral"]),
            ("segmentation", ["find_boundaries"]),
            ("util", ["random_noise"]),
        ):
            mod = types.ModuleType(f"skimage.{sub}")
            for n in names:
                setattr(mod, n, lambda *a, **k: None)
            setattr(sk, sub, mod)
            sys.modules[f"skimage.{sub}"] = mod
        # find_boundaries IS on a tested path (the reduce-border branch of
        # RelaxedBoundaryLossToTensor, transforms/transforms.py:130): provide
        # the documented mode='thick' semantics faithfully for 2-D labels --
        # a pixel is a boundary pixel iff any 4-neighbor (connectivity 1,
        # the default) has a different label.
        def _find_boundaries(label_img, connectivity=1, mode="thick",
                             background=0):
            assert mode == "thick" and connectivity == 1, (
                "stub implements only the call signature the reference uses")
            a = np.asarray(label_img)
            b = np.zeros(a.shape, bool)
            d = a[:-1, :] != a[1:, :]
            b[:-1, :] |= d
            b[1:, :] |= d
            d = a[:, :-1] != a[:, 1:]
            b[:, :-1] |= d
            b[:, 1:] |= d
            return b

        sys.modules["skimage.segmentation"].find_boundaries = _find_boundaries
        sk.segmentation.find_boundaries = _find_boundaries
        sys.modules["skimage"] = sk

    # scipy removed the legacy ``scipy.ndimage.interpolation`` namespace the
    # reference imports ``shift`` from (transforms/transforms.py:42); re-expose
    # the REAL scipy.ndimage.shift under the old path.
    if "scipy.ndimage.interpolation" not in sys.modules:
        import scipy.ndimage as _ndi

        legacy = types.ModuleType("scipy.ndimage.interpolation")
        legacy.shift = _ndi.shift
        sys.modules["scipy.ndimage.interpolation"] = legacy

    # Replace any earlier permissive torchvision stub with the faithful one:
    # the eval-protocol oracle RUNS ToTensor/Normalize/Compose for real.
    tv = sys.modules.get("torchvision")
    need_real = tv is None or not hasattr(
        getattr(tv, "transforms", None), "ToTensor"
    )
    if need_real:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.Compose = _Compose
        tr.ToTensor = _ToTensor
        tr.Normalize = _Normalize
        tr.ToPILImage = _ToPILImage
        tr.Lambda = _Lambda
        tr.__getattr__ = _module_getattr
        trf = _permissive("torchvision.transforms.functional")
        tr.functional = trf
        tv.transforms = tr
        for sub in ("models", "utils"):
            mod = _permissive(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = trf

    if "datasets" not in sys.modules:
        ds = types.ModuleType("datasets")
        ds.num_classes = NUM_CLASSES
        ds.ignore_label = 255
        for sub in (
            "cityscapes", "mapillary", "synthia", "bdd100k", "gtav", "idd",
            "video_folder", "kitti", "camvid", "nullloader",
        ):
            mod = types.ModuleType(f"datasets.{sub}")
            mod.num_classes = NUM_CLASSES
            mod.ignore_label = 255
            setattr(ds, sub, mod)
            sys.modules[f"datasets.{sub}"] = mod
        sys.modules["datasets"] = ds


@contextlib.contextmanager
def reference_env():
    """sys.path + CUDA/NCCL no-op patches active while the body runs."""
    install_stub_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    t_cuda, m_cuda = torch.Tensor.cuda, nn.Module.cuda
    set_device = torch.cuda.set_device
    init_pg = torch.distributed.init_process_group
    empty_cache = torch.cuda.empty_cache
    current_device = torch.cuda.current_device
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.distributed.init_process_group = lambda *a, **k: None
    torch.cuda.empty_cache = lambda: None
    # cov_settings.set_mask_matrix logs behind `current_device() == 0`
    torch.cuda.current_device = lambda: 0
    # numpy>=1.24 removed the deprecated builtin aliases the reference uses
    # (eval.py:228 divides by counts.astype(np.float)); the alias WAS the
    # builtin, so restoring it preserves the oracle's numerics exactly
    np_aliases = {}
    for name, builtin in (("float", float), ("int", int), ("bool", bool),
                          ("object", object)):
        if not hasattr(np, name):
            np_aliases[name] = builtin
            setattr(np, name, builtin)
    try:
        yield
    finally:
        torch.Tensor.cuda, nn.Module.cuda = t_cuda, m_cuda
        torch.cuda.set_device = set_device
        torch.distributed.init_process_group = init_pg
        torch.cuda.empty_cache = empty_cache
        torch.cuda.current_device = current_device
        for name in np_aliases:
            delattr(np, name)


def import_reference_eval(argv: list[str]):
    """Import the real `/root/reference/eval.py` module (module-level argparse
    + dist init are satisfied by ``argv`` and the reference_env patches).

    NOTE: module-level state (``args``) is baked at first import; callers that
    need different protocol knobs should mutate ``mod.args`` afterwards --
    exactly what the reference's own ``main()`` relies on (globals).
    """
    with reference_env():
        if "eval" in sys.modules and getattr(
            sys.modules["eval"], "__file__", ""
        ).startswith(REF):
            return sys.modules["eval"]
        old_argv = sys.argv
        sys.argv = ["eval.py"] + list(argv)
        try:
            mod = importlib.import_module("eval")
        finally:
            sys.argv = old_argv
    return mod


def import_reference_module(name: str):
    """Import an arbitrary reference module (e.g. ``loss``) under the shims."""
    with reference_env():
        return importlib.import_module(name)


@contextlib.contextmanager
def numpy_normed_shim():
    """numpy>=1.24 removed ``np.histogram(..., normed=True)``, which the
    reference's ImageBasedCrossEntropyLoss2d.calculate_weights uses
    (loss.py:140-141).  For unit-width integer bins (``range(classes+1)``)
    ``normed`` is exactly ``density``, so shimming it preserves the oracle's
    numerics bit-for-bit."""
    orig = np.histogram

    def patched(a, bins=10, **kw):
        if kw.pop("normed", False):
            kw["density"] = True
        return orig(a, bins, **kw)

    np.histogram = patched
    try:
        yield
    finally:
        np.histogram = orig


def build_reference_model(ctor: str, module: str = "deepv3plus",
                          memory: bool = True,
                          num_classes: int = NUM_CLASSES,
                          criterion=None, criterion_aux=None,
                          wt_layer=None, use_wtloss: bool = False):
    """Instantiate a real reference constructor with seeded weights/BN/memory.

    ``ctor`` is a constructor name inside ``network.<module>`` (e.g.
    ``DeepR50V3PlusD`` in deepv3plus, ``DeepR50V2D`` in deepv2).  Seeds are
    fixed so every parity test compares against the identical oracle weights.
    ``wt_layer``/``use_wtloss`` arm the RobustNet whitening family
    (deepv3plus.py:457-467 builds CovMatrix_IRW/ISW per nonzero position).
    """
    with reference_env():
        from config import cfg

        cfg.immutable(False)
        cfg.MODEL.BNFUNC = nn.BatchNorm2d

        from network import Resnet

        orig_load_url = Resnet.model_zoo.load_url
        Resnet.model_zoo.load_url = lambda *a, **k: {}
        try:
            net_module = importlib.import_module(f"network.{module}")

            args = types.SimpleNamespace(
                wt_layer=list(wt_layer) if wt_layer is not None else [0] * 7,
                use_wtloss=use_wtloss, memory=memory,
                mem_slot=num_classes, mem_dim=256, mem_momentum=0.8,
                mem_temp=1.0, gumbel_off=True, relax_denom=0.0, clusters=50,
                visualize_feature=False,
            )
            torch.manual_seed(0)
            net = getattr(net_module, ctor)(
                args, num_classes, criterion, criterion_aux)
        finally:
            Resnet.model_zoo.load_url = orig_load_url

    torch.manual_seed(1)
    if memory:
        net.memory.m_items = F.normalize(
            torch.rand((num_classes, 256)), dim=1)
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


def build_reference_deepr50(memory: bool = True, num_classes: int = NUM_CLASSES,
                            criterion=None, criterion_aux=None):
    """Back-compat wrapper: the real ``DeepR50V3PlusD`` oracle."""
    return build_reference_model(
        "DeepR50V3PlusD", "deepv3plus", memory, num_classes,
        criterion, criterion_aux)
