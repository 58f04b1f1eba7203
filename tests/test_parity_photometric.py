"""Photometric (ColorJitter) parity against the ACTUAL reference
transforms/transforms.py.

The reference ColorJitter draws factors from the GLOBAL numpy RNG and
shuffles the op order (transforms.py:338-371); the rebuild draws from an
explicit ``random.Random``.  Bit-exact comparison therefore scripts the
randomness on BOTH sides: the same factor sequence and the same op
permutation are injected, and the resulting pixels must be identical --
gating the adjust_brightness/contrast/saturation/hue math (incl. the uint8
hue rotation, transforms.py:311-316) and the random-order composition.

The reference blurs route through skimage's gaussian/denoise_bilateral,
absent in this environment, so their math cannot be oracle-driven here; the
sigma draw structure is mirrored in data/transforms.py and the gaussian is
implemented via scipy (see its docstring).
"""

import types

import numpy as np
import pytest
from PIL import Image

from pinthememory_tpu.data.transforms import ColorJitter as OursColorJitter

from ref_harness import import_reference_module, reference_env


@pytest.fixture(scope="module")
def ref_tf():
    with reference_env():
        return import_reference_module("transforms.transforms")


class _WrapU8:
    """numpy-1.x ``np.uint8(float)`` semantics: truncate toward zero, wrap
    mod 256.  numpy>=2 raises OverflowError for negative floats, which the
    reference's hue shift hits (``np.uint8(hue_factor * 255)``,
    transforms.py:314) -- the era-correct behavior is restored here.  Also
    usable as a dtype (np.dtype reads the ``dtype`` attribute), which
    ``np.array(h, dtype=np.uint8)`` in the same function needs."""

    dtype = np.dtype(np.uint8)

    def __call__(self, v):
        return np.uint8(int(v) % 256)


def _np_with_wrapping_uint8():
    proxy = types.SimpleNamespace()
    proxy.__dict__.update(np.__dict__)
    proxy.uint8 = _WrapU8()
    return proxy


class _ScriptRng:
    """Duck-typed random.Random: pops scripted uniforms, applies a fixed
    permutation as shuffle."""

    def __init__(self, uniforms, perm):
        self.uniforms = list(uniforms)
        self.perm = list(perm)

    def uniform(self, a, b):
        v = self.uniforms.pop(0)
        assert a - 1e-9 <= v <= b + 1e-9, (v, a, b)
        return v

    def shuffle(self, lst):
        lst[:] = [lst[i] for i in self.perm[: len(lst)]]


def _img(seed=0, w=40, h=28):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


@pytest.mark.parametrize("factors,perm", [
    # flagship meta "hard" transform: ColorJitter(.8,.8,.8,.3)
    # (datasets/__init__.py:128-144)
    ([0.7, 1.5, 0.9, 0.25], [3, 1, 0, 2]),
    ([1.2, 0.4, 1.7, -0.2], [0, 1, 2, 3]),
    ([0.3, 1.0, 1.3, 0.05], [2, 3, 1, 0]),
])
def test_color_jitter_parity(ref_tf, factors, perm, monkeypatch):
    img = _img()
    b, c, s, h = 0.8, 0.8, 0.8, 0.3

    fq = list(factors)
    monkeypatch.setattr(ref_tf, "np", _np_with_wrapping_uint8())
    monkeypatch.setattr(np.random, "uniform", lambda lo, hi: fq.pop(0))
    monkeypatch.setattr(
        np.random, "shuffle",
        lambda lst: lst.__setitem__(slice(None),
                                    [lst[i] for i in perm[: len(lst)]]))
    with reference_env():
        ref_out = ref_tf.ColorJitter(
            brightness=b, contrast=c, saturation=s, hue=h)(img)

    ours = OursColorJitter(brightness=b, contrast=c, saturation=s, hue=h)
    our_out = ours(img, _ScriptRng(factors, perm))

    np.testing.assert_array_equal(np.array(our_out), np.array(ref_out))


@pytest.mark.parametrize("hue", [-0.3, -0.05, 0.0, 0.2, 0.5])
def test_hue_rotation_parity(ref_tf, hue, monkeypatch):
    """The uint8 wraparound hue shift (transforms.py:311-316) vs the
    rebuild's modular shift, across sign and the +/-0.5 extremes.  Includes
    hue=0: the HSV round trip is lossy and the reference performs it
    unconditionally."""
    img = _img(seed=2)
    monkeypatch.setattr(ref_tf, "np", _np_with_wrapping_uint8())
    with reference_env():
        ref_out = ref_tf.adjust_hue(img, hue)
    ours = OursColorJitter(hue=0.5)
    from pinthememory_tpu.data.transforms import _adjust_hue

    our_out = _adjust_hue(img, hue)
    np.testing.assert_array_equal(np.array(our_out), np.array(ref_out))


def test_enhance_factors_parity(ref_tf):
    """Brightness/contrast/saturation at fixed factors reduce to the same
    PIL ImageEnhance calls (transforms.py:215-273)."""
    img = _img(seed=3)
    from PIL import ImageEnhance

    with reference_env():
        cases = [
            (ref_tf.adjust_brightness(img, 1.4),
             ImageEnhance.Brightness(img).enhance(1.4)),
            (ref_tf.adjust_contrast(img, 0.6),
             ImageEnhance.Contrast(img).enhance(0.6)),
            (ref_tf.adjust_saturation(img, 1.8),
             ImageEnhance.Color(img).enhance(1.8)),
        ]
    for ref_out, our_out in cases:
        np.testing.assert_array_equal(np.array(our_out), np.array(ref_out))
