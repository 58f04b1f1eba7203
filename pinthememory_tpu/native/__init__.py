"""Native (C++) helpers, loaded via ctypes with automatic build + fallback.

Provides:
- ``kmeans1d_cluster(values, k)``: exact weighted 1-D k-means (DP with
  divide-and-conquer optimization) -- replaces the reference's ``kmeans1d``
  pip dependency used by ISW (network/cov_settings.py:58);
- ``remap_u8`` / ``remap_rgb``: LUT label remaps for the data pipeline.

If the shared library is missing it is built on first use (``make``); if the
toolchain is unavailable, pure-numpy fallbacks keep everything working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpinmem_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.kmeans1d_cluster.restype = ctypes.c_int64
        lib.kmeans1d_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def kmeans1d_cluster(values: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Cluster 1-D values into k groups; returns (assignments, centroids).

    Assignments are in *input* order (like the reference's kmeans1d.cluster),
    cluster ids ordered by centroid value ascending.
    """
    values = np.asarray(values, np.float64).ravel()
    n = values.size
    k = int(min(k, n))
    order = np.argsort(values, kind="stable")
    x = np.ascontiguousarray(values[order])
    w = np.ones(n, np.float64)

    lib = _load()
    if lib is not None:
        assign_sorted = np.zeros(n, np.int64)
        centroids = np.zeros(k, np.float64)
        lib.kmeans1d_cluster(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, k,
            assign_sorted.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    else:
        assign_sorted, centroids = _kmeans1d_numpy(x, k)

    assign = np.empty(n, np.int64)
    assign[order] = assign_sorted
    return assign, centroids


def _kmeans1d_numpy(x_sorted: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy exact DP fallback, O(k n^2) -- fine for n <= ~4096."""
    n = x_sorted.size
    w = np.cumsum(np.concatenate([[0.0], x_sorted]))
    w2 = np.cumsum(np.concatenate([[0.0], x_sorted**2]))

    def cost(l, r):  # [l, r)
        m = r - l
        if m <= 0:
            return 0.0
        s = w[r] - w[l]
        return (w2[r] - w2[l]) - s * s / m

    INF = np.inf
    D = np.full((k + 1, n + 1), INF)
    A = np.zeros((k + 1, n + 1), np.int64)
    D[0, 0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, n + 1):
            best, bj = INF, j - 1
            for l in range(j - 1, i):
                c = D[j - 1, l] + cost(l, i)
                if c < best:
                    best, bj = c, l
            D[j, i] = best
            A[j, i] = bj
    bounds = [n]
    for j in range(k, 0, -1):
        bounds.append(int(A[j, bounds[-1]]))
    bounds = bounds[::-1]
    assign = np.zeros(n, np.int64)
    centroids = np.zeros(k, np.float64)
    for c in range(k):
        l, r = bounds[c], bounds[c + 1]
        assign[l:r] = c
        centroids[c] = x_sorted[l:r].mean() if r > l else 0.0
    return assign, centroids


def remap_u8(arr: np.ndarray, lut: np.ndarray) -> np.ndarray:
    lib = _load()
    arr = np.ascontiguousarray(arr, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    if lib is None:
        return lut[arr]
    out = np.empty_like(arr)
    lib.remap_u8(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.size,
    )
    return out


def remap_rgb(rgb: np.ndarray, lut24: np.ndarray) -> np.ndarray:
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if lib is None:
        packed = (
            rgb[..., 0].astype(np.int32) << 16
            | rgb[..., 1].astype(np.int32) << 8
            | rgb[..., 2].astype(np.int32)
        )
        return lut24[packed]
    h, w = rgb.shape[:2]
    out = np.empty((h, w), np.uint8)
    lut24 = np.ascontiguousarray(lut24, np.uint8)
    lib.remap_rgb(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lut24.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h * w,
    )
    return out
