"""ISW / IRW covariance bookkeeping (host-side state between epochs).

Reference: network/cov_settings.py.  ``CovMatrixISW`` accumulates the
variance-of-covariance over augmentation pairs during the covstat pass, then
selects "sensitive" off-diagonal entries by 1-D k-means (cluster 0 =
insensitive; everything else sensitive) and intersects masks across rounds.
The k-means runs through the native C++ DP (pinthememory_tpu.native),
replacing the reference's ``kmeans1d`` pip dependency.
"""

from __future__ import annotations

import numpy as np


class CovMatrixIRW:
    """All off-diagonal entries, optional margin relaxation
    (cov_settings.py:91-107)."""

    def __init__(self, dim: int, relax_denom: float = 0.0):
        self.dim = dim
        self.reversal_eye = np.triu(np.ones((dim, dim), np.float32), k=1)
        self.num_off_diagonal = float(self.reversal_eye.sum())
        self.margin = 0.0 if relax_denom == 0 else self.num_off_diagonal // relax_denom

    def get_mask_matrix(self):
        return self.reversal_eye, self.margin, self.num_off_diagonal


class CovMatrixISW:
    """Sensitive-covariance selection via clustering (cov_settings.py:16-89)."""

    def __init__(self, dim: int, relax_denom: float = 0.0, clusters: int = 50):
        self.dim = dim
        self.reversal_eye = np.triu(np.ones((dim, dim), np.float32), k=1)
        self.num_off_diagonal = float(self.reversal_eye.sum())
        self.clusters = clusters
        self.margin = 0.0 if relax_denom == 0 else self.num_off_diagonal // relax_denom
        self.var_matrix: np.ndarray | None = None
        self.count_var_cov = 0
        self.mask_matrix: np.ndarray | None = None
        self.num_sensitive = 0.0

    def set_variance_of_covariance(self, var_cov: np.ndarray):
        var_cov = np.asarray(var_cov, np.float32)
        if self.var_matrix is None:
            self.var_matrix = var_cov
        else:
            self.var_matrix = self.var_matrix + var_cov
        self.count_var_cov += 1

    def set_mask_matrix(self):
        if self.var_matrix is None or self.count_var_cov == 0:
            import warnings

            warnings.warn(
                "ISW set_mask_matrix called with no accumulated covariance "
                "statistics (empty covstat dataset?); keeping previous mask"
            )
            return
        var = self.var_matrix / self.count_var_cov
        flat = var.ravel()

        if self.margin == 0:
            from pinthememory_tpu.native import kmeans1d_cluster

            assign, _centroids = kmeans1d_cluster(flat, self.clusters)
            num_sensitive = int(flat.size - int((assign == 0).sum()))
        else:
            num_sensitive = int(self.num_off_diagonal - self.margin)

        mask = np.zeros(flat.size, np.float32)
        if num_sensitive > 0:
            idx = np.argpartition(flat, -num_sensitive)[-num_sensitive:]
            mask[idx] = 1.0
        mask = mask.reshape(self.dim, self.dim)

        if self.mask_matrix is not None:
            self.mask_matrix = (self.mask_matrix.astype(np.int32)
                                & mask.astype(np.int32)).astype(np.float32)
        else:
            self.mask_matrix = mask
        self.num_sensitive = float(self.mask_matrix.sum())
        self.var_matrix = None
        self.count_var_cov = 0

    def reset_mask_matrix(self):
        self.mask_matrix = None

    def get_mask_matrix(self):
        if self.mask_matrix is None:
            self.set_mask_matrix()
        if self.mask_matrix is None:
            # still no statistics (empty covstat dataset): fall back to the
            # IRW-style all-off-diagonal mask so training can proceed
            return self.reversal_eye, self.margin, self.num_off_diagonal
        return self.mask_matrix, 0.0, self.num_sensitive


def build_cov_layers(wt_layer, in_channel_list, relax_denom: float, clusters: int):
    """Per-whitened-position cov state (deepv3plus.py:457-467)."""
    layers = []
    for i, code in enumerate(wt_layer):
        if code == 1:
            layers.append(CovMatrixIRW(in_channel_list[i], relax_denom))
        elif code == 2:
            layers.append(CovMatrixISW(in_channel_list[i], relax_denom, clusters))
    return layers


# low-level/aux/final channels per whitening position (deepv3plus.py:438-455)
IN_CHANNEL_LIST = {
    "resnet-101": (64, 64, 128, 256, 512, 1024, 2048),
    "resnet-18": (0, 0, 64, 64, 128, 256, 512),
    "resnet-50": (0, 0, 64, 256, 512, 1024, 2048),
    "resnet-152": (0, 0, 64, 256, 512, 1024, 2048),
    "shufflenetv2": (0, 0, 24, 116, 232, 464, 1024),
    "mobilenetv2": (0, 0, 16, 32, 64, 320, 1280),
}
