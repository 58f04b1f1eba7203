"""t-SNE feature analysis: class/domain-colored embeddings incl. memory slots.

Reference: tsnelib.py (RunTsne) -- accumulates L2-normalized class-mean
feature vectors per (class, domain), embeds with MulticoreTSNE/tsnecuda
(native deps), and scatter-plots by class color and by domain.  Here the
embedding runs through scikit-learn's TSNE (analysis is off the hot path,
SURVEY.md §2.6) and the accumulation is vectorized numpy.
"""

from __future__ import annotations

import os

import numpy as np

from pinthememory_tpu.core.labels import TRAINID_NAMES, trainId2color


class TsneCollector:
    """Accumulate per-class mean features by domain (tsnelib.py:48-74).

    ``selected_classes`` restricts basketing to those trainIds (the
    reference's ``selected_cls`` list -- 6 classes by default in
    ablation.py:453-454, all 19 with --all_class); None keeps every class.
    """

    def __init__(self, num_classes: int = 19, ignore_label: int = 255,
                 selected_classes: tuple[int, ...] | None = None):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.selected = (tuple(range(num_classes))
                         if selected_classes is None
                         else tuple(selected_classes))
        self.features: list[np.ndarray] = []
        self.class_ids: list[int] = []
        self.domains: list[str] = []
        self.mem_items: np.ndarray | None = None
        self.mem_class_ids: tuple[int, ...] = ()

    def add_batch(self, feats: np.ndarray, labels: np.ndarray, domain: str):
        """feats: (h, w, D) at feature resolution (pre- or post-memory);
        labels: (H, W) FULL-RESOLUTION trainIds.

        Reference semantics (tsnelib.py:48-74): L2-normalize each pixel's
        feature vector first, bilinearly upsample (align_corners=True) to the
        GT resolution, then take GT-masked per-class means; ignore=255 maps
        to the extra one-hot slot and is never a selected class.  The class
        means are stored UN-normalized -- the draw path re-normalizes
        (tsnelib.py:90), mirrored in :meth:`embed`."""
        import jax.numpy as jnp

        from pinthememory_tpu.ops.resize import resize_bilinear_align_corners

        feats = np.asarray(feats, np.float32)
        labels = np.asarray(labels)
        # F.normalize(dim=1): v / max(||v||, eps), eps=1e-12
        norm = np.linalg.norm(feats, axis=-1, keepdims=True)
        feats = feats / np.maximum(norm, 1e-12)
        H, W = labels.shape
        if feats.shape[:2] != (H, W):
            feats = np.asarray(
                resize_bilinear_align_corners(jnp.asarray(feats)[None], (H, W))[0])
        lab = labels.astype(np.int64).copy()
        lab[lab == self.ignore_label] = self.num_classes
        flat = feats.reshape(-1, feats.shape[-1])
        labf = lab.reshape(-1)
        for c in self.selected:
            m = labf == c
            cnt = int(m.sum())
            if cnt == 0:
                continue
            v = flat[m].sum(0) / cnt
            self.features.append(v.astype(np.float32))
            self.class_ids.append(c)
            self.domains.append(domain)

    def add_memory(self, m_items: np.ndarray):
        """Include the SELECTED memory slots as markers
        (tsnelib.py:84-86: ``mem_vecs = m_items[self.selected_clsid]``)."""
        m = np.asarray(m_items, np.float32)
        sel = [c for c in self.selected if c < len(m)]
        self.mem_items = m[sel]
        self.mem_class_ids = tuple(sel)

    def embed(self, perplexity: float = 30.0, seed: int = 0) -> dict:
        from sklearn.manifold import TSNE

        feats = np.stack(self.features)
        # draw-time re-normalization of the stored class means
        # (tsnelib.py:90); memory slots stay as-is (rows are unit by
        # construction, tsnelib.py:95)
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        n_base = len(feats)
        if self.mem_items is not None:
            feats = np.concatenate([feats, self.mem_items], axis=0)
        perplexity = min(perplexity, max(2, (len(feats) - 1) / 3))
        emb = TSNE(
            n_components=2, perplexity=perplexity, init="pca", random_state=seed
        ).fit_transform(feats)
        return {
            "points": emb[:n_base],
            "classes": np.asarray(self.class_ids),
            "domains": np.asarray(self.domains),
            "memory_points": emb[n_base:] if self.mem_items is not None else None,
        }

    def draw(self, out_dir: str, perplexity: float = 30.0, seed: int = 0,
             source_domains: tuple[str, ...] = (), duplication: int = 1):
        """Class-colored and domain-colored scatters (tsnelib.py:88-216).

        ``source_domains`` are drawn as circles, unseen domains as crosses
        (the reference's --source_domain marker split).  ``duplication``
        re-embeds and re-plots N times (t-SNE inits differ per try;
        tsnelib.py:151 ``for tries in range(self.duplication)``) -- try 0
        keeps the unsuffixed filenames, later tries get ``_try{t}``."""
        for t in range(max(1, duplication)):
            res = self._draw_one(out_dir, perplexity, seed + t,
                                 source_domains,
                                 suffix="" if t == 0 else f"_try{t}")
        return res

    def _draw_one(self, out_dir: str, perplexity: float, seed: int,
                  source_domains: tuple[str, ...], suffix: str = ""):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        res = self.embed(perplexity, seed)
        os.makedirs(out_dir, exist_ok=True)

        fig, ax = plt.subplots(figsize=(8, 8))
        colors = np.array([trainId2color[c] for c in res["classes"]]) / 255.0
        ax.scatter(res["points"][:, 0], res["points"][:, 1], c=colors, s=8)
        if res["memory_points"] is not None:
            mp = res["memory_points"]
            slot_ids = self.mem_class_ids or tuple(range(len(mp)))
            mcol = np.array([trainId2color[i % 19] for i in slot_ids]) / 255.0
            ax.scatter(mp[:, 0], mp[:, 1], c=mcol, s=120, marker="*",
                       edgecolors="black", linewidths=0.8)
        ax.set_title("t-SNE by class (stars = memory slots)")
        fig.savefig(os.path.join(out_dir, f"tsne_class{suffix}.png"), dpi=150)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(8, 8))
        domain_names = sorted(set(res["domains"]))
        cmap = plt.get_cmap("tab10")
        for i, d in enumerate(domain_names):
            m = res["domains"] == d
            marker = "o" if (not source_domains or d in source_domains) else "x"
            ax.scatter(res["points"][m, 0], res["points"][m, 1],
                       color=cmap(i % 10), s=8, label=d, marker=marker)
        ax.legend()
        ax.set_title("t-SNE by domain")
        fig.savefig(os.path.join(out_dir, f"tsne_domain{suffix}.png"), dpi=150)
        plt.close(fig)
        return res
