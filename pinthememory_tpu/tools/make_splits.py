"""Materialize GTAV / Synthia train/val(/test) folder layouts from split
lists.

Reference workflow: the repo ships ``split_data/{gtav,synthia}_split_*.txt``
(plain filename lists, one PNG per line) and its README instructs users to
split the flat official downloads into the per-split folders the dataset
readers expect (README.md:94; gtav.py:86-119 reads ``images/{train,valid,
test}``, synthia.py:83-88 reads ``RGB/{train,val}``).  This tool performs
that data-prep step: given the flat download and the split lists, it creates
the folder layout with symlinks (or copies).

Usage::

    python -m pinthememory_tpu.tools.make_splits gtav \
        --root ~/dg_seg_dataset/GTAV --split_dir /path/to/split_data
    python -m pinthememory_tpu.tools.make_splits synthia \
        --root ~/dg_seg_dataset/synthia --split_dir /path/to/split_data

Layouts produced:

- gtav:    ``images/{train,valid,test}/*.png``, ``labels/{...}/*.png``
           from ``gtav_split_{train,val,test}.txt`` (val -> ``valid``,
           matching the reference folder name, gtav.py:88)
- synthia: ``RGB/{train,val}/*.png``, ``GT/LABELS/{train,val}/*.png``
           from ``synthia_split_{train,val}.txt``
"""

from __future__ import annotations

import argparse
import os


def _read_list(path: str) -> list[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _place(src_dir: str, dst_dir: str, names: list[str], copy: bool) -> int:
    os.makedirs(dst_dir, exist_ok=True)
    placed = 0
    for name in names:
        src = os.path.join(src_dir, name)
        dst = os.path.join(dst_dir, name)
        if not os.path.exists(src):
            continue  # tolerate the official download's known missing files
        if os.path.lexists(dst):
            placed += 1
            continue
        if copy:
            import shutil

            shutil.copy2(src, dst)
        else:
            os.symlink(os.path.abspath(src), dst)
        placed += 1
    return placed


def materialize_gtav(root: str, split_dir: str, copy: bool = False) -> dict:
    """Flat ``images/``+``labels/`` -> ``images/{train,valid,test}`` etc."""
    report = {}
    for txt_split, folder in (("train", "train"), ("val", "valid"),
                              ("test", "test")):
        names = _read_list(
            os.path.join(split_dir, f"gtav_split_{txt_split}.txt"))
        n_img = _place(os.path.join(root, "images"),
                       os.path.join(root, "images", folder), names, copy)
        n_lbl = _place(os.path.join(root, "labels"),
                       os.path.join(root, "labels", folder), names, copy)
        report[folder] = (n_img, n_lbl)
    return report


def materialize_synthia(root: str, split_dir: str, copy: bool = False) -> dict:
    """Flat ``RGB/``+``GT/LABELS/`` -> ``RGB/{train,val}`` etc."""
    report = {}
    for split in ("train", "val"):
        names = _read_list(
            os.path.join(split_dir, f"synthia_split_{split}.txt"))
        n_img = _place(os.path.join(root, "RGB"),
                       os.path.join(root, "RGB", split), names, copy)
        n_lbl = _place(os.path.join(root, "GT", "LABELS"),
                       os.path.join(root, "GT", "LABELS", split), names, copy)
        report[split] = (n_img, n_lbl)
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("dataset", choices=["gtav", "synthia"])
    p.add_argument("--root", required=True, help="dataset root (flat download)")
    p.add_argument("--split_dir", required=True,
                   help="directory holding the *_split_*.txt lists")
    p.add_argument("--copy", action="store_true",
                   help="copy files instead of symlinking")
    args = p.parse_args(argv)
    root = os.path.expanduser(args.root)
    fn = materialize_gtav if args.dataset == "gtav" else materialize_synthia
    report = fn(root, os.path.expanduser(args.split_dir), args.copy)
    for split, (n_img, n_lbl) in report.items():
        print(f"{args.dataset}/{split}: {n_img} images, {n_lbl} labels")


if __name__ == "__main__":
    main()
