"""Host-side data pipeline.

Reference: datasets/ + transforms/ (PyTorch DataLoader + PIL).  The rebuild
keeps dataset decoding and geometric augmentation on the host (numpy/PIL),
hands the accelerator contiguous NHWC uint8/float batches, and replaces slow
per-pixel Python remap loops with vectorized LUTs (optionally the native C++
helper).  All datasets emit the 19-class Cityscapes trainId space with
ignore=255 and items ``(img, mask, name, aux_mask)``.
"""

from pinthememory_tpu.data.loader import setup_loaders  # noqa: F401

num_classes = 19
ignore_label = 255
