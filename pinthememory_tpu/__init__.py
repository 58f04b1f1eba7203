"""Pin-the-Memory, rebuilt TPU-native.

A JAX/XLA/Pallas re-design of the domain-generalization semantic-segmentation
framework from "Pin the Memory: Learning to Generalize Semantic Segmentation"
(CVPR 2022).  The reference implementation (PyTorch/CUDA, Genie-Kim/PintheMemory)
defines the feature set; this package re-architects it for TPU:

- models are pure Flax modules in NHWC layout, compiled once under ``jax.jit``;
- the categorical memory (reference ``network/memory.py``) is a pure function
  over an explicit ``m_items`` carry, with a fused Pallas read kernel;
- the MLDG meta-episode (reference ``train.py:493-632``) is explicit dataflow
  over parameter pytrees instead of cloned DDP models;
- data parallelism is GSPMD sharding over a ``jax.sharding.Mesh`` (ICI
  collectives) instead of NCCL DDP;
- multi-scale + flip sliding-window evaluation (reference ``eval.py``) is a
  single jitted tiled tensor program instead of Python crop loops and CPU
  threads.
"""

__version__ = "0.1.0"
