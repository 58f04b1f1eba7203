"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip behavior (GSPMD data parallelism, psum'd memory-write statistics,
sync BN) is validated without TPU hardware by forcing the host platform to
expose 8 devices -- the JAX-native answer to "test multi-node without a
cluster" (SURVEY.md §4).
"""

import os

# Force CPU even when the environment points at a TPU (JAX_PLATFORMS=axon):
# unit tests must be runnable anywhere and need the 8-device virtual mesh.
# Real-TPU runs go through bench.py / the CLIs, not pytest.
# NB: the axon sitecustomize registers its PJRT plugin (and hijacks the
# platform) whenever PALLAS_AXON_POOL_IPS is set -- clear it first.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
