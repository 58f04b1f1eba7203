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

# The axon sitecustomize imports jax at interpreter start (before conftest),
# so JAX_PLATFORMS was captured as "axon" at import time and the env set
# above is ignored -- override the live config too.  Backends are created
# lazily at first use, so XLA_FLAGS still applies to the CPU client.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, (
    f"expected the 8-device virtual CPU mesh, got {jax.devices()}"
)
