"""Regression tests for the driver entry points in __graft_entry__.py.

Round 1's MULTICHIP check failed because dryrun_multichip inherited the
ambient (TPU-tunneled) platform from the calling process.  It now always
executes in a subprocess with the CPU platform forced, so this must pass
no matter what env pytest itself runs under.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_subprocess_hostile_env(monkeypatch):
    # Simulate the driver's env: an ambient non-CPU platform selection that
    # must NOT leak into the dry run.
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    graft.dryrun_multichip(8)


def test_entry_compiles_single_chip():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
    assert out.shape[-1] == 19
