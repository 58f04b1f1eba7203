"""Execute the multi-host (process_count>1) branches for real.

``ShardedSampler``'s host sharding and ``Trainer._global_hist``'s
``process_allgather`` reduction only run their multi-process branches when
``jax.process_count() > 1`` -- which the in-process suite can never be.
Here two subprocesses form a real 2-process JAX distributed job over
localhost (Gloo collectives on the CPU backend) and run both branches,
asserting partition/reduction correctness inside each worker
(tests/multihost_worker.py).  Reference counterparts:
datasets/sampler.py:43-110, train.py:927-929.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sampler_and_global_hist():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"multihost worker {pid}/2: ok" in out, out[-3000:]
