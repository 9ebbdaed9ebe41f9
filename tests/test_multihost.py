"""Multi-host (2-process) data-parallel training over jax.distributed.

SURVEY §2 #24: the reference has NO distributed backend; ours is
jax.distributed + XLA collectives. This test runs a REAL 2-process cluster
(4 virtual CPU devices each, 8-device global mesh) and asserts both
processes complete 2 fused train steps with identical losses — i.e. the
cross-process gradient all-reduce is live and consistent.
"""

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
def test_two_process_dp_training(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    lines = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_OK")]
    assert len(lines) == 2, outs
    # both processes must report the SAME losses (global all-reduce consistent)
    metrics = [l.split(" ", 2)[2] for l in lines]
    assert metrics[0] == metrics[1], lines
