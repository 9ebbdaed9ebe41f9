"""bench.py backend-probe fallback (_ensure_live_backend).

The axon tunnel sometimes hangs device discovery outright (observed
2026-08-18); bench.py must then re-exec on CPU with an honest JSON tag
instead of hanging the driver. The hang itself can't run in a unit test —
the guard conditions and the re-exec environment can.
"""

import importlib.util
import os
import subprocess

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    # conftest already removed PALLAS_AXON_POOL_IPS and pinned
    # JAX_PLATFORMS=cpu, so the import-time guard call is a no-op here
    spec.loader.exec_module(mod)
    return mod


class _Recorder:
    def __init__(self):
        self.probes = []
        self.execs = []

    def run_ok(self, *a, **kw):
        self.probes.append(a)
        return subprocess.CompletedProcess(a, 0)

    def run_hang(self, *a, **kw):
        self.probes.append(a)
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw.get("timeout"))

    def execve(self, exe, argv, env):
        self.execs.append((exe, argv, env))


def test_no_axon_plugin_skips_probe(bench, monkeypatch):
    rec = _Recorder()
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setattr(subprocess, "run", rec.run_hang)
    bench._ensure_live_backend()
    assert rec.probes == []


def test_explicit_cpu_pin_skips_probe(bench, monkeypatch):
    rec = _Recorder()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(subprocess, "run", rec.run_hang)
    bench._ensure_live_backend()
    assert rec.probes == []


def test_live_backend_probe_passes_through(bench, monkeypatch):
    rec = _Recorder()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    # the image EXPORTS JAX_PLATFORMS=axon; that must NOT skip the probe
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(subprocess, "run", rec.run_ok)
    monkeypatch.setattr(os, "execve", rec.execve)
    bench._ensure_live_backend()
    assert len(rec.probes) == 1 and rec.execs == []


def test_cli_guard_exits_with_remediation(monkeypatch):
    from littlegan_tpu.utils import backend_probe

    rec = _Recorder()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(subprocess, "run", rec.run_hang)
    with pytest.raises(SystemExit, match="unresponsive"):
        backend_probe.ensure_live_backend_or_exit(timeout_s=0.01)
    # the documented opt-out really skips the probe
    monkeypatch.setenv(backend_probe.SKIP_ENV, "1")
    n = len(rec.probes)
    backend_probe.ensure_live_backend_or_exit(timeout_s=0.01)
    assert len(rec.probes) == n


def test_hung_backend_reexecs_on_cpu(bench, monkeypatch):
    rec = _Recorder()
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(subprocess, "run", rec.run_hang)
    monkeypatch.setattr(os, "execve", rec.execve)
    bench._ensure_live_backend(timeout_s=0.01)
    assert len(rec.execs) == 1
    exe, argv, env = rec.execs[0]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "unresponsive" in env["LITTLEGAN_BENCH_FALLBACK"]
    assert exe == argv[0]  # re-exec of the same interpreter + argv
