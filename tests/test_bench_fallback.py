"""bench.py watchdog supervisor (round-4 verdict #1).

BENCH_r03 was lost to a driver timeout (rc=124, parsed:null): the discovery
probe passed but compile/dispatch over the wedged tunnel hung with nothing
bounding it. The supervisor now stages bounded attempts — probe → chip
child → CPU child → provisional artifact line — and must ALWAYS print one
valid JSON line within LITTLEGAN_BENCH_BUDGET_S. Unit tests drive the
staging logic with a fake runner; one integration test injects a real hang
(LITTLEGAN_BENCH_TEST_HANG_S) into real subprocesses and asserts the line
still appears within budget.
"""

import importlib.util
import json
import os
import subprocess
import sys
import time

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeRunner:
    """Mimics subprocess.run for _run_child: scripted per-call behavior."""

    def __init__(self, behaviors):
        self.behaviors = list(behaviors)
        self.calls = []  # (cmd, env, timeout)

    def __call__(self, cmd, env=None, timeout=None, **kw):
        self.calls.append((cmd, env, timeout))
        behavior = self.behaviors.pop(0)
        if behavior == "hang":
            raise subprocess.TimeoutExpired(cmd=cmd, timeout=timeout)
        if behavior == "crash":
            return subprocess.CompletedProcess(cmd, 3, stdout="")
        if behavior == "garbage":
            return subprocess.CompletedProcess(cmd, 0, stdout="not json\n{broken\n")
        # behavior is a dict → a successful JSON line (with log noise around it)
        return subprocess.CompletedProcess(
            cmd, 0, stdout="some warning\n" + json.dumps(behavior) + "\n"
        )


def _emitted(capsys):
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines}"
    return json.loads(lines[0])


GOOD = {"metric": "train_images_per_sec_per_chip_128px_b32", "value": 6500.0,
        "unit": "images/sec", "vs_baseline": 19.0}


def test_accelerator_success_passes_through(bench, capsys, monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")  # not CPU-pinned
    runner = _FakeRunner([GOOD])
    assert bench.supervise([], runner=runner) == 0
    out = _emitted(capsys)
    assert out["value"] == 6500.0 and "watchdog_note" not in out
    # child env: marked as child, nothing else rewritten
    cmd, env, timeout = runner.calls[0]
    assert env[bench.CHILD_ENV] == "1"
    assert "LITTLEGAN_BENCH_FALLBACK" not in env
    assert timeout is not None and timeout > 0


def test_hung_chip_falls_back_to_cpu(bench, capsys, monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    cpu_line = dict(GOOD, metric="train_images_per_sec_per_chip_32px_b4",
                    value=11.0, backend_fallback="cpu (...)")
    runner = _FakeRunner(["hang", cpu_line])
    assert bench.supervise([], runner=runner) == 0
    out = _emitted(capsys)
    assert out["value"] == 11.0
    assert "killed by watchdog" in out["watchdog_note"]
    # CPU stage env: pinned to cpu, axon plugin off, honest fallback tag
    _, env, _ = runner.calls[1]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "LITTLEGAN_BENCH_FALLBACK" in env


def test_dead_discovery_skips_chip_stage(bench, capsys, monkeypatch):
    # axon plugin present + probe times out → go straight to CPU
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    cpu_line = dict(GOOD, value=12.0)
    runner = _FakeRunner([cpu_line])
    assert bench.supervise([], runner=runner, probe=lambda t: False) == 0
    out = _emitted(capsys)
    assert out["value"] == 12.0
    assert "discovery hung" in out["watchdog_note"]
    assert len(runner.calls) == 1  # no accelerator child was spawned
    _, env, _ = runner.calls[0]
    assert env["JAX_PLATFORMS"] == "cpu"


def test_live_probe_attempts_chip(bench, capsys, monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # image default, not a user pin
    runner = _FakeRunner([GOOD])
    assert bench.supervise([], runner=runner, probe=lambda t: True) == 0
    out = _emitted(capsys)
    assert out["value"] == GOOD["value"]
    _, env, _ = runner.calls[0]
    assert env.get("JAX_PLATFORMS") == "axon"  # accelerator env untouched


def test_all_stages_dead_emits_provisional(bench, capsys, monkeypatch, tmp_path):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    past = dict(GOOD, value=6582.2)
    (tmp_path / "bench_r3_chip.json").write_text(json.dumps(past))
    monkeypatch.setenv(bench.ARTIFACTS_DIR_ENV, str(tmp_path))
    runner = _FakeRunner(["hang", "crash"])
    assert bench.supervise([], runner=runner) == 0
    out = _emitted(capsys)
    assert out["provisional"] is True
    assert out["value"] == 6582.2
    assert "bench_r3_chip.json" in out["provisional_source"]
    assert "killed by watchdog" in out["watchdog_note"]
    assert "rc=3" in out["watchdog_note"]


def test_provisional_from_autotune_schema(bench, tmp_path):
    autotune = {
        "device_kind": "TPU v5 lite", "image_dim": 128, "batch_size": 32,
        "parity": {"steps_per_dispatch": 64, "step_ms": 9.723,
                   "images_per_sec": 6582.2},
    }
    (tmp_path / "autotune_v5e_128_b32.json").write_text(json.dumps(autotune))
    out = bench._provisional_result(str(tmp_path))
    assert out["metric"] == "train_images_per_sec_per_chip_128px_b32"
    assert out["value"] == 6582.2 and out["step_ms"] == 9.723
    assert out["provisional"] is True


def test_provisional_prefers_bench_over_autotune(bench, tmp_path):
    (tmp_path / "autotune_x.json").write_text(
        json.dumps({"image_dim": 1, "batch_size": 1,
                    "parity": {"images_per_sec": 1.0}})
    )
    (tmp_path / "bench_r4_chip.json").write_text(json.dumps(GOOD))
    out = bench._provisional_result(str(tmp_path))
    assert out["value"] == GOOD["value"]


def test_no_artifacts_still_emits_valid_line(bench, capsys, monkeypatch, tmp_path):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    monkeypatch.setenv(bench.ARTIFACTS_DIR_ENV, str(tmp_path / "empty"))
    runner = _FakeRunner(["garbage", "hang"])
    assert bench.supervise([], runner=runner) == 0
    out = _emitted(capsys)
    assert out["provisional"] is True and out["value"] == 0.0
    assert "metric" in out and "no JSON result line" in out["watchdog_note"]


def test_tiny_budget_goes_straight_to_provisional(bench, capsys, monkeypatch, tmp_path):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv(bench.BUDGET_ENV, "1")
    (tmp_path / "bench_r4.json").write_text(json.dumps(GOOD))
    monkeypatch.setenv(bench.ARTIFACTS_DIR_ENV, str(tmp_path))
    runner = _FakeRunner([])  # would raise if any child were spawned
    assert bench.supervise([], runner=runner) == 0
    out = _emitted(capsys)
    assert out["provisional"] is True and out["value"] == GOOD["value"]


def test_store_batches_rejects_negative(bench):
    with pytest.raises(SystemExit):
        bench.parse_args(["--store-batches", "-1"])
    with pytest.raises(SystemExit):
        bench.parse_args(["--k", "-2"])
    args = bench.parse_args(["--store-batches", "3", "--k", "8"])
    assert args.store_batches == 3 and args.k == 8


def test_wedged_tunnel_integration(tmp_path):
    """Real subprocesses, real hang, real budget: both measurement children
    sleep past their watchdog timeouts; one provisional JSON line must
    still appear inside the budget (the BENCH_r03 regression test)."""
    (tmp_path / "bench_prior.json").write_text(json.dumps(GOOD))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update({
        "LITTLEGAN_BENCH_BUDGET_S": "60",
        "LITTLEGAN_BENCH_TEST_HANG_S": "3600",
        "LITTLEGAN_BENCH_TEST_HANG_STAGES": "all",
        "LITTLEGAN_BENCH_ARTIFACTS_DIR": str(tmp_path),
    })
    bench_path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, bench_path], env=env, timeout=90,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    elapsed = time.monotonic() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert elapsed < 75, f"supervisor blew its budget: {elapsed:.0f}s"
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["provisional"] is True and out["value"] == GOOD["value"]
    assert "killed by watchdog" in out["watchdog_note"]


def test_fallback_schedule_is_tiny(bench):
    """The CPU-fallback measurement must fit the supervisor's CPU reserve:
    a 32²/b4 CPU step is ~1.5 s on this 1-core host, so the schedule is
    capped at (1 warmup + 2 measured) dispatches of K<=4 (~12 steps)."""
    k, warmup, measure, repeats = bench.fallback_schedule(64)
    total_steps = (warmup + measure * repeats) * k
    assert k <= 4 and total_steps <= 16, (k, warmup, measure, repeats)
    assert bench.fallback_schedule(2)[0] == 2  # never raises K above auto


def test_cpu_pin_skips_accelerator_attempt(bench, capsys, monkeypatch):
    """An explicitly CPU-pinned run (JAX_PLATFORMS=cpu, no axon plugin) goes
    straight to the small tagged CPU measurement — the full-size
    accelerator attempt would crawl on CPU until the watchdog killed it."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    cpu_line = dict(GOOD, metric="train_images_per_sec_per_chip_32px_b4", value=5.0)
    runner = _FakeRunner([cpu_line])
    assert bench.supervise([], runner=runner) == 0
    out = _emitted(capsys)
    assert out["value"] == 5.0
    assert "JAX_PLATFORMS=cpu" in out["watchdog_note"]
    assert len(runner.calls) == 1
    _, env, _ = runner.calls[0]
    assert env["JAX_PLATFORMS"] == "cpu" and "LITTLEGAN_BENCH_FALLBACK" in env
