"""state_bytes_report (parallel/zero.py) + scripts/memory_report.py.

The report's contract: its per-leaf sharding arithmetic MUST equal the live
train_state_shardings layout — the tool exists so users trust its numbers
at 512²+ without materializing anything.
"""

import importlib.util
import json
import os

import jax
import numpy as np
import pytest

from littlegan_tpu.parallel.mesh import make_mesh
from littlegan_tpu.parallel.zero import state_bytes_report, train_state_shardings
from littlegan_tpu.training import create_train_state


@pytest.fixture(scope="module")
def sd_cfg(tiny_cfg):
    return tiny_cfg.replace(image_dim=32, init_dim=2, batch_size=4)


def test_bf16_moments_halve_opt_bytes(sd_cfg):
    f32 = state_bytes_report(sd_cfg)
    bf16 = state_bytes_report(sd_cfg.replace(moment_dtype="bfloat16"))
    assert bf16["opt_mu_nu"]["global_bytes"] * 2 == f32["opt_mu_nu"]["global_bytes"]
    assert bf16["params"] == f32["params"]  # params untouched


def test_report_matches_live_shardings(sd_cfg, monkeypatch):
    """Per-chip bytes from the report == bytes actually resident per device
    under train_state_shardings, leaf for leaf, for every flag combination."""
    monkeypatch.setattr("littlegan_tpu.parallel.zero._MIN_SHARD_ELEMS", 0)
    mesh = make_mesh(8, axis_names=("data", "model"))
    mesh_shape = {"data": 4, "model": 2}

    for flags in (
        {},
        {"shard_opt_state": True},
        {"shard_dense": True},
        {"shard_opt_state": True, "shard_dense": True, "moment_dtype": "bfloat16"},
        {"shard_dense": True, "ema_decay": 0.999},
    ):
        cfg = sd_cfg.replace(**flags)
        rep = state_bytes_report(cfg, mesh_shape)
        shapes = jax.eval_shape(lambda c=cfg: create_train_state(c, jax.random.PRNGKey(0)))
        sh = train_state_shardings(cfg, shapes.params, mesh)

        def live_bytes(shape_tree, shard_tree):
            total = 0
            for x, s in zip(
                jax.tree_util.tree_leaves(shape_tree),
                jax.tree_util.tree_leaves(shard_tree),
            ):
                shard = s.shard_shape(x.shape)
                total += int(np.prod(shard)) * x.dtype.itemsize
            return total

        assert rep["params"]["per_chip_bytes"] == live_bytes(shapes.params, sh.params), flags
        opt_live = sum(
            live_bytes(getattr(shapes, f).mu, getattr(sh, f).mu)
            + live_bytes(getattr(shapes, f).nu, getattr(sh, f).nu)
            for f in ("opt_g", "opt_d", "opt_a")
        )
        assert rep["opt_mu_nu"]["per_chip_bytes"] == opt_live, flags
        if cfg.ema_decay > 0:
            assert rep["ema"]["per_chip_bytes"] == live_bytes(shapes.ema, sh.ema), flags


def test_report_script_prints_json(tmp_path, capsys):
    spec = importlib.util.spec_from_file_location(
        "memory_report_under_test",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "memory_report.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import sys

    argv = sys.argv
    sys.argv = ["memory_report.py", "--dim", "32", "--batch", "4",
                "--mesh", "data=4,model=2", "--shard-opt-state", "--shard-dense",
                "--moment-dtype", "bfloat16", "--remat", "--adj-half"]
    try:
        assert mod.main() == 0
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["total_per_chip_bytes"] < rec["total_global_bytes"]
    # remat/adj_half are step-compile knobs: echoed in the JSON, no effect
    # on train-state bytes
    assert rec["remat"] is True and rec["adj_half_batch"] is True


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"{name}_under_test",
        os.path.join(os.path.dirname(__file__), "..", "scripts", f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_compiled_step_report_fits_on_cpu(sd_cfg):
    """The compile-only fit probe: a tiny step compiles and reports a
    positive peak with fits=True (the OOM branch needs a real HBM-limited
    backend — its parsing is covered by the fit_frontier regex test)."""
    mod = _load("memory_report")
    comp = mod.compiled_step_report(sd_cfg.replace(debug=True))
    assert comp["fits"] is True and comp["donate"] is True
    assert comp["peak_bytes"] > 0 and comp["temp_bytes"] >= 0


def test_fit_frontier_oom_regex_and_headroom():
    """_OOM_RE must parse the tunneled backend's REAL diagnostic line
    (captured verbatim from a 2026-08-19 1024²/b32 compile)."""
    ff = _load("fit_frontier")
    msg = ("compile: Internal: AOT PJRT error: XLA:TPU compile permanent "
           "error. Ran out of memory in memory space hbm. Used 20.02G of "
           "15.75G hbm. Exceeded hbm capacity by 4.27G.")
    m = ff._OOM_RE.search(msg)
    assert m is not None
    used = int(float(m.group(1)) * ff._SCALE[m.group(2)])
    cap = int(float(m.group(3)) * ff._SCALE[m.group(4)])
    assert used == int(20.02 * (1 << 30)) and cap == int(15.75 * (1 << 30))

    hbm = 16 << 30
    res = {"dim": 1024, "peak_bytes": hbm - 10 * 1024 * 1024 * 3}
    assert ff.headroom_images(res, 1024, hbm) == 10
    assert ff.headroom_images({"dim": 1024}, 1024, hbm) is None
    assert ff.headroom_images({"peak_bytes": hbm + 1}, 1024, hbm) == 0

    with pytest.raises(SystemExit, match="unknown flag"):
        ff.flagset_args("remat+nonsense")
    assert ff.flagset_args("remat+mbf16") == ["--remat", "--moment-dtype", "bfloat16"]


def test_fit_frontier_search_and_out(tmp_path, monkeypatch, capsys):
    """Binary search over a stubbed probe: max fitting batch found with the
    minimal probe sequence, every probe recorded, --out written."""
    ff = _load("fit_frontier")
    calls = []

    def fake_probe(dim, batch, flagset, timeout_s, topology=None, mesh=None):
        calls.append(batch)
        fits = batch <= 5
        res = {"dim": dim, "batch": batch, "flags": flagset,
               "verdict": "fits" if fits else "oom"}
        if fits:
            res["peak_bytes"] = batch * (1 << 20)
        return res

    monkeypatch.setattr(ff, "probe", fake_probe)
    out = tmp_path / "fit.json"
    import sys

    argv = sys.argv
    sys.argv = ["fit_frontier.py", "--search", "256", "--max-batch", "8",
                "--flagsets", "remat", "--out", str(out)]
    try:
        assert ff.main() == 0
    finally:
        sys.argv = argv
    assert calls == [8, 4, 6, 5]  # upper bound, then lo=0..hi=7 bisection
    rec = json.loads(out.read_text())
    assert rec["results"][-1] == {"dim": 256, "flags": "remat",
                                  "max_fitting_batch": 5}
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines[-1]["max_fitting_batch"] == 5
    # every recorded probe gained the headroom column
    assert all("n_images_headroom" in l for l in lines if "batch" in l)


def test_fit_frontier_multichip_headroom():
    """Multi-chip probes scale the store headroom by the slice size (the
    sharded uint8 store spreads every image's bytes over all chips)."""
    ff = _load("fit_frontier")
    hbm = 16 << 30
    res = {"dim": 1024, "peak_bytes": hbm - 10 * 1024 * 1024 * 3, "n_chips": 8}
    assert ff.headroom_images(res, 1024, hbm) == 80
    assert ff.flagset_args("zero+sdense") == ["--shard-opt-state", "--shard-dense"]


def test_topology_compile_path(sd_cfg, monkeypatch):
    """--topology end to end on the virtual 8-device backend: a fake
    topology description standing in for the TPU one (same .devices
    contract), the spatial step compiled over a (4,2) mesh with every
    sharding flag on, per-chip memory analysis returned."""
    import jax.experimental.topologies as topo

    mod = _load("memory_report")

    class _FakeTopo:
        devices = jax.devices()[:8]

    seen = {}

    def fake_desc(platform, topology_name):
        seen["args"] = (platform, topology_name)
        return _FakeTopo()

    monkeypatch.setattr(topo, "get_topology_desc", fake_desc)

    # axis product must match the chip count
    with pytest.raises(SystemExit, match="needs 6 chips"):
        mod.topology_mesh("v5e:2x4", {"data": 3, "model": 2})

    mesh = mod.topology_mesh("v5e:2x4", {"data": 4, "model": 2})
    assert seen["args"] == ("tpu", "v5e:2x4")
    assert mesh.axis_names == ("data", "model") and mesh.devices.shape == (4, 2)

    cfg = sd_cfg.replace(
        debug=True, shard_opt_state=True, shard_dense=True,
        moment_dtype="bfloat16", remat=True,
    )
    comp = mod.compiled_step_report(cfg, topology="v5e:2x4", mesh_shape={"data": 4, "model": 2})
    assert comp["fits"] is True and comp["n_chips"] == 8
    assert comp["mesh"] == {"data": 4, "model": 2}
    assert comp["peak_bytes"] > 0

    # default split: everything on 'data' -> the DP step (batch must divide)
    comp_dp = mod.compiled_step_report(
        cfg.replace(shard_dense=False, batch_size=8), topology="v5e:2x4"
    )
    assert comp_dp["fits"] is True and comp_dp["n_chips"] == 8


def test_compiled_step_report_grad_accum(sd_cfg, monkeypatch):
    """--grad-accum compiles the ACCUMULATION step: (M, B, ...) stacked
    batches, single-device and over a topology mesh (the 2048² fit lever —
    scripts/fit_frontier.py probes it via the 'accumM' flag)."""
    import jax.experimental.topologies as topo

    mod = _load("memory_report")
    cfg = sd_cfg.replace(debug=True, grad_accum=2)
    comp = mod.compiled_step_report(cfg)
    assert comp["fits"] is True and comp["peak_bytes"] > 0

    class _FakeTopo:
        devices = jax.devices()[:8]

    monkeypatch.setattr(topo, "get_topology_desc", lambda platform, topology_name: _FakeTopo())
    comp = mod.compiled_step_report(
        cfg.replace(shard_opt_state=True, moment_dtype="bfloat16", remat=True),
        topology="v5e:2x4", mesh_shape={"data": 4, "model": 2},
    )
    assert comp["fits"] is True and comp["n_chips"] == 8

    ff = _load("fit_frontier")
    assert ff.flagset_args("accum8+remat") == ["--grad-accum", "8", "--remat"]
    with pytest.raises(SystemExit, match="unknown flag"):
        ff.flagset_args("accumx")
