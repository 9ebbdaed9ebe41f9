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
