"""StableHLO export (littlegan_tpu/compat/stablehlo.py).

The serialized ``jax.export.Exported`` must reload with
``jax.export.deserialize`` and reproduce the apply functions exactly at
ANY batch size (symbolic batch dim); artifacts must carry a manifest and
readable StableHLO text; export_experiment must pick EMA weights.
"""

import json
import os

import jax
import numpy as np
import pytest

from littlegan_tpu.compat.stablehlo import export_experiment, export_stablehlo
from littlegan_tpu.config import Config
from littlegan_tpu.models import generator_apply, init_params
from littlegan_tpu.training.checkpoint import Checkpointer
from littlegan_tpu.training.state import create_train_state, eval_params


def _cfg(**kw) -> Config:
    base = dict(
        image_dim=16,
        init_dim=1,
        noise_dim=13,
        attr=list(range(7)),
        conv_filter=[24, 16, 12, 8, 4],
        compute_dtype="float32",
        debug=True,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(3))
    out = export_stablehlo(cfg, params, os.fspath(tmp_path_factory.mktemp("shlo")))
    return cfg, params, out


def test_artifacts_and_manifest(exported):
    cfg, _, out = exported
    names = sorted(os.listdir(out))
    for ep in ("generate", "adjust", "discriminate"):
        assert f"{ep}.stablehlo.mlir" in names
        assert f"{ep}.jaxexport.bin" in names
    with open(os.path.join(out, "generate.stablehlo.mlir")) as f:
        text = f.read()
    assert "stablehlo" in text and "func.func" in text
    m = json.load(open(os.path.join(out, "manifest.json")))
    gen = m["entry_points"]["generate"]
    assert gen["in_avals"] == [f"float32[b,{cfg.noise_dim}]", f"float32[b,{cfg.cond_dim}]"]
    assert gen["out_avals"] == [f"float32[b,{cfg.image_dim},{cfg.image_dim},3]"]
    assert "cpu" in gen["platforms"]


def test_roundtrip_matches_jax_any_batch(exported):
    from jax import export as jexport

    cfg, params, out = exported
    with open(os.path.join(out, "generate.jaxexport.bin"), "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    rng = np.random.default_rng(0)
    for n in (1, 5):  # symbolic batch: two different sizes, one artifact
        noise = rng.normal(size=(n, cfg.noise_dim)).astype(np.float32)
        cond = np.where(rng.random((n, cfg.cond_dim)) < 0.5, 0.98, -0.94).astype(np.float32)
        got = np.asarray(exp.call(noise, cond))
        want = np.asarray(generator_apply(params, noise, cond, cfg))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_experiment_picks_ema_weights(tmp_path):
    cfg = _cfg(
        ema_decay=0.999,
        exp_name="shlo_ema",
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "td"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state._replace(ema=jax.tree_util.tree_map(lambda x: x + 1.0, state.ema))
    Checkpointer(os.path.join(cfg.result_dir, "checkpoint")).save("1", state)
    out = export_experiment(cfg, out_dir=str(tmp_path / "shlo"), include=("generate",))

    from jax import export as jexport

    with open(os.path.join(out, "generate.jaxexport.bin"), "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    noise = np.zeros((2, cfg.noise_dim), np.float32)
    cond = np.zeros((2, cfg.cond_dim), np.float32)
    got = np.asarray(exp.call(noise, cond))
    want = np.asarray(generator_apply(eval_params(state), noise, cond, cfg))
    live = np.asarray(generator_apply(state.params, noise, cond, cfg))
    # the +1.0-shifted EMA weights drive tanh into saturation, where the
    # export's different fusion order costs a few 1e-4 — the check is WHICH
    # weights were exported, and live-vs-EMA differs at O(1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    assert np.abs(got - live).max() > 0.1


def test_cli_script(tmp_path, monkeypatch):
    cfg = _cfg(
        exp_name="shlo_cli",
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "td"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    Checkpointer(os.path.join(cfg.result_dir, "checkpoint")).save("1", state)
    (tmp_path / "sample.config.json").write_text(json.dumps(cfg.to_json_dict(), default=str))
    monkeypatch.chdir(tmp_path)
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import export_stablehlo as script
    finally:
        sys.path.pop(0)
    rc = script.main(["shlo_cli", "--only", "discriminate"])
    assert rc == 0
    out = tmp_path / "result" / "shlo_cli" / "model" / "stablehlo"
    assert (out / "discriminate.jaxexport.bin").is_file()
    assert (out / "manifest.json").is_file()
    m = json.load(open(out / "manifest.json"))
    assert list(m["entry_points"]) == ["discriminate"]
