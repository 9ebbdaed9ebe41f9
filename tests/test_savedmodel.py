"""SavedModel export (littlegan_tpu/compat/savedmodel.py).

TF loads the exported model with NO JAX in the loop and must reproduce the
JAX apply functions exactly; batch is shape-polymorphic; export_experiment
must pick the EMA generator weights like every other eval path.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from littlegan_tpu.compat.savedmodel import export_experiment, export_saved_model  # noqa: E402
from littlegan_tpu.config import Config  # noqa: E402
from littlegan_tpu.models import (  # noqa: E402
    adjuster_apply,
    discriminator_apply,
    generator_apply,
    init_params,
)
from littlegan_tpu.training.checkpoint import Checkpointer  # noqa: E402
from littlegan_tpu.training.state import create_train_state, eval_params  # noqa: E402


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


def test_savedmodel_matches_jax_and_is_batch_polymorphic(tmp_path):
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(3))
    out = export_saved_model(cfg, params, os.fspath(tmp_path / "sm"))
    loaded = tf.saved_model.load(out)
    assert set(loaded.signatures) == {"generate", "adjust", "discriminate"}

    rng = np.random.default_rng(0)
    for b in (1, 5):  # one export serves every batch size
        noise = rng.normal(size=(b, cfg.noise_dim)).astype(np.float32)
        cond = rng.normal(size=(b, cfg.cond_dim)).astype(np.float32)
        image = rng.uniform(-1, 1, size=(b, 16, 16, 3)).astype(np.float32)

        got = loaded.generate(tf.constant(noise), tf.constant(cond)).numpy()
        want = np.asarray(generator_apply(params, noise, cond, cfg))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        got = loaded.adjust(tf.constant(image), tf.constant(cond)).numpy()
        want = np.asarray(adjuster_apply(params, image, cond, cfg))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        got = loaded.discriminate(tf.constant(image))
        pr, cd = discriminator_apply(params, image, cfg)
        np.testing.assert_allclose(got["pr"].numpy(), np.asarray(pr), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got["cond"].numpy(), np.asarray(cd), rtol=1e-5, atol=1e-5)

    # the serving-signature view works too (TF Serving entry point)
    sig = loaded.signatures["generate"]
    res = sig(noise=tf.zeros([2, cfg.noise_dim]), cond=tf.zeros([2, cfg.cond_dim]))
    (val,) = res.values()
    assert val.shape == (2, 16, 16, 3)


def test_export_experiment_uses_ema_weights(tmp_path):
    cfg = _cfg(ema_decay=0.99, all_result_dir=os.fspath(tmp_path / "result"), exp_name="x")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # make the EMA weights VISIBLY different from the live ones
    state = state._replace(ema=jax.tree_util.tree_map(lambda a: a + 0.25, state.ema))
    Checkpointer(os.path.join(cfg.result_dir, "checkpoint")).save(
        "3", state, status={"epoch": 4, "step": 7}
    )

    out = export_experiment(cfg, include=("generate",))
    assert out == os.path.join(cfg.result_dir, "model", "savedmodel")
    loaded = tf.saved_model.load(out)

    noise = np.zeros((2, cfg.noise_dim), np.float32)
    cond = np.zeros((2, cfg.cond_dim), np.float32)
    got = loaded.generate(tf.constant(noise), tf.constant(cond)).numpy()
    want_ema = np.asarray(generator_apply(eval_params(state), noise, cond, cfg))
    want_live = np.asarray(generator_apply(state.params, noise, cond, cfg))
    np.testing.assert_allclose(got, want_ema, rtol=1e-5, atol=1e-5)
    assert np.abs(want_ema - want_live).max() > 1e-3  # the distinction is real

    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        export_experiment(cfg.replace(exp_name="never-trained"))


def test_export_script_cli(tmp_path, monkeypatch, capsys):
    """scripts/export_savedmodel.py main(): cwd config resolution + flags."""
    import importlib.util
    import json

    cfg = _cfg(all_result_dir=os.fspath(tmp_path / "result"), exp_name="cliexp")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    Checkpointer(os.path.join(cfg.result_dir, "checkpoint")).save("1", state)

    # the CLI merges configs from the CURRENT directory (reference semantics)
    (tmp_path / "sample.config.json").write_text(
        json.dumps({k: getattr(cfg, k) for k in (
            "image_dim", "init_dim", "noise_dim", "attr", "conv_filter",
            "all_result_dir", "compute_dtype",
        )})
    )
    monkeypatch.chdir(tmp_path)

    spec = importlib.util.spec_from_file_location(
        "export_savedmodel",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "export_savedmodel.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main(["cliexp", "--only", "generate"]) == 0
    out_dir = os.path.join(cfg.result_dir, "model", "savedmodel")
    assert "savedmodel" in capsys.readouterr().out
    loaded = tf.saved_model.load(out_dir)
    assert set(loaded.signatures) == {"generate"}
