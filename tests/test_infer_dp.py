"""Data-parallel inference (parallel/infer.py).

Value-equivalence with the single-device jits on the virtual 8-device CPU
mesh (the forwards are row-independent, so row sharding must not change any
output), ragged-row padding, the shared Inception featurizer, and the
trainer/Config wiring. Reference context: the tools this accelerates are
single-device there (evaluate-sample main.py:58-81, FID features
fid.py:73-106)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlegan_tpu.models import (
    adjuster_apply,
    discriminator_apply,
    generator_apply,
    init_params,
)
from littlegan_tpu.parallel.infer import data_parallel_infer, infer_mesh_devices, pad_rows


@pytest.fixture(scope="module")
def batch(tiny_cfg):
    rng = np.random.default_rng(3)
    return (
        rng.normal(size=(8, tiny_cfg.noise_dim)).astype(np.float32),
        rng.uniform(-1, 1, size=(8, tiny_cfg.cond_dim)).astype(np.float32),
        rng.uniform(-1, 1, size=(8, tiny_cfg.image_dim, tiny_cfg.image_dim, 3)).astype(
            np.float32
        ),
    )


def test_dp_matches_single_device(tiny_cfg, batch):
    """All three apply fns: sharded == plain jit (incl. tuple outputs)."""
    assert infer_mesh_devices() == 8  # conftest's virtual mesh
    params = init_params(tiny_cfg, jax.random.PRNGKey(0))
    noise, cond, image = batch

    gen_fn = lambda p, n, c: generator_apply(p, n, c, tiny_cfg).astype(jnp.float32)
    disc_fn = lambda p, i: discriminator_apply(p, i, tiny_cfg)
    adj_fn = lambda p, i, c: adjuster_apply(p, i, c, tiny_cfg).astype(jnp.float32)

    dp_gen = data_parallel_infer(gen_fn, 2)
    gen = np.asarray(dp_gen(params, noise, cond))
    np.testing.assert_allclose(
        gen, np.asarray(jax.jit(gen_fn)(params, noise, cond)), rtol=2e-5, atol=2e-5
    )

    dp_pr, dp_c = data_parallel_infer(disc_fn, 1)(params, image)
    pr, c = jax.jit(disc_fn)(params, image)
    np.testing.assert_allclose(np.asarray(dp_pr), np.asarray(pr), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dp_c), np.asarray(c), rtol=2e-5, atol=2e-5)

    adj = data_parallel_infer(adj_fn, 2)(params, image, cond)
    np.testing.assert_allclose(
        np.asarray(adj),
        np.asarray(jax.jit(adj_fn)(params, image, cond)),
        rtol=2e-5,
        atol=2e-5,
    )

    # chaining device outputs back in (predict feeds G's output to D/A)
    pr2, _ = data_parallel_infer(disc_fn, 1)(params, dp_gen(params, noise, cond))
    np.testing.assert_allclose(
        np.asarray(pr2), np.asarray(jax.jit(disc_fn)(params, gen)[0]), rtol=2e-5, atol=2e-5
    )


def test_dp_ragged_rows(tiny_cfg):
    """5 rows over 8 devices: zero-padded to 8, outputs sliced back — equal
    to the single-device run on the raw 5 rows."""
    params = init_params(tiny_cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    noise = rng.normal(size=(5, tiny_cfg.noise_dim)).astype(np.float32)
    cond = rng.uniform(-1, 1, size=(5, tiny_cfg.cond_dim)).astype(np.float32)
    gen_fn = lambda p, n, c: generator_apply(p, n, c, tiny_cfg).astype(jnp.float32)
    out = data_parallel_infer(gen_fn, 2)(params, noise, cond)
    assert out.shape[0] == 5
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.jit(gen_fn)(params, noise, cond)),
        rtol=2e-5, atol=2e-5,
    )
    # pad_rows itself: zero rows appended, dtype kept
    padded = pad_rows(noise, 8)
    assert padded.shape == (8, tiny_cfg.noise_dim) and padded.dtype == noise.dtype
    assert (padded[5:] == 0).all()
    assert pad_rows(noise, 5) is noise  # no-op passthrough


def test_featurizer_dp_equivalence(tiny_cfg):
    """compute_features: eval_data_parallel on == off (random-init Inception,
    honesty-gated via allow_random_fid)."""
    from littlegan_tpu.eval.evaluate import compute_features

    imgs = np.random.default_rng(5).integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    base = tiny_cfg.replace(allow_random_fid=True)
    f_dp = compute_features(imgs, base.replace(eval_data_parallel=True), batch_size=4)
    f_1d = compute_features(imgs, base.replace(eval_data_parallel=False), batch_size=4)
    assert f_dp.shape == (4, 2048)
    np.testing.assert_allclose(f_dp, f_1d, rtol=1e-4, atol=1e-4)


def test_trainer_wiring(tiny_cfg, tmp_path):
    """The Config gate picks the DP wrappers (mesh attr) vs plain jits, and
    predict produces identical images either way."""
    from littlegan_tpu.training.trainer import Trainer

    cfg = tiny_cfg.replace(
        all_result_dir=str(tmp_path / "r"), test_data_dir=str(tmp_path / "t"),
        exp_name="dp", restore=False, epoch=1,
    )
    tr_dp = Trainer(cfg, None)
    assert getattr(tr_dp._gen_jit, "mesh", None) is not None
    tr_1d = Trainer(cfg.replace(eval_data_parallel=False), None)
    assert getattr(tr_1d._gen_jit, "mesh", None) is None

    rng = np.random.default_rng(6)
    noise = rng.normal(size=(4, cfg.noise_dim)).astype(np.float32)
    cond = rng.uniform(-1, 1, size=(4, cfg.cond_dim)).astype(np.float32)
    # fresh states differ; compare through the SAME params
    g_dp = tr_dp.generate(noise, cond)
    tr_1d.state = tr_dp.state
    g_1d = tr_1d.generate(noise, cond)
    np.testing.assert_allclose(g_dp, g_1d, rtol=2e-5, atol=2e-5)


def test_dp_params_cache_tracks_tree_changes(tiny_cfg):
    """Swapping in a different tree must never serve the previous tree's
    weights (the cache holds the host tree and compares identity — a bare
    id() key could collide after garbage collection)."""
    gen_fn = lambda p, n, c: generator_apply(p, n, c, tiny_cfg).astype(jnp.float32)
    dp = data_parallel_infer(gen_fn, 2)
    rng = np.random.default_rng(7)
    noise = rng.normal(size=(8, tiny_cfg.noise_dim)).astype(np.float32)
    cond = rng.uniform(-1, 1, size=(8, tiny_cfg.cond_dim)).astype(np.float32)
    for seed in (0, 1, 0, 2):  # incl. returning to an earlier tree
        params = init_params(tiny_cfg, jax.random.PRNGKey(seed))
        out = np.asarray(dp(params, noise, cond))
        ref = np.asarray(jax.jit(gen_fn)(params, noise, cond))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
