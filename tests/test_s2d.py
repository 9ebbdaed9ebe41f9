"""Space-to-depth boundary execution (ops/s2d.py) — exact-math equivalence.

The s2d path is a pure layout transformation: every assertion here is
EQUALITY (f32, CPU) against the plain path, not approximate agreement —
the kernels are index rearrangements of the same parameters.
"""

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
from littlegan_tpu.ops.s2d import depth_to_space, space_to_depth
from littlegan_tpu.training import create_train_state, make_train_step


@pytest.fixture(scope="module")
def cfgs(tiny_cfg):
    base = tiny_cfg.replace(use_s2d=False)
    return base, base.replace(use_s2d=True)


@pytest.mark.core
def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)), jnp.float32)
    y = space_to_depth(x)
    assert y.shape == (2, 4, 4, 12)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)), np.asarray(x))
    # channel order (pi, pj, c): block (0,0) phase (1,0) is raw pixel (1,0)
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0, :].reshape(2, 2, 3)[1, 0]), np.asarray(x[0, 1, 0, :])
    )


@pytest.mark.core
def test_generator_s2d_exact(cfgs):
    cfg, cfg_s = cfgs
    params = init_params(cfg, jax.random.PRNGKey(0))
    noise = jnp.asarray(np.random.default_rng(1).normal(size=(4, cfg.noise_dim)), jnp.float32)
    cond = jnp.asarray(np.random.default_rng(2).normal(size=(4, cfg.cond_dim)), jnp.float32)
    a = np.asarray(generator_apply(params, noise, cond, cfg))
    b = np.asarray(generator_apply(params, noise, cond, cfg_s))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)


def test_discriminator_s2d_exact(cfgs):
    cfg, cfg_s = cfgs
    params = init_params(cfg, jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (4, cfg.image_dim, cfg.image_dim, 3)), jnp.float32
    )
    pa, ca = discriminator_apply(params, img, cfg)
    pb, cb = discriminator_apply(params, img, cfg_s)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-6)
    # pre-converted input must agree with internal conversion
    pc, cc = discriminator_apply(params, space_to_depth(img), cfg_s, s2d_in=True)
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(pc))


def test_adjuster_s2d_exact(cfgs):
    cfg, cfg_s = cfgs
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(-1, 1, (4, cfg.image_dim, cfg.image_dim, 3)), jnp.float32)
    cond = jnp.asarray(rng.uniform(0, 1, (4, cfg.cond_dim)), jnp.float32)
    a = np.asarray(adjuster_apply(params, img, cond, cfg))
    b = np.asarray(adjuster_apply(params, img, cond, cfg_s))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)


def test_train_step_s2d_exact(cfgs):
    """One full fused train step (G+D+A losses, masked Adam) must produce the
    same parameter update with and without s2d."""
    cfg, cfg_s = cfgs
    cfg = cfg.replace(use_partition=True, donate_state=False)
    cfg_s = cfg_s.replace(use_partition=True, donate_state=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    mk = lambda: (
        jnp.asarray(rng.uniform(-1, 1, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)), jnp.float32),
        jnp.asarray(np.where(rng.random((cfg.batch_size, cfg.cond_dim)) < 0.5, 0.98, -0.94), jnp.float32),
    )
    b1, b2 = mk(), mk()
    key = jax.random.PRNGKey(6)

    out_a = make_train_step(cfg, state.params, donate=False)(state, b1, b2, key, jnp.int32(20))
    out_b = make_train_step(cfg_s, state.params, donate=False)(state, b1, b2, key, jnp.int32(20))

    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert abs(float(out_a.metrics[k]) - float(out_b.metrics[k])) < 1e-5, k
    np.testing.assert_allclose(
        np.asarray(out_a.fake_image), np.asarray(out_b.fake_image), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_a.adj_image), np.asarray(out_b.adj_image), atol=2e-6
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(out_a.state.params),
        jax.tree_util.tree_leaves_with_path(out_b.state.params),
    ):
        key_s = "/".join(str(getattr(p, "key", p)) for p in path)
        # forward values are exact (tests above); after ONE Adam step, f32
        # reduction-order differences between layouts are amplified to the
        # update scale on near-zero-gradient leaves (same rationale as
        # test_spatial) — bound at ~1 Adam step, far below training noise
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff <= 2.5 * cfg.lr, (key_s, diff)


def test_s2d_with_gp(cfgs):
    cfg_s = cfgs[1].replace(use_gp=True, donate_state=False)
    state = create_train_state(cfg_s, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    mk = lambda: (
        jnp.asarray(rng.uniform(-1, 1, (cfg_s.batch_size, cfg_s.image_dim, cfg_s.image_dim, 3)), jnp.float32),
        jnp.asarray(np.where(rng.random((cfg_s.batch_size, cfg_s.cond_dim)) < 0.5, 0.98, -0.94), jnp.float32),
    )
    out = make_train_step(cfg_s, state.params, donate=False)(
        state, mk(), mk(), jax.random.PRNGKey(8), jnp.int32(20)
    )
    for k, v in out.metrics.items():
        assert np.isfinite(float(v)), k


def test_augment_s2d_matches_raw():
    """augment_s2d on an s2d batch == s2d(augment(raw batch)): same PRNG
    stream, same per-raw-pixel noise, layout-aware flip/contrast/hue."""
    import jax

    from littlegan_tpu.ops.augment import augment, augment_s2d

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 3)), jnp.float32)
    key = jax.random.PRNGKey(7)
    a = space_to_depth(augment(key, x))
    b = augment_s2d(key, space_to_depth(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_gather_step_s2d_store_matches_raw_store(cfgs, tiny_cfg):
    """The s2d-layout device store must produce the same update as the raw
    store (bounded at the Adam-update scale — f32 reduction order)."""
    import jax

    from littlegan_tpu.training.step import make_gather_train_step

    cfg = cfgs[1].replace(use_partition=True, donate_state=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(41)
    imgs = rng.uniform(-1, 1, (2, cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)).astype(np.float32)
    conds = np.where(rng.random((2, cfg.batch_size, cfg.cond_dim)) < 0.5, 0.98, -0.94).astype(np.float32)
    key = jax.random.PRNGKey(9)

    raw = make_gather_train_step(cfg, state.params, donate=False, store_s2d=False)
    out_raw = raw(state, jnp.asarray(imgs), jnp.asarray(conds), jnp.int32(0), jnp.int32(1), key, jnp.int32(21))

    m, b, hh, ww, cc = imgs.shape
    imgs_s2d = (
        imgs.reshape(m, b, hh // 2, 2, ww // 2, 2, cc)
        .transpose(0, 1, 2, 4, 3, 5, 6)
        .reshape(m, b, hh // 2, ww // 2, 4 * cc)
    )
    s2d_step = make_gather_train_step(cfg, state.params, donate=False, store_s2d=True)
    out_s2d = s2d_step(state, jnp.asarray(imgs_s2d), jnp.asarray(conds), jnp.int32(0), jnp.int32(1), key, jnp.int32(21))

    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert abs(float(out_raw.metrics[k]) - float(out_s2d.metrics[k])) < 1e-4, k
    np.testing.assert_allclose(
        np.asarray(out_raw.fake_image), np.asarray(out_s2d.fake_image), atol=1e-5
    )
    for (path, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(out_raw.state.params),
        jax.tree_util.tree_leaves_with_path(out_s2d.state.params),
    ):
        key_s = "/".join(str(getattr(p, "key", p)) for p in path)
        assert np.abs(np.asarray(a) - np.asarray(b_)).max() <= 2.5 * cfg.lr, key_s


def test_trainer_device_data_keeps_raw_store(cfgs, tmp_path):
    """End-to-end: device_data trainer keeps the RAW-layout store (measured
    faster than the s2d-layout store — see trainer._ensure_device_store)
    while the s2d step path stays active."""
    from littlegan_tpu.data.synthetic import SyntheticDataset
    from littlegan_tpu.training.trainer import Trainer

    cfg = cfgs[1].replace(
        epoch=1,
        device_data=True,
        steps_per_dispatch=2,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="s2dstore",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    assert not tr._store_s2d
    imgs_dev, _ = tr._device_store
    assert imgs_dev.shape == (8, cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)
    assert tr.global_step == 4
