"""Model topology tests: shapes, param counts, weight sharing (SURVEY §2 #5-9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.core  # sub-5-min gate tier (round-4 verdict #4)

from littlegan_tpu.models import (
    adjuster_apply,
    discriminator_apply,
    encoder_apply,
    generator_apply,
    init_params,
)


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def test_param_tree_arity(full_cfg, rng):
    p = init_params(full_cfg, rng)
    # reference weight counts: G=22 arrays (model.py:76-105), D=20 (54-73),
    # Adjuster owns 4 (108-136); encoder/decoder are 16 each.
    assert len(_leaves(p["encoder"])) == 16
    assert len(_leaves(p["decoder"])) == 16
    assert len(_leaves(p["g_head"])) + len(_leaves(p["decoder"])) + len(_leaves(p["out_conv"])) == 22
    assert len(_leaves(p["encoder"])) + len(_leaves(p["d_head"])) == 20
    assert len(_leaves(p["adj_head"])) == 4
    assert len(_leaves(p)) == 46


def test_reference_scale_shapes(full_cfg, rng):
    p = init_params(full_cfg, rng)
    # encoder channels 3->64->128->256->384 (model.py:15: conv_filter[4-i])
    assert p["encoder"]["block1"]["conv"]["kernel"].shape == (5, 5, 3, 64)
    assert p["encoder"]["block4"]["conv"]["kernel"].shape == (5, 5, 256, 384)
    # decoder channels 384->256->...->32 (model.py:38: conv_filter[i]); TF
    # transpose layout (h,w,out,in)
    assert p["decoder"]["block1"]["conv"]["kernel"].shape == (5, 5, 256, 384)
    assert p["decoder"]["block4"]["conv"]["kernel"].shape == (5, 5, 32, 64)
    # G dense: (93+7) -> 8*8*384 (model.py:81)
    assert p["g_head"]["dense"]["kernel"].shape == (100, 8 * 8 * 384)
    # D heads flatten 8*8*384 (model.py:68-72)
    assert p["d_head"]["pr"]["kernel"].shape == (8 * 8 * 384, 1)
    assert p["d_head"]["cond"]["kernel"].shape == (8 * 8 * 384, 7)
    # adjuster dense: cond_dim -> 8*8*384 (model.py:121)
    assert p["adj_head"]["dense"]["kernel"].shape == (7, 8 * 8 * 384)
    # shared output conv: (5,5,3,32) (model.py:90)
    assert p["out_conv"]["kernel"].shape == (5, 5, 3, 32)


def test_encoder_returns_four_fmaps(tiny_cfg, rng):
    p = init_params(tiny_cfg, rng)
    x = jnp.zeros((2, 16, 16, 3))
    fmaps = encoder_apply(p["encoder"], x, tiny_cfg)
    assert len(fmaps) == 4  # model.py:18-27 returns ALL feature maps
    cf = tiny_cfg.conv_filter
    assert [f.shape for f in fmaps] == [
        (2, 8, 8, cf[3]),
        (2, 4, 4, cf[2]),
        (2, 2, 2, cf[1]),
        (2, 1, 1, cf[0]),
    ]


def test_generator_output(tiny_cfg, rng):
    p = init_params(tiny_cfg, rng)
    noise = jax.random.normal(rng, (4, tiny_cfg.noise_dim))
    cond = jnp.zeros((4, tiny_cfg.cond_dim))
    img = generator_apply(p, noise, cond, tiny_cfg)
    assert img.shape == (4, 16, 16, 3)
    arr = np.asarray(img)
    assert arr.min() >= -1.0 and arr.max() <= 1.0  # tanh output (model.py:90)


def test_discriminator_outputs(tiny_cfg, rng):
    p = init_params(tiny_cfg, rng)
    img = jax.random.normal(rng, (4, 16, 16, 3))
    pr, cond = discriminator_apply(p, img, tiny_cfg)
    assert pr.shape == (4, 1) and cond.shape == (4, tiny_cfg.cond_dim)
    for a in (np.asarray(pr), np.asarray(cond)):
        assert a.min() >= 0.0 and a.max() <= 1.0  # sigmoid heads (model.py:62-63)


def test_adjuster_output_and_sharing(tiny_cfg, rng):
    p = init_params(tiny_cfg, rng)
    img = jax.random.normal(rng, (4, 16, 16, 3))
    cond = jnp.zeros((4, tiny_cfg.cond_dim))
    adj = adjuster_apply(p, img, cond, tiny_cfg)
    assert adj.shape == (4, 16, 16, 3)

    # weight sharing: perturbing the ENCODER changes the adjuster's output
    # (model.py:119 — adjuster uses D's encoder), and perturbing the DECODER
    # does too (model.py:122 — uses G's decoder)
    p2 = jax.tree_util.tree_map(lambda x: x, p)
    p2["encoder"]["block1"]["conv"]["kernel"] = p["encoder"]["block1"]["conv"]["kernel"] + 0.5
    adj2 = adjuster_apply(p2, img, cond, tiny_cfg)
    assert np.abs(np.asarray(adj2) - np.asarray(adj)).max() > 1e-6

    p3 = jax.tree_util.tree_map(lambda x: x, p)
    p3["decoder"]["block2"]["conv"]["kernel"] = p["decoder"]["block2"]["conv"]["kernel"] + 0.5
    adj3 = adjuster_apply(p3, img, cond, tiny_cfg)
    assert np.abs(np.asarray(adj3) - np.asarray(adj)).max() > 1e-6


def test_jit_compilable(tiny_cfg, rng):
    p = init_params(tiny_cfg, rng)
    gen = jax.jit(lambda pp, n, c: generator_apply(pp, n, c, tiny_cfg))
    noise = jax.random.normal(rng, (2, tiny_cfg.noise_dim))
    cond = jnp.zeros((2, tiny_cfg.cond_dim))
    out = gen(p, noise, cond)
    assert out.shape == (2, 16, 16, 3)


def test_dropout_inert_by_default_matches_reference_quirk(tiny_cfg, rng):
    # reference model.py:25: dropout is a no-op at train time (SURVEY appendix)
    p = init_params(tiny_cfg, rng)
    img = jax.random.normal(rng, (2, 16, 16, 3))
    a, _ = discriminator_apply(p, img, tiny_cfg)
    b, _ = discriminator_apply(p, img, tiny_cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # but CAN be activated explicitly
    c, _ = discriminator_apply(p, img, tiny_cfg, dropout_rng=jax.random.PRNGKey(3))
    assert np.abs(np.asarray(c) - np.asarray(a)).max() > 1e-9


def test_cond_bias_extension(tiny_cfg):
    """Config.cond_bias (opt-in, non-parity): zeros-init => identical outputs
    at init; the kernel receives gradient and shifts global statistics."""
    import jax
    import jax.numpy as jnp

    from littlegan_tpu.models import generator_apply, init_params, param_count
    from littlegan_tpu.training import create_train_state, make_train_step

    cfg = tiny_cfg.replace(donate_state=False)
    cfg_cb = cfg.replace(cond_bias=True)
    p0 = init_params(cfg, jax.random.PRNGKey(0))
    p1 = init_params(cfg_cb, jax.random.PRNGKey(0))
    assert param_count(p1) - param_count(p0) == cfg.cond_dim * cfg.image_channel

    noise = jnp.asarray(np.random.default_rng(1).normal(size=(2, cfg.noise_dim)), jnp.float32)
    cond = jnp.asarray(np.where(np.random.default_rng(2).random((2, cfg.cond_dim)) < 0.5, 0.98, -0.94), jnp.float32)
    a = np.asarray(generator_apply(p0, noise, cond, cfg))
    b = np.asarray(generator_apply(p1, noise, cond, cfg_cb))
    np.testing.assert_array_equal(a, b)  # zeros-init: exact reference behavior

    # a nonzero kernel shifts the output in the cond direction
    p2 = dict(p1)
    p2["out_conv"] = dict(p1["out_conv"])
    p2["out_conv"]["cond_kernel"] = jnp.ones((cfg.cond_dim, cfg.image_channel)) * 0.5
    c = np.asarray(generator_apply(p2, noise, cond, cfg_cb))
    assert np.abs(c - b).max() > 0.01

    # the kernel trains: one step moves it off zero
    state = create_train_state(cfg_cb, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    mk = lambda: (
        jnp.asarray(rng.uniform(-1, 1, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)), jnp.float32),
        jnp.asarray(np.where(rng.random((cfg.batch_size, cfg.cond_dim)) < 0.5, 0.98, -0.94), jnp.float32),
    )
    # batch 21: NOT a partition step (21 % 5 != 0) -> all weights train
    out = make_train_step(cfg_cb, state.params, donate=False)(
        state, mk(), mk(), jax.random.PRNGKey(4), jnp.int32(21)
    )
    assert np.abs(np.asarray(out.state.params["out_conv"]["cond_kernel"])).max() > 0
