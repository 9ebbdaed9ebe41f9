"""Pallas fused norm+LeakyReLU kernel: forward + gradient parity vs the jnp
reference path (runs in interpret mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlegan_tpu.ops.conv import leaky_relu
from littlegan_tpu.ops.norm import instance_norm
from littlegan_tpu.ops.pallas.norm_lrelu import fused_instance_norm_lrelu, supports


def _ref(x, g, b, alpha=0.3):
    return leaky_relu(instance_norm(x, g, b), alpha)


@pytest.mark.parametrize("shape", [(2, 4, 4, 8), (3, 8, 8, 3)])
def test_fused_forward_matches_reference(np_rng, shape):
    x = jnp.asarray(np_rng.normal(size=shape).astype(np.float32))
    g = jnp.asarray([1.3], jnp.float32)
    b = jnp.asarray([-0.2], jnp.float32)
    got = fused_instance_norm_lrelu(x, g, b, 0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, g, b)), rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_reference(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    g = jnp.asarray([0.9], jnp.float32)
    b = jnp.asarray([0.1], jnp.float32)

    def loss_fused(x, g, b):
        return jnp.sum(fused_instance_norm_lrelu(x, g, b, 0.3) ** 2)

    def loss_ref(x, g, b):
        return jnp.sum(_ref(x, g, b) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for gg, ww, name in zip(got, want, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(ww), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_fused_bf16_io(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 4, 4, 8)).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray([1.0], jnp.float32)
    b = jnp.asarray([0.0], jnp.float32)
    out = fused_instance_norm_lrelu(x, g, b, 0.3)
    assert out.dtype == jnp.bfloat16
    ref = _ref(x, g, b)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_supports_budget():
    assert supports((8, 128, 128, 32), jnp.bfloat16)
    assert not supports((1, 1024, 1024, 64), jnp.float32)
    assert not supports((8, 128), jnp.float32)


def test_model_with_pallas_matches_without(tiny_cfg, rng):
    """Full generator/discriminator forward: pallas path == jnp path."""
    from littlegan_tpu.models import discriminator_apply, generator_apply, init_params

    cfg_on = tiny_cfg.replace(use_pallas=True)
    cfg_off = tiny_cfg.replace(use_pallas=False)
    p = init_params(cfg_off, rng)
    noise = jax.random.normal(rng, (2, cfg_off.noise_dim))
    cond = jnp.zeros((2, cfg_off.cond_dim))
    img_on = generator_apply(p, noise, cond, cfg_on)
    img_off = generator_apply(p, noise, cond, cfg_off)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off), rtol=1e-4, atol=1e-5)

    image = jax.random.normal(rng, (2, 16, 16, 3))
    pr_on, c_on = discriminator_apply(p, image, cfg_on)
    pr_off, c_off = discriminator_apply(p, image, cfg_off)
    np.testing.assert_allclose(np.asarray(pr_on), np.asarray(pr_off), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_on), np.asarray(c_off), rtol=1e-4, atol=1e-5)


# -------------------------------------------------- boundary conv kernel ----
# Round-3 time-boxed Mosaic attempt (round-2 verdict #2): the im2col GEMM
# kernel for the narrow-channel s2d boundary conv. Measured SLOWER than
# XLA's in-step fusion on v5e (see the kernel docstring for the full
# record); ships opt-in. These tests pin its math either way.


def test_boundary_conv_matches_xla():
    """Kernel fwd (interpret mode) == lax conv + bias, stats == f32 sums."""
    import jax.numpy as jnp

    from littlegan_tpu.ops.pallas.boundary_conv import _xla_conv3x3, boundary_conv_s2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 16, 16, 12)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 12, 24)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(24,)) * 0.1, jnp.float32)
    y, s1, s2 = boundary_conv_s2d(x, w, b, True)
    want = _xla_conv3x3(x, w) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(want.sum((1, 2, 3))), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray((want * want).sum((1, 2, 3))), rtol=1e-4
    )


def test_boundary_conv_grads_match_xla():
    """custom_vjp grads == autodiff of the plain conv+stats composition."""
    import jax
    import jax.numpy as jnp

    from littlegan_tpu.ops.pallas.boundary_conv import _xla_conv3x3, boundary_conv_s2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 12)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 12, 16)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)) * 0.1, jnp.float32)
    gout = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)

    def f_pal(x, w, b):
        y, s1, s2 = boundary_conv_s2d(x, w, b, True)
        return jnp.sum(y * gout) + jnp.sum(s1 * 0.7) + jnp.sum(s2 * 0.01)

    def f_ref(x, w, b):
        y = _xla_conv3x3(x, w) + b
        return (
            jnp.sum(y * gout)
            + jnp.sum(y.sum((1, 2, 3)) * 0.7)
            + jnp.sum((y * y).sum((1, 2, 3)) * 0.01)
        )

    for i in range(3):
        gp = jax.grad(f_pal, argnums=i)(x, w, b)
        gr = jax.grad(f_ref, argnums=i)(x, w, b)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-5)


def test_boundary_conv_integrated_encoder_path(tiny_cfg):
    """use_pallas_boundary through the real encoder (s2d block1): forward
    feature maps and full-model grads match the XLA path."""
    import jax
    import jax.numpy as jnp

    from littlegan_tpu.models import init_params
    from littlegan_tpu.models.littlegan import discriminator_apply, encoder_apply

    cfg = tiny_cfg.replace(image_dim=32, init_dim=2, conv_filter=[48, 32, 24, 16, 8], use_s2d=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4, 32, 32, 3)), jnp.float32)

    ref = encoder_apply(params["encoder"], x, cfg)
    pal = encoder_apply(params["encoder"], x, cfg.replace(use_pallas_boundary=True))
    for a, b in zip(ref, pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def loss(p, c):
        pr, cond = discriminator_apply(p, x, c)
        return jnp.sum(pr) + jnp.sum(cond)

    g_ref = jax.grad(loss)(params, cfg)
    g_pal = jax.grad(loss)(params, cfg.replace(use_pallas_boundary=True))
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref), jax.tree_util.tree_leaves_with_path(g_pal)
    ):
        key = "/".join(str(getattr(q, "key", q)) for q in path)
        # absolute tolerance floors the near-zero scalar-gamma grads
        # (catastrophic cancellation at init makes their relative noise big)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5, err_msg=key
        )


def test_instance_norm_from_stats_matches_instance_norm():
    import jax.numpy as jnp

    from littlegan_tpu.ops.norm import instance_norm, instance_norm_from_stats

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 16)), jnp.float32)
    g = jnp.asarray([1.3], jnp.float32)
    b = jnp.asarray([-0.2], jnp.float32)
    s1 = x.sum(axis=(1, 2, 3))
    s2 = (x * x).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(
        np.asarray(instance_norm_from_stats(x, s1, s2, g, b)),
        np.asarray(instance_norm(x, g, b)),
        rtol=1e-5, atol=1e-6,
    )


def test_boundary_conv_grads_under_bf16_compute(tiny_cfg):
    """Under the DEFAULT bfloat16 compute dtype the kernel receives a bf16
    input/weight but a FLOAT32 bias — the custom-vjp bias cotangent must
    match the bias primal's dtype (it used to return bf16 and crash
    jax.grad's aval check). Full fused step through the kernel."""
    import jax.numpy as jnp

    from littlegan_tpu.data.synthetic import random_device_batch
    from littlegan_tpu.training import create_train_state
    from littlegan_tpu.training.step import make_train_step

    cfg = tiny_cfg.replace(
        compute_dtype="bfloat16", use_s2d=True, use_pallas_boundary=True,
        donate_state=False,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=False)
    b1 = random_device_batch(cfg, jax.random.PRNGKey(1))
    b2 = random_device_batch(cfg, jax.random.PRNGKey(2))
    out = step(state, b1, b2, jax.random.PRNGKey(3), jnp.int32(11))
    assert np.isfinite(float(out.metrics["loss/gen"]))
