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
