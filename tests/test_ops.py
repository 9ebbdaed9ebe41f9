"""Op-level tests: instance norm math, conv/deconv TF-parity, losses, augment."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.core  # sub-5-min gate tier (round-4 verdict #4)

from littlegan_tpu.ops.augment import adjust_hue, augment
from littlegan_tpu.ops.conv import conv2d, deconv2d, dense
from littlegan_tpu.ops.losses import (
    adjuster_loss,
    binary_crossentropy,
    discriminator_loss,
    generator_loss,
    mean_squared_error,
)
from littlegan_tpu.ops.norm import instance_norm


# ----------------------------------------------------------- instance norm --


def test_instance_norm_matches_reference_formula(np_rng):
    # reference instance.py:105-116: axis=None, population std, eps on STD
    x = np_rng.normal(size=(3, 5, 5, 4)).astype(np.float32)
    gamma = np.array([1.7], np.float32)
    beta = np.array([-0.3], np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))

    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    std = x.std(axis=(1, 2, 3), keepdims=True) + 1e-3  # population std + eps
    want = (x - mean) / std * gamma + beta
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_instance_norm_scalar_params_reshape_invariant(np_rng):
    x = np_rng.normal(size=(2, 16)).astype(np.float32)
    g = np.ones((1,), np.float32)
    b = np.zeros((1,), np.float32)
    a = instance_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    c = instance_norm(jnp.asarray(x.reshape(2, 4, 4, 1)), jnp.asarray(g), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(a).ravel(), np.asarray(c).ravel(), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------- conv/deconv --


def test_conv2d_same_shape(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    k = jnp.asarray(np_rng.normal(size=(5, 5, 3, 8)).astype(np.float32))
    y = conv2d(x, k, stride=2)
    assert y.shape == (2, 8, 8, 8)


def test_deconv2d_is_exact_transpose_of_conv(np_rng):
    """TF defines conv2d_transpose as the gradient of SAME conv (SURVEY hard
    part (d)); assert our deconv == vjp of our conv for stride 2, k=5."""
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    k = jnp.asarray(np_rng.normal(size=(5, 5, 4, 6)).astype(np.float32))  # (h,w,out,in)

    got = deconv2d(x, k, stride=2)
    assert got.shape == (2, 16, 16, 4)

    # the forward conv being transposed maps 4ch -> 6ch; its HWIO kernel is
    # exactly the TF transpose layout (h,w,outT=4,inT=6) reinterpreted as
    # (h,w,I=4,O=6) — no axis swap
    fwd_kernel = k
    primal = jnp.zeros((2, 16, 16, 4), jnp.float32)
    _, vjp = jax.vjp(lambda img: conv2d(img, fwd_kernel, stride=2), primal)
    (want,) = vjp(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_deconv2d_stride1_shape(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    k = jnp.asarray(np_rng.normal(size=(5, 5, 3, 4)).astype(np.float32))
    y = deconv2d(x, k, stride=1)
    assert y.shape == (2, 16, 16, 3)


def test_dense_bias(np_rng):
    x = jnp.asarray(np_rng.normal(size=(3, 7)).astype(np.float32))
    k = jnp.asarray(np_rng.normal(size=(7, 5)).astype(np.float32))
    b = jnp.asarray(np_rng.normal(size=(5,)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(dense(x, k, b)), np.asarray(x) @ np.asarray(k) + np.asarray(b), rtol=1e-5)


# ------------------------------------------------------------------ losses --


def _np_bce(t, p):
    p = np.clip(p, 1e-7, 1 - 1e-7)
    return np.mean(-(t * np.log(p) + (1 - t) * np.log(1 - p)), axis=-1)


def test_bce_matches_keras_formula(np_rng):
    t = np_rng.uniform(-1, 1, (4, 7)).astype(np.float32)  # negative targets allowed (quirk)
    p = np_rng.uniform(0.01, 0.99, (4, 7)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(binary_crossentropy(t, p)), _np_bce(t, p), rtol=1e-5)


def test_bce_clips_extreme_predictions():
    out = binary_crossentropy(jnp.ones((1, 1)), jnp.zeros((1, 1)))
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_loss_value(np_rng):
    rc = np_rng.uniform(-1, 1, (4, 7)).astype(np.float32)
    pc = np_rng.uniform(0.01, 0.99, (4, 7)).astype(np.float32)
    rpr = np_rng.uniform(0.01, 0.99, (4, 1)).astype(np.float32)
    fpr = np_rng.uniform(0.01, 0.99, (4, 1)).astype(np.float32)
    got = float(discriminator_loss(rc, pc, rpr, fpr))
    want = (
        2 * _np_bce(rc, pc).mean()
        + _np_bce(np.full_like(rpr, 0.98), rpr).mean()
        + _np_bce(np.full_like(fpr, 0.02), fpr).mean()
    )
    assert abs(got - want) < 1e-5


def test_generator_and_adjuster_loss_value(np_rng):
    c = np_rng.uniform(-1, 1, (4, 7)).astype(np.float32)
    cd = np_rng.uniform(0.01, 0.99, (4, 7)).astype(np.float32)
    pr = np_rng.uniform(0.01, 0.99, (4, 1)).astype(np.float32)
    a = np_rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    b = np_rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    got = float(generator_loss(c, cd, pr, a, b, l1_lambda=0.02))
    want = (
        _np_bce(np.full_like(pr, 0.98), pr).mean()
        + _np_bce(c, cd).mean()
        + 0.02 * np.abs(a - b).mean()
    )
    assert abs(got - want) < 1e-5
    assert float(adjuster_loss(c, cd, pr, a, b, 0.02)) == pytest.approx(got)


def test_mse_last_axis(np_rng):
    t = np_rng.normal(size=(4, 7)).astype(np.float32)
    p = np_rng.normal(size=(4, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mean_squared_error(t, p)), ((t - p) ** 2).mean(-1), rtol=1e-5
    )


# ----------------------------------------------------------------- augment --


def test_adjust_hue_identity(np_rng):
    x = np_rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
    y = np.asarray(adjust_hue(jnp.asarray(x), jnp.asarray(0.0)))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_adjust_hue_full_turn(np_rng):
    x = np_rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
    y = np.asarray(adjust_hue(jnp.asarray(x), jnp.asarray(1.0)))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_augment_shape_dtype_and_determinism(rng, np_rng):
    x = jnp.asarray(np_rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32))
    a = augment(rng, x)
    b = augment(rng, x)
    assert a.shape == x.shape and a.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key -> same aug
    c = augment(jax.random.PRNGKey(1), x)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4  # different key -> different


def test_augment_statistical_properties(np_rng):
    """Statistical checks of the augmentation chain parameters
    (eager_trainer.py:127-131): per-image flips ~50%, bounded brightness /
    contrast / noise magnitudes across many draws."""
    import jax

    from littlegan_tpu.ops.augment import augment

    # asymmetric image so flips are detectable
    base = np.zeros((16, 8, 8, 3), np.float32)
    base[:, :, :4, :] = 0.5
    x = jnp.asarray(base)

    flipped_frac = []
    deltas = []
    for s in range(30):
        out = np.asarray(augment(jax.random.PRNGKey(s), x))
        # flip detection: column mass moves to the right half
        left = out[:, :, :4, :].mean(axis=(1, 2, 3))
        right = out[:, :, 4:, :].mean(axis=(1, 2, 3))
        flipped_frac.append(float((right > left).mean()))
        deltas.append(out.mean() - base.mean())
    assert 0.25 < np.mean(flipped_frac) < 0.75  # ~Bernoulli(0.5) per image
    # brightness (|U(-.02,.02)|) + noise (mean ~0) keep the global mean close
    assert np.abs(np.mean(deltas)) < 0.02
    assert np.max(np.abs(deltas)) < 0.1


def test_adjust_hue_rotation_matches_colorsys():
    """Golden check of the FULL adjust_hue (rotation + wraparound) against
    stdlib colorsys on a fixed image in [0,1] (round-1 verdict #7)."""
    import colorsys

    rng = np.random.default_rng(17)
    rgb = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
    for delta in (0.03, -0.03, 0.5, -0.4):
        got = np.asarray(adjust_hue(jnp.asarray(rgb[None]), jnp.asarray(delta)))[0]
        want = np.empty_like(rgb)
        for i in range(4):
            for j in range(4):
                h, s, v = colorsys.rgb_to_hsv(*rgb[i, j])
                want[i, j] = colorsys.hsv_to_rgb((h + delta) % 1.0, s, v)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(delta))


def test_adjust_hue_pm1_matches_scalar_reference():
    """[-1,1]-range hue math (what the reference feeds TF's kernel,
    eager_trainer.py:130) vs an independent scalar port of TF's CHROMA-based
    adjust_hue kernel: pins channel order, the c-based (not s=c/v) hue math
    that keeps negative pixels well-defined, and wraparound. The same
    behavior is asserted against tf.image.adjust_hue itself in
    tests/test_tf_oracle.py; this scalar twin runs without tensorflow."""
    rng = np.random.default_rng(23)
    img = rng.uniform(-1, 1, (4, 4, 3)).astype(np.float32)

    def tf_adjust_hue_scalar(p, delta):
        r, g, b = float(p[0]), float(p[1]), float(p[2])
        v, m = max(r, g, b), min(r, g, b)
        c = v - m
        if c == 0.0:
            h = 0.0
        elif v == r:
            h = ((g - b) / (6.0 * c)) % 1.0
        elif v == g:
            h = (b - r) / (6.0 * c) + 2.0 / 6.0
        else:
            h = (r - g) / (6.0 * c) + 4.0 / 6.0
        h = (h + delta) % 1.0
        dh = h * 6.0
        i = int(np.floor(dh)) % 6
        x1 = c * (1.0 - abs(dh % 2.0 - 1.0))
        return [
            (c, x1, 0.0, 0.0, x1, c)[i] + m,
            (x1, c, c, x1, 0.0, 0.0)[i] + m,
            (0.0, 0.0, x1, c, c, x1)[i] + m,
        ]

    for delta in (0.03, -0.03):
        got = np.asarray(adjust_hue(jnp.asarray(img[None]), jnp.asarray(delta)))[0]
        want = np.array(
            [[tf_adjust_hue_scalar(img[i, j], delta) for j in range(4)] for i in range(4)],
            np.float32,
        )
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(delta))


def test_brightness_contrast_golden():
    """adjust_brightness is additive (TF, not PIL's multiplicative);
    adjust_contrast interpolates toward the per-image per-CHANNEL mean."""
    from littlegan_tpu.ops.augment import adjust_brightness, adjust_contrast

    rng = np.random.default_rng(29)
    for lo, hi in ((-1.0, 1.0), (0.0, 1.0)):
        x = rng.uniform(lo, hi, (2, 4, 4, 3)).astype(np.float32)
        got_b = np.asarray(adjust_brightness(jnp.asarray(x), 0.25))
        np.testing.assert_allclose(got_b, x + 0.25, atol=1e-6)

        got_c = np.asarray(adjust_contrast(jnp.asarray(x), 0.75))
        mean = x.mean(axis=(1, 2), keepdims=True)  # (2,1,1,3): per-channel
        np.testing.assert_allclose(got_c, (x - mean) * 0.75 + mean, atol=1e-6)


def test_instance_norm_one_pass_matches_two_pass(np_rng):
    """Default one-pass stats (fused conv-epilogue form) vs the literal Keras
    two-pass evaluation: identical to f32 rounding."""
    x = np_rng.normal(size=(3, 8, 8, 6)).astype(np.float32) * 3 + 1.5
    g = np.array([1.3], np.float32)
    b = np.array([0.2], np.float32)
    a = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
    c = np.asarray(instance_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), two_pass=True))
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)
