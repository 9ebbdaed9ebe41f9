"""On-device data augmentation — runs INSIDE the jitted train step.

The reference augments real images on the hot path with TF image ops
(eager_trainer.py:127-131): random horizontal flip, brightness, contrast, hue
shift, plus additive gaussian noise. Here the whole chain is pure jnp and
fuses into the train step's XLA program (no host round-trip).

Parity notes:
- brightness/contrast/hue each draw ONE scalar per call (TF batch semantics);
  the flip is per-image (improvement over TF 1.x whole-batch flip; documented
  deviation).
- ``tf.image.random_hue(x, 0.03, -0.03)`` passes -0.03 as the SEED positional
  (SURVEY appendix quirk) — the actual behavior is delta ~ U(-0.03, 0.03),
  which is what we implement.
- noise: ``x + 0.1 * N(0, 0.2)`` i.e. additive sigma = 0.02
  (eager_trainer.py:131).
- images are in [-1,1] when hue-adjusted; the reference feeds that range
  straight into TF's adjust_hue kernel, which is CHROMA-based (hue from
  ``(v - m)``, reconstruction as ``chroma * ramp + m``) and therefore well
  defined on any value range — an HSV round trip via saturation ``s = c/v``
  is NOT (it breaks where ``max(r,g,b) <= 0``). ``adjust_hue`` mirrors the
  chroma kernel and is asserted equal to ``tf.image.adjust_hue`` on [-1,1],
  [0,1], and wider ranges in tests/test_tf_oracle.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adjust_hue(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Rotate hue by ``delta`` (in [0,1] turns) — exact tf.image.adjust_hue
    kernel math (chroma-based; defined for any value range, which matters
    because the reference feeds rescaled [-1,1] images, eager_trainer.py:130).

    Per pixel: v = max(r,g,b), m = min(r,g,b), c = v - m; hue from the
    standard piecewise formula on c; rotate modulo 1; reconstruct as
    ``c * ramp(h') + m`` (never divides by v, unlike an HSV round trip)."""
    xf = x.astype(jnp.float32)
    r, g, b = xf[..., 0], xf[..., 1], xf[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    m = jnp.minimum(jnp.minimum(r, g), b)
    c = v - m
    safe_c = jnp.where(c != 0, c, 1.0)
    norm = 1.0 / (6.0 * safe_c)
    h = jnp.where(
        v == r,
        norm * (g - b),
        jnp.where(v == g, norm * (b - r) + 2.0 / 6.0, norm * (r - g) + 4.0 / 6.0),
    )
    h = jnp.where(c == 0, 0.0, h)
    h = jnp.where(h < 0, h + 1.0, h)
    h = jnp.mod(h + delta, 1.0)
    dh = h * 6.0
    x1 = c * (1.0 - jnp.abs(jnp.mod(dh, 2.0) - 1.0))
    i = jnp.floor(dh).astype(jnp.int32) % 6
    zero = jnp.zeros_like(c)
    sel = lambda choices, default: jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4], choices, default
    )
    rr = sel([c, x1, zero, zero, x1], c)
    gg = sel([x1, c, c, x1, zero], zero)
    bb = sel([zero, zero, x1, c, c], x1)
    return jnp.stack([rr + m, gg + m, bb + m], axis=-1).astype(x.dtype)


def adjust_brightness(x: jnp.ndarray, delta) -> jnp.ndarray:
    """tf.image.adjust_brightness semantics: additive delta (not PIL's scale)."""
    return x + delta


def adjust_contrast(x: jnp.ndarray, factor) -> jnp.ndarray:
    """tf.image.adjust_contrast semantics: interpolate towards the per-image
    PER-CHANNEL mean over (H, W)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    return (x - mean) * factor + mean


def augment_s2d(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """:func:`augment` on a space-to-depth-layout batch [N, H/2, W/2, 4C]
    (ops/s2d.py) — IDENTICAL math and PRNG stream to the raw-layout version:
    the flip mask and scalar deltas are drawn with the same shapes, and the
    additive noise is drawn in RAW image shape then rearranged, so a raw
    pixel receives the same noise value in either layout (tested)."""
    from littlegan_tpu.ops.s2d import space_to_depth

    k_flip, k_bright, k_contrast, k_hue, k_noise = jax.random.split(rng, 5)
    n, h, w, c4 = x.shape
    c = c4 // 4
    dtype = x.dtype
    v = x.astype(jnp.float32).reshape(n, h, w, 2, 2, c)  # (N, hb, wb, pi, pj, c)

    # flip W in raw space = reverse column blocks AND swap column phases
    do_flip = jax.random.bernoulli(k_flip, 0.5, (n, 1, 1, 1)).reshape(n, 1, 1, 1, 1, 1)
    v = jnp.where(do_flip, v[:, :, ::-1, :, ::-1, :], v)

    delta_b = jax.random.uniform(k_bright, (), minval=-0.02, maxval=0.02)
    v = v + delta_b

    factor = jax.random.uniform(k_contrast, (), minval=0.75, maxval=1.003)
    mean = jnp.mean(v, axis=(1, 2, 3, 4), keepdims=True)  # per-image per-CHANNEL
    v = (v - mean) * factor + mean

    delta_h = jax.random.uniform(k_hue, (), minval=-0.03, maxval=0.03)
    v = adjust_hue(v, delta_h)  # HSV kernels operate on the trailing RGB axis

    noise = jax.random.normal(k_noise, (n, 2 * h, 2 * w, c))  # raw-shape stream
    out = v.reshape(n, h, w, c4) + 0.1 * (0.2 * space_to_depth(noise))
    return out.astype(dtype)


def augment(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Full reference augmentation chain (eager_trainer.py:127-131) on NHWC [-1,1]."""
    k_flip, k_bright, k_contrast, k_hue, k_noise = jax.random.split(rng, 5)
    n = x.shape[0]
    dtype = x.dtype
    x = x.astype(jnp.float32)

    # per-image random horizontal flip
    do_flip = jax.random.bernoulli(k_flip, 0.5, (n, 1, 1, 1))
    x = jnp.where(do_flip, x[:, :, ::-1, :], x)

    # brightness: one delta for the batch, delta ~ U(-0.02, 0.02)
    delta_b = jax.random.uniform(k_bright, (), minval=-0.02, maxval=0.02)
    x = adjust_brightness(x, delta_b)

    # contrast: factor ~ U(0.75, 1.003)
    factor = jax.random.uniform(k_contrast, (), minval=0.75, maxval=1.003)
    x = adjust_contrast(x, factor)

    # hue: delta ~ U(-0.03, 0.03) (the reference's buggy seed arg notwithstanding)
    delta_h = jax.random.uniform(k_hue, (), minval=-0.03, maxval=0.03)
    x = adjust_hue(x, delta_h)

    # additive gaussian noise, sigma = 0.1 * 0.2
    x = x + 0.1 * (0.2 * jax.random.normal(k_noise, x.shape))
    return x.astype(dtype)
