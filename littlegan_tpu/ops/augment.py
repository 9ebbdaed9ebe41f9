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
- images are in [-1,1] when hue-adjusted; the reference feeds that range into
  TF's HSV kernels unperturbed, so we reproduce the same max/min-based HSV
  math on the raw range.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """TF-kernel-equivalent RGB->HSV on NHWC (any value range, like TF)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    m = jnp.minimum(jnp.minimum(r, g), b)
    rng = v - m
    safe_v = jnp.where(v != 0, v, 1.0)
    s = jnp.where(v > 0, rng / safe_v, 0.0)
    safe_rng = jnp.where(rng != 0, rng, 1.0)
    norm = 1.0 / (6.0 * safe_rng)
    h = jnp.where(
        v == r,
        norm * (g - b),
        jnp.where(v == g, norm * (b - r) + 2.0 / 6.0, norm * (r - g) + 4.0 / 6.0),
    )
    h = jnp.where(rng == 0, 0.0, h)
    h = jnp.where(h < 0, h + 1.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    dh = h * 6.0
    i = jnp.floor(dh)
    f = dh - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Rotate hue by ``delta`` (in [0,1] turns), like tf.image.adjust_hue."""
    hsv = _rgb_to_hsv(x.astype(jnp.float32))
    h = jnp.mod(hsv[..., 0] + delta, 1.0)
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1)).astype(x.dtype)


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
