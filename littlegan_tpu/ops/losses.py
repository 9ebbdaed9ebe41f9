"""Loss functions — exact reference math (eager_trainer.py:85-102).

All BCE calls in the reference go through ``tf.keras.losses.binary_crossentropy``
with ``from_logits=False``: predictions are clipped to ``[eps, 1-eps]``
(eps=1e-7) and the pointwise BCE is averaged over the LAST axis, then
``reduce_mean`` over the batch. Targets may be *negative* (softened -1 labels,
SURVEY appendix quirk) — the formula is applied as-is, exactly like Keras.

Loss structure (reference: eager_trainer.py:85-102):
  D: 2*BCE(real_cond, real_c) + BCE(soft(1), real_pr) + BCE(soft(0), fake_pr)
  G: BCE(soft(1), fake_pr) + BCE(cond, fake_c) + l1_lambda * L1(real_img2, fake)
  A: same shape as G against the adjusted image.
"""

from __future__ import annotations

import jax.numpy as jnp

from littlegan_tpu.utils.image import soft

_EPS = 1e-7  # keras backend.epsilon()


def binary_crossentropy(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Keras-compatible probability-space BCE, mean over the last axis."""
    p = jnp.clip(y_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
    t = y_true.astype(jnp.float32)
    per_elem = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    return jnp.mean(per_elem, axis=-1)


def mean_squared_error(y_true, y_pred) -> jnp.ndarray:
    """Keras-compatible MSE, mean over the last axis (used by predict stats)."""
    diff = y_pred.astype(jnp.float32) - jnp.asarray(y_true, jnp.float32)
    return jnp.mean(jnp.square(diff), axis=-1)


def _bce_mean(y_true, y_pred) -> jnp.ndarray:
    return jnp.mean(binary_crossentropy(y_true, y_pred))


def discriminator_loss(real_true_c, real_pred_c, real_pred_pr, fake_pred_pr) -> jnp.ndarray:
    """Reference: eager_trainer.py:85-91 (condition term weighted 2x)."""
    ones = jnp.full_like(real_pred_pr, soft(1.0))
    zeros = jnp.full_like(fake_pred_pr, soft(0.0))
    return (
        2.0 * _bce_mean(real_true_c, real_pred_c)
        + _bce_mean(ones, real_pred_pr)
        + _bce_mean(zeros, fake_pred_pr)
    )


def generator_loss(cond_ori, cond_disc, pr_disc, image_ori, image_gen, l1_lambda: float) -> jnp.ndarray:
    """Reference: eager_trainer.py:93-96. L1 target is real_image_2 (the batch
    whose conds G consumed), not the augmented D input — quirk preserved."""
    ones = jnp.full_like(pr_disc, soft(1.0))
    l1 = jnp.mean(jnp.abs(image_ori.astype(jnp.float32) - image_gen.astype(jnp.float32)))
    return _bce_mean(ones, pr_disc) + _bce_mean(cond_ori, cond_disc) + l1_lambda * l1


def adjuster_loss(cond_ori, cond_disc, pr_disc, image_ori, image_adj, l1_lambda: float) -> jnp.ndarray:
    """Reference: eager_trainer.py:98-102 — identical structure to G's loss."""
    return generator_loss(cond_ori, cond_disc, pr_disc, image_ori, image_adj, l1_lambda)
