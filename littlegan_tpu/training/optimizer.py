"""Masked Adam — TF-v1-Adam semantics with per-leaf update masks.

The reference runs three independent ``tf.compat.v1.train.AdamOptimizer``s
(eager_trainer.py:28-30) and, under the partition schedule
(eager_trainer.py:104-113), applies each step's update to only a subset of a
model's weights; the *unselected* weights keep their Adam slots untouched.

Here that is a single pure update function taking a per-leaf 0/1 mask:
- masked leaves: moments, per-leaf step count, and params are all untouched,
- unmasked leaves: standard Adam with TF-v1 bias correction
  ``lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)`` and epsilon OUTSIDE the sqrt
  (``var -= lr_t * m / (sqrt(v) + eps)``), eps = 1e-8 — the exact v1 update.

The mask is a traced scalar per leaf, so the whole partition schedule
(reference: eager_trainer.py:48-52,104-113) compiles into one XLA program
with no retracing across batches.

Deviation from v1 (documented, opt-out): v1 Adam shares one global beta-power
pair across all slots of an optimizer instance and ticks it on every apply;
under partitioned training that couples bias correction across weight groups.
Default here is a per-leaf count — self-consistent and correct per-leaf Adam.
``tick_all=True`` (Config.adam_tf_parity) restores the exact v1 schedule:
the count advances every call even for masked-off leaves, so rotated groups
see the same lr_t sequence as the reference (verified against a NumPy v1-Adam
simulation in tests/test_train_step.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


def lr_scale_fn(
    kind: str, warmup_steps: int = 0, decay_steps: int = 0, min_ratio: float = 0.0
):
    """Schedule factory for ``masked_adam_update(..., lr_scale=...)``.

    Returns ``None`` when the schedule is the constant-1 identity (so the
    default config path stays BIT-IDENTICAL to the historical update — the
    golden-trajectory tests pin this), else a pure ``t -> scale`` over the
    float32 apply count ``t >= 1``:

    - linear warmup ``min(t / warmup_steps, 1)`` first (any kind), then
    - over ``decay_steps`` applies after warmup, progress p in [0, 1]:
      linear ``1 - (1-r) p``; cosine ``r + (1-r)(1 + cos(pi p))/2``;
      exponential ``r ** p`` (geometric to the floor, needs r > 0);
      all hold the floor ``r = min_ratio`` after the horizon.

    Beyond the reference (constant lr, eager_trainer.py:28-30); evaluated
    per-leaf from AdamState.count, so partitioned groups advance their own
    schedule exactly as they advance their own bias correction.
    """
    kinds = ("constant", "linear", "cosine", "exponential")
    if kind not in kinds:
        raise ValueError(f"lr_schedule must be one of {kinds}, got {kind!r}")
    decaying = kind != "constant" and decay_steps > 0
    if kind != "constant" and decay_steps <= 0 and warmup_steps <= 0:
        raise ValueError(
            f"lr_schedule={kind!r} does nothing without lr_decay_steps or "
            "lr_warmup_steps — set a horizon or use 'constant'"
        )
    if kind == "exponential" and decaying and min_ratio <= 0.0:
        raise ValueError("exponential lr_schedule needs lr_min_ratio > 0 (its decay floor)")
    if not 0.0 <= min_ratio <= 1.0:
        raise ValueError(f"lr_min_ratio must be in [0, 1], got {min_ratio}")
    if kind == "constant" and warmup_steps <= 0:
        return None  # identity: callers skip the multiply entirely

    def fn(t):
        t = t.astype(jnp.float32) if hasattr(t, "astype") else jnp.float32(t)
        scale = jnp.minimum(t / warmup_steps, 1.0) if warmup_steps > 0 else jnp.float32(1.0)
        if decaying:
            p = jnp.clip((t - warmup_steps) / decay_steps, 0.0, 1.0)
            if kind == "linear":
                base = 1.0 - (1.0 - min_ratio) * p
            elif kind == "cosine":
                base = min_ratio + (1.0 - min_ratio) * 0.5 * (1.0 + jnp.cos(jnp.pi * p))
            else:  # exponential
                base = jnp.float32(min_ratio) ** p
            scale = scale * base
        return scale

    return fn


def lr_scale_from_config(cfg) -> "callable | None":
    """The trainer/step entry: Config fields -> schedule fn (or None)."""
    return lr_scale_fn(
        cfg.lr_schedule, cfg.lr_warmup_steps, cfg.lr_decay_steps, cfg.lr_min_ratio
    )


class AdamState(NamedTuple):
    count: Any  # per-leaf int32 step counts
    mu: Any  # first moments
    nu: Any  # second moments


def adam_init(params, dtype=jnp.float32) -> AdamState:
    """``dtype`` (Config.moment_dtype): storage dtype of mu/nu. bfloat16
    halves optimizer-state HBM (the dominant train-state cost at 512²+,
    docs/SCALING.md); the update math always runs in f32 — moments are
    upcast on load and rounded back on store (masked_adam_update)."""
    zeros_like = lambda t: jax.tree_util.tree_map(lambda x: jnp.zeros_like(x, dtype=dtype), t)
    counts = jax.tree_util.tree_map(lambda x: jnp.zeros((), jnp.int32), params)
    return AdamState(count=counts, mu=zeros_like(params), nu=zeros_like(params))


def masked_adam_update(
    grads,
    state: AdamState,
    params,
    mask,
    lr: float,
    b1: float,
    b2: float,
    eps: float = 1e-8,
    tick_all: bool = False,
    lr_scale=None,
):
    """One masked Adam step. ``mask`` is a tree of scalar 0./1. per leaf
    (may be traced). ``tick_all`` advances the bias-correction count on every
    call (TF-v1 shared-beta-power parity); default counts per-leaf updates.
    ``lr_scale`` (from ``lr_scale_fn``) multiplies lr by a schedule of the
    apply count; None keeps the exact historical constant-lr update.
    Returns (new_params, new_state)."""

    def upd(g, c, m, v, p, msk):
        g = g.astype(jnp.float32)
        # moment storage may be bfloat16 (Config.moment_dtype); the update
        # math always runs in f32 — upcast on load, round back on store.
        # f32 storage keeps the historical update BIT-identical (astype
        # no-ops), which the golden-trajectory tests pin.
        mdt = m.dtype
        m, v = m.astype(jnp.float32), v.astype(jnp.float32)
        # select with where, NOT multiplicative blending: a non-finite
        # gradient on a masked-off leaf must leave moments/params untouched
        # (0 * inf = NaN would poison exactly the weights the reference's
        # partition schedule never computes gradients for)
        on = jnp.asarray(msk, jnp.float32) > 0.5
        c_new = c + 1 if tick_all else c + on.astype(jnp.int32)
        m_new = jnp.where(on, b1 * m + (1.0 - b1) * g, m)
        v_new = jnp.where(on, b2 * v + (1.0 - b2) * jnp.square(g), v)
        t = jnp.maximum(c_new, 1).astype(jnp.float32)  # safe when mask==0
        lr_t = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        if lr_scale is not None:  # masked-off leaves never apply the step
            lr_t = lr_t * lr_scale(t)
        step = lr_t * m_new / (jnp.sqrt(v_new) + eps)
        p_new = jnp.where(on, p - step.astype(p.dtype), p)
        return p_new, c_new, m_new.astype(mdt), v_new.astype(mdt)

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_c = treedef.flatten_up_to(state.count)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_msk = treedef.flatten_up_to(mask)

    out = [upd(g, c, m, v, p, k) for g, c, m, v, p, k in zip(flat_g, flat_c, flat_m, flat_v, flat_p, flat_msk)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_c = treedef.unflatten([o[1] for o in out])
    new_m = treedef.unflatten([o[2] for o in out])
    new_v = treedef.unflatten([o[3] for o in out])
    return new_p, AdamState(count=new_c, mu=new_m, nu=new_v)
