"""Train state: one shared param pytree + three Adam states.

Replaces the reference's object graph (3 Keras models + 3 v1 Adam optimizers
wrapped in a tf.train.Checkpoint, eager_trainer.py:28-35) with a flat,
checkpointable NamedTuple of pytrees. The three optimizers own DISJOINT
subtrees of the shared params:

    opt_d: encoder + d_head          (D trains the shared encoder)
    opt_g: g_head + decoder + out_conv  (G trains the shared decoder/out conv)
    opt_a: adj_head                  (reference trains ONLY weights[16:20],
                                      eager_trainer.py:59-63)

Optimizer hyper-params follow eager_trainer.py:28-30: G and D Adam use
(lr, beta_1=0.5, beta_2=0.9); the Adjuster's Adam uses default betas
(0.9, 0.999).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from littlegan_tpu.config import Config
from littlegan_tpu.models import (
    ADJUSTER_TRAINABLE,
    DISCRIMINATOR_SUBTREES,
    GENERATOR_SUBTREES,
    init_params,
)
from littlegan_tpu.training.optimizer import AdamState, adam_init

# Single source of truth for optimizer ownership: the models' subtree
# constants (models/littlegan.py) — do not redefine the groups here.
G_KEYS = GENERATOR_SUBTREES
D_KEYS = DISCRIMINATOR_SUBTREES
A_KEYS = ADJUSTER_TRAINABLE


class TrainState(NamedTuple):
    params: Any
    opt_g: AdamState
    opt_d: AdamState
    opt_a: AdamState
    # EMA copy of the generator subtrees (g_head/decoder/out_conv), present
    # only when Config.ema_decay > 0 (OPT-IN, beyond the reference — the
    # standard GAN practice of evaluating/exporting an exponential moving
    # average of G's weights). None keeps the historical pytree structure,
    # so parity configs and their checkpoints are byte-identical.
    ema: Any = None


def subtree(params, keys):
    return {k: params[k] for k in keys}


def create_train_state(cfg: Config, rng: jax.Array) -> TrainState:
    if not 0.0 <= cfg.ema_decay < 1.0:
        raise ValueError(
            f"ema_decay must be in [0, 1), got {cfg.ema_decay}: 1.0 freezes "
            "the EMA at the random init (every eval/export would silently "
            "emit untrained weights) and >1 diverges"
        )
    if cfg.moment_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"moment_dtype must be 'float32' or 'bfloat16', got "
            f"{cfg.moment_dtype!r} (Adam math is always f32; this only "
            "picks the mu/nu STORAGE dtype)"
        )
    params = init_params(cfg, rng)
    mdt = jnp.dtype(cfg.moment_dtype)
    return TrainState(
        params=params,
        opt_g=adam_init(subtree(params, G_KEYS), dtype=mdt),
        opt_d=adam_init(subtree(params, D_KEYS), dtype=mdt),
        opt_a=adam_init(subtree(params, A_KEYS), dtype=mdt),
        # EMA starts as a COPY of the init weights (no bias correction —
        # the standard copy-at-init form). jnp.copy, not aliasing: aliased
        # Arrays appear twice in a donated TrainState and XLA rejects
        # donating the same buffer twice (verified on this jax version).
        ema=(
            jax.tree_util.tree_map(jnp.copy, subtree(params, G_KEYS))
            if cfg.ema_decay > 0
            else None
        ),
    )


def eval_params(state: TrainState):
    """Params for inference/export: the EMA generator subtrees when EMA is
    enabled, live params otherwise. The adjuster automatically shares the
    EMA decoder/out_conv (they are G's subtrees); encoder/d_head/adj_head
    stay live (EMA-ing D serves no purpose — StyleGAN-style G-only EMA)."""
    if state.ema is None:
        return state.params
    return {**state.params, **state.ema}
