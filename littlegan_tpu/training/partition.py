"""Partitioned-training schedule over NAMED parameter subtrees.

The reference rotates training over hardcoded *weight-index* groups
(eager_trainer.py:48-52):

    Generator:      [0,4)  [4,8)   [8,22)
    Discriminator:  [0,12) [12,16) [16,20)
    Adjuster:       [16,20)  (always — only its private dense+norm)

Mapped onto Keras weight ordering those index ranges are exactly:

    G: [g_head] · [decoder.block1] · [decoder.block2-4 + out_conv]
    D: [encoder.block1-3] · [encoder.block4] · [d_head]
    A: [adj_head]  (the shared encoder/decoder/out_conv are trained
       exclusively by the D/G steps — eager_trainer.py:59-63)

We express the groups by subtree NAME (no ordering fragility, SURVEY §7) and
stack them into a per-leaf ``(n_groups,)`` 0/1 array so the group choice is a
traced gather inside the jitted step — no retracing per batch.

Schedule (reference: eager_trainer.py:104-113): on batches where
``use_partition and batch_no % (interval+1) == 0`` train only group
``(batch_no // (interval+1)) % n_groups``; otherwise train all weights.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


# group definitions: lists of path prefixes, rooted at the model's sub-dict
_G_GROUPS = [
    [["g_head"]],
    [["decoder", "block1"]],
    [["decoder", "block2"], ["decoder", "block3"], ["decoder", "block4"], ["out_conv"]],
]
_D_GROUPS = [
    [["encoder", "block1"], ["encoder", "block2"], ["encoder", "block3"]],
    [["encoder", "block4"]],
    [["d_head"]],
]
_A_GROUPS = [[["adj_head"]]]


def build_partition_masks(params) -> Dict[str, object]:
    """Stacked (n_groups,)-per-leaf masks for each model's trainable subtree."""
    from littlegan_tpu.models import (
        ADJUSTER_TRAINABLE,
        DISCRIMINATOR_SUBTREES,
        GENERATOR_SUBTREES,
    )

    g_sub = {k: params[k] for k in GENERATOR_SUBTREES}
    d_sub = {k: params[k] for k in DISCRIMINATOR_SUBTREES}
    a_sub = {k: params[k] for k in ADJUSTER_TRAINABLE}

    from littlegan_tpu.utils.tree import path_str

    def build(sub, groups):
        def leaf_row(path, _leaf):
            joined = path_str(path)
            row = [
                1.0 if any(joined.startswith("/".join(g)) for g in grp) else 0.0
                for grp in groups
            ]
            return jnp.asarray(row, jnp.float32)

        return jax.tree_util.tree_map_with_path(leaf_row, sub)

    return {
        "generator": build(g_sub, _G_GROUPS),
        "discriminator": build(d_sub, _D_GROUPS),
        "adjuster": build(a_sub, _A_GROUPS),
    }


def resolve_mask(stacked, batch_no, use_partition: bool, interval: int):
    """Per-leaf scalar mask for this batch (traced ``batch_no``).

    Reference: eager_trainer.py:104-113.
    """
    if not use_partition:
        return jax.tree_util.tree_map(lambda s: jnp.float32(1.0), stacked)
    period = interval + 1
    is_part = (batch_no % period) == 0
    n_groups = len(jax.tree_util.tree_leaves(stacked)[0])
    group_idx = (batch_no // period) % n_groups
    return jax.tree_util.tree_map(
        lambda s: jnp.where(is_part, s[group_idx], jnp.float32(1.0)), stacked
    )
