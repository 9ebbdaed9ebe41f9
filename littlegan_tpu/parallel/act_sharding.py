"""Explicit activation shardings for the spatial ('data','model') mesh.

Round-4 verdict #3: without these, XLA's sharding propagation had to guess
shardings for the tiny ``[B, init_dim, init_dim, C]`` head activations at
the dense-head -> decoder junction (G's head norm output, the Adjuster's
head-reshape + reversed-e4 skip-add). On the dryrun mesh it guessed a
batch-replicated H-sharded target and fell back to "Involuntary full
rematerialization" (spmd_partitioner.cc:652 — replicate-then-repartition),
a latent perf/memory hazard at real scale. The fix is the scaling-book
recipe: annotate the layer-boundary activations explicitly and let XLA
insert clean collectives.

Policy (``constrain_spatial``): an NHWC activation is sharded
``P('data', 'model')`` on (N, H) when its height divides the model-axis
size — the same layout as the images — and ``P('data')`` (replicated over
'model') otherwise. Transitions to/from a model-replicated tensor are
always efficient (all-gather / local slice), so the sub-model-axis-height
deep stages (e.g. the 8x8 maps under a 16-wide model axis, or everything
at dryrun scale) get a clean explicit layout instead of a propagation
conflict. No-op without a spatial mesh — the step stays sharding-agnostic
by default (train_step threads ``spatial_mesh=None``).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def model_axis_size(mesh: Mesh | None) -> int:
    if mesh is None or "model" not in mesh.axis_names:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape))["model"]


def h_shardable(x: jax.Array, mesh: Mesh | None) -> bool:
    """Can this NHWC activation's height be tiled on the model axis?"""
    msize = model_axis_size(mesh)
    return msize > 1 and x.ndim == 4 and x.shape[1] % msize == 0


def constrain_spatial(x: jax.Array, mesh: Mesh | None) -> jax.Array:
    """Pin an NHWC activation's sharding under a ('data','model') mesh.

    ``P('data', 'model')`` when H is shardable on the model axis, else
    ``P('data')``. Identity when ``mesh`` is None or has no 'model' axis.
    """
    msize = model_axis_size(mesh)
    if msize <= 1 or x.ndim != 4:
        return x
    spec = P("data", "model") if h_shardable(x, mesh) else P("data")
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_data(x: jax.Array, mesh: Mesh | None) -> jax.Array:
    """Pin to ``P('data')`` (model-replicated) regardless of height.

    Placed on a convolution's OUTPUT when its input height was too small to
    tile: with both operand and result pinned batch-only, the partitioner
    runs the conv model-replicated instead of demanding a degenerate
    H-sharded operand (the remaining involuntary-remat source after the
    input-side constraints alone)."""
    if model_axis_size(mesh) <= 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))
