"""Data-parallel training over a device mesh.

SURVEY §2 #23: DP is the first-class scaling target — replicate G/D/A
params, shard the batch over the ``data`` axis, gradient all-reduce over ICI.

Implementation: the SAME ``train_step`` as single-device (training/step.py)
jitted with sharding annotations. Batch inputs are sharded ``P('data')`` on
their leading axis; params/optimizer state are replicated ``P()``. XLA's
SPMD partitioner then:
- runs fwd/bwd on each chip's batch shard,
- inserts ONE all-reduce (psum) for the gradients where they meet the
  replicated params in the Adam update — the canonical DP schedule, no
  hand-written collectives (reference has none to port: SURVEY §2 #24),
- keeps the loss means globally correct (batch-mean reductions partition into
  psum'd partial sums).

Per-sample ops (instance norm reduces over each sample's own axes) make the
whole model trivially batch-shardable; there is no cross-sample compute
outside the loss means.

Equivalence with single-device training is asserted in
tests/test_parallel.py on the fake 8-device CPU backend (SURVEY §4).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from littlegan_tpu.config import Config
from littlegan_tpu.training.partition import build_partition_masks
from littlegan_tpu.training.state import TrainState
from littlegan_tpu.training.step import StepOutput, train_step
from littlegan_tpu.utils.jax_cache import tpu_compiler_options


def _batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Host batch -> device-sharded along the data axis (leading dim)."""
    return jax.device_put(batch, _batch_sharding(mesh))


def shard_local_batch(batch, mesh: Mesh, spec: P = P("data")):
    """Per-process LOCAL rows -> one GLOBAL batch sharded over ``mesh``.

    Multi-host host-fed feeding (round-2 verdict #5b): every process passes
    only the rows its own devices train (its 1/n_proc slice of the global
    batch) and ``make_array_from_process_local_data`` assembles the global
    sharded array. Previously each host decoded the full global batch while
    its devices trained a 1/n slice — and, with fixed batch membership, the
    other rows of its shard never trained at all."""
    import numpy as np

    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    return jax.device_put(state, _replicated(mesh))


def make_parallel_train_step(cfg: Config, params, mesh: Mesh, donate: bool | None = None):
    """Jit the train step with DP shardings over ``mesh``.

    Returned step signature matches the single-device one:
    ``step(state, batch1, batch2, rng, batch_no) -> StepOutput``.
    The global batch (both batches) must be divisible by the data-axis size.
    """
    from littlegan_tpu.parallel.zero import train_state_shardings

    part_masks = build_partition_masks(params)
    rep = _replicated(mesh)
    bsh = _batch_sharding(mesh)
    # replicated everything unless cfg.shard_opt_state (ZeRO-1: Adam moments
    # sharded over the mesh, parallel/zero.py)
    state_sh = train_state_shardings(cfg, params, mesh)

    if cfg.use_pallas or cfg.use_pallas_boundary:
        # Mosaic kernels are not auto-partitionable by the SPMD partitioner;
        # sharded paths force the jnp norm (which measured faster anyway —
        # see config.use_pallas).
        cfg = cfg.replace(use_pallas=False, use_pallas_boundary=False)
    fn = partial(train_step, cfg=cfg, part_masks=part_masks)
    donate = cfg.donate_state if donate is None else donate
    adj_sh = bsh if cfg.train_adj else rep  # placeholder adj output is tiny
    return jax.jit(
        fn,
        in_shardings=(state_sh, (bsh, bsh), (bsh, bsh), rep, rep),
        out_shardings=StepOutput(state=state_sh, metrics=rep, fake_image=bsh, adj_image=adj_sh),
        donate_argnums=(0,) if donate else (),
        compiler_options=tpu_compiler_options(cfg),
    )
