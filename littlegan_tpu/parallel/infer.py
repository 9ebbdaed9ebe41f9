"""Data-parallel INFERENCE over the local device mesh.

The reference runs every offline tool single-device (its multi-GPU flag
only masks CUDA_VISIBLE_DEVICES, config.py:35-37); here the heavy offline
paths — ``evaluate-sample``'s 30k-image generation (main.py:58-81) and the
FID stack's Inception featurization (fid.py:73-106) — shard their batches
row-wise over all visible chips. Pure forward passes are row-independent
(instance norm reduces per sample, ops/norm.py), so sharding the batch
axis is value-equivalent to the single-device run; XLA inserts the gather.

This is the inference sibling of parallel/train.py: annotation-only
sharding on a 1-D ``('data',)`` mesh, no collectives in user code.
Single-process only — the offline tools are per-host utilities; multi-host
training cadences keep their existing path (trainer.py).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from littlegan_tpu.parallel.mesh import make_mesh


def infer_mesh_devices() -> int:
    """Devices a data-parallel inference wrapper would span (1 = disabled)."""
    return jax.device_count() if jax.process_count() == 1 else 1


def pad_rows(arr, target: int):
    """Zero-pad axis 0 to ``target`` rows (static shapes for XLA)."""
    pad = target - arr.shape[0]
    if pad <= 0:
        return arr
    return np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)])


def data_parallel_infer(fn: Callable, n_batch_args: int, mesh=None, cfg=None) -> Callable:
    """Wrap ``fn(params, *batch_args)`` to shard batches over the devices.

    - every batch argument shards ``P('data')`` on axis 0 (zero-padded up to
      the next device-count multiple; outputs are sliced back),
    - ``params`` replicates, device-put ONCE per tree (single-slot cache
      holding a STRONG reference to the host tree and comparing identity
      with ``is`` — caching a bare ``id()`` would let CPython reuse the
      freed address for a different tree and silently serve stale weights;
      a fresh tree evicts the old entry so trees never accumulate in HBM.
      Callers must not mutate a cached tree's leaves in place),
    - every output leaf must carry the batch on axis 0 (true for the
      generator/discriminator/adjuster applies and the Inception featurizer).

    With one device (or multi-host) this wrapper is never built — callers
    gate on ``infer_mesh_devices() > 1``.
    """
    from littlegan_tpu.utils.jax_cache import tpu_compiler_options

    mesh = mesh if mesh is not None else make_mesh(axis_names=("data",))
    n = int(np.prod(mesh.devices.shape))
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("data"))
    jfn = jax.jit(
        fn,
        in_shardings=(rep,) + (row,) * n_batch_args,
        out_shardings=row,
        # per-jit options are the ONLY channel to the tunneled TPU backend
        # (XLA_FLAGS does not reach it) — same policy as every other jit
        compiler_options=tpu_compiler_options(cfg),
    )
    cache: dict = {}

    def wrapped(params, *batch_args):
        if len(batch_args) != n_batch_args:
            raise TypeError(f"expected {n_batch_args} batch args, got {len(batch_args)}")
        cached = cache.get("<params>")
        if cached is None or cached[0] is not params:
            cached = (params, jax.device_put(params, rep))
            cache["<params>"] = cached
        rows = batch_args[0].shape[0]
        target = max(math.ceil(rows / n) * n, n)
        if target == rows:  # divisible: pass through (device arrays — e.g.
            args = batch_args  # predict chaining G's output into D/A — stay
        else:  # on device; jit resharding handles their layout)
            args = [pad_rows(np.asarray(a), target) for a in batch_args]
        out = jfn(cached[1], *args)
        if target == rows:
            return out
        return jax.tree_util.tree_map(lambda o: o[:rows], out)

    wrapped.mesh = mesh  # introspection for tests / logs
    return wrapped
