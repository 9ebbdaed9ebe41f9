"""Device mesh construction.

The reference has NO distributed backend (SURVEY §2 #23-24: its multi-GPU
flag only masks CUDA_VISIBLE_DEVICES, config.py:35-37). Scaling here is
JAX-native: a ``jax.sharding.Mesh`` with a ``data`` axis; gradient
all-reduce is inserted by XLA's SPMD partitioner and rides ICI within a
slice. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` (initialize_distributed()).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1-D (or reshaped) mesh over the first ``num_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        # split devices evenly across leading axes: e.g. (data, model)
        per = int(round(len(devices) ** (1 / len(axis_names))))
        shape = [per] * (len(axis_names) - 1) + [-1]
        arr = arr.reshape(shape)
    return Mesh(arr, tuple(axis_names))


def initialize_distributed(coordinator: Optional[str] = None, num_processes: int = 1, process_id: int = 0):
    """Multi-host entry: wraps jax.distributed.initialize (no-op single host)."""
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
