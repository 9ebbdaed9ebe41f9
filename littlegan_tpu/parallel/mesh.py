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
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Mesh over the first ``num_devices`` devices.

    ``shape``: explicit per-axis sizes (must multiply to the device count).
    Default for a 2-axis mesh: trailing axis of size 2 (smallest useful model
    split), remainder on the leading axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    arr = np.asarray(devices)
    if shape is None and len(axis_names) == 2 and n % 2 == 0:
        shape = (n // 2, 2)
    if shape is not None:
        assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
        arr = arr.reshape(shape)
    elif len(axis_names) > 1:
        raise ValueError(f"pass an explicit shape for a {len(axis_names)}-axis mesh over {n} devices")
    return Mesh(arr, tuple(axis_names))


def model_groups_within_process(mesh: Mesh) -> bool:
    """True iff every trailing-axis ('model') group of the mesh lies inside
    one process.

    This is the layout condition for multi-host feeding of a spatial
    ('data','model') mesh — host-fed (shard_local_batch) and device stores
    alike: each host then contributes whole-H blocks of its local batch rows,
    so ``make_array_from_process_local_data`` can assemble the global array
    from per-process (rows, FULL_H, ...) data. With the default
    process-contiguous device order this holds whenever the model-axis size
    divides the per-host device count (trainer error text suggests
    ``mesh_shape = (n_hosts * k, devices_per_host / k)``)."""
    last = mesh.devices.shape[-1]
    return all(
        len({d.process_index for d in grp}) == 1
        for grp in mesh.devices.reshape(-1, last)
    )


def initialize_distributed(coordinator: Optional[str] = None, num_processes: int = 1, process_id: int = 0):
    """Multi-host entry: wraps jax.distributed.initialize (no-op single host)."""
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
