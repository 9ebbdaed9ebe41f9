"""Synthetic dataset — deterministic random images + attribute labels.

Used by tests and benchmarks when no CelebA tree is on disk. Produces the
same (image in [-1,1] f32 NHWC, softened ±1 cond) contract as the CelebA
pipeline (reference dataset.py:25-33).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

from littlegan_tpu.config import Config
from littlegan_tpu.utils.image import soft


def random_device_batch(cfg: Config, key) -> Tuple:
    """One (image [-1,1] f32, softened ±1 cond) batch built ON DEVICE with a
    jax PRNG key — shared by bench.py, __graft_entry__, and step-variant
    experiments (keeps their batch construction identical)."""
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(key)
    img = jax.random.uniform(
        k1,
        (cfg.batch_size, cfg.image_dim, cfg.image_dim, cfg.image_channel),
        jnp.float32,
        minval=-1.0,
        maxval=1.0,
    )
    cond = jnp.where(
        jax.random.bernoulli(k2, 0.5, (cfg.batch_size, cfg.cond_dim)), soft(1.0), soft(-1.0)
    ).astype(jnp.float32)
    return img, cond


class SyntheticDataset:
    def __init__(self, cfg: Config, num_items: int = 256, shard_index: int = 0):
        self.cfg = cfg
        self.num_items = num_items
        self.batches = num_items // cfg.batch_size
        self.label = [f"attr{i}" for i in cfg.attr]
        self.rows_per_batch = cfg.batch_size
        self._shard_index = shard_index

    def set_rows_per_batch(self, rows: int) -> None:
        """Multi-host host-fed DP: generate only this host's rows of each
        global batch (same contract as CelebA.set_rows_per_batch — without
        it the trainer's shard_local_batch would assemble an n_proc-times
        inflated global batch of per-host duplicated rows). ``shard_index``
        decorrelates the per-host substreams; ``batches`` stays the same on
        every host, so dispatch counts agree."""
        assert self.cfg.batch_size % rows == 0, (rows, self.cfg.batch_size)
        self.rows_per_batch = rows

    def epoch_iterator(
        self, epoch: int = 0, shuffle: bool = True, start_batch: int = 0
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        # ``shuffle`` is accepted for pipeline-mode API parity with CelebA
        # and ignored: batches are IID draws, so every order IS canonical.
        # ``start_batch`` (mid-epoch resume) must DRAW the skipped batches
        # to keep the sequential stream identical to the full epoch's tail.
        base = self.cfg.seed * 100003 + epoch
        # shard 0 keeps the historical scalar seed (golden trajectories,
        # campaign reproducibility); other shards get decorrelated substreams
        rng = np.random.default_rng(base if self._shard_index == 0 else (base, self._shard_index))
        c = self.cfg
        rows = self.rows_per_batch
        for i in range(self.batches):
            img = rng.uniform(-1.0, 1.0, (rows, c.image_dim, c.image_dim, c.image_channel)).astype(
                np.float32
            )
            cond = soft(np.where(rng.random((rows, c.cond_dim)) < 0.5, -1.0, 1.0)).astype(
                np.float32
            )
            if i >= start_batch:
                yield img, cond
