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


class SyntheticDataset:
    def __init__(self, cfg: Config, num_items: int = 256):
        self.cfg = cfg
        self.num_items = num_items
        self.batches = num_items // cfg.batch_size
        self.label = [f"attr{i}" for i in cfg.attr]

    def epoch_iterator(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = np.random.default_rng(self.cfg.seed * 100003 + epoch)
        c = self.cfg
        for _ in range(self.batches):
            img = rng.uniform(-1.0, 1.0, (c.batch_size, c.image_dim, c.image_dim, c.image_channel)).astype(
                np.float32
            )
            cond = soft(np.where(rng.random((c.batch_size, c.cond_dim)) < 0.5, -1.0, 1.0)).astype(
                np.float32
            )
            yield img, cond
