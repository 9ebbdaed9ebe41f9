"""Shared fixtures for the 2-process multi-host tests: one definition of the
tiny config and the deterministic global store so the worker and the
single-process reference cannot drift apart."""

import numpy as np

STORE_K = 2
STORE_N_BATCHES = 2 * STORE_K * 2


def make_cfg():
    from littlegan_tpu.config import Config

    return Config(
        batch_size=8, image_dim=16, init_dim=1, noise_dim=13,
        conv_filter=[24, 16, 12, 8, 4], compute_dtype="float32",
        donate_state=False, debug=True,
    )


def make_store_data(cfg):
    """(n_batches, B, H, W, 3) images + conds, deterministic across hosts."""
    rng = np.random.default_rng(7)
    imgs = rng.uniform(
        -1, 1, (STORE_N_BATCHES, cfg.batch_size, cfg.image_dim, cfg.image_dim, 3)
    ).astype(np.float32)
    conds = np.where(
        rng.random((STORE_N_BATCHES, cfg.batch_size, cfg.cond_dim)) < 0.5, 0.98, -0.94
    ).astype(np.float32)
    return imgs, conds
