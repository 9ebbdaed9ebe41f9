"""Benchmark: training images/sec on one chip (the BASELINE.md north-star).

Measures the full fused train step (G+D+A forward/backward, on-device
augmentation, masked-Adam updates, partition schedule) at the reference
training scale — 128x128 images, batch 32 (sample.config.json:2,7), bf16
compute — on whatever accelerator JAX exposes (the driver runs this on one
real TPU chip; it also runs on CPU for smoke).

Accounting matches the reference: each step consumes TWO batches
(eager_trainer.py:117-118), so images/sec = 2 * batch * steps / time — the
same quantity the reference's Progbar tracks (eager_trainer.py:213).

``vs_baseline``: the reference publishes NO numbers (BASELINE.md). We use
the BASELINE.json north-star definition — ``>=5x V100-class reference
throughput`` — with the V100-class reference estimated at 190 images/sec
(TF-1.15 eager + defun, batch 32, measured-class estimate for this model
size; documented assumption, revisit if a real reference run lands).
vs_baseline = measured / 190.0, so the 5x target reads as vs_baseline >= 5.
"""

import json
import time

from littlegan_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from littlegan_tpu.config import Config
from littlegan_tpu.data.synthetic import random_device_batch as make_batch
from littlegan_tpu.training import create_train_state
from littlegan_tpu.training.step import make_train_step

V100_REFERENCE_IMAGES_PER_SEC = 190.0

WARMUP_STEPS = 5
MEASURE_STEPS = 30


def main():
    cfg = Config(
        batch_size=32,
        compute_dtype="bfloat16",
        use_partition=True,
        train_adj=True,
        donate_state=True,
        debug=True,
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params)

    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    batches = [make_batch(cfg, k) for k in keys]  # device-resident, rotated
    rng = jax.random.PRNGKey(2)

    for i in range(WARMUP_STEPS):
        out = step(state, batches[i % 4], batches[(i % 4) + 4], rng, jnp.int32(i + 11))
        state = out.state
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        out = step(state, batches[i % 4], batches[(i % 4) + 4], rng, jnp.int32(i + 11))
        state = out.state
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - t0

    images_per_sec = 2 * cfg.batch_size * MEASURE_STEPS / elapsed
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_128px_b32",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / V100_REFERENCE_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
