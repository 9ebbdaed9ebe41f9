"""Benchmark: training images/sec on one chip (the BASELINE.md north-star).

Measures the full fused train step (G+D+A forward/backward, on-device
augmentation, masked-Adam updates, partition schedule) at the reference
training scale — 128x128 images, batch 32 (sample.config.json:2,7), bf16
compute — on whatever accelerator JAX exposes (the driver runs this on one
real TPU chip; it also runs on CPU for smoke).

Measured through the PRODUCTION dispatch path: HBM-resident batch store +
``steps_per_dispatch`` (lax.scan over K exact train steps, identical math
to K sequential dispatches — training/step.py:make_scan_train_step). This
is the trainer's sustained mode (trainer.py device_data) and what the
convergence campaign ran. It also makes the measurement robust to
host<->device RTT: this container reaches the chip over a tunnel whose
per-dispatch latency varies ~10-90 ms across the day (measured 2026-08-16:
the same unscanned loop read 3,739 img/s in the morning and 995 img/s in
the evening while device step time was 11.0 ms in both — the scan path
reads ~5,800 img/s at both RTTs because one dispatch covers K steps).

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
from littlegan_tpu.training.step import make_scan_train_step

V100_REFERENCE_IMAGES_PER_SEC = 190.0

STEPS_PER_DISPATCH = 8  # trainer.py default for device_data runs
WARMUP_DISPATCHES = 2
MEASURE_DISPATCHES = 5
N_STORE_BATCHES = 16


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
    step = make_scan_train_step(cfg, state.params, STEPS_PER_DISPATCH)

    keys = jax.random.split(jax.random.PRNGKey(1), N_STORE_BATCHES)
    pairs = [make_batch(cfg, k) for k in keys]
    images = jnp.stack([p[0] for p in pairs])
    conds = jnp.stack([p[1] for p in pairs])
    rng = jax.random.PRNGKey(2)
    k = STEPS_PER_DISPATCH
    b1s = jnp.arange(k, dtype=jnp.int32)
    b2s = b1s + k

    def dispatch(state, d):
        return step(
            state, images, conds, b1s, b2s, rng, jnp.int32(d * k), jnp.int32(11 + d * k)
        ).state

    for d in range(WARMUP_DISPATCHES):
        state = dispatch(state, d)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for d in range(MEASURE_DISPATCHES):
        state = dispatch(state, WARMUP_DISPATCHES + d)
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - t0

    n_steps = MEASURE_DISPATCHES * STEPS_PER_DISPATCH
    images_per_sec = 2 * cfg.batch_size * n_steps / elapsed
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
