"""Measured baseline anchor: reference TF step vs our JAX step, same host CPU.

The bench's ``vs_baseline`` derives a V100 figure from an ASSUMED 30%
utilization (bench.py docstring) — honest, but never measured. This script
produces the one anchor this container CAN measure (round-4 verdict weak
#4): the reference's EXACT training step — the in-suite TF oracle
transcription of eager_trainer.py:115-169 (tests/test_tf_oracle.py,
gradient-parity-pinned against our step) — timed on THIS host's CPU against
our single-device jitted step at identical shapes, dtype (f32) and
semantics (clip, partition schedule, v1 Adam, adjuster past the warm-up
gate).

Two TF numbers are recorded:
  - tf_graph_ms: the recipe wrapped in tf.function — GENEROUS to the
    reference (it only defun-compiled the three forwards, model.py:65,89,125;
    tapes ran eager),
  - tf_eager_ms: closer to how the tapes actually executed.

This does NOT replace the derived V100 figure (a CPU ratio is not a GPU
ratio); it bounds the framework-efficiency component of the claim with a
same-silicon measurement. Output: artifacts/baseline_anchor.json and a
README-citable ratio line.

Usage: python scripts/baseline_anchor.py [--dim 128] [--batch 32]
       [--steps 3] [--eager-steps 1] [--out artifacts/baseline_anchor.json]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3, help="timed steps per side (median)")
    ap.add_argument("--eager-steps", type=int, default=1, help="timed TF eager steps (slow)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    # CPU on both sides — this is a same-silicon framework comparison
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")

    from littlegan_tpu.config import Config
    from littlegan_tpu.training import create_train_state
    from littlegan_tpu.training.step import make_train_step
    from littlegan_tpu.utils.image import soft
    from tests.test_tf_oracle import TFOracle, _tf_reference_step

    cfg = Config(
        image_dim=args.dim,
        init_dim=args.dim // 16,
        batch_size=args.batch,
        compute_dtype="float32",  # the reference's CPU dtype; bf16 is a TPU lever
        use_clip=True,
        use_partition=True,
        adam_tf_parity=True,
        train_adj=True,
        donate_state=False,
    )
    n = cfg.batch_size
    rng = np.random.default_rng(0)

    def batches():
        img1 = (rng.random((n, cfg.image_dim, cfg.image_dim, 3), np.float32) * 2 - 1)
        img2 = (rng.random((n, cfg.image_dim, cfg.image_dim, 3), np.float32) * 2 - 1)
        cond1 = soft(rng.choice([-1.0, 1.0], (n, cfg.cond_dim))).astype(np.float32)
        cond2 = soft(rng.choice([-1.0, 1.0], (n, cfg.cond_dim))).astype(np.float32)
        return img1, cond1, img2, cond2

    img1, cond1, img2, cond2 = batches()
    noise = rng.standard_normal((n, cfg.noise_dim)).astype(np.float32)

    # ---------------- our side: the production single-device jitted step ----
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, state.params, donate=False)
    jb1 = (jnp.asarray(img1), jnp.asarray(cond1))
    jb2 = (jnp.asarray(img2), jnp.asarray(cond2))
    jrng = jax.random.PRNGKey(1)
    out = step(state, jb1, jb2, jrng, jnp.int32(11))  # compile + warm (adj on)
    jax.block_until_ready(out.metrics)
    jax_times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        out = step(out.state, jb1, jb2, jrng, jnp.int32(11 + i))
        jax.block_until_ready(out.metrics)
        jax_times.append(time.perf_counter() - t0)
    jax_ms = float(np.median(jax_times) * 1000)
    print(f"jax jitted step: {jax_ms:.0f} ms  ({n / (jax_ms / 1000):.1f} img/s)", flush=True)

    # ---------------- reference side: oracle recipe + clip + 3 v1 Adams ----
    o = TFOracle(cfg, state.params)
    gen_opt = tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2)
    disc_opt = tf.compat.v1.train.AdamOptimizer(cfg.lr, cfg.beta_1, cfg.beta_2)
    adj_opt = tf.compat.v1.train.AdamOptimizer(cfg.lr)

    def tf_step(img1, cond1, img2, cond2, noise, new_image):
        ref = _tf_reference_step(o, cfg, img1, img2, cond1, cond2, noise, new_image, with_adj=True)
        dg = [
            tf.clip_by_value(g, -cfg.clip_range, cfg.clip_range) for g in ref["d_grads"]
        ]
        disc_opt.apply_gradients(zip(dg, o.d_vars()))
        gen_opt.apply_gradients(zip(ref["g_grads"], o.g_vars()))
        adj_opt.apply_gradients(zip(ref["a_grads"], o.a_vars()))
        return ref["d_loss"], ref["g_loss"], ref["a_loss"]

    new_image = img1  # augmentation excluded on BOTH sides? no — ours includes
    # it in-step; the reference also augments in-step (eager_trainer.py:127-131).
    # The oracle recipe takes new_image precomputed, so augmentation cost is
    # excluded from the TF timing — another generosity to the reference.

    eager_times = []
    for i in range(max(0, args.eager_steps)):
        t0 = time.perf_counter()
        losses = tf_step(img1, cond1, img2, cond2, noise, new_image)
        _ = [float(x) for x in losses]
        eager_times.append(time.perf_counter() - t0)
        print(f"tf eager step {i}: {eager_times[-1]*1000:.0f} ms", flush=True)
    tf_eager_ms = float(np.median(eager_times) * 1000) if eager_times else None

    graph_step = tf.function(tf_step)
    losses = graph_step(img1, cond1, img2, cond2, noise, new_image)  # trace
    _ = [float(x) for x in losses]
    graph_times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        losses = graph_step(img1, cond1, img2, cond2, noise, new_image)
        _ = [float(x) for x in losses]
        graph_times.append(time.perf_counter() - t0)
    tf_graph_ms = float(np.median(graph_times) * 1000)
    print(f"tf graph step: {tf_graph_ms:.0f} ms  ({n / (tf_graph_ms / 1000):.1f} img/s)", flush=True)

    rec = {
        "dim": cfg.image_dim,
        "batch": n,
        "dtype": "float32",
        "host_cpu": platform.processor() or platform.machine(),
        "n_host_cores": os.cpu_count(),
        "jax_step_ms": round(jax_ms, 1),
        "tf_graph_ms": round(tf_graph_ms, 1),
        "tf_eager_ms": round(tf_eager_ms, 1) if tf_eager_ms is not None else None,
        "jax_speedup_vs_tf_graph": round(tf_graph_ms / jax_ms, 2),
        "jax_speedup_vs_tf_eager": (
            round(tf_eager_ms / jax_ms, 2) if tf_eager_ms is not None else None
        ),
        "timed_steps": args.steps,
        "note": (
            "same-host CPU, f32, identical shapes/semantics (clip, partition, "
            "v1 Adam, adjuster on); oracle recipe gradient-parity-pinned in "
            "tests/test_tf_oracle.py; TF side excludes augmentation and gets "
            "a full tf.function wrap (both generous to the reference). This "
            "bounds framework efficiency on shared silicon; it does not "
            "measure a GPU."
        ),
    }
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "baseline_anchor.json",
    )
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in ("jax_step_ms", "tf_graph_ms", "tf_eager_ms", "jax_speedup_vs_tf_graph")}))
    print(f"anchor -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
