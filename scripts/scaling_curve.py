"""Multi-chip scaling curve: img/s per chip for the DP and spatial steps.

Round-4 verdict missing #3: real multi-chip measurements (scaling curves,
ICI overlap, per-chip rates) need a slice this container does not have.
This script makes that measurement ONE COMMAND the moment a slice appears:

  python scripts/scaling_curve.py                      # all real devices
  python scripts/scaling_curve.py --devices 1,2,4,8    # explicit curve
  python scripts/scaling_curve.py --virtual 8          # CPU dryrun mode

For each device count n it builds the production step over a mesh of the
first n devices and times steady-state steps (global batch = b x n for DP,
so per-chip work is constant — WEAK scaling, the regime DP training runs
in). Spatial points use a ('data', 'model') mesh with model=2 (the
fixed-batch strong-scaling axis). Emitted per point:

  - img_s          global images/second
  - img_s_chip     images/second/chip (flat curve == linear scaling)
  - step_ms        wall per step
  - efficiency     img_s_chip / single-chip img_s_chip (1.0 == linear)

With ``--trace DIR`` each point also captures a jax.profiler trace whose
xplane can be fed to scripts/xplane_top_ops.py to attribute collective
(all-reduce / all-gather / collective-permute) time per step — kept out of
the timed windows.

``--virtual N`` runs the same code on N virtual CPU devices
(xla_force_host_platform_device_count): timings are then labeled
``backend: cpu-virtual`` and are NOT performance claims — the mode exists
so the curve harness itself is testable in-suite (tests/test_scaling_curve
.py) and stays green until real chips arrive. Results land in
``artifacts/scaling_curve_<backend>.json`` (or --out).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steps_per_sec(step, state, b1, b2, rng, warmup: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    out = None
    for _ in range(max(1, warmup)):
        out = step(state, b1, b2, rng, jnp.int32(11))
    jax.block_until_ready(out.metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out.state, b1, b2, rng, jnp.int32(11))
    jax.block_until_ready(out.metrics)
    return iters / (time.perf_counter() - t0)


def measure_point(cfg, mesh, spatial: bool, warmup: int, iters: int, trace_dir=None):
    """One curve point: build the production step on ``mesh``, time it."""
    import jax
    import jax.numpy as jnp

    from littlegan_tpu.data.synthetic import random_device_batch
    from littlegan_tpu.parallel import (
        make_parallel_train_step,
        replicate_state,
        shard_batch,
    )
    from littlegan_tpu.training import create_train_state

    state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    if spatial:
        from littlegan_tpu.parallel.spatial import (
            make_spatial_train_step,
            shard_spatial_batch,
        )

        step = make_spatial_train_step(cfg, state.params, mesh, donate=False)
        sharder = lambda b: shard_spatial_batch(b, mesh)
    else:
        step = make_parallel_train_step(cfg, state.params, mesh, donate=False)
        sharder = lambda b: shard_batch(b, mesh)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    b1 = sharder(random_device_batch(cfg, ks[0]))
    b2 = sharder(random_device_batch(cfg, ks[1]))
    rng = jax.random.PRNGKey(2)

    sps = _steps_per_sec(step, state, b1, b2, rng, warmup, iters)
    if trace_dir:
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            out = step(state, b1, b2, rng, jnp.int32(11))
            jax.block_until_ready(out.metrics)
    # reference step semantics: 2 data batches per step, batch_size images
    # counted once (the reference's Progbar counts batch_size per step)
    return sps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--devices", default="", help="comma list of device counts (default: 1,2,4,.. up to all)")
    ap.add_argument("--virtual", type=int, default=0, help="use N virtual CPU devices (harness test mode)")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32, help="per-chip batch for DP points; global batch for spatial")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--no-spatial", action="store_true", help="skip the ('data','model') points")
    ap.add_argument("--trace", default="", help="capture a jax.profiler trace per point under DIR/<tag>")
    ap.add_argument("--out", default="", help="output JSON path (default artifacts/scaling_curve_<backend>.json)")
    args = ap.parse_args(argv)

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # a wedged tunnel must fail fast, not hang the curve (CLAUDE.md)
        from littlegan_tpu.utils.backend_probe import ensure_live_backend_or_exit

        ensure_live_backend_or_exit()
        import jax

    from littlegan_tpu.config import Config
    from littlegan_tpu.parallel import make_mesh

    n_all = len(jax.devices())
    backend = "cpu-virtual" if args.virtual else jax.devices()[0].platform
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_all]
    bad = [n for n in counts if n > n_all]
    if bad:
        raise SystemExit(f"device counts {bad} exceed available {n_all}")

    base = dict(
        image_dim=args.dim,
        init_dim=args.dim // 16,
        compute_dtype="bfloat16" if backend != "cpu-virtual" else "float32",
        use_partition=True,
        train_adj=True,
        donate_state=False,
    )
    if args.virtual:  # tiny shapes: the harness validates, it does not claim perf
        base.update(image_dim=16, init_dim=1, noise_dim=13, conv_filter=[24, 16, 12, 8, 4])

    results = []
    single_chip_rate = None
    for n in counts:
        cfg = Config(batch_size=args.batch * n, **base)
        mesh = make_mesh(n)
        tag = f"dp_n{n}"
        trace = os.path.join(args.trace, tag) if args.trace else None
        sps = measure_point(cfg, mesh, spatial=False, warmup=args.warmup, iters=args.iters, trace_dir=trace)
        img_s = sps * cfg.batch_size
        img_s_chip = img_s / n
        if n == counts[0] and counts[0] == 1:
            single_chip_rate = img_s_chip
        eff = img_s_chip / single_chip_rate if single_chip_rate else None
        rec = {
            "regime": "dp",
            "n_devices": n,
            "batch_global": cfg.batch_size,
            "dim": cfg.image_dim,
            "step_ms": round(1000.0 / sps, 3),
            "img_s": round(img_s, 1),
            "img_s_chip": round(img_s_chip, 1),
            "efficiency": round(eff, 4) if eff is not None else None,
            "backend": backend,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if not args.no_spatial:
        for n in counts:
            if n % 2 or n < 2:
                continue
            cfg = Config(batch_size=args.batch * (n // 2), **base)
            mesh = make_mesh(n, axis_names=("data", "model"))
            tag = f"spatial_n{n}"
            trace = os.path.join(args.trace, tag) if args.trace else None
            sps = measure_point(cfg, mesh, spatial=True, warmup=args.warmup, iters=args.iters, trace_dir=trace)
            img_s = sps * cfg.batch_size
            rec = {
                "regime": "spatial_model2",
                "n_devices": n,
                "batch_global": cfg.batch_size,
                "dim": cfg.image_dim,
                "step_ms": round(1000.0 / sps, 3),
                "img_s": round(img_s, 1),
                "img_s_chip": round(img_s / n, 1),
                "efficiency": (
                    round((img_s / n) / single_chip_rate, 4) if single_chip_rate else None
                ),
                "backend": backend,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        f"scaling_curve_{backend}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(
            {
                "results": results,
                "iters": args.iters,
                "timing_note": (
                    "per-step dispatches (no scan): over a tunneled chip the "
                    "absolute rate includes host RTT per step — compare points "
                    "ACROSS n_devices; the single-chip absolute headline is "
                    "bench.py's scan-path number"
                ),
            },
            f,
            indent=1,
        )
    print(f"curve -> {out}")
    if args.trace:
        print(
            f"collective attribution: python scripts/xplane_top_ops.py "
            f"{args.trace}/<tag>  (sum all-reduce/all-gather/collective-permute rows)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
