"""Autotune: measure THIS chip's fastest trainer configuration.

The reference hardcodes one training configuration (config.py:5-25); this
framework has measured opt-in levers whose payoff depends on the hardware
and the host<->device link: ``adj_half_batch`` (alternating N-row adjuster
batches, ~20% of step FLOPs), ``moment_dtype: bfloat16`` (halved
optimizer-state HBM traffic), and ``steps_per_dispatch`` (scan K — how many
exact train steps ride one dispatch; pure RTT amortization). This script
sweeps those knobs AT A FIXED semantic scale (image_dim, batch_size are the
user's choice — they change training semantics, so autotune never "recommends"
them) on the live backend and prints:

  - one JSON line per measured point (same harness as bench.py — the
    production HBM-store scan path, best-of-windows timing), and
  - a final ``RECOMMEND`` line with two picks:
      * ``parity``: fastest configuration whose training math is exactly the
        reference's (only scan K varies — K is dispatch plumbing, not math;
        K-step scan == K sequential steps, tests/test_train_step.py), and
      * ``fastest``: fastest overall, with any opt-in semantics changes it
        relies on listed in ``opt_ins`` so nobody enables them unknowingly.

Usage:
  python scripts/autotune.py                     # 128², b32, full sweep
  python scripts/autotune.py --dim 256 --batch 16
  python scripts/autotune.py --ks 4,8,16 --skip-moment-dtype
Each point compiles once (~20-40 s on the tunneled backend, cached across
reruns by the persistent compilation cache) and times ~1 s of steps; the
default 12-point sweep is ~5-10 min end to end on the tunnel.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument(
        "--ks", default="4,8,16",
        help="comma-separated steps_per_dispatch candidates (scan K)",
    )
    ap.add_argument(
        "--skip-adj-half", action="store_true",
        help="leave the adj_half_batch lever out of the sweep",
    )
    ap.add_argument(
        "--skip-moment-dtype", action="store_true",
        help="leave the bfloat16 Adam-moment lever out of the sweep",
    )
    ap.add_argument(
        "--measure-dispatches", type=int, default=5,
        help="timed dispatches per window (3 windows, best kept — see "
        "bench.py::time_scan_dispatches for why best-of-windows)",
    )
    ap.add_argument(
        "--out", default="",
        help="also write the recommendation to this JSON file",
    )
    args = ap.parse_args()

    # bench.py owns the backend-liveness fallback logic; autotune REQUIRES a
    # live backend instead (a CPU autotune result would mis-tune the chip).
    from littlegan_tpu.utils.backend_probe import backend_may_hang, probe_backend

    if backend_may_hang() and not probe_backend(240.0):
        print(
            "ERROR: device discovery did not complete within 240s — the "
            "accelerator backend is unresponsive. Autotune results are "
            "backend-specific, so there is no CPU fallback; retry when "
            "`python scripts/doctor.py` shows a live device.",
            file=sys.stderr,
        )
        return 2

    from littlegan_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import bench  # the canonical harness — autotune must not drift from it

    from littlegan_tpu.config import Config

    ks = [int(k) for k in args.ks.split(",") if k]
    adj_opts = [False] if args.skip_adj_half else [False, True]
    mom_opts = ["float32"] if args.skip_moment_dtype else ["float32", "bfloat16"]

    dev = jax.devices()[0]
    results = []
    for adj_half, moment_dtype, k in itertools.product(adj_opts, mom_opts, ks):
        cfg = Config(
            image_dim=args.dim,
            init_dim=args.dim // 16,  # 4 stride-2 encoder halvings
            batch_size=args.batch,
            compute_dtype="bfloat16",
            use_partition=True,
            train_adj=True,
            adj_half_batch=adj_half,
            moment_dtype=moment_dtype,
            donate_state=True,
            debug=True,
        )
        t0 = time.time()
        try:
            state, dispatch = bench.build_scan_harness(cfg, k=k)
            step_s, _ = bench.time_scan_dispatches(
                state, dispatch, k=k, measure=args.measure_dispatches
            )
        except Exception as e:  # noqa: BLE001 — one OOMing point must not
            # kill the sweep (e.g. a batch that fits at K=4 but whose scan
            # unrolling tips HBM at K=16)
            print(json.dumps({
                "adj_half_batch": adj_half, "moment_dtype": moment_dtype,
                "steps_per_dispatch": k, "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
            continue
        rec = {
            "adj_half_batch": adj_half,
            "moment_dtype": moment_dtype,
            "steps_per_dispatch": k,
            "step_ms": round(step_s * 1000, 3),
            "images_per_sec": round(2 * args.batch / step_s, 1),
            "compile_plus_measure_secs": round(time.time() - t0, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if not results:
        print("ERROR: no point measured successfully", file=sys.stderr)
        return 1

    def best(rows):
        return min(rows, key=lambda r: r["step_ms"])

    parity_rows = [
        r for r in results
        if not r["adj_half_batch"] and r["moment_dtype"] == "float32"
    ]
    pick_parity = best(parity_rows) if parity_rows else None
    pick_fast = best(results)
    opt_ins = []
    if pick_fast["adj_half_batch"]:
        opt_ins.append(
            "adj_half_batch: adjuster trains on ONE alternating N-row batch "
            "per step instead of the reference 2N concat (convergence-"
            "validated, CAMPAIGN.md — but not reference math)"
        )
    if pick_fast["moment_dtype"] == "bfloat16":
        opt_ins.append(
            "moment_dtype bfloat16: Adam moments STORED in bf16 (update math "
            "f32; trajectories drift within tested bounds — not bit-parity)"
        )

    recommend = {
        "device_kind": dev.device_kind,
        "image_dim": args.dim,
        "batch_size": args.batch,
        "parity": pick_parity,
        "fastest": pick_fast,
        "opt_ins": opt_ins,
        "config_snippet": {
            "steps_per_dispatch": pick_fast["steps_per_dispatch"],
            "device_data": True,
            **({"adj_half_batch": True} if pick_fast["adj_half_batch"] else {}),
            **(
                {"moment_dtype": "bfloat16"}
                if pick_fast["moment_dtype"] == "bfloat16"
                else {}
            ),
        },
    }
    print("RECOMMEND", json.dumps(recommend), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(recommend, f, indent=1)
        print(f"recommendation -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
