"""Train-state / step HBM report: what fits, and what each flag buys.

Answers the 512²+ deployment questions BEFORE burning chip time:
- how many bytes of params / Adam moments / EMA the config needs,
- per chip, under any combination of `shard_opt_state`, `shard_dense`,
  `moment_dtype`, `ema_decay`, and a mesh shape,
- (--compile) XLA's own compiled memory analysis of the full train step —
  argument + output + temp + peak bytes — on the current backend.

The analytic part materializes NOTHING (jax.eval_shape); the sharding
arithmetic mirrors parallel/zero.py::train_state_shardings leaf for leaf
(consistency asserted in tests/test_memory_report.py).

Usage:
  python scripts/memory_report.py --dim 1024 --batch 8
  python scripts/memory_report.py --dim 1024 --batch 32 \
      --mesh data=4,model=2 --shard-opt-state --shard-dense \
      --moment-dtype bfloat16 --ema 0.999
  python scripts/memory_report.py --dim 512 --batch 32 --compile   # step peak
Prints one JSON line (machine-readable) after a human-readable table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topology_mesh(topology: str, mesh_shape: dict | None):
    """Mesh over a TPU *topology description* — AOT, no hardware needed.

    ``topology`` is a PJRT topology name (e.g. ``v5e:2x4`` = 8 chips); the
    plugin compiles for that chip count exactly as it would at run time, so
    the compiled memory analysis is the real per-chip verdict for a slice
    this container doesn't have. ``mesh_shape`` splits the chips over named
    axes (default: all on ``data``)."""
    import numpy as np
    from jax.experimental import topologies

    t = topologies.get_topology_desc(platform="tpu", topology_name=topology)
    n = len(t.devices)
    axes = dict(mesh_shape) if mesh_shape else {"data": n}
    sz = 1
    for v in axes.values():
        sz *= v
    if sz != n:
        raise SystemExit(f"mesh {axes} needs {sz} chips but topology '{topology}' has {n}")

    from littlegan_tpu.parallel.mesh import make_mesh

    return make_mesh(axis_names=tuple(axes), shape=tuple(axes.values()), devices=t.devices)


def compiled_step_report(
    cfg, donate: bool = True, topology: str | None = None,
    mesh_shape: dict | None = None,
) -> dict:
    """Compile (never execute) the train step on the current backend and
    return XLA's memory analysis — or a parsed OOM verdict.

    On the tunneled TPU backend compilation is AOT (chipless), so this is a
    cheap, chip-accurate "does one training step fit" probe: a config past
    the HBM capacity fails at COMPILE time with the backend's
    "Ran out of memory in memory space hbm. Used X of Y" diagnosis (the
    detail rides the plugin's stderr tracing; the Python exception carries
    only the HTTP 500 — scripts/fit_frontier.py captures both). NOTE: this
    is the step alone — the production scan pipeline adds the device store
    (`device_data`) on top; budget that separately (uint8 dataset bytes).

    ``topology`` compiles the MULTI-CHIP production step (DP, or spatial
    when ``mesh_shape`` has a 'model' axis — honoring shard_opt_state /
    shard_dense / moment_dtype) for a TPU topology description instead:
    the memory analysis is then per chip OF THAT SLICE. This is how the
    2048² "multi-chip by construction" claim gets a compiled verdict
    without an actual multi-chip slice (docs/SCALING.md).

    ``donate=True`` matches the production step (trainer/bench donate the
    input state); donate=False double-counts the train state in the peak
    (input + output both live)."""
    import jax
    import jax.numpy as jnp

    from littlegan_tpu.training import create_train_state, make_train_step

    state_sh = jax.eval_shape(lambda: create_train_state(cfg, jax.random.PRNGKey(0)))
    accum = (cfg.grad_accum,) if cfg.grad_accum > 1 else ()
    img = jax.ShapeDtypeStruct(
        (*accum, cfg.batch_size, cfg.image_dim, cfg.image_dim, 3), jnp.dtype("float32")
    )
    cond = jax.ShapeDtypeStruct((*accum, cfg.batch_size, cfg.cond_dim), jnp.dtype("float32"))
    b = (img, cond)
    if topology is None:
        if accum:
            from littlegan_tpu.training.step import make_accum_train_step

            step = make_accum_train_step(cfg, state_sh.params, donate=donate)
        else:
            step = make_train_step(cfg, state_sh.params, donate=donate)
        backend = jax.devices()[0].platform
    else:
        mesh = topology_mesh(topology, mesh_shape)
        if accum:
            # accumulation composes with BOTH mesh kinds through one factory
            # (micro-batches sharded P(None, 'data'[, H over 'model']))
            from littlegan_tpu.training.step import make_accum_train_step

            step = make_accum_train_step(cfg, state_sh.params, donate=donate, mesh=mesh)
        elif "model" in mesh.axis_names:
            from littlegan_tpu.parallel.spatial import make_spatial_train_step

            step = make_spatial_train_step(cfg, state_sh.params, mesh, donate=donate)
        else:
            from littlegan_tpu.parallel.train import make_parallel_train_step

            step = make_parallel_train_step(cfg, state_sh.params, mesh, donate=donate)
        backend = f"{mesh.devices.flat[0].platform} topology {topology}"
    lowered = step.lower(state_sh, b, b, jax.random.PRNGKey(0), jnp.int32(11))
    comp = {"backend": backend, "donate": donate,
            "topology": topology, "mesh": mesh_shape if topology else None,
            "n_chips": int(mesh.size) if topology else 1}
    try:
        ma = lowered.compile().memory_analysis()
    except Exception as e:  # noqa: BLE001 — compile-OOM is a RESULT here
        msg = str(e)
        comp["fits"] = False
        comp["compile_error"] = msg[:500]
        m = re.search(
            r"Used ([0-9.]+)([MG]) of ([0-9.]+)([MG]) hbm", msg
        )
        if m:  # some backends put the OOM detail in the exception itself
            scale = {"M": 1 << 20, "G": 1 << 30}
            comp["oom_used_bytes"] = int(float(m.group(1)) * scale[m.group(2)])
            comp["hbm_capacity_bytes"] = int(float(m.group(3)) * scale[m.group(4)])
        return comp
    comp["fits"] = True
    comp.update(
        argument_bytes=int(ma.argument_size_in_bytes),
        output_bytes=int(ma.output_size_in_bytes),
        temp_bytes=int(ma.temp_size_in_bytes),
        peak_bytes=int(ma.peak_memory_in_bytes),
    )
    return comp


def _fmt(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:.2f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n:.2f} GiB"


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--mesh", default=None, help="e.g. 'data=8' or 'data=4,model=2'")
    p.add_argument("--shard-opt-state", action="store_true")
    p.add_argument("--shard-dense", action="store_true")
    p.add_argument("--moment-dtype", default="float32", choices=("float32", "bfloat16"))
    p.add_argument("--ema", type=float, default=0.0)
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize block internals in the backward (Config.remat) — "
        "affects only the --compile peak/temp numbers, not train-state bytes",
    )
    p.add_argument(
        "--grad-accum", type=int, default=1, metavar="M",
        help="compile the gradient-accumulation step instead: M micro-pairs "
        "of --batch rows per applied update (effective batch M x batch x "
        "n_data_chips) with ONE micro-pair's activations live — the lever "
        "when the full-batch step's --compile verdict is oom",
    )
    p.add_argument(
        "--adj-half", action="store_true",
        help="adjuster on one alternating N-row batch (Config.adj_half_batch) — "
        "affects only the --compile numbers",
    )
    p.add_argument(
        "--compile", action="store_true",
        help="also compile the train step on the current backend and report "
        "XLA's memory analysis — the 'does this resolution/batch fit one "
        "chip' number (single-device unless --topology)",
    )
    p.add_argument(
        "--topology", default=None, metavar="NAME",
        help="AOT-compile the MULTI-chip production step for a TPU topology "
        "description instead of the local device — e.g. 'v5e:2x4' (8 chips); "
        "pairs with --mesh for the axis split (a 'model' axis selects the "
        "spatial step; plain DP otherwise) and honors --shard-opt-state / "
        "--shard-dense / --moment-dtype. Implies --compile.",
    )
    args = p.parse_args()

    mesh_shape = None
    if args.mesh:
        mesh_shape = {}
        for part in args.mesh.split(","):
            k, v = part.split("=")
            mesh_shape[k.strip()] = int(v)

    from littlegan_tpu.config import Config
    from littlegan_tpu.parallel.zero import state_bytes_report

    cfg = Config(
        image_dim=args.dim,
        init_dim=args.dim // 16,
        batch_size=args.batch,
        compute_dtype="bfloat16",
        shard_opt_state=args.shard_opt_state,
        shard_dense=args.shard_dense,
        moment_dtype=args.moment_dtype,
        ema_decay=args.ema,
        remat=args.remat,
        grad_accum=args.grad_accum,
        adj_half_batch=args.adj_half,
        debug=True,
    )
    rep = state_bytes_report(cfg, mesh_shape)

    n_chips = 1
    if mesh_shape:
        for v in mesh_shape.values():
            n_chips *= v
    print(f"train-state memory @ {args.dim}² b{args.batch} "
          f"(mesh={mesh_shape or 'single chip'}, moment_dtype={args.moment_dtype}, "
          f"shard_opt_state={args.shard_opt_state}, shard_dense={args.shard_dense}, "
          f"ema={args.ema}):")
    for name in ("params", "opt_mu_nu", "ema"):
        r = rep[name]
        print(f"  {name:10s} global {_fmt(r['global_bytes']):>12s}   "
              f"per-chip {_fmt(r['per_chip_bytes']):>12s}")
    print(f"  {'TOTAL':10s} global {_fmt(rep['total_global_bytes']):>12s}   "
          f"per-chip {_fmt(rep['total_per_chip_bytes']):>12s}")

    out = {
        "dim": args.dim, "batch": args.batch, "mesh": mesh_shape,
        "moment_dtype": args.moment_dtype,
        "shard_opt_state": args.shard_opt_state, "shard_dense": args.shard_dense,
        "ema_decay": args.ema, "remat": args.remat, "grad_accum": args.grad_accum,
        "adj_half_batch": args.adj_half,
        **rep,
    }

    if args.compile or args.topology:
        comp = compiled_step_report(cfg, topology=args.topology, mesh_shape=mesh_shape)
        per = " per chip" if args.topology else ""
        if comp["fits"]:
            print(f"  compiled step ({comp['backend']}): args {_fmt(comp['argument_bytes'])}, "
                  f"out {_fmt(comp['output_bytes'])}, temp {_fmt(comp['temp_bytes'])}, "
                  f"peak {_fmt(comp['peak_bytes'])}{per}")
        else:
            used = comp.get("oom_used_bytes")
            print(f"  compiled step ({comp['backend']}): DOES NOT FIT{per}"
                  + (f" — needs {_fmt(used)}" if used else " (compile OOM)"))
        out["compiled"] = comp

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
