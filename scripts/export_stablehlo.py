"""Export an experiment's latest checkpoint as StableHLO artifacts.

Usage:
    python scripts/export_stablehlo.py <exp_name> [-e ENV] [--out DIR] \
        [--only generate,adjust,discriminate]

Loads config with the CLI's 3-layer merge (cwd sample.config.json ->
<env>.config.json), restores the latest checkpoint (EMA generator weights
when the run trained with ema_decay), and writes per-entry-point
``*.stablehlo.mlir`` (IR text) + ``*.jaxexport.bin`` (serialized
``jax.export.Exported`` — reload with ``jax.export.deserialize``) with
batch-polymorphic shapes and cpu+tpu lowerings. See
littlegan_tpu/compat/stablehlo.py.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("exp_name")
    ap.add_argument("-e", "--env", default="sample")
    ap.add_argument("--out", default=None, help="output dir (default result/<exp>/model/stablehlo)")
    ap.add_argument(
        "--only",
        default="generate,adjust,discriminate",
        help="comma-separated subset of entry points to export",
    )
    args = ap.parse_args(argv)

    from littlegan_tpu.compat.stablehlo import export_experiment
    from littlegan_tpu.config import load_config

    cfg = load_config(env=args.env, overrides={"exp_name": args.exp_name, "mode": "export-model"})
    include = tuple(s.strip() for s in args.only.split(",") if s.strip())
    out = export_experiment(cfg, out_dir=args.out, include=include)
    print(f"StableHLO artifacts written to {out} (entry points: {', '.join(include)})")
    return 0


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
