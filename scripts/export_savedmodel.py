"""Export an experiment's latest checkpoint as a TensorFlow SavedModel.

Usage:
    python scripts/export_savedmodel.py <exp_name> [-e ENV] [--out DIR] \
        [--only generate,adjust,discriminate]

Loads config with the CLI's 3-layer merge (cwd sample.config.json ->
<env>.config.json), restores the latest checkpoint (EMA generator weights
when the run trained with ema_decay), and writes a SavedModel with
``generate`` / ``adjust`` / ``discriminate`` signatures (batch-polymorphic,
float32, TF-Serving ready). See littlegan_tpu/compat/savedmodel.py.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("exp_name")
    ap.add_argument("-e", "--env", default="sample")
    ap.add_argument("--out", default=None, help="output dir (default result/<exp>/model/savedmodel)")
    ap.add_argument(
        "--only",
        default="generate,adjust,discriminate",
        help="comma-separated subset of signatures to export",
    )
    args = ap.parse_args(argv)

    from littlegan_tpu.compat.savedmodel import export_experiment
    from littlegan_tpu.config import load_config

    cfg = load_config(env=args.env, overrides={"exp_name": args.exp_name, "mode": "export-model"})
    include = tuple(s.strip() for s in args.only.split(",") if s.strip())
    out = export_experiment(cfg, out_dir=args.out, include=include)
    print(f"SavedModel written to {out} (signatures: {', '.join(include)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
