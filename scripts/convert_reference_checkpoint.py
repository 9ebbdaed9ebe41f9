"""Convert a reference (IXarea/LittleGAN) tf.train.Checkpoint into a native
littlegan_tpu checkpoint.

The reference saves one object-based TF checkpoint per epoch plus an
``interrupt`` one (eager_trainer.py:31-36,172,229). This script imports the
weights — and, when recoverable, the three v1 Adam optimizers' moments and
bias-correction counts — into the npz TrainState format
(training/checkpoint.py), so a reference user's trained model keeps working
here: drop the output directory in as ``result/<exp>/checkpoint/`` and
``train`` resumes from it; every sampling/eval mode reads it too.

Usage:
    python scripts/convert_reference_checkpoint.py \
        /ref/result/exp/checkpoint out_ckpt_dir [--tag 40] \
        [--beta-1 0.5 --beta-2 0.9] [--no-optimizers] [--weights-only]

``--beta-1/--beta-2`` must match what the reference TRAINED with (its
args.beta_1/beta_2 — v1 Adam stores only the resulting beta POWERS, so the
betas are needed to invert them into an apply count). The inferred
architecture (conv_filter, dims...) is printed as JSON: set the same values
in your <env>.config.json before resuming.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="reference checkpoint dir (result/<exp>/checkpoint) or prefix")
    ap.add_argument("out_dir", help="output directory for the native checkpoint")
    ap.add_argument("--tag", default=None, help="checkpoint tag (default: from source status.json, else 0)")
    ap.add_argument("--beta-1", type=float, default=0.5, help="G/D Adam beta_1 the reference trained with")
    ap.add_argument("--beta-2", type=float, default=0.9, help="G/D Adam beta_2 the reference trained with")
    ap.add_argument("--no-optimizers", action="store_true", help="import weights only; fresh Adam state")
    ap.add_argument(
        "--weights-only",
        action="store_true",
        help="write just the param tree (export-model format) instead of a resumable TrainState",
    )
    args = ap.parse_args(argv)

    from littlegan_tpu.compat import convert_reference_checkpoint

    summary = convert_reference_checkpoint(
        args.src,
        args.out_dir,
        tag=args.tag,
        beta_1=args.beta_1,
        beta_2=args.beta_2,
        import_optimizers=not args.no_optimizers,
        weights_only=args.weights_only,
    )
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
