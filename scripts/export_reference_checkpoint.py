"""Export an experiment's latest checkpoint as a REFERENCE tf.train.Checkpoint.

The inverse of scripts/convert_reference_checkpoint.py — completes two-way
migration: train here, hand the resulting directory to the original
IXarea/LittleGAN repo and its restore consumes it unmodified
(eager_trainer.py:37-43 — tf.train.latest_checkpoint over
``result/<exp>/checkpoint`` plus optional status.json {'epoch': next}).
Weights AND the three v1 Adam optimizers' slots/beta powers are exported,
so reference-side training RESUMES rather than restarting the optimizers.

Usage:
    python scripts/export_reference_checkpoint.py <exp_name> [-e ENV] \
        [--out DIR] [--tag N] [--ema]

``--ema`` exports the EMA generator weights (when the run trained with
ema_decay) instead of the live ones; optimizer moments still describe the
live trajectory — use it for inference-quality handoff, not exact resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("exp_name")
    ap.add_argument("-e", "--env", default="sample")
    ap.add_argument(
        "--out", default=None, help="output dir (default result/<exp>/model/reference-checkpoint)"
    )
    ap.add_argument(
        "--tag", default=None,
        help="checkpoint epoch tag (default: the restored checkpoint's own tag)",
    )
    ap.add_argument(
        "--ema", action="store_true",
        help="export EMA generator weights (inference handoff, not exact resume)",
    )
    args = ap.parse_args(argv)

    import jax

    from littlegan_tpu.compat.reference_checkpoint import export_reference_checkpoint
    from littlegan_tpu.config import load_config
    from littlegan_tpu.training.checkpoint import make_checkpointer
    from littlegan_tpu.training.state import create_train_state

    cfg = load_config(env=args.env, overrides={"exp_name": args.exp_name, "mode": "export-model"})
    template = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    ck = make_checkpointer(cfg, os.path.join(cfg.result_dir, "checkpoint"))
    state, status = ck.restore_latest(template)
    if state is None:
        raise FileNotFoundError(
            f"no checkpoint under {cfg.result_dir}/checkpoint — train first"
        )
    tag = args.tag
    if tag is None:
        # reference names each save after the epoch it finished; our status
        # epoch is the NEXT epoch to train (trainer.py restore contract)
        ep = status.get("epoch") if isinstance(status, dict) else None
        tag = str(ep - 1) if isinstance(ep, int) and ep > 1 else "1"
    out = args.out or os.path.join(cfg.result_dir, "model", "reference-checkpoint")
    summary = export_reference_checkpoint(
        state, out, tag=tag, beta_1=cfg.beta_1, beta_2=cfg.beta_2, use_ema=args.ema
    )
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
