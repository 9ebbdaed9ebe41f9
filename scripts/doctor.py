"""Environment diagnosis: is this machine ready to train/serve/evaluate?

Usage:  python scripts/doctor.py [-e ENV] [--probe-timeout S]

Checks (PASS / WARN / FAIL per line, one JSON summary at the end):
- accelerator backend: liveness probe (the axon tunnel's failure mode is a
  HANG, utils/backend_probe.py), then device kind/count,
- native C++ JPEG loader: built and loadable (auto-build attempt),
- persistent compile cache: writable,
- optional interop deps: tensorflow (reference-checkpoint import, SavedModel
  export, TB oracle), torch (Inception weight conversion),
- config-resolved paths from the CURRENT DIRECTORY's config files:
  image_path / attr_path / fid_weights / evaluate_pre_calculated.

Exit code: 0 when everything needed for `train --synthetic-data` works
(backend + step compile), 1 otherwise. WARNs cover optional capabilities.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python scripts/doctor.py` without PYTHONPATH (same bootstrap
# as every other script here)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RESULTS = []


def _report(level: str, name: str, detail: str) -> None:
    _RESULTS.append({"check": name, "level": level, "detail": detail})
    print(f"[{level:4s}] {name}: {detail}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-e", "--env", default="sample")
    ap.add_argument("--probe-timeout", type=float, default=240.0)
    args = ap.parse_args(argv)

    del _RESULTS[:]  # main() may be called more than once in-process
    ok = True

    # --- backend liveness (BEFORE anything initializes jax) --------------
    from littlegan_tpu.utils.backend_probe import backend_may_hang, probe_backend

    if backend_may_hang():
        if probe_backend(args.probe_timeout):
            _report("PASS", "backend-probe", "tunneled accelerator answered device discovery")
        else:
            _report(
                "FAIL",
                "backend-probe",
                f"device discovery hung >{args.probe_timeout:.0f}s — tunnel down; "
                "run on CPU with `env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu`",
            )
            print(json.dumps({"ok": False, "results": _RESULTS}))
            return 1
    else:
        _report("PASS", "backend-probe", "not applicable (no hang-prone plugin in play)")

    from littlegan_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()  # same persistent cache every entry point uses

    import jax

    devs = jax.devices()
    _report("PASS", "devices", f"{len(devs)} x {devs[0].device_kind} (platform {devs[0].platform})")

    # --- one tiny train step compiles and runs ---------------------------
    try:
        t0 = time.perf_counter()
        from littlegan_tpu.config import Config
        from littlegan_tpu.data.synthetic import random_device_batch
        from littlegan_tpu.training import create_train_state
        from littlegan_tpu.training.step import make_train_step

        cfg = Config(
            batch_size=2, image_dim=16, init_dim=1, noise_dim=8,
            conv_filter=[16, 12, 8, 6, 4], compute_dtype="float32", debug=True,
        )
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, state.params, donate=False)
        b = random_device_batch(cfg, jax.random.PRNGKey(1))
        out = step(state, b, b, jax.random.PRNGKey(2), 11)
        jax.block_until_ready(out.metrics)
        _report("PASS", "train-step", f"tiny fused G+D+A step ran in {time.perf_counter()-t0:.1f}s (incl. compile)")
    except Exception as e:  # noqa: BLE001 — diagnosis tool reports, never crashes
        ok = False
        _report("FAIL", "train-step", f"{type(e).__name__}: {e}")

    # --- native loader ----------------------------------------------------
    try:
        from littlegan_tpu.data import native_loader

        native_loader._load_lib()
        _report("PASS", "native-loader", f"libloader.so loadable ({native_loader._LIB_PATH})")
    except Exception as e:  # noqa: BLE001
        _report("WARN", "native-loader", f"unavailable ({type(e).__name__}: {e}) — PIL fallback will be used")

    # --- compile cache -----------------------------------------------------
    cache_dir = jax.config.jax_compilation_cache_dir or "(unset)"
    if cache_dir != "(unset)" and os.access(cache_dir, os.W_OK):
        _report("PASS", "compile-cache", cache_dir)
    else:
        _report("WARN", "compile-cache", f"{cache_dir} not writable/enabled — cold compiles every run")

    # --- optional interop deps ---------------------------------------------
    for mod, why in (
        ("tensorflow", "reference-checkpoint import + SavedModel export"),
        ("torch", "Inception weight conversion (scripts/convert_inception.py)"),
    ):
        try:
            __import__(mod)
            _report("PASS", f"dep:{mod}", why)
        except ImportError:
            _report("WARN", f"dep:{mod}", f"not importable — {why} unavailable")

    # --- config-resolved paths ----------------------------------------------
    from littlegan_tpu.config import load_config

    cfg = load_config(args.env, {"mode": "train", "exp_name": "doctor"})
    for name, path, what in (
        ("image_path", cfg.image_path, "CelebA images (use --synthetic-data without it)"),
        ("attr_path", cfg.attr_path, "attribute list"),
        ("fid_weights", cfg.fid_weights, "real Inception weights (FID refuses without them)"),
        (
            "evaluate_pre_calculated",
            os.path.join(cfg.test_data_dir, cfg.evaluate_pre_calculated),
            "pre-calculated FID stats",
        ),
    ):
        if not path:
            _report("WARN", name, f"unset — {what}")
        elif os.path.exists(path):
            _report("PASS", name, path)
        else:
            _report("WARN", name, f"{path} missing — {what}")

    print(json.dumps({"ok": ok, "results": _RESULTS}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
