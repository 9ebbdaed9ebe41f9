"""Guard against a HUNG accelerator backend (the axon tunnel failure mode).

This container reaches its TPU chip over a tunnel that sometimes fails by
HANGING device discovery rather than erroring (``jax.devices()`` never
returns — observed 2026-08-17/18 for hours at a stretch). Any entry point
that would initialize that backend then hangs forever with no message. The
cure is cheap: probe device discovery in a SUBPROCESS with a timeout before
the real process initializes its backend.

Scope: probes only when the axon plugin would actually be used
(``PALLAS_AXON_POOL_IPS`` set, and ``JAX_PLATFORMS`` absent or naming axon —
note the image EXPORTS ``JAX_PLATFORMS=axon``, so a set value does not mean
the user pinned a different backend). On a live chip the probe costs one
small python startup + device query (~10-20 s over the tunnel); set
``LITTLEGAN_SKIP_BACKEND_PROBE=1`` to skip it entirely.

Must be importable without initializing jax (callers probe BEFORE their
first backend touch).
"""

from __future__ import annotations

import os
import subprocess
import sys

SKIP_ENV = "LITTLEGAN_SKIP_BACKEND_PROBE"


def backend_may_hang() -> bool:
    """Would this process initialize the (hang-prone) axon backend?"""
    if os.environ.get(SKIP_ENV):
        return False
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    return not platforms or "axon" in platforms


def probe_backend(timeout_s: float = 240.0) -> bool:
    """True iff device discovery completes within ``timeout_s`` (or the
    probe is not applicable). Runs in a subprocess so a hang cannot leak."""
    if not backend_may_hang():
        return True
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def ensure_live_backend_or_exit(timeout_s: float = 240.0) -> None:
    """CLI guard: fail FAST with remediation text instead of hanging."""
    if not probe_backend(timeout_s):
        raise SystemExit(
            f"ERROR: accelerator device discovery did not complete within "
            f"{timeout_s:.0f}s — the TPU tunnel looks unresponsive (a known "
            "failure mode of this container; it usually recovers on its "
            "own). Options: retry later; run on CPU with "
            "`env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu ...`; or skip "
            f"this check with {SKIP_ENV}=1."
        )
