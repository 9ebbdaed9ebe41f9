"""Persistent XLA compilation cache for all entry points.

Remote (axon) TPU compiles of the big programs here (the fused train step,
the InceptionV3 graph) take minutes; the persistent cache makes every
process after the first start instantly. Called by cli.py, bench.py,
serving.py and the eval driver. Opt out with LITTLEGAN_JAX_CACHE=0.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/littlegan_jax_cache"


def enable_compilation_cache(directory: str | None = None) -> None:
    if os.environ.get("LITTLEGAN_JAX_CACHE", "1") == "0":
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", directory or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: fail open


def tpu_compiler_options(cfg=None) -> dict | None:
    """Per-jit XLA compiler options for TPU backends (None elsewhere —
    TPU-only option names would fail CPU compiles).

    ``scoped_vmem_kib``: swept on v5e at reference scale, 32 MiB beats the
    16 MiB default by ~2% step time; see Config.scoped_vmem_kib."""
    import jax

    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    kib = getattr(cfg, "scoped_vmem_kib", 32768) if cfg is not None else 32768
    opts: dict = {}
    if kib:
        opts["xla_tpu_scoped_vmem_limit_kib"] = str(int(kib))
    # free-form per-jit options (Config.xla_options); user keys win
    extra = getattr(cfg, "xla_options", None) if cfg is not None else None
    if extra:
        opts.update({str(k): str(v) for k, v in extra.items()})
    return opts or None
