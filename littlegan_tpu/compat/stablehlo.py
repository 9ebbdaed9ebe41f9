"""StableHLO export of the inference entry points (``jax.export``).

The SavedModel path (compat/savedmodel.py) targets TF-Serving; this one
targets everything else: ``jax.export`` serializes the jitted forwards to
StableHLO — the portable compiler IR any XLA/IREE-class runtime consumes —
with symbolic (batch-polymorphic) shapes and multi-platform lowerings.
Beyond-reference capability (the reference's only export is a TF
checkpoint, eager_trainer.py:300-303).

Artifacts per entry point, under ``<out_dir>/``:

- ``<name>.stablehlo.mlir``  — human-readable StableHLO module text,
- ``<name>.jaxexport.bin``   — the serialized ``jax.export.Exported``
  (versioned, stable across jax releases; reload with
  ``jax.export.deserialize(...).call(*args)``),
- ``manifest.json``          — input/output shapes+dtypes, platforms,
  calling-convention version, per-file byte sizes.

Weights ride INSIDE the module as constants (same as a SavedModel): the
artifact is self-contained — no checkpoint needed at load time.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

from littlegan_tpu.config import Config

ENTRY_POINTS = ("generate", "adjust", "discriminate")


def _entry_fns(cfg: Config, params):
    """f32 pure fns over baked-in params (mirrors savedmodel.py's trio)."""
    import jax
    import jax.numpy as jnp

    from littlegan_tpu.models import (
        adjuster_apply,
        discriminator_apply,
        generator_apply,
    )

    ecfg = cfg.replace(compute_dtype="float32", use_pallas=False, use_pallas_boundary=False)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    def gen_fn(noise, cond):
        return generator_apply(params, noise, cond, ecfg).astype(jnp.float32)

    def adj_fn(image, cond):
        return adjuster_apply(params, image, cond, ecfg).astype(jnp.float32)

    def disc_fn(image):
        pr, cond = discriminator_apply(params, image, ecfg)
        return {"pr": pr.astype(jnp.float32), "cond": cond.astype(jnp.float32)}

    return {"generate": gen_fn, "adjust": adj_fn, "discriminate": disc_fn}


def export_stablehlo(
    cfg: Config,
    params: Any,
    out_dir: str,
    include: tuple = ENTRY_POINTS,
    platforms: Optional[tuple] = None,
) -> str:
    """Write StableHLO artifacts for ``include`` to ``out_dir``.

    ``platforms``: lowering targets baked into the artifact (default: try
    ``("cpu", "tpu")`` so one file serves both; falls back to the current
    backend alone if the toolchain rejects one of them — e.g. a kernel
    with no lowering for that platform)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fns = _entry_fns(cfg, params)
    b = jexport.symbolic_shape("b")
    h = w = cfg.image_dim
    c = cfg.image_channel
    f32 = jnp.float32
    arg_specs = {
        "generate": (
            jax.ShapeDtypeStruct((*b, cfg.noise_dim), f32),
            jax.ShapeDtypeStruct((*b, cfg.cond_dim), f32),
        ),
        "adjust": (
            jax.ShapeDtypeStruct((*b, h, w, c), f32),
            jax.ShapeDtypeStruct((*b, cfg.cond_dim), f32),
        ),
        "discriminate": (jax.ShapeDtypeStruct((*b, h, w, c), f32),),
    }

    unknown = set(include) - set(ENTRY_POINTS)
    if unknown or not include:
        raise ValueError(f"include must be a non-empty subset of {ENTRY_POINTS}, got {include!r}")

    os.makedirs(out_dir, exist_ok=True)
    manifest: Dict[str, Any] = {"entry_points": {}, "image_dim": cfg.image_dim}

    for name in include:
        specs = arg_specs[name]

        def _export(plats):
            kw = {"platforms": plats} if plats else {}
            return jexport.export(jax.jit(fns[name]), **kw)(*specs)

        try:
            exp = _export(platforms or ("cpu", "tpu"))
        except Exception:
            if platforms is not None:
                raise  # an explicit platform request must not degrade silently
            exp = _export(None)  # current backend only

        mlir_path = os.path.join(out_dir, f"{name}.stablehlo.mlir")
        bin_path = os.path.join(out_dir, f"{name}.jaxexport.bin")
        with open(mlir_path, "w") as f:
            f.write(exp.mlir_module())
        blob = exp.serialize()
        with open(bin_path, "wb") as f:
            f.write(blob)
        manifest["entry_points"][name] = {
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
            "platforms": list(exp.platforms),
            "calling_convention_version": exp.calling_convention_version,
            "mlir_bytes": os.path.getsize(mlir_path),
            "serialized_bytes": len(blob),
        }

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


def export_experiment(cfg: Config, out_dir: Optional[str] = None, **kw) -> str:
    """Export the experiment's latest checkpoint (EMA weights when present)
    to ``result/<exp>/model/stablehlo`` by default."""
    import jax

    from littlegan_tpu.training.checkpoint import make_checkpointer
    from littlegan_tpu.training.state import create_train_state, eval_params

    template = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    ck = make_checkpointer(cfg, os.path.join(cfg.result_dir, "checkpoint"))
    state, _ = ck.restore_latest(template)
    if state is None:
        raise FileNotFoundError(
            f"no checkpoint under {cfg.result_dir}/checkpoint — train first"
        )
    if out_dir is None:
        out_dir = os.path.join(cfg.result_dir, "model", "stablehlo")
    return export_stablehlo(cfg, eval_params(state), out_dir, **kw)
