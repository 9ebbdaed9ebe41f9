"""Export trained models as a TensorFlow SavedModel (jax2tf).

The reference lives in the TF ecosystem; its users deploy with TF tooling.
``export-model`` (trainer.py export_model_checkpoint) covers the reference's
weights-only export (eager_trainer.py:300-303) — this module goes the other
direction of compat/reference_checkpoint.py: OUR trained weights leave as a
standard SavedModel that `tf.saved_model.load` / TF Serving consume with no
JAX anywhere, with named signatures for all three entry points:

- ``generate(noise[b,noise_dim], cond[b,cond_dim]) -> image [b,H,W,3]``
- ``adjust(image[b,H,W,3], cond[b,cond_dim]) -> image [b,H,W,3]``
- ``discriminate(image[b,H,W,3]) -> {'pr': [b,1], 'cond': [b,cond_dim]}``

Batch is shape-polymorphic (jax2tf polymorphic_shapes) so one export serves
any batch size. Images are [-1,1] float32 NHWC, exactly the in-framework
contract (utils/image.py rescaling helpers are the caller's job, as in
serving.py). Weights are the EMA generator subtrees when the checkpoint
carries them (training/state.py eval_params — same policy as predict/
export/serving). Inference runs dropout-free like every predict path (the
reference's dropout is inert at its 0.5 default anyway, model.py:25).

TensorFlow is imported lazily; everything else in the package works without
it.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from littlegan_tpu.config import Config


def export_saved_model(
    cfg: Config,
    params: Any,
    out_dir: str,
    include: tuple = ("generate", "adjust", "discriminate"),
) -> str:
    """Write a SavedModel of ``params`` to ``out_dir``; returns ``out_dir``.

    ``params``: the full shared pytree (pass ``eval_params(state)`` to get
    EMA weights). ``include``: which signatures to export.
    """
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError("SavedModel export needs tensorflow (jax2tf backend)") from e

    import jax
    import jax.numpy as jnp

    from littlegan_tpu.models import adjuster_apply, discriminator_apply, generator_apply

    # f32 export regardless of the training compute dtype: a SavedModel's
    # consumers expect float32, and eval-path casts at the jit boundary are
    # the in-framework convention too (generator_apply docstring)
    ecfg = cfg.replace(compute_dtype="float32", use_pallas=False, use_pallas_boundary=False)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    def gen_fn(noise, cond):
        return generator_apply(params, noise, cond, ecfg).astype(jnp.float32)

    def adj_fn(image, cond):
        return adjuster_apply(params, image, cond, ecfg).astype(jnp.float32)

    def disc_fn(image):
        pr, cond = discriminator_apply(params, image, ecfg)
        return {"pr": pr.astype(jnp.float32), "cond": cond.astype(jnp.float32)}

    h = w = ecfg.image_dim
    c = ecfg.image_channel
    spec_noise = tf.TensorSpec([None, ecfg.noise_dim], tf.float32, name="noise")
    spec_cond = tf.TensorSpec([None, ecfg.cond_dim], tf.float32, name="cond")
    spec_image = tf.TensorSpec([None, h, w, c], tf.float32, name="image")

    module = tf.Module()
    signatures: Dict[str, Any] = {}

    def add(name, jax_fn, poly, specs):
        tf_fn = tf.function(
            jax2tf.convert(jax_fn, with_gradient=False, polymorphic_shapes=poly),
            autograph=False,
            input_signature=specs,
        )
        setattr(module, name, tf_fn)
        signatures[name] = tf_fn.get_concrete_function(*specs)

    if "generate" in include:
        add("generate", gen_fn, ["(b, _)", "(b, _)"], [spec_noise, spec_cond])
    if "adjust" in include:
        add("adjust", adj_fn, ["(b, _, _, _)", "(b, _)"], [spec_image, spec_cond])
    if "discriminate" in include:
        add("discriminate", disc_fn, ["(b, _, _, _)"], [spec_image])
    if not signatures:
        raise ValueError(f"nothing to export: include={include!r}")

    os.makedirs(out_dir, exist_ok=True)
    tf.saved_model.save(module, out_dir, signatures=signatures)
    return out_dir


def export_experiment(cfg: Config, out_dir: Optional[str] = None, **kw) -> str:
    """Export the experiment's latest checkpoint (EMA weights when present).

    Restores like the trainer does (restore_latest over
    ``result/<exp>/checkpoint``), picks ``eval_params``, writes the
    SavedModel to ``out_dir`` (default ``result/<exp>/model/savedmodel``).
    """
    import jax

    from littlegan_tpu.training.checkpoint import make_checkpointer
    from littlegan_tpu.training.state import create_train_state, eval_params

    template = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    ck = make_checkpointer(cfg, os.path.join(cfg.result_dir, "checkpoint"))
    state, _ = ck.restore_latest(template)
    if state is None:
        raise FileNotFoundError(
            f"no checkpoint under {cfg.result_dir}/checkpoint — train first "
            "(or convert a reference checkpoint, scripts/convert_reference_checkpoint.py)"
        )
    if out_dir is None:
        out_dir = os.path.join(cfg.result_dir, "model", "savedmodel")
    return export_saved_model(cfg, eval_params(state), out_dir, **kw)
