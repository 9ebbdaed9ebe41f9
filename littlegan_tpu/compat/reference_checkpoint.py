"""Import reference ``tf.train.Checkpoint`` files into littlegan_tpu.

The reference trains with an object-based TF checkpoint of its three Keras
models + three v1 Adam optimizers (eager_trainer.py:31-36) and saves one per
epoch (eager_trainer.py:229). A reference user switching to this framework
brings those files along; this module converts them into a native
``TrainState`` checkpoint (training/checkpoint.py npz format) so training
RESUMES where the reference left off — weights and, when recoverable, Adam
moments and bias-correction counts included.

Key schema (verified against an in-container ``tf.train.Checkpoint`` of a
module graph with the reference's exact attribute names and sharing,
tests/test_reference_ckpt.py):

- every variable is ``<object path>/.ATTRIBUTES/VARIABLE_VALUE`` where the
  object path concatenates attribute names from the checkpoint root
  (model.py:6-136 names: ``conv1..4``/``norm1..4`` in Encoder/Decoder,
  ``dense_pr``/``dense_cond`` on Discriminator, ``dense``/``norm``/``conv``
  on Generator/Adjuster);
- SHARED modules (Adjuster = D.encoder + G.decoder + G.conv,
  model.py:119-123) are serialized ONCE, under whichever root the object
  graph traversal reaches first (alphabetically ``adjuster`` in practice) —
  the mapper accepts every root the sharing permits;
- v1 Adam slots ride the VARIABLE's path:
  ``<var path>/.OPTIMIZER_SLOT/<optimizer kwarg name>/{m,v}/...``;
- each optimizer's shared bias-correction powers are
  ``<optimizer kwarg name>/beta{1,2}_power/...`` — after ``t`` applies the
  stored value is ``beta^(t+1)`` (v1 initializes the power to beta and
  multiplies AFTER each apply), so ``t = log(power)/log(beta) - 1``.

TensorFlow is imported lazily and only for reading the checkpoint; the
mapping itself is pure numpy (testable without TF).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from littlegan_tpu.config import Config

_VAR_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"
_SLOT_MARK = "/.OPTIMIZER_SLOT/"

# bias correction beyond ~1e3 D/G applies is numerically converged (the
# reference's beta powers underflow: 0.5^t, 0.9^t); any large count yields
# bit-identical updates, so an exact t is unrecoverable AND irrelevant
_CONVERGED_COUNT = 1 << 20

# our optimizer subtrees -> (reference Checkpoint kwarg, (beta_1, beta_2)).
# G/D betas are config-driven (eager_trainer.py:28-29 uses args.beta_1/2);
# the adjuster optimizer uses v1 defaults (eager_trainer.py:30, step.py).
_OPT_SOURCES = {
    "opt_g": ("generator_optimizer", None),
    "opt_d": ("discriminator_optimizer", None),
    "opt_a": ("adjuster_optimizer", (0.9, 0.999)),
}


def read_reference_variables(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint's variables as {logical path: array}.

    ``path``: a checkpoint prefix (``.../checkpoint/17-1``) or a directory
    containing TF's ``checkpoint`` state file (the reference's
    ``result/<exp>/checkpoint/`` — resolves to the latest save). Logical
    paths have ``/.ATTRIBUTES/VARIABLE_VALUE`` stripped; bookkeeping keys
    (object graph, save_counter) are dropped.
    """
    try:
        import tensorflow as tf  # noqa: PLC0415 — heavyweight, lazy
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "reading reference checkpoints needs tensorflow (only for "
            "tf.train.load_checkpoint; the conversion itself is numpy)"
        ) from e

    prefix = path
    if os.path.isdir(path):
        prefix = tf.train.latest_checkpoint(path)
        if prefix is None:
            raise FileNotFoundError(
                f"no TF checkpoint state in {path!r} (expected the "
                "reference's result/<exp>/checkpoint directory or an "
                "explicit checkpoint prefix)"
            )
    reader = tf.train.load_checkpoint(prefix)
    out: Dict[str, np.ndarray] = {}
    for key in reader.get_variable_to_shape_map():
        if not key.endswith(_VAR_SUFFIX):
            continue  # _CHECKPOINTABLE_OBJECT_GRAPH and friends
        logical = key[: -len(_VAR_SUFFIX)]
        if logical == "save_counter":
            continue
        out[logical] = np.asarray(reader.get_tensor(key))
    return out


def _pick(
    variables: Dict[str, np.ndarray], roots: Tuple[str, ...], leaf: str
) -> Tuple[np.ndarray, str]:
    """Fetch ``<root>/<leaf>`` under the first root that has it.

    Shared modules serialize under exactly one root; if a (non-standard)
    checkpoint carries several they must agree.
    """
    hits = [(f"{r}/{leaf}", variables[f"{r}/{leaf}"]) for r in roots if f"{r}/{leaf}" in variables]
    if not hits:
        raise KeyError(
            f"reference checkpoint is missing {leaf!r} under any of {roots} "
            "— not a LittleGAN training checkpoint?"
        )
    first_path, first = hits[0]
    for p, arr in hits[1:]:
        if not np.array_equal(arr, first):
            raise ValueError(f"conflicting duplicates for {leaf!r}: {first_path} vs {p}")
    return first, first_path


# roots each module may serialize under (object-graph dedup order is an
# implementation detail of TF's traversal — accept every sharing-legal root)
_ENC_ROOTS = ("adjuster/encoder", "discriminator/encoder")
_DEC_ROOTS = ("adjuster/decoder", "generator/decoder")
_OUT_ROOTS = ("adjuster/conv", "generator/conv")


def variables_to_params(
    variables: Dict[str, np.ndarray],
) -> Tuple[Dict[str, Any], Dict[str, str], Dict[str, Any]]:
    """Map reference variables onto our shared param pytree.

    Returns ``(params, sources, inferred)``:
    - ``params``: the ``encoder/decoder/g_head/out_conv/d_head/adj_head``
      tree (models/littlegan.py layout; kernels copy straight through —
      Conv2D HWIO and Conv2DTranspose HWOI match ops/conv.py exactly),
    - ``sources``: our leaf path -> reference logical path (slot lookups),
    - ``inferred``: Config kwargs recovered from the weight shapes.
    """
    sources: Dict[str, str] = {}

    def take(roots: Tuple[str, ...], leaf: str, our_path: str) -> np.ndarray:
        arr, src = _pick(variables, roots if isinstance(roots, tuple) else (roots,), leaf)
        sources[our_path] = src
        return arr

    def block(roots: Tuple[str, ...], i: int, our: str) -> Dict[str, Any]:
        return {
            "conv": {
                "kernel": take(roots, f"conv{i}/kernel", f"{our}/block{i}/conv/kernel"),
                "bias": take(roots, f"conv{i}/bias", f"{our}/block{i}/conv/bias"),
            },
            "norm": {
                "gamma": take(roots, f"norm{i}/gamma", f"{our}/block{i}/norm/gamma"),
                "beta": take(roots, f"norm{i}/beta", f"{our}/block{i}/norm/beta"),
            },
        }

    params = {
        "encoder": {f"block{i}": block(_ENC_ROOTS, i, "encoder") for i in range(1, 5)},
        "decoder": {f"block{i}": block(_DEC_ROOTS, i, "decoder") for i in range(1, 5)},
        "g_head": {
            "dense": {
                "kernel": take(("generator",), "dense/kernel", "g_head/dense/kernel"),
                "bias": take(("generator",), "dense/bias", "g_head/dense/bias"),
            },
            "norm": {
                "gamma": take(("generator",), "norm/gamma", "g_head/norm/gamma"),
                "beta": take(("generator",), "norm/beta", "g_head/norm/beta"),
            },
        },
        "out_conv": {
            "kernel": take(_OUT_ROOTS, "kernel", "out_conv/kernel"),
            "bias": take(_OUT_ROOTS, "bias", "out_conv/bias"),
        },
        "d_head": {
            "pr": {
                "kernel": take(("discriminator",), "dense_pr/kernel", "d_head/pr/kernel"),
                "bias": take(("discriminator",), "dense_pr/bias", "d_head/pr/bias"),
            },
            "cond": {
                "kernel": take(("discriminator",), "dense_cond/kernel", "d_head/cond/kernel"),
                "bias": take(("discriminator",), "dense_cond/bias", "d_head/cond/bias"),
            },
        },
        "adj_head": {
            "dense": {
                "kernel": take(("adjuster",), "dense/kernel", "adj_head/dense/kernel"),
                "bias": take(("adjuster",), "dense/bias", "adj_head/dense/bias"),
            },
            "norm": {
                "gamma": take(("adjuster",), "norm/gamma", "adj_head/norm/gamma"),
                "beta": take(("adjuster",), "norm/beta", "adj_head/norm/beta"),
            },
        },
    }

    # --- infer the architecture knobs the shapes pin down ----------------
    # encoder conv_i: conv_filter[4-i] output channels (model.py:13-15);
    # decoder conv_i: conv_filter[i] (model.py:37-40)
    enc1 = params["encoder"]["block1"]["conv"]["kernel"]
    conv_filter = [int(params["encoder"]["block4"]["conv"]["kernel"].shape[3])] + [
        int(params["decoder"][f"block{i}"]["conv"]["kernel"].shape[2]) for i in range(1, 5)
    ]
    cond_kernel = params["d_head"]["cond"]["kernel"]
    g_dense = params["g_head"]["dense"]["kernel"]
    feat = int(g_dense.shape[1])
    init_dim = math.isqrt(feat // conv_filter[0])
    if init_dim * init_dim * conv_filter[0] != feat:
        raise ValueError(
            f"generator dense width {feat} is not init_dim^2 * conv_filter[0] "
            f"(conv_filter[0]={conv_filter[0]}) — unrecognized architecture"
        )
    inferred: Dict[str, Any] = {
        "kernel_size": int(enc1.shape[0]),
        "image_channel": int(enc1.shape[2]),
        "conv_filter": conv_filter,
        "attr": list(range(int(cond_kernel.shape[1]))),  # cond_dim = len(attr)
        "noise_dim": int(g_dense.shape[0]) - int(cond_kernel.shape[1]),
        "init_dim": init_dim,
        # 4 stride-2 decoder doublings from init_dim (model.py:37-40)
        "image_dim": init_dim * 16,
    }

    # cross-check against our init layout: same treedef, same shapes
    import jax

    template = _template_params(inferred)
    t_leaves = jax.tree_util.tree_leaves_with_path(template)
    got = {p: l for p, l in jax.tree_util.tree_leaves_with_path(params)}
    for path, tmpl in t_leaves:
        if path not in got:
            raise ValueError(f"converted tree is missing {path} vs inferred config")
        if tuple(got[path].shape) != tuple(tmpl.shape):
            raise ValueError(
                f"converted leaf {path} shape {got[path].shape} != "
                f"{tuple(tmpl.shape)} expected from the inferred config"
            )
    if len(got) != len(t_leaves):
        extra = set(got) - {p for p, _ in t_leaves}
        raise ValueError(f"converted tree has unexpected leaves: {sorted(map(str, extra))}")
    return params, sources, inferred


def _template_params(inferred: Dict[str, Any]):
    import jax

    from littlegan_tpu.models import init_params

    return init_params(Config(**inferred), jax.random.PRNGKey(0))


def _derive_count(
    variables: Dict[str, np.ndarray], opt_name: str, betas: Tuple[float, float]
) -> Optional[int]:
    """Number of v1 ``apply_gradients`` calls, from the stored beta powers.

    Returns None when the optimizer never ran (no powers saved). Prefers
    beta2 (slower decay -> wider exact range); when both powers have
    underflowed the count only matters through 1-beta^t which is exactly 1.0
    in float, so any converged count reproduces the updates bit-for-bit.
    """
    b1p = variables.get(f"{opt_name}/beta1_power")
    b2p = variables.get(f"{opt_name}/beta2_power")
    if b1p is None and b2p is None:
        return None
    for power, beta in ((b2p, betas[1]), (b1p, betas[0])):
        if power is None:
            continue
        p = float(power)
        if 1e-290 < p < 1.0:
            return max(int(round(math.log(p) / math.log(beta))) - 1, 0)
        if p >= 1.0:  # freshly created, never applied (power == beta^1 > ...)
            return 0
    return _CONVERGED_COUNT


def _import_opt_state(
    variables: Dict[str, np.ndarray],
    sub_params: Dict[str, Any],
    sources: Dict[str, str],
    opt_name: str,
    betas: Tuple[float, float],
):
    """AdamState for one optimizer: v1 slots m/v -> mu/nu, shared count."""
    import jax
    import jax.numpy as jnp

    from littlegan_tpu.training.optimizer import AdamState

    count = _derive_count(variables, opt_name, betas)

    def leaf_state(path, leaf, slot):
        src = sources[_path_str(path)]
        key = f"{src}{_SLOT_MARK}{opt_name}/{slot}"
        arr = variables.get(key)
        if arr is None:  # var never reached an apply under this optimizer
            return jnp.zeros_like(jnp.asarray(leaf), dtype=jnp.float32)
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"slot {key} shape {arr.shape} != param {np.shape(leaf)}")
        return jnp.asarray(arr, jnp.float32)

    def with_path(fn):
        return jax.tree_util.tree_map_with_path(fn, sub_params)

    c = jnp.int32(0 if count is None else min(count, np.iinfo(np.int32).max))
    return AdamState(
        count=jax.tree_util.tree_map(lambda _: c, sub_params),
        mu=with_path(lambda p, l: leaf_state(p, l, "m")),
        nu=with_path(lambda p, l: leaf_state(p, l, "v")),
    ), count


def _path_str(path) -> str:
    from littlegan_tpu.utils.tree import path_str

    return path_str(path)


def variables_to_train_state(
    variables: Dict[str, np.ndarray],
    beta_1: float = 0.5,
    beta_2: float = 0.9,
    import_optimizers: bool = True,
):
    """Full ``TrainState`` from reference variables.

    ``beta_1``/``beta_2`` are the G/D Adam betas the reference TRAINED with
    (its args.beta_1/args.beta_2 — needed to invert the beta powers into an
    apply count; the values themselves are not stored in the checkpoint).
    Returns ``(state, inferred_cfg_kwargs, report)``; ``report`` maps each
    optimizer to its recovered apply count (None = never ran, 'converged' =
    powers underflowed, exact count irrelevant by arithmetic).
    """
    from littlegan_tpu.training.optimizer import adam_init
    from littlegan_tpu.training.state import A_KEYS, D_KEYS, G_KEYS, TrainState, subtree

    params_np, sources, inferred = variables_to_params(variables)
    import jax.numpy as jnp
    import jax

    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params_np)

    report: Dict[str, Any] = {}
    opts = {}
    for field, keys in (("opt_g", G_KEYS), ("opt_d", D_KEYS), ("opt_a", A_KEYS)):
        opt_name, fixed = _OPT_SOURCES[field]
        betas = fixed if fixed is not None else (beta_1, beta_2)
        sub = subtree(params, keys)
        if import_optimizers:
            opts[field], count = _import_opt_state(variables, sub, sources, opt_name, betas)
            report[field] = (
                None if count is None else ("converged" if count == _CONVERGED_COUNT else count)
            )
        else:
            opts[field] = adam_init(sub)
            report[field] = "fresh"
    return TrainState(params=params, ema=None, **opts), inferred, report


def convert_reference_checkpoint(
    src: str,
    out_dir: str,
    tag: Optional[str] = None,
    beta_1: float = 0.5,
    beta_2: float = 0.9,
    import_optimizers: bool = True,
    weights_only: bool = False,
) -> Dict[str, Any]:
    """Convert a reference checkpoint into a native one on disk.

    - full state (default): ``<out_dir>/ckpt-<tag>.npz`` + ``status.json``
      ({'epoch': tag+1, 'step': recovered D apply count}) — drop ``out_dir``
      in as ``result/<exp>/checkpoint/`` and ``train`` resumes from it
      (trainer.py restore_latest), exactly like the reference's own restore
      (eager_trainer.py:37-43);
    - ``weights_only``: ``ckpt-model.npz`` of just the param tree — the
      ``export-model`` format (trainer.py export_model_checkpoint).

    ``tag`` defaults to the source directory's status.json epoch - 1 when
    present (the reference names each save after the epoch it finished,
    eager_trainer.py:229), else '0'. Returns a summary dict (out path,
    inferred config kwargs, optimizer report).
    """
    from littlegan_tpu.training.checkpoint import Checkpointer

    variables = read_reference_variables(src)
    state, inferred, report = variables_to_train_state(
        variables, beta_1=beta_1, beta_2=beta_2, import_optimizers=import_optimizers
    )

    if tag is None:
        tag = "0"
        status_path = os.path.join(
            src if os.path.isdir(src) else os.path.dirname(src), "status.json"
        )
        if os.path.isfile(status_path):
            with open(status_path) as f:
                src_epoch = json.load(f).get("epoch")
            if isinstance(src_epoch, int) and src_epoch > 1:
                # reference status epoch = next epoch to train; its newest
                # checkpoint file is the one that finished epoch-1
                tag = str(src_epoch - 1)

    ck = Checkpointer(out_dir)
    if weights_only:
        path = ck.save("model", state.params)
    else:
        step = report.get("opt_d")
        status = {
            "epoch": (int(tag) + 1) if tag.isdigit() else 1,
            "step": step if isinstance(step, int) else 0,
            "converted_from": os.path.abspath(src),
        }
        path = ck.save(tag, state, status=status)
    return {"path": path, "inferred": inferred, "optimizers": report, "tag": tag}


# --------------------------------------------------------------------------
# EXPORT: our TrainState -> a reference-loadable tf.train.Checkpoint.
# The inverse of the importer above — completes two-way migration: a user
# can train here and hand the result back to the reference's own restore
# (eager_trainer.py:37-43, tf.train.latest_checkpoint + optional
# status.json {'epoch': next}).
# --------------------------------------------------------------------------


def _build_reference_modules(params_np):
    """The reference's exact trackable graph (model.py:6-136 attribute
    names, Adjuster sharing D.encoder + G.decoder + G.conv per
    model.py:119-123) as plain tf.Modules holding our weights.

    Returns ``(gen, disc, adj, varmap)`` with ``varmap``: our leaf path
    ('encoder/block1/conv/kernel', ...) -> the tf.Variable — object-based
    restore matches by attribute names, so plain Modules restore into the
    reference's Keras models (proven for the import direction against a
    real keras-built checkpoint, tests/test_reference_ckpt.py).
    """
    import tensorflow as tf  # noqa: PLC0415 — heavyweight, lazy

    class Mod(tf.Module):
        pass

    varmap: Dict[str, Any] = {}

    def var(arr, our_path):
        v = tf.Variable(np.asarray(arr, np.float32))
        varmap[our_path] = v
        return v

    def conv_mod(blk, our):
        m = Mod()
        m.kernel = var(blk["conv"]["kernel"], f"{our}/conv/kernel")
        m.bias = var(blk["conv"]["bias"], f"{our}/conv/bias")
        return m

    def norm_mod(nm, our):
        m = Mod()
        m.gamma = var(nm["gamma"], f"{our}/gamma")
        m.beta = var(nm["beta"], f"{our}/beta")
        return m

    def dense_mod(d, our):
        m = Mod()
        m.kernel = var(d["kernel"], f"{our}/kernel")
        m.bias = var(d["bias"], f"{our}/bias")
        return m

    enc, dec = Mod(), Mod()
    for i in range(1, 5):
        eb = params_np["encoder"][f"block{i}"]
        db = params_np["decoder"][f"block{i}"]
        setattr(enc, f"conv{i}", conv_mod(eb, f"encoder/block{i}"))
        setattr(enc, f"norm{i}", norm_mod(eb["norm"], f"encoder/block{i}/norm"))
        setattr(dec, f"conv{i}", conv_mod(db, f"decoder/block{i}"))
        setattr(dec, f"norm{i}", norm_mod(db["norm"], f"decoder/block{i}/norm"))
    disc = Mod()
    disc.encoder = enc
    disc.dense_pr = dense_mod(params_np["d_head"]["pr"], "d_head/pr")
    disc.dense_cond = dense_mod(params_np["d_head"]["cond"], "d_head/cond")
    gen = Mod()
    gen.dense = dense_mod(params_np["g_head"]["dense"], "g_head/dense")
    gen.norm = norm_mod(params_np["g_head"]["norm"], "g_head/norm")
    gen.decoder = dec
    out = Mod()
    out.kernel = var(params_np["out_conv"]["kernel"], "out_conv/kernel")
    out.bias = var(params_np["out_conv"]["bias"], "out_conv/bias")
    gen.conv = out
    adj = Mod()
    adj.encoder = enc
    adj.dense = dense_mod(params_np["adj_head"]["dense"], "adj_head/dense")
    adj.norm = norm_mod(params_np["adj_head"]["norm"], "adj_head/norm")
    adj.decoder = dec
    adj.conv = out
    return gen, disc, adj, varmap


def _export_opt(opt, adam_state, sub_params, varmap, betas) -> Optional[int]:
    """Load one AdamState into a v1 optimizer: slots from mu/nu, shared
    beta powers from the max per-leaf count (v1 keeps ONE power pair per
    optimizer — the reference's own coupling; under Config.adam_tf_parity
    the per-leaf counts are all equal and the export is exact).

    Returns the exported apply count, or None when the optimizer never ran
    (no slots are created then — matching a reference checkpoint whose v1
    optimizer was constructed but never applied).
    """
    import jax
    import tensorflow as tf  # noqa: PLC0415

    from littlegan_tpu.utils.tree import path_str

    leaves = jax.tree_util.tree_leaves_with_path(sub_params)
    counts = jax.tree_util.tree_leaves(adam_state.count)
    count = max(int(c) for c in counts) if counts else 0
    if count == 0:
        return None

    tf_vars = [varmap[path_str(p)] for p, _ in leaves]
    # one zero-gradient apply creates the m/v slots and the beta-power
    # accumulators without moving any weight (Adam with g=0 on m=v=0 is an
    # exact no-op update); real values are assigned over them below
    opt.apply_gradients([(tf.zeros_like(v), v) for v in tf_vars])
    mu = {path_str(p): l for p, l in jax.tree_util.tree_leaves_with_path(adam_state.mu)}
    nu = {path_str(p): l for p, l in jax.tree_util.tree_leaves_with_path(adam_state.nu)}
    for p, _ in leaves:
        key = path_str(p)
        opt.get_slot(varmap[key], "m").assign(np.asarray(mu[key], np.float32))
        opt.get_slot(varmap[key], "v").assign(np.asarray(nu[key], np.float32))
    # stored power after t applies is beta^(t+1) (v1 multiplies AFTER the
    # apply; see _derive_count). f32 underflow past ~beta^-38 loses the
    # exact count exactly as the reference's own checkpoints do — the
    # updates are bit-identical either way (1 - beta^t == 1.0 there).
    b1p, b2p = opt._get_beta_accumulators()
    b1p.assign(np.float32(betas[0] ** (count + 1)))
    b2p.assign(np.float32(betas[1] ** (count + 1)))
    return count


def export_reference_checkpoint(
    state,
    out_dir: str,
    tag: str = "1",
    beta_1: float = 0.5,
    beta_2: float = 0.9,
    use_ema: bool = False,
) -> Dict[str, Any]:
    """Write ``state`` as a reference ``result/<exp>/checkpoint/`` directory.

    Produces ``<out_dir>/<tag>-1.{index,data-*}``, TF's ``checkpoint`` state
    file, and ``status.json`` ({'epoch': tag+1} — the reference resumes at
    the NEXT epoch, eager_trainer.py:40-43,173). ``beta_1``/``beta_2`` must
    be the G/D betas trained with (they parameterize the stored beta powers).
    ``use_ema`` exports the EMA generator subtrees as the weights (the
    optimizer moments still describe the live trajectory — documented
    mismatch, weights-quality export). Returns a summary dict.
    """
    import jax
    import tensorflow as tf  # noqa: PLC0415

    from littlegan_tpu.training.state import A_KEYS, D_KEYS, G_KEYS, eval_params, subtree

    params = eval_params(state) if use_ema else state.params
    params_np = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    gen, disc, adj, varmap = _build_reference_modules(params_np)

    # lr is not a trackable in v1 checkpoints — any value serializes the same
    opt_g = tf.compat.v1.train.AdamOptimizer(1e-4, beta_1, beta_2)
    opt_d = tf.compat.v1.train.AdamOptimizer(1e-4, beta_1, beta_2)
    opt_a = tf.compat.v1.train.AdamOptimizer(1e-4)  # v1 defaults (eager_trainer.py:30)
    report = {
        "opt_g": _export_opt(opt_g, state.opt_g, subtree(params_np, G_KEYS), varmap, (beta_1, beta_2)),
        "opt_d": _export_opt(opt_d, state.opt_d, subtree(params_np, D_KEYS), varmap, (beta_1, beta_2)),
        "opt_a": _export_opt(opt_a, state.opt_a, subtree(params_np, A_KEYS), varmap, (0.9, 0.999)),
    }

    ckpt = tf.train.Checkpoint(
        discriminator=disc,
        generator=gen,
        adjuster=adj,
        discriminator_optimizer=opt_d,
        generator_optimizer=opt_g,
        adjuster_optimizer=opt_a,
    )
    os.makedirs(out_dir, exist_ok=True)
    path = ckpt.save(os.path.join(out_dir, str(tag)))
    epoch_next = (int(tag) + 1) if str(tag).isdigit() else 1
    with open(os.path.join(out_dir, "status.json"), "w") as f:
        json.dump({"epoch": epoch_next, "exported_by": "littlegan_tpu"}, f)
    return {"path": path, "optimizers": report, "ema": bool(use_ema and state.ema is not None)}
