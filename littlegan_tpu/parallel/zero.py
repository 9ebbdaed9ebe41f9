"""Train-state sharding over the device mesh: ZeRO-1 optimizer-state
sharding and tensor-parallel dense heads (both opt-in).

The reference replicates nothing because it has no distributed backend at
all (SURVEY §2 #23-24); plain DP here replicates params AND the three Adam
states on every chip (parallel/train.py). That is fine at 128² (~9.6M
params), but the dense heads scale with init_dim² — at
1024² (init_dim 64) the G dense kernel alone is 100x(64·64·384) ≈ 629 MB f32
and the full train state ≈ 2.1 GiB (params 729 MB + moments 1.42 GiB —
scripts/memory_report.py), most of it Adam moments that each chip keeps an
identical copy of.

``Config.shard_opt_state`` shards the Adam ``mu``/``nu`` moment trees over
the mesh instead (per-leaf, largest divisible axis), annotation-only in the
idiomatic-JAX way: the SAME train step is jitted with these shardings and
XLA's SPMD partitioner turns the optimizer tail into the canonical ZeRO-1
schedule — gradients reduce-scatter into the moment shards, each chip
applies 1/n of the Adam update, and the updated params all-gather back to
replicated. Same collective volume as plain DP's all-reduce (a
reduce-scatter + all-gather IS an all-reduce), n× less optimizer HBM.

Params (and the optional EMA tree) stay replicated: they are read by every
conv in fwd/bwd, so gathering them once per step is the right trade at GAN
scale (full ZeRO-3 param sharding would re-gather per layer for no memory
win that matters here). Per-leaf int32 ``count`` scalars stay replicated.

``Config.shard_dense`` goes one step further for the ONE place param
replication actually hurts: the init_dim²-scaled dense heads. The
g_head/adj_head dense kernels shard their OUTPUT dim and the d_head
pr/cond kernels their INPUT dim over the spatial mesh's ``'model'`` axis
(``_DENSE_HEAD_SPECS``). Because the (B, H·W·C) <-> (B, H, W, C) reshapes
are row-major with H major, an output-dim shard boundary aligned to whole
H-rows (guaranteed by init_dim % n_model == 0) IS the H-sharding the
spatial mesh already uses for every activation — the embed side adds no
gathers, the d_head side is a local partial product plus one tiny (B, 1|7)
psum over 'model', and each kernel's gradient reduces over 'data' only at
1/n_model volume. Verified on the compiled (4,2)-mesh HLO: shard_dense
LOWERS the program's all-gather count (42 -> 30 on the 32² test config —
the dense kernels are never re-gathered) and adds only small all-reduces
(49 -> 61, the d_head psums + norm-stat terms). The moments (and the EMA
g_head) follow the param sharding regardless of ``shard_opt_state``:
moments of a sharded param that stayed replicated would force a gather in
the optimizer tail and defeat the memory win.

Update-equivalence with unsharded DP is asserted on the virtual 8-device
CPU mesh in tests/test_zero.py; the driver's ``dryrun_multichip`` compiles
and runs this regime every round. Across HOSTS both flags require the
orbax checkpoint backend (coordinated cross-host sharded save/restore —
2-process round-trip test in tests/test_multihost.py); the default npz
backend gathers with jax.device_get and refuses at build time.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from littlegan_tpu.config import Config
from littlegan_tpu.training.optimizer import AdamState
from littlegan_tpu.training.state import A_KEYS, D_KEYS, G_KEYS, TrainState, subtree


# leaves below this element count stay replicated: a sharded leaf swaps its
# grad all-reduce for reduce-scatter + all-gather (same volume, one more
# collective launch) — worth it only where the HBM saving is real
_MIN_SHARD_ELEMS = 32768

# Config.shard_dense param shardings, keyed by pytree path. The dense-embed
# kernels/biases shard the feature (output) dim — H-major, so the shards ARE
# the spatial mesh's H-slabs — and the D heads shard the flattened-feature
# (input) dim, which is the same H-major layout on the other side of the
# matmul (a local partial product + one psum over 'model' for a (B, 1|7)
# result). d_head biases are 1-8 floats: replicated.
_DENSE_HEAD_SPECS = {
    ("g_head", "dense", "kernel"): P(None, "model"),
    ("g_head", "dense", "bias"): P("model"),
    ("adj_head", "dense", "kernel"): P(None, "model"),
    ("adj_head", "dense", "bias"): P("model"),
    ("d_head", "pr", "kernel"): P("model", None),
    ("d_head", "cond", "kernel"): P("model", None),
}


def _path_key(path) -> tuple:
    return tuple(str(getattr(p, "key", p)) for p in path)


def _dense_spec(path) -> Optional[P]:
    return _DENSE_HEAD_SPECS.get(_path_key(path))


def _moment_spec(shape, mesh: Mesh) -> P:
    """PartitionSpec for one moment leaf: pick the LARGEST axis divisible by
    the whole mesh (ties -> last such axis, keeping conv kernels sharded on
    channels-out); fall back to the 'data' axis alone, else replicate.
    Leaves smaller than _MIN_SHARD_ELEMS replicate.

    Deterministic by construction — the same leaf always shards the same
    way, so checkpoints restore onto identical layouts.
    """
    total = 1
    for d in shape:
        total *= d
    if total < _MIN_SHARD_ELEMS:
        return P()
    candidates = [tuple(mesh.axis_names)]
    if len(mesh.axis_names) > 1 and "data" in mesh.axis_names:
        candidates.append(("data",))  # e.g. H=odd multiples on spatial meshes
    for axes in candidates:
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        if n <= 1:
            continue
        best = None
        for i, d in enumerate(shape):
            if d % n == 0 and d > 1 and (best is None or d >= shape[best]):
                best = i
        if best is not None:
            spec = [None] * len(shape)
            spec[best] = axes if len(axes) > 1 else axes[0]
            return P(*spec)
    return P()


def train_state_shardings(cfg: Config, params, mesh: Mesh) -> TrainState:
    """TrainState-shaped pytree of NamedShardings for ``jax.jit``'s
    in/out_shardings. Default (both flags off): everything replicated —
    exactly the historical DP layout. ``shard_opt_state``: Adam moments
    sharded per ``_moment_spec``. ``shard_dense``: the dense-head params
    (+ their moments and the EMA g_head) sharded per ``_DENSE_HEAD_SPECS``."""
    if cfg.shard_dense:
        check_shard_dense(cfg, mesh)
    rep = NamedSharding(mesh, P())
    rep_tree = lambda t: jax.tree_util.tree_map(lambda _: rep, t)

    def param_sh(t):
        if not cfg.shard_dense:
            return rep_tree(t)
        return jax.tree_util.tree_map_with_path(
            lambda p, _: NamedSharding(mesh, _dense_spec(p) or P()), t
        )

    def opt_sh(keys):
        sub = subtree(params, keys)

        def moment(path, x):
            spec = _dense_spec(path) if cfg.shard_dense else None
            if spec is None and cfg.shard_opt_state:
                spec = _moment_spec(x.shape, mesh)
            return NamedSharding(mesh, spec or P())

        moments = jax.tree_util.tree_map_with_path(moment, sub)
        return AdamState(count=rep_tree(sub), mu=moments, nu=moments)

    return TrainState(
        params=param_sh(params),
        opt_g=opt_sh(G_KEYS),
        opt_d=opt_sh(D_KEYS),
        opt_a=opt_sh(A_KEYS),
        ema=param_sh(subtree(params, G_KEYS)) if cfg.ema_decay > 0 else None,
    )


class _MeshShape:
    """Duck-typed stand-in for a Mesh in shape-only computations
    (state_bytes_report): _moment_spec touches only .axis_names / .shape."""

    def __init__(self, shape: dict):
        self.axis_names = tuple(shape)
        self.shape = dict(shape)


def _spec_divisor(spec: P, mesh_shape: dict) -> int:
    n = 1
    for entry in spec:
        if entry is None:
            continue
        for ax in (entry if isinstance(entry, tuple) else (entry,)):
            n *= mesh_shape[ax]
    return n


def state_bytes_report(cfg: Config, mesh_shape: Optional[dict] = None) -> dict:
    """Analytic train-state memory per chip under the config's sharding
    flags, WITHOUT materializing anything (jax.eval_shape over
    create_train_state). ``mesh_shape``: {'data': n} or
    {'data': n, 'model': m}; None = single chip (everything local).

    Mirrors ``train_state_shardings``' per-leaf decisions exactly — the
    dense-head specs ignore the size threshold, _moment_spec applies it —
    so the numbers are the real layout's, not an estimate. int32 count
    scalars are omitted (4 bytes/leaf). Used by scripts/memory_report.py;
    consistency with the live shardings is asserted in
    tests/test_memory_report.py."""
    import numpy as np

    from littlegan_tpu.training.state import create_train_state

    shapes = jax.eval_shape(lambda: create_train_state(cfg, jax.random.PRNGKey(0)))
    mesh = _MeshShape(mesh_shape) if mesh_shape else None
    if (
        mesh is not None
        and cfg.shard_dense
        and "model" in mesh.shape
        and cfg.init_dim % mesh.shape["model"] != 0
    ):
        # mirror check_shard_dense: a non-divisible model axis would
        # silently truncate the per-chip division below
        raise ValueError(
            f"shard_dense needs init_dim ({cfg.init_dim}) divisible by the "
            f"model-axis size ({mesh.shape['model']})"
        )

    def leaf_bytes(path, x, is_moment: bool):
        total = int(np.prod(x.shape)) * x.dtype.itemsize
        spec = None
        if mesh is not None and cfg.shard_dense and "model" in mesh.shape:
            spec = _dense_spec(path)
        if spec is None and is_moment and mesh is not None and cfg.shard_opt_state:
            spec = _moment_spec(x.shape, mesh)
        div = _spec_divisor(spec, mesh.shape) if spec is not None else 1
        return total, total // div

    out = {}
    for name, tree, is_moment in (
        ("params", shapes.params, False),
        ("opt_mu_nu", [(s.mu, s.nu) for s in (shapes.opt_g, shapes.opt_d, shapes.opt_a)], True),
        ("ema", shapes.ema, False),
    ):
        g = p = 0
        for path, x in jax.tree_util.tree_leaves_with_path(tree):
            # moment paths carry a leading tuple index; strip non-key entries
            key_path = tuple(
                pp for pp in path if hasattr(pp, "key") or isinstance(pp, str)
            )
            gb, pb = leaf_bytes(key_path, x, is_moment)
            g += gb
            p += pb
        out[name] = {"global_bytes": g, "per_chip_bytes": p}
    sections = list(out.values())
    out["total_per_chip_bytes"] = sum(v["per_chip_bytes"] for v in sections)
    out["total_global_bytes"] = sum(v["global_bytes"] for v in sections)
    return out


def place_state(state: TrainState, mesh: Mesh, cfg: Config) -> TrainState:
    """Initial device placement matching ``train_state_shardings`` (the
    sharding-aware successor of ``replicate_state``)."""
    return jax.device_put(state, train_state_shardings(cfg, state.params, mesh))


def check_shard_opt_state(cfg: Config, mesh: Optional[Mesh]) -> None:
    """Build-time preconditions for ``cfg.shard_opt_state`` (clear errors
    instead of opaque GSPMD/checkpoint failures at first dispatch)."""
    if not cfg.shard_opt_state:
        return
    if mesh is None:
        raise ValueError(
            "shard_opt_state=true needs a device mesh (it shards the Adam "
            "moments over mesh axes) — run with >1 device and a batch_size "
            "divisible by the device count, or turn it off"
        )
    _check_multihost_backend(cfg, "shard_opt_state", "moment")


def _check_multihost_backend(cfg: Config, flag: str, what: str) -> None:
    """Sharded train state across HOSTS needs a checkpoint backend that can
    write non-addressable shards: orbax coordinates a cross-host sharded
    save/restore natively; the default npz backend gathers with
    jax.device_get, which can only see this host's shards."""
    if jax.process_count() > 1 and getattr(cfg, "extra", {}).get("checkpoint_backend") != "orbax":
        raise ValueError(
            f"{flag}=true across hosts needs the orbax checkpoint backend: "
            f"the default npz backend gathers the full state with "
            f"jax.device_get, which cannot address other hosts' {what} "
            f"shards — set extra.checkpoint_backend='orbax' in the config "
            f"(cross-host sharded save/restore, tests/test_multihost.py), "
            f"run on one host's chips, or turn {flag} off"
        )


def check_shard_dense(cfg: Config, mesh: Optional[Mesh]) -> None:
    """Build-time preconditions for ``cfg.shard_dense`` (clear errors
    instead of opaque GSPMD/checkpoint failures at first dispatch)."""
    if not cfg.shard_dense:
        return
    if mesh is None or "model" not in mesh.axis_names:
        raise ValueError(
            "shard_dense=true needs a ('data','model') mesh: the dense-head "
            "kernels shard over the spatial mesh's 'model' axis so their "
            "shards align with the H-sharded activations — set "
            "mesh_axes=['data','model'] (parallel/spatial.py), or turn "
            "shard_dense off"
        )
    n_model = mesh.shape["model"]
    if cfg.init_dim % n_model != 0:
        raise ValueError(
            f"shard_dense=true needs init_dim ({cfg.init_dim}) divisible by "
            f"the model-axis size ({n_model}): dense-head shard boundaries "
            "must fall on whole H-rows of the reshaped feature map so they "
            "coincide with the spatial H-sharding — shrink the model axis "
            "or turn shard_dense off"
        )
    _check_multihost_backend(cfg, "shard_dense", "param")
