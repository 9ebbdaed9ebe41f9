"""ZeRO-1 optimizer-state sharding (Config.shard_opt_state, parallel/zero.py).

The contract: sharding the Adam moments over the mesh changes WHERE the
optimizer state lives, never what it computes — every update must match the
fully-replicated DP step bit-for-bit up to collective reduction order.
Runs on the virtual 8-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlegan_tpu.parallel import make_mesh, make_parallel_train_step, shard_batch
from littlegan_tpu.parallel.zero import (
    _moment_spec,
    check_shard_opt_state,
    place_state,
    train_state_shardings,
)
from littlegan_tpu.training import create_train_state, make_train_step

from tests.test_parallel import _global_batches  # same batch maker as the DP suite


@pytest.fixture()
def zero_cfg(tiny_cfg, monkeypatch):
    # tiny leaves would all fall under the real-size threshold; force
    # sharding so the virtual mesh exercises the ZeRO layout
    monkeypatch.setattr("littlegan_tpu.parallel.zero._MIN_SHARD_ELEMS", 0)
    return tiny_cfg.replace(
        batch_size=8, use_partition=True, donate_state=False, shard_opt_state=True
    )


def test_moment_spec_rules():
    mesh = make_mesh(8)
    # largest divisible axis wins; ties -> last (channels-out for conv kernels)
    assert _moment_spec((5, 5, 64, 128), mesh) == jax.sharding.PartitionSpec(
        None, None, None, "data"
    )
    # scalar / nothing divisible -> replicated
    assert _moment_spec((), mesh) == jax.sharding.PartitionSpec()
    assert _moment_spec((5, 5, 3, 33), mesh) == jax.sharding.PartitionSpec()
    # below the size threshold -> replicated even when divisible
    assert _moment_spec((8, 8), mesh) == jax.sharding.PartitionSpec()
    # spatial mesh: sharded over ALL axes when divisible by the product
    smesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    big = (100, 64 * 64 * 384)
    spec = _moment_spec(big, smesh)
    assert spec == jax.sharding.PartitionSpec(None, ("data", "model"))


def test_zero1_update_matches_replicated_dp(zero_cfg):
    """3 steps crossing the adjuster warm-up gate and a partition rotation:
    sharded-moment DP must track replicated DP exactly."""
    cfg = zero_cfg
    mesh = make_mesh(8)
    state0 = create_train_state(cfg, jax.random.PRNGKey(0))

    rep_step = make_parallel_train_step(
        cfg.replace(shard_opt_state=False), state0.params, mesh, donate=False
    )
    z_step = make_parallel_train_step(cfg, state0.params, mesh, donate=False)

    rep_state = place_state(state0, mesh, cfg.replace(shard_opt_state=False))
    z_state = place_state(state0, mesh, cfg)

    # a big moment leaf must actually be sharded (not silently replicated)
    sharded_leaves = [
        x
        for x in jax.tree_util.tree_leaves(z_state.opt_d.mu)
        if x.ndim and not x.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no Adam moment leaf was sharded"
    assert len(sharded_leaves[0].sharding.device_set) == 8

    for i, bno in enumerate((9, 10, 11)):  # crosses the adj gate (batch>10)
        b1, b2 = _global_batches(cfg, seed=20 + i)
        rng = jax.random.PRNGKey(100 + i)
        sb1, sb2 = shard_batch(b1, mesh), shard_batch(b2, mesh)
        out_rep = rep_step(rep_state, sb1, sb2, rng, jnp.int32(bno))
        out_z = z_step(z_state, sb1, sb2, rng, jnp.int32(bno))
        rep_state, z_state = out_rep.state, out_z.state

    for attr in ("params", "opt_g", "opt_d", "opt_a"):
        ref = jax.device_get(getattr(rep_state, attr))
        got = jax.device_get(getattr(z_state, attr))
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(got),
        ):
            key = attr + "/".join(str(getattr(p, "key", p)) for p in path)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=key
            )


def test_zero1_scan_device_store_composes(zero_cfg):
    """shard_opt_state x device_data x steps_per_dispatch: the K-step scan
    over the sharded store runs with sharded moments and matches the
    replicated scan's result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from littlegan_tpu.training.step import make_scan_train_step

    cfg = zero_cfg
    mesh = make_mesh(8)
    state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _global_batches(cfg, seed=5)
    imgs = jax.device_put(
        jnp.stack([b1[0], b2[0]]), NamedSharding(mesh, P(None, "data"))
    )
    conds = jax.device_put(
        jnp.stack([b1[1], b2[1]]), NamedSharding(mesh, P(None, "data"))
    )
    k = 2
    b1s = jnp.array([0, 1], jnp.int32)
    b2s = jnp.array([1, 0], jnp.int32)
    args = (imgs, conds, b1s, b2s, jax.random.PRNGKey(9), jnp.int32(0), jnp.int32(11))

    rep_scan = make_scan_train_step(
        cfg.replace(shard_opt_state=False), state0.params, k, donate=False, mesh=mesh
    )
    z_scan = make_scan_train_step(cfg, state0.params, k, donate=False, mesh=mesh)
    out_rep = rep_scan(place_state(state0, mesh, cfg.replace(shard_opt_state=False)), *args)
    out_z = z_scan(place_state(state0, mesh, cfg), *args)

    mu_leaves = [
        x
        for x in jax.tree_util.tree_leaves(out_z.state.opt_g.mu)
        if x.ndim and not x.sharding.is_fully_replicated
    ]
    assert mu_leaves, "scan output moments lost their sharding"
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(out_rep.state.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(out_z.state.params)),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=key
        )


def test_zero1_composes_with_bf16_moments(zero_cfg):
    """shard_opt_state x moment_dtype='bfloat16': the sharded moment leaves
    stay bf16 through a step (half HBM x 1/n chips), and the update still
    tracks the replicated-f32-moment step within bf16 rounding of the
    moment EMAs."""
    cfg = zero_cfg.replace(moment_dtype="bfloat16")
    mesh = make_mesh(8)
    state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    z_state = place_state(state0, mesh, cfg)
    step = make_parallel_train_step(cfg, state0.params, mesh, donate=False)

    ref_cfg = zero_cfg.replace(shard_opt_state=False)
    ref_state = place_state(create_train_state(ref_cfg, jax.random.PRNGKey(0)), mesh, ref_cfg)
    ref_step = make_parallel_train_step(ref_cfg, ref_state.params, mesh, donate=False)

    b1, b2 = _global_batches(cfg, seed=31)
    sb1, sb2 = shard_batch(b1, mesh), shard_batch(b2, mesh)
    for i, bno in enumerate((11, 12)):
        rng = jax.random.PRNGKey(200 + i)
        z_state = step(z_state, sb1, sb2, rng, jnp.int32(bno)).state
        ref_state = ref_step(ref_state, sb1, sb2, rng, jnp.int32(bno)).state

    sharded_bf16 = [
        x
        for x in jax.tree_util.tree_leaves(z_state.opt_d.mu)
        if x.ndim and not x.sharding.is_fully_replicated
    ]
    assert sharded_bf16, "no moment leaf was sharded"
    assert all(x.dtype == jnp.bfloat16 for x in sharded_bf16)
    # params drift bounded by ~2 Adam steps of bf16 moment rounding
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(ref_state.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(z_state.params)),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff <= 2 * 2.5 * 5e-5, f"{key}: drift {diff}"


def test_zero1_preconditions(tiny_cfg):
    cfg = tiny_cfg.replace(shard_opt_state=True)
    with pytest.raises(ValueError, match="needs a device mesh"):
        check_shard_opt_state(cfg, None)
    # off -> no constraint
    check_shard_opt_state(tiny_cfg, None)


def test_zero1_off_is_fully_replicated(tiny_cfg):
    """Default layout is byte-identical to the historical replicate_state."""
    cfg = tiny_cfg.replace(batch_size=8, shard_opt_state=False)
    mesh = make_mesh(8)
    st = place_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh, cfg)
    for leaf in jax.tree_util.tree_leaves(st):
        assert leaf.sharding.is_fully_replicated


def test_zero1_trainer_refuses_without_mesh(tiny_cfg, tmp_path):
    """A 1-device (or indivisible-batch) run with shard_opt_state must fail
    at build time with remediation text, not deep in GSPMD."""
    from littlegan_tpu.training.trainer import Trainer

    cfg = tiny_cfg.replace(
        shard_opt_state=True,
        batch_size=3,  # not divisible by 8 -> no DP mesh
        all_result_dir=str(tmp_path / "result"),
        exp_name="zero_refuse",
    )
    with pytest.raises(ValueError, match="shard_opt_state"):
        Trainer(cfg, dataset=None)
