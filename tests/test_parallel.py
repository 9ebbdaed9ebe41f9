"""Multi-device tests on the fake 8-device CPU mesh (SURVEY §4).

The key assertion: data-parallel training over 8 devices produces the SAME
parameter update as single-device training on the same global batch —
i.e. XLA's inserted gradient all-reduce reproduces the reference's
(single-device) math exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlegan_tpu.parallel import make_mesh, make_parallel_train_step, replicate_state, shard_batch
from littlegan_tpu.training import create_train_state, make_train_step


@pytest.fixture(scope="module")
def dp_cfg(tiny_cfg):
    # global batch 8 -> 1 sample per device on the 8-device mesh
    return tiny_cfg.replace(batch_size=8, use_partition=True, donate_state=False)


def _global_batches(cfg, seed=7):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    mk_img = lambda k: jax.random.uniform(
        k, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3), minval=-1, maxval=1
    )
    mk_cond = lambda k: jnp.where(jax.random.bernoulli(k, 0.5, (cfg.batch_size, cfg.cond_dim)), 0.98, -0.94)
    return (mk_img(ks[0]), mk_cond(ks[1])), (mk_img(ks[2]), mk_cond(ks[3]))


def test_eight_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"


def test_dp_step_matches_single_device(dp_cfg):
    """psum-gradient equivalence with single-device training (SURVEY §4)."""
    cfg = dp_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _global_batches(cfg)
    rng = jax.random.PRNGKey(3)

    single = make_train_step(cfg, state.params, donate=False)
    out_single = single(state, b1, b2, rng, jnp.int32(20))

    mesh = make_mesh(8)
    dp_state = replicate_state(state, mesh)
    dp = make_parallel_train_step(cfg, state.params, mesh, donate=False)
    out_dp = dp(dp_state, shard_batch(b1, mesh), shard_batch(b2, mesh), rng, jnp.int32(20))

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(out_single.state.params),
        jax.tree_util.tree_leaves_with_path(out_dp.state.params),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=key
        )
    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert abs(float(out_single.metrics[k]) - float(out_dp.metrics[k])) < 1e-3, k


def test_dp_outputs_sharded(dp_cfg):
    cfg = dp_cfg
    mesh = make_mesh(8)
    state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    dp = make_parallel_train_step(cfg, state.params, mesh, donate=False)
    b1, b2 = _global_batches(cfg)
    out = dp(state, shard_batch(b1, mesh), shard_batch(b2, mesh), jax.random.PRNGKey(1), jnp.int32(3))
    # fake images stay sharded over the data axis; params replicated
    assert len(out.fake_image.sharding.device_set) == 8
    p_leaf = jax.tree_util.tree_leaves(out.state.params)[0]
    assert p_leaf.sharding.is_fully_replicated


def _device_store(b1, b2, mesh):
    """Stack two global batches into a (2, B, ...) store sharded like the
    trainer's device_data upload: P(None, 'data')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    imgs = jnp.stack([b1[0], b2[0]])
    conds = jnp.stack([b1[1], b2[1]])
    return (
        jax.device_put(imgs, NamedSharding(mesh, P(None, "data"))),
        jax.device_put(conds, NamedSharding(mesh, P(None, "data"))),
    )


def test_device_store_gather_step_dp_matches_host_fed(dp_cfg):
    """device_data composed with DP (VERDICT r1 #4): with the HBM store
    sharded P(None, 'data'), the store-slicing step must produce the same
    update as the host-fed DP step on the same batches."""
    from littlegan_tpu.training.step import make_gather_train_step

    cfg = dp_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _global_batches(cfg)
    rng = jax.random.PRNGKey(3)
    mesh = make_mesh(8)
    dp_state = replicate_state(state, mesh)

    host_fed = make_parallel_train_step(cfg, state.params, mesh, donate=False)
    out_ref = host_fed(dp_state, shard_batch(b1, mesh), shard_batch(b2, mesh), rng, jnp.int32(20))

    imgs, conds = _device_store(b1, b2, mesh)
    gather = make_gather_train_step(cfg, state.params, donate=False, mesh=mesh)
    out = gather(dp_state, imgs, conds, jnp.int32(0), jnp.int32(1), rng, jnp.int32(20))

    assert len(out.fake_image.sharding.device_set) == 8  # stays batch-sharded
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(out_ref.state.params),
        jax.tree_util.tree_leaves_with_path(out.state.params),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=key)
    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert abs(float(out_ref.metrics[k]) - float(out.metrics[k])) < 1e-3, k


def test_device_store_scan_step_dp_matches_sequential(dp_cfg):
    """K=2 scanned dispatch under the DP mesh == 2 sequential store-slicing
    steps (same PRNG stream, same batch_no schedule)."""
    from littlegan_tpu.training.step import make_gather_train_step, make_scan_train_step

    cfg = dp_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _global_batches(cfg)
    base_rng = jax.random.PRNGKey(11)
    mesh = make_mesh(8)
    dp_state = replicate_state(state, mesh)
    imgs, conds = _device_store(b1, b2, mesh)

    gather = make_gather_train_step(cfg, state.params, donate=False, mesh=mesh)
    seq = dp_state
    for i, (i1, i2) in enumerate([(0, 1), (1, 0)]):
        rng = jax.random.fold_in(base_rng, 5 + i)
        seq = gather(seq, imgs, conds, jnp.int32(i1), jnp.int32(i2), rng, jnp.int32(20 + i)).state

    scan = make_scan_train_step(cfg, state.params, 2, donate=False, mesh=mesh)
    out = scan(
        dp_state, imgs, conds,
        np.asarray([0, 1], np.int32), np.asarray([1, 0], np.int32),
        base_rng, jnp.int32(5), jnp.int32(20),
    )
    assert out.metrics["loss/gen"].shape == (2,)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(seq.params),
        jax.tree_util.tree_leaves_with_path(out.state.params),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        # scan vs unrolled may differ in reduction order; compare at the
        # Adam-update scale (same rationale as test_spatial)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() <= 2.5 * cfg.lr, key


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_dryrun_driver_context():
    """Run the dry run the way the DRIVER does: a fresh subprocess with the
    axon sitecustomize fully active (PALLAS_AXON_POOL_IPS restored, no
    JAX_PLATFORMS/XLA_FLAGS help from conftest).

    Round 1 shipped a dryrun that passed in-process under conftest's CPU
    override but failed under the driver (MULTICHIP_r01 ok:false): it queried
    jax.devices() before switching platforms, locking the 1-device axon
    backend. This test fails if that ordering ever regresses.
    """
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    ips = env.pop("_LITTLEGAN_STASHED_AXON_POOL_IPS", None)
    if ips is not None:
        env["PALLAS_AXON_POOL_IPS"] = ips  # re-arm the axon sitecustomize
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

    proc = subprocess.run(
        [sys.executable, "-c", "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"driver-context dryrun failed:\n{proc.stdout}\n{proc.stderr}"
    for tag in ("dp", "accum_x_dp", "spatial"):
        assert f"dryrun_multichip(8) [{tag}] OK" in proc.stdout, proc.stdout


def test_graft_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert out.shape == (8, 128, 128, 3)


def test_accum_step_dp_matches_single_device(dp_cfg):
    """grad_accum composed with the DP mesh (round-2 verdict #3): M=2
    stacked micro-pairs sharded P(None, 'data') must produce the same
    update and losses as the single-device accumulation step on the same
    stacked batches — XLA's all-reduce of the scanned micro-gradients
    reproduces the host math exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from littlegan_tpu.training.step import make_accum_train_step

    cfg = dp_cfg.replace(grad_accum=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    p1, p2 = _global_batches(cfg, seed=7), _global_batches(cfg, seed=8)
    stack = lambda a, b: tuple(jnp.stack([x, y]) for x, y in zip(a, b))
    b1s, b2s = stack(p1[0], p2[0]), stack(p1[1], p2[1])
    rng = jax.random.PRNGKey(3)

    single = make_accum_train_step(cfg, state.params, donate=False)
    out_single = single(state, b1s, b2s, rng, jnp.int32(20))

    mesh = make_mesh(8)
    dp_state = replicate_state(state, mesh)
    dp = make_accum_train_step(cfg, state.params, donate=False, mesh=mesh)
    sh = NamedSharding(mesh, P(None, "data"))
    out_dp = dp(
        dp_state, jax.device_put(b1s, sh), jax.device_put(b2s, sh), rng, jnp.int32(20)
    )

    assert len(out_dp.fake_image.sharding.device_set) == 8  # stays sharded
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(out_single.state.params),
        jax.tree_util.tree_leaves_with_path(out_dp.state.params),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=key
        )
    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert abs(float(out_single.metrics[k]) - float(out_dp.metrics[k])) < 1e-3, k


def test_dp_adj_half_batch_matches_single_device(dp_cfg):
    """adj_half_batch composes with the DP mesh: the sharded step's updates
    match single-device training at both batch_no parities."""
    cfg = dp_cfg.replace(adj_half_batch=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _global_batches(cfg)
    mesh = make_mesh(8)
    dp = make_parallel_train_step(cfg, state.params, mesh, donate=False)
    single = make_train_step(cfg, state.params, donate=False)
    for bn in (20, 21):  # even (real task) and odd (generated task)
        out_s = single(state, b1, b2, jax.random.PRNGKey(3), jnp.int32(bn))
        out_d = dp(
            replicate_state(state, mesh),
            shard_batch(b1, mesh), shard_batch(b2, mesh),
            jax.random.PRNGKey(3), jnp.int32(bn),
        )
        np.testing.assert_allclose(
            np.asarray(out_s.state.params["adj_head"]["dense"]["kernel"]),
            np.asarray(out_d.state.params["adj_head"]["dense"]["kernel"]),
            rtol=2e-4, atol=2e-5, err_msg=f"batch_no={bn}",
        )
        assert out_d.adj_image.shape[0] == cfg.batch_size  # N rows, sharded
