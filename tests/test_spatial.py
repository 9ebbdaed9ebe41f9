"""Spatial-sharding (data x model mesh) equivalence test on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlegan_tpu.parallel.mesh import make_mesh
from littlegan_tpu.parallel.spatial import make_spatial_train_step, shard_spatial_batch
from littlegan_tpu.training import create_train_state, make_train_step


@pytest.fixture(scope="module")
def sp_cfg(tiny_cfg):
    return tiny_cfg.replace(batch_size=4, use_partition=False, donate_state=False)


def _batches(cfg, seed=5):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    mk_img = lambda k: jax.random.uniform(
        k, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3), minval=-1, maxval=1
    )
    mk_cond = lambda k: jnp.where(
        jax.random.bernoulli(k, 0.5, (cfg.batch_size, cfg.cond_dim)), 0.98, -0.94
    )
    return (mk_img(ks[0]), mk_cond(ks[1])), (mk_img(ks[2]), mk_cond(ks[3]))


def test_spatial_step_matches_single_device(sp_cfg):
    """(4 data x 2 model) mesh with H-sharded images reproduces single-device
    training — XLA's halo exchanges + cross-shard norm reductions are correct.

    Losses must match tightly. Parameters are compared with an atol of ~2
    Adam steps: Adam's scale-free update (m/sqrt(v)) amplifies f32
    reduction-order noise on near-zero gradients into +-1 full step, so
    bitwise parameter equality is not a meaningful criterion — bounded
    drift at the update scale plus tight loss equality is.
    """
    cfg = sp_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _batches(cfg)
    rng = jax.random.PRNGKey(9)

    single = make_train_step(cfg, state.params, donate=False)
    out_single = single(state, b1, b2, rng, jnp.int32(30))

    mesh = make_mesh(8, axis_names=("data", "model"))
    assert mesh.devices.shape == (4, 2)  # batch 4 over data, H=16 halved
    step = make_spatial_train_step(cfg, state.params, mesh, donate=False)
    out_sp = step(
        state, shard_spatial_batch(b1, mesh), shard_spatial_batch(b2, mesh), rng, jnp.int32(30)
    )

    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert abs(float(out_single.metrics[k]) - float(out_sp.metrics[k])) < 1e-3, k

    # one v1-Adam step magnitude at t=1: lr * sqrt(1-b2)/(1-b1) * m/sqrt(v),
    # with |m|/sqrt(v) <= (1-b1)/sqrt(1-b2) for a first step
    max_step = cfg.lr
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(out_single.state.params),
        jax.tree_util.tree_leaves_with_path(out_sp.state.params),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff <= 2.5 * max_step, f"{key}: drift {diff} > 2.5 Adam steps"

    # fake images really are sharded across all 8 devices
    assert len(out_sp.fake_image.sharding.device_set) == 8


def test_spatial_compile_has_no_involuntary_remat(sp_cfg):
    """Round-4 verdict #3 regression gate: the SPMD-partitioned spatial
    program must compile without a single "Involuntary full
    rematerialization" fallback (spmd_partitioner.cc:652). Round 3's
    program had two — at the dense-head -> decoder junctions — fixed by
    the explicit activation constraints in parallel/act_sharding.py.
    The persistent compile cache is disabled for the check: a cache hit
    skips partitioning and would let a regression through silently."""
    from littlegan_tpu.parallel.diagnostics import capture_stderr, count_involuntary_remat

    cfg = sp_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _batches(cfg)
    mesh = make_mesh(8, axis_names=("data", "model"))
    step = make_spatial_train_step(cfg, state.params, mesh, donate=False)
    b1s, b2s = shard_spatial_batch(b1, mesh), shard_spatial_batch(b2, mesh)

    saved_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        with capture_stderr() as cap:
            step.lower(state, b1s, b2s, jax.random.PRNGKey(9), jnp.int32(30)).compile()
    finally:
        jax.config.update("jax_compilation_cache_dir", saved_dir)
    n = count_involuntary_remat(cap.text())
    assert n == 0, f"{n} involuntary-remat warning(s) in the spatial program"


def test_capture_stderr_sees_fd_writes():
    """The diagnostics capture must see raw fd-2 writes (XLA's C++ logs
    bypass sys.stderr) and replay them afterward."""
    import os

    from littlegan_tpu.parallel.diagnostics import capture_stderr

    with capture_stderr() as cap:
        os.write(2, b"raw-fd2-marker\n")
        assert "raw-fd2-marker" in cap.text()  # live during the context
    assert "raw-fd2-marker" in cap.text()  # final after the context


def test_spatial_s2d_compatibility_gate():
    """s2d survives an H-sharded mesh iff BLOCK-space height tiles the model
    axis (round-4: the blanket disable cost a measured 1.43x/1.69x per chip
    at 256²/512² — SCALING.md)."""
    from littlegan_tpu.config import Config
    from littlegan_tpu.training.step import spatial_s2d_compatible

    mesh2 = make_mesh(8, axis_names=("data", "model"))  # (4, 2)
    cfg16 = Config(image_dim=16, init_dim=1, debug=True)
    assert spatial_s2d_compatible(cfg16, mesh2)  # block H 8 % 2 == 0
    assert spatial_s2d_compatible(cfg16, None)  # no mesh: no constraint
    mesh4 = make_mesh(8, axis_names=("model", "data"))  # model axis first: 4
    assert dict(zip(mesh4.axis_names, mesh4.devices.shape))["model"] == 4
    cfg20 = Config(image_dim=20, init_dim=1, debug=True)
    # image 20 tiles 4-way but block space (10) does not -> must disable
    assert not spatial_s2d_compatible(cfg20, mesh4)


def test_spatial_step_keeps_s2d_blocks(sp_cfg):
    """The compiled spatial program must actually run in BLOCK space when
    compatible: the boundary convs consume 4*C=12-channel tensors. (Before
    round 4, make_spatial_train_step silently flipped use_s2d off.)"""
    assert sp_cfg.use_s2d  # default-on config
    state = create_train_state(sp_cfg, jax.random.PRNGKey(0))
    b1, b2 = _batches(sp_cfg)
    mesh = make_mesh(8, axis_names=("data", "model"))
    step = make_spatial_train_step(sp_cfg, state.params, mesh, donate=False)
    b1s, b2s = shard_spatial_batch(b1, mesh), shard_spatial_batch(b2, mesh)
    txt = step.lower(state, b1s, b2s, jax.random.PRNGKey(9), jnp.int32(30)).as_text()
    # StableHLO text: the (3,3,12,C) block-space boundary kernel built from
    # the reference-shaped 5x5 parameter (ops/s2d.py::s2d_conv1_kernel)
    assert "tensor<3x3x12x" in txt, (
        "no 12-channel (4*3) block-space boundary conv in the spatial "
        "program — s2d was disabled under the mesh"
    )
