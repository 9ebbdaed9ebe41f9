"""Tensor-parallel dense heads (Config.shard_dense, parallel/zero.py).

The contract: sharding the init_dim²-scaled dense-head kernels over the
spatial mesh's 'model' axis changes WHERE those params (and their Adam
moments / EMA copy) live, never what the step computes — training must
match the single-device step up to collective reduction order, and the
sharded layout must actually materialize (not silently replicate).
Runs on the virtual 8-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from littlegan_tpu.parallel.mesh import make_mesh
from littlegan_tpu.parallel.spatial import make_spatial_train_step, shard_spatial_batch
from littlegan_tpu.parallel.zero import check_shard_dense, place_state
from littlegan_tpu.training import create_train_state, make_train_step


@pytest.fixture(scope="module")
def sd_cfg(tiny_cfg):
    # init_dim=2 so the model axis (2) divides it: dense-head shards fall on
    # whole H-rows of the reshaped (2, 2, 24) feature map (one row each)
    return tiny_cfg.replace(
        batch_size=4,
        image_dim=32,
        init_dim=2,
        use_partition=False,
        donate_state=False,
        shard_dense=True,
    )


def _batches(cfg, seed=5):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    mk_img = lambda k: jax.random.uniform(
        k, (cfg.batch_size, cfg.image_dim, cfg.image_dim, 3), minval=-1, maxval=1
    )
    mk_cond = lambda k: jnp.where(
        jax.random.bernoulli(k, 0.5, (cfg.batch_size, cfg.cond_dim)), 0.98, -0.94
    )
    return (mk_img(ks[0]), mk_cond(ks[1])), (mk_img(ks[2]), mk_cond(ks[3]))


def _assert_dense_layout(state, mesh):
    """The six _DENSE_HEAD_SPECS leaves are sharded; everything else in
    params is replicated."""
    sharded = {
        ("g_head", "dense", "kernel"): P(None, "model"),
        ("g_head", "dense", "bias"): P("model"),
        ("adj_head", "dense", "kernel"): P(None, "model"),
        ("adj_head", "dense", "bias"): P("model"),
        ("d_head", "pr", "kernel"): P("model", None),
        ("d_head", "cond", "kernel"): P("model", None),
    }
    from jax.sharding import NamedSharding

    same = lambda leaf, spec: leaf.sharding.is_equivalent_to(
        NamedSharding(mesh, spec), leaf.ndim
    )
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        key = tuple(str(getattr(p, "key", p)) for p in path)
        if key in sharded:
            assert not leaf.sharding.is_fully_replicated, key
            assert same(leaf, sharded[key]), (key, leaf.sharding)
        else:
            assert leaf.sharding.is_fully_replicated, key
    # moments follow the param sharding (regardless of shard_opt_state)
    assert same(state.opt_g.mu["g_head"]["dense"]["kernel"], P(None, "model"))
    assert same(state.opt_d.nu["d_head"]["pr"]["kernel"], P("model", None))
    assert same(state.opt_a.mu["adj_head"]["dense"]["kernel"], P(None, "model"))


def test_shard_dense_step_matches_single_device(sd_cfg):
    """(4 data x 2 model) mesh with model-sharded dense heads reproduces
    single-device training. Same tolerance rationale as test_spatial:
    losses tight, params within ~2 Adam steps of f32 reduction-order noise.
    """
    cfg = sd_cfg.replace(shard_opt_state=True)  # compose: moments of NON-dense
    # leaves shard per _moment_spec while the dense moments follow the params
    state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    b1, b2 = _batches(cfg)
    rng = jax.random.PRNGKey(9)

    single = make_train_step(
        cfg.replace(shard_dense=False, shard_opt_state=False), state0.params, donate=False
    )
    out_single = single(state0, b1, b2, rng, jnp.int32(30))

    mesh = make_mesh(8, axis_names=("data", "model"))
    sd_state = place_state(state0, mesh, cfg)
    _assert_dense_layout(sd_state, mesh)
    step = make_spatial_train_step(cfg, state0.params, mesh, donate=False)
    out_sd = step(
        sd_state, shard_spatial_batch(b1, mesh), shard_spatial_batch(b2, mesh), rng, jnp.int32(30)
    )

    for k in ("loss/gen", "loss/disc", "loss/adj"):
        assert abs(float(out_single.metrics[k]) - float(out_sd.metrics[k])) < 1e-3, k

    # the updated state keeps the sharded layout (out_shardings held)
    _assert_dense_layout(out_sd.state, mesh)

    max_step = cfg.lr
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(out_single.state.params),
        jax.tree_util.tree_leaves_with_path(jax.device_get(out_sd.state.params)),
    ):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff <= 2.5 * max_step, f"{key}: drift {diff} > 2.5 Adam steps"


def test_shard_dense_ema_follows(sd_cfg):
    cfg = sd_cfg.replace(ema_decay=0.999)
    mesh = make_mesh(8, axis_names=("data", "model"))
    state = place_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh, cfg)
    from jax.sharding import NamedSharding

    assert state.ema is not None
    ek = state.ema["g_head"]["dense"]["kernel"]
    assert ek.sharding.is_equivalent_to(NamedSharding(mesh, P(None, "model")), ek.ndim)
    # non-dense EMA leaves stay replicated
    assert state.ema["out_conv"]["kernel"].sharding.is_fully_replicated


def test_shard_dense_preconditions(sd_cfg, tiny_cfg):
    # off -> no constraint
    check_shard_dense(tiny_cfg, None)
    with pytest.raises(ValueError, match="needs a \\('data','model'\\) mesh"):
        check_shard_dense(sd_cfg, None)
    with pytest.raises(ValueError, match="needs a \\('data','model'\\) mesh"):
        check_shard_dense(sd_cfg, make_mesh(8))  # DP mesh: no 'model' axis
    smesh = make_mesh(8, axis_names=("data", "model"))
    # tiny_cfg's init_dim=1 is not divisible by the model axis (2)
    with pytest.raises(ValueError, match="divisible by"):
        check_shard_dense(tiny_cfg.replace(shard_dense=True), smesh)
    check_shard_dense(sd_cfg, smesh)  # init_dim=2: fine


def test_shard_dense_trainer_e2e_with_resume(sd_cfg, tmp_path):
    """Full Trainer over the ('data','model') mesh with shard_dense: the
    predict cadence runs on sharded params, the npz checkpoint gathers the
    (single-host-addressable) shards, and a resume re-places the restored
    host tree back onto the sharded layout."""
    import os

    from littlegan_tpu.data.synthetic import SyntheticDataset
    from littlegan_tpu.training.trainer import Trainer

    cfg = sd_cfg.replace(
        epoch=1,
        freq_gen=2,
        freq_test=2,
        mesh_axes=["data", "model"],
        mesh_shape=[4, 2],
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="sd",
        restore=True,
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr._spatial
    assert not tr.state.params["g_head"]["dense"]["kernel"].sharding.is_fully_replicated
    tr.train()
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))
    assert os.listdir(os.path.join(cfg.result_dir, "test", "gen"))  # predict ran

    tr2 = Trainer(cfg.replace(epoch=2), SyntheticDataset(cfg, num_items=4 * cfg.batch_size))
    assert tr2.global_epoch == 2  # restored
    assert not tr2.state.params["g_head"]["dense"]["kernel"].sharding.is_fully_replicated
    tr2.train()
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-2.npz"))


def test_shard_dense_device_store_scan(sd_cfg, tmp_path):
    """shard_dense x device_data x steps_per_dispatch: the K-step scan over
    the H-sharded HBM store runs with model-sharded dense heads and keeps
    them sharded in the carried-out state."""
    import os

    from littlegan_tpu.data.synthetic import SyntheticDataset
    from littlegan_tpu.training.trainer import Trainer

    cfg = sd_cfg.replace(
        epoch=1,
        freq_gen=0,
        freq_test=0,
        mesh_axes=["data", "model"],
        mesh_shape=[4, 2],
        device_data=True,
        steps_per_dispatch=2,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="sd_scan",
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    assert tr.global_step == 4  # 8 batches -> 4 pairs
    k = tr.state.params["g_head"]["dense"]["kernel"]
    assert not k.sharding.is_fully_replicated
    assert not tr.state.opt_a.mu["adj_head"]["dense"]["kernel"].sharding.is_fully_replicated
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_shard_dense_trainer_refuses_without_model_axis(tiny_cfg, tmp_path):
    """A DP-only (or mesh-less) run with shard_dense must fail at build time
    with remediation text, not deep in GSPMD."""
    from littlegan_tpu.training.trainer import Trainer

    cfg = tiny_cfg.replace(
        shard_dense=True,
        batch_size=3,  # not divisible by 8 -> no DP mesh
        all_result_dir=str(tmp_path / "result"),
        exp_name="sd_refuse",
    )
    with pytest.raises(ValueError, match="shard_dense"):
        Trainer(cfg, dataset=None)
    cfg = cfg.replace(batch_size=8, exp_name="sd_refuse_dp")  # DP mesh, no 'model'
    with pytest.raises(ValueError, match="shard_dense"):
        Trainer(cfg, dataset=None)
