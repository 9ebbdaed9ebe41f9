"""Trainer / checkpoint / TB-writer integration tests (SURVEY §4,
reference behaviors: eager_trainer.py train loop, checkpoint/resume,
fixture reuse, predict artifacts, provenance)."""

import json
import os
import struct

import jax
import numpy as np
import pytest

from littlegan_tpu.data.synthetic import SyntheticDataset
from littlegan_tpu.training.checkpoint import Checkpointer
from littlegan_tpu.training.state import create_train_state
from littlegan_tpu.training.trainer import Trainer
from littlegan_tpu.utils.tensorboard import SummaryWriter, _masked_crc, crc32c


@pytest.fixture()
def run_cfg(tiny_cfg, tmp_path):
    return tiny_cfg.replace(
        epoch=1,
        freq_gen=2,
        freq_test=4,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="t",
        use_partition=True,
        restore=True,
        donate_state=False,
    )


@pytest.mark.core
def test_train_one_epoch_produces_artifacts(run_cfg):
    ds = SyntheticDataset(run_cfg, num_items=8 * run_cfg.batch_size)
    tr = Trainer(run_cfg, ds)
    tr.train()
    rd = run_cfg.result_dir
    assert os.path.isfile(os.path.join(rd, "checkpoint", "ckpt-1.npz"))
    assert os.path.isfile(os.path.join(rd, "checkpoint", "status.json"))
    assert os.path.isfile(os.path.join(rd, "config.json"))
    assert os.listdir(os.path.join(rd, "train", "gen"))  # freq_gen grids
    assert os.listdir(os.path.join(rd, "test", "disc"))  # freq_test jsons
    assert os.listdir(os.path.join(rd, "log"))  # TB events
    # fixture persisted with the reference naming (eager_trainer.py:67)
    assert os.path.isfile(
        os.path.join(run_cfg.test_data_dir, f"test_data_{run_cfg.env}.npz")
    )


def test_epoch_callback_fires_after_each_checkpoint(run_cfg):
    """train(epoch_callback=...) fires once per finished epoch, after that
    epoch's checkpoint is durable — the campaign harness hooks its evals
    here (scripts/campaign.py) instead of rebuilding a Trainer per chunk.
    Covers the host-fed path here and the scan path via the device_data
    variant below."""
    cfg = run_cfg.replace(epoch=2)
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    seen = []

    def cb(epoch):
        seen.append(epoch)
        assert os.path.isfile(
            os.path.join(cfg.result_dir, "checkpoint", f"ckpt-{epoch}.npz")
        )

    tr.train(epoch_callback=cb)
    assert seen == [1, 2]

    # scan-dispatch path (device_data + steps_per_dispatch): same contract
    cfg2 = cfg.replace(exp_name="t_cb_scan", device_data=True, steps_per_dispatch=2)
    seen2 = []
    Trainer(cfg2, ds).train(epoch_callback=seen2.append)
    assert seen2 == [1, 2]

    # ASYNC (orbax) backend: the durability promise requires a wait() join
    # before the callback — the epoch dir must be complete when it fires
    cfg3 = cfg.replace(exp_name="t_cb_orbax", extra={"checkpoint_backend": "orbax"})
    seen3 = []

    def cb3(epoch):
        seen3.append(epoch)
        d = os.path.join(cfg3.result_dir, "checkpoint", f"ocp-{epoch}")
        assert os.path.isdir(d) and os.listdir(d), f"incomplete async save at {d}"

    Trainer(cfg3, ds).train(epoch_callback=cb3)
    assert seen3 == [1, 2]


def test_ckpt_every_cadence(run_cfg):
    """ckpt_every=2 over 5 epochs writes only epochs {2, 4} plus the FINAL
    epoch (training must end durable); resume restores from the last saved
    epoch and retrains the gap deterministically. Covers both dispatch
    paths (host-fed and device_data scan)."""
    cfg = run_cfg.replace(epoch=5, ckpt_every=2, freq_gen=0, freq_test=0)
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    Trainer(cfg, ds).train()
    ckdir = os.path.join(cfg.result_dir, "checkpoint")
    tags = sorted(
        int(f[len("ckpt-"):-len(".npz")])
        for f in os.listdir(ckdir)
        if f.startswith("ckpt-") and f[len("ckpt-"):-len(".npz")].isdigit()
    )
    assert tags == [2, 4, 5]
    with open(os.path.join(ckdir, "status.json")) as f:
        assert json.load(f)["epoch"] == 6

    # a run killed between cadence points resumes from the last saved epoch
    cfg2 = cfg.replace(exp_name="t_ck2", epoch=3)
    Trainer(cfg2, ds).train()  # epochs 1-3: saves only {2, 3}
    tr = Trainer(cfg2.replace(epoch=5), ds)
    assert tr.global_epoch == 4  # resumes after epoch 3 (the final save)

    # scan path honors the same cadence
    cfg3 = cfg.replace(exp_name="t_ck_scan", device_data=True, steps_per_dispatch=2)
    Trainer(cfg3, ds).train()
    ckdir3 = os.path.join(cfg3.result_dir, "checkpoint")
    tags3 = sorted(
        int(f[len("ckpt-"):-len(".npz")])
        for f in os.listdir(ckdir3)
        if f.startswith("ckpt-") and f[len("ckpt-"):-len(".npz")].isdigit()
    )
    assert tags3 == [2, 4, 5]


def test_resume_restores_state_and_epoch(run_cfg):
    ds = SyntheticDataset(run_cfg, num_items=8 * run_cfg.batch_size)
    Trainer(run_cfg, ds).train()
    tr2 = Trainer(run_cfg, ds)  # restore=True picks up ckpt-1
    assert tr2.global_epoch == 2
    assert tr2.global_step == 4
    tr2.train()  # nothing left to do (epoch=1) — must not crash


def test_interrupt_checkpoint(run_cfg):
    ds = SyntheticDataset(run_cfg, num_items=8 * run_cfg.batch_size)
    tr = Trainer(run_cfg, ds)
    with pytest.raises(SystemExit) as e:
        tr._save_interrupt()
    assert e.value.code == 1  # reference exits 1 (eager_trainer.py:177-178)
    assert os.path.isfile(os.path.join(run_cfg.result_dir, "checkpoint", "ckpt-interrupt.npz"))
    tr3 = Trainer(run_cfg, ds)
    assert tr3.checkpointer.latest_tag() == "interrupt"


def _params_equal(a, b) -> bool:
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def _interrupt_after_steps(tr, n: int):
    """Set the deferred-SIGINT flag right after the n-th completed step —
    the train loop then saves the interrupt checkpoint at exactly that
    batch boundary (host-fed paths: step_fn == tr._train_step)."""
    orig = tr._train_step
    count = {"n": 0}

    def wrapped(*args, **kwargs):
        out = orig(*args, **kwargs)
        count["n"] += 1
        if count["n"] == n:
            tr._interrupt_requested = True
        return out

    tr._train_step = wrapped


def test_mid_epoch_resume_host_fed(run_cfg):
    """Interrupt at epoch 2 batch 3 (of 6) -> resume -> final params BITWISE
    equal to the uninterrupted run: the deterministic (seed, epoch) batch
    order + the step RNG keyed off the restored global_step make mid-epoch
    resume exact (beyond reference, which restarts the epoch)."""
    ds = SyntheticDataset(run_cfg, num_items=12 * run_cfg.batch_size)
    cfg_a = run_cfg.replace(epoch=2, exp_name="mid_a")
    tr_a = Trainer(cfg_a, ds)
    tr_a.train()

    cfg_b = run_cfg.replace(epoch=2, exp_name="mid_b")
    tr_b = Trainer(cfg_b, ds)
    _interrupt_after_steps(tr_b, 9)  # 6 pairs/epoch -> epoch 2, batch 3
    with pytest.raises(SystemExit):
        tr_b.train()
    status = json.load(open(os.path.join(cfg_b.result_dir, "checkpoint", "status.json")))
    assert (status["epoch"], status["step"], status["batch"]) == (2, 9, 3)

    tr_b2 = Trainer(cfg_b, ds)  # restore=True picks up the interrupt ckpt
    assert tr_b2._resume_batch == 3 and tr_b2.global_step == 9
    tr_b2.train()
    assert tr_b2.global_step == tr_a.global_step
    assert _params_equal(tr_a.state.params, tr_b2.state.params)


def test_mid_epoch_resume_scan_path(run_cfg):
    """Same exactness through the device_data K-step scan dispatch: the
    interrupt lands at a group boundary and resume skips whole groups."""
    base = run_cfg.replace(
        epoch=2, device_data=True, steps_per_dispatch=2, freq_gen=0, freq_test=2
    )
    ds = SyntheticDataset(base, num_items=12 * base.batch_size)
    cfg_a = base.replace(exp_name="scan_a")
    tr_a = Trainer(cfg_a, ds)
    tr_a.train()

    cfg_b = base.replace(exp_name="scan_b")
    tr_b = Trainer(cfg_b, ds)
    # 3 groups/epoch (12 ids, 4 per group), predict fires at every group
    # (freq_test=2, batch_no 2/4/6); flag after call 4 = epoch 2, batch 2
    orig_predict = tr_b.predict
    count = {"n": 0}

    def predict_and_flag(*a, **k):
        out = orig_predict(*a, **k)
        count["n"] += 1
        if count["n"] == 4:
            tr_b._interrupt_requested = True
        return out

    tr_b.predict = predict_and_flag
    with pytest.raises(SystemExit):
        tr_b.train()
    status = json.load(open(os.path.join(cfg_b.result_dir, "checkpoint", "status.json")))
    assert (status["epoch"], status["step"], status["batch"]) == (2, 8, 2)

    tr_b2 = Trainer(cfg_b, ds)
    assert tr_b2._resume_batch == 2
    tr_b2.train()
    assert tr_b2.global_step == tr_a.global_step
    assert _params_equal(tr_a.state.params, tr_b2.state.params)


def test_mid_epoch_resume_grad_accum(run_cfg):
    """The host-fed accumulation path skips 2*M dataset batches per already-
    applied update on resume."""
    base = run_cfg.replace(epoch=2, grad_accum=2, freq_gen=0, freq_test=0)
    ds = SyntheticDataset(base, num_items=12 * base.batch_size)
    cfg_a = base.replace(exp_name="accum_a")
    tr_a = Trainer(cfg_a, ds)
    tr_a.train()

    cfg_b = base.replace(exp_name="accum_b")
    tr_b = Trainer(cfg_b, ds)
    _interrupt_after_steps(tr_b, 4)  # 3 updates/epoch -> epoch 2, update 1
    with pytest.raises(SystemExit):
        tr_b.train()
    status = json.load(open(os.path.join(cfg_b.result_dir, "checkpoint", "status.json")))
    assert (status["epoch"], status["step"], status["batch"]) == (2, 4, 1)

    tr_b2 = Trainer(cfg_b, ds)
    tr_b2.train()
    assert _params_equal(tr_a.state.params, tr_b2.state.params)


def test_interrupt_during_epoch_save_does_not_double_train(run_cfg):
    """A SIGINT landing during the end-of-epoch checkpoint used to write an
    interrupt status pointing at the epoch that JUST finished — resume then
    re-trained the whole epoch on its own weights. With "batch" in the
    status the resumed run skips the finished epoch's batches instead."""
    ds = SyntheticDataset(run_cfg, num_items=8 * run_cfg.batch_size)
    cfg_a = run_cfg.replace(epoch=2, exp_name="win_a")
    tr_a = Trainer(cfg_a, ds)
    tr_a.train()

    cfg_b = run_cfg.replace(epoch=2, exp_name="win_b")
    tr_b = Trainer(cfg_b, ds)
    orig_save = tr_b.checkpointer.save

    def save_then_flag(tag, tree, status=None):
        out = orig_save(tag, tree, status)
        if tag == "1":
            tr_b._interrupt_requested = True
        return out

    tr_b.checkpointer.save = save_then_flag
    with pytest.raises(SystemExit):
        tr_b.train()
    status = json.load(open(os.path.join(cfg_b.result_dir, "checkpoint", "status.json")))
    # the in-flight epoch is 1 with ALL 4 of its batches complete
    assert (status["epoch"], status["batch"]) == (1, 4)

    tr_b2 = Trainer(cfg_b, ds)
    tr_b2.train()  # epoch 1 resumes past its end (0 steps), epoch 2 trains
    assert tr_b2.global_step == tr_a.global_step
    assert _params_equal(tr_a.state.params, tr_b2.state.params)


def test_predict_artifacts(run_cfg, tmp_path):
    ds = SyntheticDataset(run_cfg, num_items=4 * run_cfg.batch_size)
    tr = Trainer(run_cfg, ds)
    gen_p = str(tmp_path / "g.jpg")
    json_p = str(tmp_path / "d.json")
    adj_p = str(tmp_path / "a.jpg")
    gen, save, adj_r, adj_f = tr.predict(
        tr.test_noise, tr.test_cond, tr.test_image, gen_p, json_p, adj_p
    )
    assert gen.shape == tr.test_image.shape
    assert os.path.isfile(gen_p) and os.path.isfile(adj_p)
    d = json.load(open(json_p))
    # rounded-percentage int lists + MSE floats (eager_trainer.py:277-289)
    assert isinstance(d["real_pr"][0][0], int)
    for k in ("real_pr_mse", "real_c_mse", "fake_pr_mse", "fake_c_mse"):
        assert isinstance(d[k], float)
    assert adj_r is not None and adj_f is not None


def test_fixture_reuse_contract(run_cfg):
    ds = SyntheticDataset(run_cfg, num_items=4 * run_cfg.batch_size)
    tr1 = Trainer(run_cfg, ds)
    cfg_reuse = run_cfg.replace(reuse=True)
    tr2 = Trainer(cfg_reuse, ds)
    np.testing.assert_array_equal(tr1.test_noise, tr2.test_noise)
    np.testing.assert_array_equal(tr1.test_image, tr2.test_image)


def test_plot_lists_all_models(run_cfg):
    tr = Trainer(run_cfg, None)
    text = tr.plot()
    for name in ("Encoder", "Decoder", "Discriminator", "Generator", "Adjuster"):
        assert f"Model: {name}" in text
    assert os.path.isfile(os.path.join(run_cfg.result_dir, "models.txt"))


def test_export_weights_only(run_cfg):
    tr = Trainer(run_cfg, None)
    path = tr.export_model_checkpoint()
    assert os.path.isfile(path)
    with np.load(path) as z:
        keys = list(z.files)
    assert any(k.startswith("encoder") for k in keys)
    assert not any("opt" in k or "mu" in k for k in keys)  # weights only


# ------------------------------------------------------------- checkpoint ----


def test_checkpoint_roundtrip_exact(tiny_cfg, tmp_path):
    state = create_train_state(tiny_cfg, jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path))
    ck.save("7", state, {"epoch": 8, "step": 99})
    restored, status = ck.restore_latest(state)
    assert status == {"epoch": 8, "step": 99}
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_rejected(tiny_cfg, tmp_path):
    state = create_train_state(tiny_cfg, jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path))
    ck.save("1", state)
    other = create_train_state(tiny_cfg.replace(noise_dim=7), jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        ck.restore("1", other)


# ------------------------------------------------------------- tensorboard ---


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_event_file_framing(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalar("loss/gen", 1.5, step=3)
    w.scalars([("a", 1.0), ("b", 2.0)], step=4)
    w.close()
    fn = [f for f in os.listdir(tmp_path) if f.startswith("events")][0]
    data = open(os.path.join(tmp_path, fn), "rb").read()
    off, n = 0, 0
    while off < len(data):
        (length,) = struct.unpack("<Q", data[off : off + 8])
        (lcrc,) = struct.unpack("<I", data[off + 8 : off + 12])
        assert lcrc == _masked_crc(data[off : off + 8])
        payload = data[off + 12 : off + 12 + length]
        (pcrc,) = struct.unpack("<I", data[off + 12 + length : off + 16 + length])
        assert pcrc == _masked_crc(payload)
        off += 16 + length
        n += 1
    assert n == 3  # header + 2 scalar events
    assert b"loss/gen" in data and b"brain.Event:2" in data


def test_trainer_uses_data_parallel_when_divisible(tiny_cfg, tmp_path):
    """batch divisible by device count -> trainer trains over the 8-device mesh."""
    cfg = tiny_cfg.replace(
        batch_size=8,
        epoch=1,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="dp",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    tr.train()
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_orbax_backend_roundtrip(tiny_cfg, tmp_path):
    from littlegan_tpu.training.checkpoint import OrbaxCheckpointer

    state = create_train_state(tiny_cfg, jax.random.PRNGKey(0))
    ck = OrbaxCheckpointer(str(tmp_path / "ocp"))
    ck.save("3", state._asdict(), {"epoch": 4, "step": 12})
    ck.wait()
    restored, status = ck.restore_latest(state._asdict())
    assert status == {"epoch": 4, "step": 12}
    for a, b in zip(jax.tree_util.tree_leaves(state._asdict()), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_spatial_mesh_from_config(tiny_cfg, tmp_path):
    """mesh_axes=['data','model'] selects the spatially-sharded step."""
    cfg = tiny_cfg.replace(
        batch_size=4,
        epoch=1,
        freq_gen=100,
        freq_test=100,
        mesh_axes=["data", "model"],
        mesh_shape=[4, 2],
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="sp",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr._spatial and tr.mesh.devices.shape == (4, 2)
    tr.train()
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_checkpoint_retention(tiny_cfg, tmp_path):
    cfg = tiny_cfg.replace(
        epoch=4,
        keep_checkpoints=2,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="kr",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    kept = sorted(
        f for f in os.listdir(os.path.join(cfg.result_dir, "checkpoint")) if f.startswith("ckpt-")
    )
    assert kept == ["ckpt-3.npz", "ckpt-4.npz"]


def test_pinned_checkpoint_survives_retention(tiny_cfg, tmp_path):
    """pin_checkpoint() exempts an epoch from the rolling retention window
    (campaign best-FID pinning); unpinning makes it prunable again."""
    cfg = tiny_cfg.replace(
        epoch=4,
        keep_checkpoints=2,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="pin",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train(epoch_callback=lambda ep: tr.pin_checkpoint(1) if ep == 1 else None)
    ckdir = os.path.join(cfg.result_dir, "checkpoint")
    kept = sorted(f for f in os.listdir(ckdir) if f.startswith("ckpt-"))
    assert kept == ["ckpt-1.npz", "ckpt-3.npz", "ckpt-4.npz"]
    tr.unpin_checkpoint(1)
    tr._prune_checkpoints(keep=2)
    kept = sorted(f for f in os.listdir(ckdir) if f.startswith("ckpt-"))
    assert kept == ["ckpt-3.npz", "ckpt-4.npz"]


def test_trainer_with_orbax_backend(tiny_cfg, tmp_path):
    cfg = tiny_cfg.replace(
        epoch=1,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="ob",
        donate_state=False,
        extra={"checkpoint_backend": "orbax"},
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    tr.checkpointer.wait()
    assert tr.checkpointer.latest_tag() == "1"
    tr2 = Trainer(cfg, ds)
    assert tr2.global_epoch == 2


def test_device_data_mode(tiny_cfg, tmp_path):
    """device_data=True trains from the HBM-resident dataset (on-device
    gathers, no per-step host transfer) and still produces checkpoints."""
    cfg = tiny_cfg.replace(
        epoch=2,
        device_data=True,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="dd",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    assert tr._device_store is not None  # uploaded once, reused across epochs
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-2.npz"))


def test_device_data_with_dp_mesh(tiny_cfg, tmp_path):
    """device_data composed with the DP mesh (ADVICE r1 medium: this combo
    used to crash at store upload): batch 8 on 8 virtual devices selects the
    DP path; the sharded store + scanned dispatch must train end to end."""
    cfg = tiny_cfg.replace(
        batch_size=8,
        epoch=1,
        device_data=True,
        steps_per_dispatch=2,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="ddp",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr.mesh is not None, "8 virtual devices + batch 8 must select DP"
    tr.train()
    imgs_dev, conds_dev = tr._device_store
    assert imgs_dev.shape[:2] == (8, cfg.batch_size)
    assert len(imgs_dev.sharding.device_set) == 8  # store sharded over mesh
    assert tr.global_step == 4
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_device_data_with_spatial_mesh(tiny_cfg, tmp_path):
    """device_data under the ('data','model') spatial mesh: store sharded
    P(None,'data','model'), one-step dispatches, end-to-end train."""
    cfg = tiny_cfg.replace(
        batch_size=4,
        epoch=1,
        device_data=True,
        mesh_axes=["data", "model"],
        mesh_shape=[4, 2],
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="dsp",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr._spatial
    tr.train()
    assert tr.global_step == 4
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_steps_per_dispatch_warns_without_device_data(tiny_cfg, tmp_path, capsys):
    """ADVICE r1: steps_per_dispatch>1 outside device_data must say so, not
    silently run one step per dispatch."""
    cfg = tiny_cfg.replace(
        epoch=1,
        steps_per_dispatch=4,
        freq_gen=100,
        freq_test=100,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="warn",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    assert "steps_per_dispatch" in capsys.readouterr().out
    assert tr.global_step == 2  # one step per dispatch, 4 batches -> 2 steps


def test_steps_per_dispatch_matches_sequential(tiny_cfg, tmp_path):
    """K-steps-per-dispatch (lax.scan) must produce EXACTLY the same params
    as one-step dispatches: same PRNG stream, same batch_no schedule."""
    common = dict(
        epoch=1,
        device_data=True,
        freq_gen=1000,
        freq_test=1000,
        test_data_dir=str(tmp_path / "test-data"),
        donate_state=False,
        use_partition=True,
    )
    cfg1 = tiny_cfg.replace(
        steps_per_dispatch=1, all_result_dir=str(tmp_path / "r1"), exp_name="a", **common
    )
    cfg4 = tiny_cfg.replace(
        steps_per_dispatch=4, all_result_dir=str(tmp_path / "r4"), exp_name="b", **common
    )
    ds = SyntheticDataset(cfg1, num_items=16 * cfg1.batch_size)  # 16 batches = 8 steps
    tr1 = Trainer(cfg1, ds)
    tr1.train()
    tr4 = Trainer(cfg4, ds, init_rng=jax.random.PRNGKey(cfg4.seed))
    tr4.train()
    assert tr1.global_step == tr4.global_step == 8
    # scan vs unrolled compile to different reduction orders; Adam's
    # scale-free update amplifies that to at most ~1 step on scalar-reduced
    # leaves — compare at the update scale (same rationale as test_spatial)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(tr1.state.params),
        jax.tree_util.tree_leaves_with_path(tr4.state.params),
    ):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff <= 2.5 * cfg1.lr, (
            "/".join(str(getattr(p, "key", p)) for p in path),
            diff,
        )


def test_scan_dispatch_artifacts_and_metrics(tiny_cfg, tmp_path):
    """Scanned-dispatch path writes cadence artifacts (group-snapped) and
    per-step TB scalars."""
    cfg = tiny_cfg.replace(
        epoch=1,
        device_data=True,
        steps_per_dispatch=2,
        freq_gen=2,
        freq_test=4,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="sc",
        donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=16 * cfg.batch_size)  # 8 steps, 4 dispatches
    tr = Trainer(cfg, ds)
    tr.train()
    rd = cfg.result_dir
    assert os.listdir(os.path.join(rd, "train", "gen"))
    assert os.listdir(os.path.join(rd, "test", "disc"))
    # TB log contains one scalar event per STEP (+1 header), not per dispatch
    log_dir = os.path.join(rd, "log")
    fn = [f for f in os.listdir(log_dir) if f.startswith("events")][0]
    data = open(os.path.join(log_dir, fn), "rb").read()
    assert data.count(b"loss/gen") == 8


def test_orbax_latest_tag_ignores_partial_tmp_dirs(tiny_cfg, tmp_path):
    """A crash mid-async-save leaves '*.orbax-checkpoint-tmp-*' dirs; restore
    must fall back to the last COMPLETE checkpoint, not the partial one."""
    from littlegan_tpu.training.checkpoint import OrbaxCheckpointer
    from littlegan_tpu.training.state import create_train_state

    ck = OrbaxCheckpointer(str(tmp_path / "ckpt"))
    state = create_train_state(tiny_cfg, jax.random.PRNGKey(0))
    ck.save("3", state, {"epoch": 4})
    ck.wait()
    # simulate a preempted save: newer-mtime partial directory
    os.makedirs(tmp_path / "ckpt" / "ocp-4.orbax-checkpoint-tmp-99")
    assert ck.latest_tag() == "3"
    restored, status = ck.restore_latest(state)
    assert status["epoch"] == 4
    assert ck.epoch_tags() == [3]


def test_checkpointer_epoch_tags_and_delete(tiny_cfg, tmp_path):
    from littlegan_tpu.training.checkpoint import Checkpointer
    from littlegan_tpu.training.state import create_train_state

    ck = Checkpointer(str(tmp_path / "ckpt"))
    state = create_train_state(tiny_cfg, jax.random.PRNGKey(0))
    for tag in ("1", "2", "3", "interrupt"):
        ck.save(tag, state)
    assert ck.epoch_tags() == [1, 2, 3]  # non-numeric tags are not prunable
    ck.delete(1)
    assert ck.epoch_tags() == [2, 3]
    assert ck.latest_tag() == "interrupt"  # mtime-newest wins (resume parity)


def test_interrupt_flushes_buffered_metrics(run_cfg):
    """SIGINT must not drop the metrics buffered since the last flush."""
    from littlegan_tpu.training.trainer import Trainer

    tr = Trainer(run_cfg)
    tr._metrics_buffer.append(
        (1, 1, {"loss/gen": np.float32(1.0), "loss/disc": np.float32(2.0), "loss/adj": np.float32(0.0)})
    )
    with pytest.raises(SystemExit):
        tr._save_interrupt()
    assert tr._metrics_buffer == []
    log_dir = os.path.join(run_cfg.result_dir, "log")
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(log_dir))


def test_profile_steps_on_scan_path(run_cfg):
    """profile_steps must produce a trace in the steps_per_dispatch scan mode
    (it used to be silently ignored there)."""
    cfg = run_cfg.replace(
        device_data=True, steps_per_dispatch=2, profile_steps=2, epoch=1,
        freq_gen=1000, freq_test=1000,
    )
    ds = SyntheticDataset(cfg, num_items=16 * cfg.batch_size)
    Trainer(cfg, ds).train()
    profile_dir = os.path.join(cfg.result_dir, "log", "profile")
    assert os.path.isdir(profile_dir)
    assert any(os.scandir(profile_dir)), "no trace files written"


def test_grad_accum_epoch(run_cfg):
    """grad_accum=2 trains end to end: half the applied updates, same
    artifact flow; incompatible combinations are rejected."""
    cfg = run_cfg.replace(grad_accum=2, epoch=1, freq_gen=2, freq_test=100)
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    # 8 batches -> 4 pairs -> 2 accum groups = 2 applied updates
    assert tr.global_step == 2
    assert os.path.isfile(
        os.path.join(cfg.result_dir, "train", "gen", "1-2.jpg")
    )


def test_grad_accum_device_data_matches_host_fed(tiny_cfg, tmp_path):
    """grad_accum x device_data (scan-accum step) must produce the same
    updates as the host-fed accumulation path: unified epoch-order stream,
    same per-update PRNG (fold_in(base, global_step)) and batch_no schedule.

    Needs a FILE-backed dataset (content fixed across epochs — the store is
    canonical-order content that every epoch permutes; SyntheticDataset
    draws fresh IID data per epoch, so the two pipelines would see different
    bytes). 12 batches = 6 pairs = 3 updates; the device path runs them as
    one full 2-update dispatch + a 1-update remainder scan (both paths hit)."""
    from PIL import Image

    from littlegan_tpu.data import CelebA

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    lines = ["48", " ".join(f"A{i}" for i in range(40))]
    for i in range(48):
        name = f"{i:06d}.jpg"
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            img_dir / name, quality=95
        )
        lines.append(name + " " + " ".join(str(v) for v in rng.choice([-1, 1], size=40)))
    (tmp_path / "attrs.txt").write_text("\n".join(lines))

    common = dict(
        image_path=str(img_dir), attr_path=str(tmp_path / "attrs.txt"),
        batch_size=4, grad_accum=2, epoch=1, freq_gen=1000, freq_test=1000,
        use_partition=True, all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"), donate_state=False, restore=True,
    )
    cfg_h = tiny_cfg.replace(exp_name="ah", **common)
    cfg_d = tiny_cfg.replace(exp_name="ad", device_data=True, steps_per_dispatch=2, **common)
    tr_h = Trainer(cfg_h, CelebA(cfg_h))
    tr_h.train()
    tr_d = Trainer(cfg_d, CelebA(cfg_d), init_rng=jax.random.PRNGKey(cfg_d.seed))
    tr_d.train()
    assert tr_h.global_step == tr_d.global_step == 3
    # scan vs unrolled reduction orders: compare at the Adam-update scale
    # (same rationale as test_steps_per_dispatch_matches_sequential)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(tr_h.state.params),
        jax.tree_util.tree_leaves_with_path(tr_d.state.params),
    ):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert diff <= 2.5 * cfg_h.lr, (
            "/".join(str(getattr(p, "key", p)) for p in path),
            diff,
        )


def test_grad_accum_device_data_dp_mesh(run_cfg):
    """grad_accum x device_data x DP: the mesh-sharded store feeds the
    scan-accum step; micro-batches come out P('data')-sharded with one
    all-reduced apply per update."""
    cfg = run_cfg.replace(
        batch_size=8, grad_accum=2, device_data=True, steps_per_dispatch=2,
        epoch=1, freq_gen=1000, freq_test=1000,
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr.mesh is not None, "8 virtual devices + batch 8 must pick the DP mesh"
    tr.train()
    assert tr.global_step == 2  # 8 batches = 4 pairs = 2 accumulated updates
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_grad_accum_spatial_mesh_host_fed(tiny_cfg, tmp_path):
    """grad_accum x spatial ('data','model') mesh, host-fed: (M, B, H, ...)
    micro stacks sharded P(None,'data','model')."""
    cfg = tiny_cfg.replace(
        batch_size=4, grad_accum=2, epoch=1, freq_gen=100, freq_test=100,
        mesh_axes=["data", "model"], mesh_shape=[4, 2],
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="spa", donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr._spatial and tr.mesh.devices.shape == (4, 2)
    tr.train()
    assert tr.global_step == 2
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_spatial_multihost_hostfed_build(tiny_cfg, tmp_path, monkeypatch):
    """Host-fed spatial multi-host (round 3): when the dataset supports
    per-host row slicing and the model axis stays within one process, the
    Trainer builds WITHOUT refusal and slices batch_size/n_proc rows per
    host (the real 2-process run lives in tests/test_multihost.py). A
    dataset lacking set_rows_per_batch still refuses at build time with the
    remediation text."""
    import jax as _jax

    cfg = tiny_cfg.replace(
        batch_size=4, grad_accum=2, epoch=1,
        mesh_axes=["data", "model"], mesh_shape=[4, 2],
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="spmh", donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    # the fixture's cross-host collectives consult the (monkeypatched)
    # process count inside multihost_utils — stub them to single-process
    # identities; the REAL collective path runs in tests/test_multihost.py
    from jax.experimental import multihost_utils as _mhu

    monkeypatch.setattr(_mhu, "process_allgather", lambda x, tiled=False: np.asarray([x]))
    monkeypatch.setattr(_mhu, "broadcast_one_to_all", lambda x: x)
    tr = Trainer(cfg, ds)
    assert tr._hostfed_rows_sliced and ds.rows_per_batch == cfg.batch_size // 2

    class _NoSlice:  # same dataset, slicing API hidden
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name == "set_rows_per_batch":
                raise AttributeError(name)
            return getattr(self._inner, name)

    ds2 = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    with pytest.raises(ValueError, match="host-fed spatial multi-host"):
        Trainer(cfg.replace(exp_name="spmh2"), _NoSlice(ds2))

    # dataset-less modes (plot / export-model / predict) never feed a train
    # batch — the refusal must NOT fire for them on a multi-process config
    tr3 = Trainer(cfg.replace(exp_name="spmh3", mode="plot"), None)
    assert tr3._spatial and not tr3._hostfed_rows_sliced


def test_grad_accum_device_data_spatial_mesh(tiny_cfg, tmp_path):
    """grad_accum x device_data x spatial: the H-sharded store feeds the
    scan-accum step (P(None,'data','model') gathers)."""
    cfg = tiny_cfg.replace(
        batch_size=4, grad_accum=2, device_data=True, epoch=1,
        freq_gen=100, freq_test=100,
        mesh_axes=["data", "model"], mesh_shape=[4, 2],
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        exp_name="spd", donate_state=False,
    )
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr._spatial
    tr.train()
    assert tr.global_step == 2
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_scan_path_remainder_dispatch_full_coverage(run_cfg):
    """steps_per_dispatch must not drop whole trailing groups: an epoch with
    n_batches % 2K != 0 runs the remainder through a smaller scan — only the
    reference-parity single odd batch may be dropped."""
    cfg = run_cfg.replace(
        device_data=True, steps_per_dispatch=3, epoch=1,
        freq_gen=1000, freq_test=1000,
    )
    # 10 batches, 2K=6: one full group (6) + remainder 4 -> 2 more steps
    ds = SyntheticDataset(cfg, num_items=10 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    assert tr.global_step == 5  # all 10 batches consumed (5 steps x 2)


def test_scan_remainder_fires_cadences(run_cfg):
    """A freq_gen cadence crossing INSIDE the trailing remainder group must
    still produce its artifact (the remainder shares the cadence path)."""
    cfg = run_cfg.replace(
        device_data=True, steps_per_dispatch=3, epoch=1,
        freq_gen=4, freq_test=1000,
    )
    ds = SyntheticDataset(cfg, num_items=10 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    # 10 batches -> full group (steps 1-3) + remainder (steps 4-5);
    # batch_no 3 -> 5 crosses freq_gen=4 inside the remainder
    gen_dir = os.path.join(cfg.result_dir, "train", "gen")
    assert os.listdir(gen_dir), "cadence inside the remainder group produced no artifact"


def test_grad_accum_composes_with_dp_mesh(run_cfg):
    """grad_accum x DP (round-2 verdict #3): batch 8 over the 8-device mesh
    with 2-pair accumulation trains end to end — the trainer must build the
    mesh-sharded accumulation step instead of refusing."""
    cfg = run_cfg.replace(batch_size=8, grad_accum=2, epoch=1, freq_gen=2, freq_test=100)
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    assert tr.mesh is not None, "8 virtual devices + batch 8 must pick the DP mesh"
    tr.train()
    # 8 batches -> 4 pairs -> 2 accum groups = 2 applied updates
    assert tr.global_step == 2
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))


def test_deferred_sigint_saves_and_exits(run_cfg):
    """SIGINT is deferred (advisor r2): the handler only sets a flag; the
    train loop flushes, checkpoints and exits at the next step boundary —
    never from signal-handler context (orbax AsyncCheckpointer is not
    reentrant)."""
    import signal as _signal
    import threading as _threading

    cfg = run_cfg.replace(epoch=50, freq_gen=1000, freq_test=1000)
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    timer = _threading.Timer(1.0, os.kill, (os.getpid(), _signal.SIGINT))
    timer.start()
    with pytest.raises(SystemExit) as e:
        tr.train()
    timer.cancel()
    assert e.value.code == 1  # reference exits 1 (eager_trainer.py:177-178)
    assert tr._interrupt_requested  # flag path, not an in-handler save
    assert os.path.isfile(
        os.path.join(cfg.result_dir, "checkpoint", "ckpt-interrupt.npz")
    )


def test_second_sigint_escalates(run_cfg):
    """First Ctrl-C defers (flag only); a SECOND Ctrl-C raises
    KeyboardInterrupt immediately — a run wedged in a collective must stay
    killable without SIGKILL (round-3 review finding)."""
    ds = SyntheticDataset(run_cfg, num_items=8 * run_cfg.batch_size)
    tr = Trainer(run_cfg, ds)
    tr._request_interrupt()
    assert tr._interrupt_requested
    with pytest.raises(KeyboardInterrupt):
        tr._request_interrupt()


def test_nonfinite_loss_warns_once(run_cfg, capsys):
    """Divergence observability: a NaN loss in the flushed metrics prints
    one loud warning naming the step (and only one per run)."""
    ds = SyntheticDataset(run_cfg, num_items=4 * run_cfg.batch_size)
    tr = Trainer(run_cfg, ds)
    bad = {
        "loss/gen": np.float32("nan"),
        "loss/disc": np.float32(1.0),
        "loss/adj": np.float32(1.0),
    }
    tr._flush_metrics([(7, 7, bad)])
    tr._flush_metrics([(8, 8, bad)])
    out = capsys.readouterr().out
    assert out.count("non-finite loss") == 1
    assert "step 7" in out


def test_divergence_freezes_pruning_and_opt_in_halt(run_cfg, capsys):
    """After a non-finite loss: checkpoint pruning stops (the pre-divergence
    epochs are the recovery path), and halt_on_nonfinite raises at the next
    flush."""
    ds = SyntheticDataset(run_cfg, num_items=4 * run_cfg.batch_size)
    tr = Trainer(run_cfg, ds)
    bad = {
        "loss/gen": np.float32("inf"),
        "loss/disc": np.float32(1.0),
        "loss/adj": np.float32(1.0),
    }
    # seed three epoch checkpoints, then diverge
    for tag in ("1", "2", "3"):
        tr.checkpointer.save(tag, tr.state, {"epoch": int(tag)})
    tr.checkpointer.wait()
    tr._flush_metrics([(5, 5, bad)])
    assert tr._nonfinite_warned
    tr._prune_checkpoints(keep=1)  # must be a no-op now
    assert len(tr.checkpointer.epoch_tags()) == 3
    capsys.readouterr()

    halt = Trainer(run_cfg.replace(halt_on_nonfinite=True, exp_name="halt"), ds)
    halt._metrics_buffer.append((5, 5, bad))
    with pytest.raises(RuntimeError, match="halt_on_nonfinite"):
        halt._flush_buffered()


def test_ema_predict_export_and_resume(run_cfg, tmp_path):
    """ema_decay end to end: training carries the EMA subtrees, predict and
    export-model use them (training/state.py::eval_params), and resume
    restores them."""
    from littlegan_tpu.training.state import G_KEYS, eval_params

    cfg = run_cfg.replace(ema_decay=0.9, epoch=1, freq_gen=100, freq_test=100)
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    tr.train()
    assert tr.state.ema is not None and set(tr.state.ema) == set(G_KEYS)
    # trained params moved away from the (slow-moving) EMA copy
    diff = float(
        np.abs(
            np.asarray(tr.state.ema["g_head"]["dense"]["kernel"])
            - np.asarray(tr.state.params["g_head"]["dense"]["kernel"])
        ).max()
    )
    assert diff > 0

    ep = eval_params(tr.state)
    np.testing.assert_array_equal(
        np.asarray(ep["g_head"]["dense"]["kernel"]),
        np.asarray(tr.state.ema["g_head"]["dense"]["kernel"]),
    )
    # predict runs on the EMA weights: patch the gen jit to capture params
    seen = {}
    real = tr._gen_jit
    tr._gen_jit = lambda p, n, c: (seen.setdefault("p", p), real(p, n, c))[1]
    tr.predict(tr.test_noise, tr.test_cond, tr.test_image)
    np.testing.assert_array_equal(
        np.asarray(seen["p"]["g_head"]["dense"]["kernel"]),
        np.asarray(tr.state.ema["g_head"]["dense"]["kernel"]),
    )
    tr._gen_jit = real

    # export writes EMA weights
    path = tr.export_model_checkpoint()
    assert os.path.isfile(path)
    from littlegan_tpu.models import init_params
    import jax

    template = init_params(cfg, jax.random.PRNGKey(0))
    restored = Checkpointer(os.path.join(cfg.result_dir, "model")).restore("model", template)
    np.testing.assert_array_equal(
        np.asarray(restored["g_head"]["dense"]["kernel"]),
        np.asarray(tr.state.ema["g_head"]["dense"]["kernel"]),
    )

    # resume restores the ema subtree
    tr2 = Trainer(cfg, ds)
    assert tr2.state.ema is not None
    np.testing.assert_array_equal(
        np.asarray(tr2.state.ema["g_head"]["dense"]["kernel"]),
        np.asarray(tr.state.ema["g_head"]["dense"]["kernel"]),
    )


def test_latest_tag_orders_epochs_numerically(tiny_cfg, tmp_path):
    """Epoch checkpoints are ordered by tag NUMBER, not mtime: a result dir
    copied without mtime preservation (or same-tick saves) must not resume
    a stale epoch. 'interrupt' still wins only when its FILE is newer."""
    state = create_train_state(tiny_cfg, jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path))
    ck.save("9", state, {"epoch": 10})
    ck.save("10", state, {"epoch": 11})
    # perturb mtimes: make ckpt-9 look newer than ckpt-10
    late = os.path.getmtime(os.path.join(str(tmp_path), "ckpt-10.npz")) + 100
    os.utime(os.path.join(str(tmp_path), "ckpt-9.npz"), (late, late))
    assert ck.latest_tag() == "10"
    # an interrupt checkpoint NEWER than the newest epoch wins...
    ck.save("interrupt", state, {"epoch": 11})
    os.utime(os.path.join(str(tmp_path), "ckpt-interrupt.npz"), (late + 100, late + 100))
    assert ck.latest_tag() == "interrupt"
    # ...but an OLDER one does not
    os.utime(os.path.join(str(tmp_path), "ckpt-interrupt.npz"), (late - 200, late - 200))
    assert ck.latest_tag() == "10"


def test_restore_latest_reconciles_stale_status(tiny_cfg, tmp_path):
    """Crash window between the checkpoint rename and the status write:
    status.json lags the newest checkpoint by one epoch — resuming as-is
    would train that epoch TWICE on its own weights. The npz backend must
    reconcile from the tag (like the orbax backend's deferred-status
    reconcile)."""
    state = create_train_state(tiny_cfg, jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path))
    ck.save("4", state, {"epoch": 5, "step": 20, "batch": 3})  # from an interrupt
    ck.save("5", state, None)  # crash before _write_status: status stays 5
    with open(os.path.join(str(tmp_path), "status.json")) as f:
        assert json.load(f)["epoch"] == 5
    _, status = ck.restore_latest(state)
    assert status["epoch"] == 6  # re-derived from ckpt-5, not the stale file
    # the stale mid-epoch resume point belongs to epoch 5 — carrying it into
    # the re-derived epoch 6 would silently skip its first 3 batches
    assert status["batch"] == 0


def test_multihost_without_mesh_or_slicing_refused(tiny_cfg, tmp_path, monkeypatch):
    """Two silent multi-host failure modes must refuse at build time:
    (a) batch not divisible by global devices -> mesh=None -> n_proc
    INDEPENDENT models training silently; (b) a DP mesh with a dataset
    lacking set_rows_per_batch -> n_proc-inflated global batch."""
    import jax as _jax

    from jax.experimental import multihost_utils as _mhu

    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    monkeypatch.setattr(_mhu, "process_allgather", lambda x, tiled=False: np.asarray([x]))
    monkeypatch.setattr(_mhu, "broadcast_one_to_all", lambda x: x)

    base = tiny_cfg.replace(
        epoch=1,
        all_result_dir=str(tmp_path / "result"),
        test_data_dir=str(tmp_path / "test-data"),
        donate_state=False,
    )
    # (a) 8 virtual devices, batch 6: no mesh -> refuse under multi-process
    cfg_a = base.replace(batch_size=6, exp_name="mh_nomesh")
    ds_a = SyntheticDataset(cfg_a, num_items=8 * cfg_a.batch_size)
    with pytest.raises(ValueError, match="independent"):
        Trainer(cfg_a, ds_a)

    # (b) DP mesh but the dataset hides set_rows_per_batch -> refuse
    class _NoSlice:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name == "set_rows_per_batch":
                raise AttributeError(name)
            return getattr(self._inner, name)

    cfg_b = base.replace(batch_size=8, exp_name="mh_noslice")
    ds_b = SyntheticDataset(cfg_b, num_items=8 * cfg_b.batch_size)
    with pytest.raises(ValueError, match="row slicing"):
        Trainer(cfg_b, _NoSlice(ds_b))


def test_predict_logs_tb_images(run_cfg, tmp_path):
    """The freq_test predict cadence logs test/gen (and test/adj) image
    summaries when training opened the writer; sampling-mode predicts (no
    writer yet) must NOT create an event file; tb_images=false disables."""
    from littlegan_tpu.data.synthetic import SyntheticDataset

    cfg = run_cfg.replace(epoch=1, freq_test=2, tb_images=True)
    # one step consumes TWO batches (reference semantics): 32 items -> 4 steps
    tr = Trainer(cfg, SyntheticDataset(cfg, num_items=32))
    tr.train()
    log_dir = os.path.join(cfg.result_dir, "log")
    (fname,) = [f for f in os.listdir(log_dir) if f.startswith("events")]
    data = open(os.path.join(log_dir, fname), "rb").read()
    # legacy Summary.Image events carry a PNG: magic bytes must appear
    assert b"\x89PNG\r\n\x1a\n" in data
    assert b"test/gen" in data
    assert (b"test/adj" in data) == cfg.train_adj

    # no-writer predict (sampling modes) creates no event file
    cfg2 = cfg.replace(exp_name="tbi2", reuse=True, restore=False)
    tr2 = Trainer(cfg2, None)
    tr2.predict(tr2.test_noise, tr2.test_cond, tr2.test_image)
    assert not os.path.isdir(os.path.join(cfg2.result_dir, "log")) or not os.listdir(
        os.path.join(cfg2.result_dir, "log")
    )

    # tb_images=false: scalars still flow, no PNG records
    cfg3 = cfg.replace(exp_name="tbi3", tb_images=False, restore=False)
    tr3 = Trainer(cfg3, SyntheticDataset(cfg3, num_items=32))
    tr3.train()
    log3 = os.path.join(cfg3.result_dir, "log")
    (f3,) = [f for f in os.listdir(log3) if f.startswith("events")]
    assert b"\x89PNG\r\n\x1a\n" not in open(os.path.join(log3, f3), "rb").read()


def test_zero_cadence_disables_artifacts(run_cfg):
    """freq_gen=0 / freq_test=0 disable the cadences instead of crashing
    (ZeroDivisionError found driving a pure-throughput zip run on-chip) —
    on BOTH the host-fed and the scan-dispatch paths."""
    cfg = run_cfg.replace(exp_name="t_nocad", freq_gen=0, freq_test=0)
    ds = SyntheticDataset(cfg, num_items=8 * cfg.batch_size)
    Trainer(cfg, ds).train()
    assert not os.listdir(os.path.join(cfg.result_dir, "train", "gen"))
    assert not os.listdir(os.path.join(cfg.result_dir, "test", "disc"))
    assert os.path.isfile(os.path.join(cfg.result_dir, "checkpoint", "ckpt-1.npz"))

    cfg2 = cfg.replace(exp_name="t_nocad_scan", device_data=True, steps_per_dispatch=2)
    Trainer(cfg2, ds).train()
    assert not os.listdir(os.path.join(cfg2.result_dir, "train", "gen"))
    assert os.path.isfile(os.path.join(cfg2.result_dir, "checkpoint", "ckpt-1.npz"))


def test_tb_reader_roundtrip_and_framing(tmp_path):
    """The dependency-free event reader (utils/tensorboard.py::read_scalars)
    inverts the from-scratch writer: scalars round-trip exactly (f32), image
    summaries are skipped, a TRAILING partial record (run killed mid-write)
    ends iteration cleanly, and a corrupt payload CRC raises."""
    import struct

    from littlegan_tpu.utils.tensorboard import SummaryWriter, read_scalars

    d = tmp_path / "log"
    w = SummaryWriter(str(d))
    want = {}
    for s in range(7):
        g, dd = 1.0 / (s + 1), 2.0 + 0.5 * s
        w.scalars([("loss/gen", g), ("loss/disc", dd)], s)
        want[s] = (g, dd)
    w.image("img/x", np.zeros((4, 4, 3), np.uint8), 3)  # must be skipped
    w.close()

    got = read_scalars(str(d))
    assert set(got) == {"loss/gen", "loss/disc"}
    for s, (g, dd) in want.items():
        assert got["loss/gen"][s][0] == s
        np.testing.assert_allclose(got["loss/gen"][s][1], np.float32(g), rtol=0)
        np.testing.assert_allclose(got["loss/disc"][s][1], np.float32(dd), rtol=0)

    fname = [f for f in os.listdir(d) if f.startswith("events")][0]
    path = os.path.join(d, fname)
    # trailing partial record: tolerated (iteration just ends)
    with open(path, "ab") as f:
        f.write(struct.pack("<Q", 1000) + b"\x00\x01\x02")
    assert read_scalars(str(d)) == got
    # corrupt a payload byte inside a full record: CRC must catch it
    blob = bytearray(open(path, "rb").read())
    blob[40] ^= 0xFF
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / fname).write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="CRC"):
        read_scalars(str(bad))


def test_sample_u8_matches_predict(run_cfg):
    """The fused uint8 evaluate-sample dispatch (trainer.sample_u8) must
    reproduce predict()'s outputs: device-side round((y+1)*127.5)
    quantization == the host writer's inverse_rescale (±1 count on
    fusion-order knife edges), identical D-score JSON semantics, and
    adjusted images for both real and generated inputs."""
    from littlegan_tpu.utils.image import inverse_rescale

    from littlegan_tpu.utils.image import ensure_pm1

    ds = SyntheticDataset(run_cfg, num_items=4 * run_cfg.batch_size)
    tr = Trainer(run_cfg, ds)
    # both paths see the same uint8-derived pixels (the pipeline ships uint8;
    # the f32 fixture must be quantized first or the comparison measures
    # quantization of the INPUT, not path parity)
    img_u8 = np.round((np.asarray(tr.test_image) + 1) * 127.5).astype(np.uint8)
    gen_f32, save_ref, adj_r_f32, adj_f_f32 = tr.predict(
        tr.test_noise, tr.test_cond, ensure_pm1(img_u8), None, None, None
    )
    gen_u8, save, adj_r_u8, adj_f_u8 = tr.sample_u8(
        tr.test_noise, tr.test_cond, img_u8
    )

    def close_u8(got, want_f32, tag):
        want = inverse_rescale(want_f32).astype(np.uint8)
        assert got.dtype == np.uint8 and got.shape == want.shape, tag
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.98, (
            f"{tag}: max diff {diff.max()}, equal frac {(diff == 0).mean():.4f}"
        )

    close_u8(gen_u8, gen_f32, "gen")
    close_u8(adj_r_u8, adj_r_f32, "adj_real")
    close_u8(adj_f_u8, adj_f_f32, "adj_fake")

    assert set(save) == set(save_ref)
    for k in ("real_pr_mse", "real_c_mse", "fake_pr_mse", "fake_c_mse"):
        assert abs(save[k] - save_ref[k]) < 1e-4, k
    for k in ("real_cond", "real_pr", "real_c", "fake_pr", "fake_c"):
        a, b = np.asarray(save[k]), np.asarray(save_ref[k])
        assert np.abs(a - b).max() <= 1, k  # rounded percentages


def test_sample_u8_uint8_input_and_no_adj(run_cfg):
    """uint8 pipeline rows feed sample_u8 directly (device-side rescale),
    and train_adj=False returns None adjusted images."""
    cfg = run_cfg.replace(train_adj=False)
    ds = SyntheticDataset(cfg, num_items=4 * cfg.batch_size)
    tr = Trainer(cfg, ds)
    img_u8 = inverse = np.round((np.asarray(tr.test_image) + 1) * 127.5).astype(np.uint8)
    gen_u8, save, adj_r, adj_f = tr.sample_u8(tr.test_noise, tr.test_cond, img_u8)
    assert gen_u8.dtype == np.uint8 and adj_r is None and adj_f is None
    assert "real_pr_mse" in save
