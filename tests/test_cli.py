"""In-suite end-to-end tests for all 8 CLI modes (round-2 verdict #4).

Each test drives ``cli.main([...])`` — the real dispatch layer (cli.py:99+,
reference main.py:26-132) — on synthetic data with a tiny config in a tmp
workspace, and asserts the mode's artifact set exists and is well-formed.
Previously only ``parse_config`` was imported by tests; a broken mode
branch could ship with a green suite.
"""

import base64
import json
import os

import numpy as np
import pytest

from littlegan_tpu import cli

TINY = {
    "batch_size": 4,
    "image_dim": 16,
    "init_dim": 1,
    "noise_dim": 13,
    "attr": [0, 1, 2, 3, 4, 5, 6],
    "conv_filter": [24, 16, 12, 8, 4],
    "compute_dtype": "float32",
    "epoch": 1,
    "freq_gen": 2,
    "freq_test": 4,
    "train_adj": True,
    "random_sample_batch": 2,
    "condition_sample_batch": 2,
    "evaluate_sample_size": 8,
    "allow_random_fid": True,
    "debug": True,
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Config-on-cwd workspace (reference semantics: config files are looked
    up in the current working directory) with one trained experiment."""
    root = tmp_path_factory.mktemp("cli")
    cfg = dict(TINY)
    cfg["all_result_dir"] = str(root / "result")
    cfg["test_data_dir"] = str(root / "test-data")
    (root / "sample.config.json").write_text(json.dumps(cfg))
    old = os.getcwd()
    os.chdir(root)
    try:
        rc = cli.main(["train", "exp", "--debug", "--synthetic-data"])
        assert rc == 0
        yield root / "result" / "exp"
    finally:
        os.chdir(old)


def test_mode_train_artifacts(workspace):
    assert os.path.isfile(workspace / "checkpoint" / "ckpt-1.npz")
    assert os.path.isfile(workspace / "config.json")
    assert list((workspace / "train" / "gen").iterdir())  # freq_gen grids
    assert list((workspace / "test" / "disc").iterdir())  # freq_test jsons
    assert list((workspace / "log").iterdir())  # TB event files


def test_mode_plot(workspace, capsys):
    assert cli.main(["plot", "exp"]) == 0
    text = (workspace / "models.txt").read_text()
    for model in ("Encoder", "Decoder", "Discriminator", "Generator", "Adjuster"):
        assert f"Model: {model}" in text
        assert os.path.isfile(workspace / f"{model}.dot")
    assert "total parameters" in capsys.readouterr().out


def test_mode_visual_fallback(workspace, capsys, monkeypatch):
    """No tensorboard binary in-container: the visual branch must fall back
    to serving the built-in HTML report instead of crashing (reference
    main.py:34-36 spawns tensorboard unconditionally). The command runs as
    an ARGV LIST — a shell-metacharacter exp_name must stay one --logdir
    value — and a Ctrl-C'd working server (rc 130) is not 'unavailable'."""
    import subprocess

    from littlegan_tpu import report

    calls = []
    served = []

    class _RC:
        def __init__(self, rc):
            self.returncode = rc

    monkeypatch.setattr(
        subprocess, "run", lambda argv, **kw: (calls.append(argv), _RC(127))[1]
    )
    monkeypatch.setattr(
        report, "serve_report", lambda cfg, port: served.append((cfg.exp_name, port))
    )
    assert cli.main(["visual", "exp"]) == 0
    out = capsys.readouterr().out
    assert "tensorboard unavailable" in out
    assert len(calls) == 1 and calls[0][0] == "tensorboard"
    assert isinstance(calls[0], list) and calls[0][-1] == str(workspace / "log")
    assert served == [("exp", 8600)]  # fell through to the report server

    # user Ctrl-C on a WORKING server: no misleading fallback, no report server
    monkeypatch.setattr(subprocess, "run", lambda argv, **kw: _RC(130))
    assert cli.main(["visual", "exp"]) == 0
    assert "tensorboard unavailable" not in capsys.readouterr().out
    assert len(served) == 1


def test_serve_report_live(workspace):
    """serve_report regenerates the report PER REQUEST (a refresh tracks a
    live run) and keeps serving past a render failure (500, not a dropped
    connection)."""
    import queue
    import threading
    import urllib.request

    from littlegan_tpu import report
    from littlegan_tpu.config import load_config

    cfg = load_config("sample", {"exp_name": "exp"})
    ports = queue.Queue()
    t = threading.Thread(
        target=report.serve_report,
        args=(cfg,),
        kwargs=dict(port=0, max_requests=2, on_bound=ports.put),
        daemon=True,
    )
    t.start()
    port = ports.get(timeout=30)
    for _ in range(2):  # per-request regeneration: both answers are full reports
        with urllib.request.urlopen(f"http://localhost:{port}/", timeout=30) as r:
            body = r.read().decode()
        assert '<svg id="losschart"' in body
        assert "optimizer steps" in body

    # a render failure must answer 500 and keep the server alive
    bad = cfg.replace(exp_name="no-such-exp")
    t2_ports = queue.Queue()
    t2 = threading.Thread(
        target=report.serve_report,
        args=(bad,),
        kwargs=dict(port=0, max_requests=1, on_bound=t2_ports.put),
        daemon=True,
    )
    t2.start()
    p2 = t2_ports.get(timeout=30)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"http://localhost:{p2}/", timeout=30)
    assert ei.value.code == 500
    assert "report generation failed" in ei.value.read().decode()
    t.join(timeout=30)
    t2.join(timeout=30)
    assert not t.is_alive() and not t2.is_alive()


def test_mode_random_sample(workspace):
    assert cli.main(["random-sample", "exp", "--synthetic-data"]) == 0
    sample = workspace / "sample"
    names = {p.name for p in sample.iterdir()}
    for b in range(TINY["random_sample_batch"]):
        assert any(n.startswith("generator-") and n.endswith(f"-{b}.jpg") for n in names)
        assert any(n.startswith("discriminator-") and n.endswith(f"-{b}.json") for n in names)
        assert any(n.startswith("adjuster-") and n.endswith(f"-{b}.jpg") for n in names)
        assert any(n.startswith("input_data-") and n.endswith(f"-{b}.npz") for n in names)
    npz = sorted(p for p in sample.iterdir() if p.name.startswith("input_data-"))[0]
    with np.load(npz) as z:
        assert z["n"].shape == (TINY["batch_size"], TINY["noise_dim"])
        assert z["i"].shape == (TINY["batch_size"], 16, 16, 3)


def test_mode_condition_sample(workspace):
    from PIL import Image

    assert cli.main(["condition-sample", "exp"]) == 0
    for i in range(1, 1 + TINY["condition_sample_batch"]):
        p = workspace / "sample" / f"condition-gen-{i}.jpg"
        assert p.is_file()
        with Image.open(p) as img:
            # one noise x 8 condition rows -> 1x8 grid (reference main.py:105-125)
            assert img.size == (8 * 16, 16)


def test_mode_evaluate_sample(workspace):
    assert cli.main(["evaluate-sample", "exp", "--synthetic-data"]) == 0
    gen = workspace / "evaluate" / "gen"
    adj = workspace / "evaluate" / "adj"
    # per-image JPEGs numbered from 1 (reference main.py:58-81)
    assert {p.name for p in gen.iterdir()} == {
        f"{i}.jpg" for i in range(1, TINY["evaluate_sample_size"] + 1)
    }
    assert len(list(adj.iterdir())) == 2 * TINY["evaluate_sample_size"]  # real_ + fake_
    assert list((workspace / "evaluate" / "disc").iterdir())


def test_mode_evaluate(workspace, capsys):
    """calc mode end to end (in-process; reference shells out, main.py:82-104):
    needs evaluate-sample's images + a pre-calculated stats npz."""
    if not (workspace / "evaluate" / "gen" / "1.jpg").is_file():
        cli.main(["evaluate-sample", "exp", "--synthetic-data"])
    from littlegan_tpu.config import load_config
    from littlegan_tpu.eval.evaluate import precalculate

    cfg = load_config("sample", {"exp_name": "exp", "mode": "evaluate"})
    stats = os.path.join(cfg.test_data_dir, cfg.evaluate_pre_calculated)
    precalculate(cfg, str(workspace / "evaluate" / "gen"), stats, batch_size=4)
    assert cli.main(["evaluate", "exp"]) == 0
    out = capsys.readouterr().out
    assert "(gen):" in out and "(adj):" in out
    for log in ("fid-gen.log", "fid-adj.log"):
        text = (workspace / "evaluate" / log).read_text()
        assert "RANDOM-INIT" in text  # never an uncomparable bare "FID:"


def test_mode_export_model(workspace):
    assert cli.main(["export-model", "exp"]) == 0
    assert os.path.isfile(workspace / "model" / "ckpt-model.npz")
    # weights-only: params restore into a fresh pytree (eager_trainer.py:300-303)
    from littlegan_tpu.config import load_config
    from littlegan_tpu.models import init_params
    from littlegan_tpu.training.checkpoint import Checkpointer

    import jax

    cfg = load_config("sample", {"exp_name": "exp"})
    template = init_params(cfg, jax.random.PRNGKey(0))
    restored = Checkpointer(str(workspace / "model")).restore("model", template)
    trained = Checkpointer(str(workspace / "checkpoint"))
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(template)


def test_mode_train_refuses_missing_dataset(workspace):
    """No --synthetic-data and a bogus image_path -> FileNotFoundError, not a
    silent random-noise run (cli.py:59-73)."""
    with pytest.raises(FileNotFoundError):
        cli.main(["train", "exp2", "--debug"])


def test_unknown_mode_rejected():
    with pytest.raises(SystemExit):  # argparse rejects non-MODES values
        cli.main(["frobnicate", "exp"])


def test_missing_env_file_refused(workspace):
    """A typo'd -e env must hard-fail (reference config.py behavior): the
    graceful load_config skip would otherwise silently train with
    sample/default hyperparameters and clobber checkpoints."""
    with pytest.raises(FileNotFoundError, match="config environment"):
        cli.main(["plot", "exp", "-e", "porduction"])


def test_mode_evaluate_full_metric_suite(workspace, capsys):
    """Config.eval_metrics routes the evaluate MODE through IS/KID/PRDC from
    the same features (stats npz re-written with raw rows); unknown names
    fail loudly before any feature compute."""
    if not (workspace / "evaluate" / "gen" / "1.jpg").is_file():
        cli.main(["evaluate-sample", "exp", "--synthetic-data"])
    from littlegan_tpu.config import load_config
    from littlegan_tpu.eval.evaluate import precalculate

    cfg = load_config("sample", {"exp_name": "exp", "mode": "evaluate"})
    stats = os.path.join(cfg.test_data_dir, cfg.evaluate_pre_calculated)
    precalculate(cfg, str(workspace / "evaluate" / "gen"), stats, batch_size=4, save_features=16)

    with open("sample.config.json") as f:
        base = json.load(f)
    with open("metrics.config.json", "w") as f:
        json.dump({**base, "eval_metrics": ["fid", "is", "kid", "prdc"]}, f)
    assert cli.main(["evaluate", "exp", "-e", "metrics"]) == 0
    out = capsys.readouterr().out
    assert "(gen):" in out
    text = (workspace / "evaluate" / "fid-gen.log").read_text()
    for tag in ("IS[RANDOM-INIT", "KID[RANDOM-INIT", "PRDC[RANDOM-INIT"):
        assert tag in text, tag

    with open("bad.config.json", "w") as f:
        json.dump({**base, "eval_metrics": ["fid", "ssim"]}, f)
    with pytest.raises(ValueError, match="ssim"):
        cli.main(["evaluate", "exp", "-e", "bad"])


def test_mode_interpolate(workspace):
    """9th mode (beyond-reference): slerp grid is (rows*H, steps*W), the
    adjuster sweep grid is (cond_dim*H, steps*W), same-seed reruns are
    byte-identical, and degenerate geometry fails loudly."""
    from PIL import Image

    import numpy as np

    with open("sample.config.json") as f:
        base = json.load(f)
    with open("interp.config.json", "w") as f:
        json.dump({**base, "interpolate_rows": 3, "interpolate_steps": 4, "seed": 7}, f)
    assert cli.main(["interpolate", "exp", "-e", "interp"]) == 0
    sample = workspace / "sample"
    z_grids = sorted(sample.glob("interpolate-z-*.jpg"))
    a_grids = sorted(sample.glob("interpolate-attr-*.jpg"))
    assert z_grids and a_grids
    dim = TINY["image_dim"]
    z_img = np.asarray(Image.open(z_grids[-1]))
    assert z_img.shape == (3 * dim, 4 * dim, 3)
    a_img = np.asarray(Image.open(a_grids[-1]))
    assert a_img.shape == (7 * dim, 4 * dim, 3)

    # same seed -> byte-identical grids (filenames carry a timestamp; wait
    # for a fresh second so the rerun cannot overwrite the originals)
    import time as _time

    _time.sleep(1.1)
    assert cli.main(["interpolate", "exp", "-e", "interp"]) == 0
    z2 = sorted(sample.glob("interpolate-z-*.jpg"))
    assert len(z2) > len(z_grids)
    assert z2[-1].read_bytes() == z_grids[-1].read_bytes()

    with open("badinterp.config.json", "w") as f:
        json.dump({**base, "interpolate_steps": 1}, f)
    with pytest.raises(ValueError, match="interpolate_steps"):
        cli.main(["interpolate", "exp", "-e", "badinterp"])


def test_serve_mode_parses_knobs(workspace):
    """`serve` is a first-class CLI mode; its knobs ride in cfg.extra."""
    cfg = cli.parse_config(
        ["serve", "exp", "--port", "1234", "--reload-every", "5", "--devices", "0"]
    )
    assert cfg.mode == "serve"
    assert cfg.extra["serve_port"] == 1234
    assert cfg.extra["serve_reload_every"] == 5.0
    assert cfg.extra["serve_devices"] == 0  # 0 = all local chips
    # absent --devices -> key absent -> serve() default (single device)
    assert "serve_devices" not in cli.parse_config(["serve", "exp"]).extra


@pytest.mark.slow
def test_serve_mode_end_to_end(workspace):
    """cli.main(["serve", ...]) brings up the HTTP server on the trained
    experiment and serves /healthz + /generate; SIGTERM drains. Fresh
    subprocess: serve() installs signal handlers (main thread only)."""
    import signal
    import subprocess
    import sys
    import time as _time
    import urllib.request

    proc = subprocess.Popen(
        [
            sys.executable, "-c",
            "import os; os.environ['JAX_PLATFORMS']='cpu';"
            "os.environ.pop('PALLAS_AXON_POOL_IPS', None);"
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from littlegan_tpu import cli;"
            "raise SystemExit(cli.main(['serve','exp','--port','18613','--batch-size','2']))",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.getcwd(),  # workspace cwd: config + checkpoints live here
        env={**os.environ, "PYTHONPATH": "/root/repo:" + os.environ.get("PYTHONPATH", "")},
    )
    try:
        deadline = _time.monotonic() + 240
        lines = []
        while _time.monotonic() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if "serving on" in line:
                break
        else:
            raise AssertionError(f"server never came up: {lines}")
        with urllib.request.urlopen("http://127.0.0.1:18613/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        req = urllib.request.Request(
            "http://127.0.0.1:18613/generate",
            data=json.dumps({"cond": [[0.98] * 7], "seed": 1}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert len(json.load(r)["images"]) == 1
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "drained, socket closed" in out, out
    assert proc.returncode == 0


def test_mode_report(workspace):
    """`report` renders a self-contained HTML report from the run's own
    artifacts: loss curves (read back from the from-scratch event files),
    stat tiles, inlined sample grids, and the merged config table."""
    assert cli.main(["report", "exp"]) == 0
    doc = (workspace / "report.html").read_text()
    assert '<svg id="losschart"' in doc
    assert "polyline" in doc  # at least one loss series plotted
    assert "data:image/jpeg;base64," in doc  # sample grid inlined
    assert "optimizer steps" in doc
    assert "<table class='cfg'>" in doc
    assert "prefers-color-scheme: dark" in doc  # selected dark mode ships
