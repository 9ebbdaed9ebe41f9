"""In-suite smokes for the operational scripts (campaign, autotune).

These scripts were previously exercised only by hand on the chip; a broken
argument path or a drifted bench-harness signature would ship with a green
suite (the round-2 verdict's CLI-mode lesson, applied to scripts/). Each
smoke runs the REAL entry point end to end at doll-house scale on CPU.
"""

import json
import os
import sys

import pytest

# the scripts/ dir is a namespace package rooted at the repo — make it
# importable regardless of how pytest was launched
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_campaign_smoke(tmp_path, monkeypatch):
    """scripts/campaign.py end to end: dataset synthesis, 1-epoch train
    through the device_data scan path, one full eval point (conditioning
    effect sizes + FID/IS/KID/PRDC trend with --eval-chunk/--eval-rows),
    trajectory artifact written."""
    from scripts import campaign

    data = tmp_path / "data"
    result = tmp_path / "result"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "campaign.py",
            "smoke",
            "--epochs", "1",
            "--eval-every", "1",
            "--dim", "16",
            "--n", "64",
            "--batch-size", "4",
            "--fid-n", "32",
            "--eval-chunk", "16",
            "--eval-rows", "4",
            "--data", str(data),
            "--result-dir", str(result),
        ],
    )
    assert campaign.main() == 0
    traj_file = result / "smoke" / "campaign_trajectory.json"
    assert traj_file.is_file()
    records = json.loads(traj_file.read_text())
    assert len(records) == 1
    rec = records[0]
    assert rec["epoch"] == 1
    assert len(rec["gen_effects"]) == 7
    assert len(rec["adj_effects"]) == 7
    for key in ("fid_trend_random_init", "is_trend_random_init", "kid_trend_random_init"):
        assert key in rec, key  # loudly-tagged trend metrics, never bare "fid"


@pytest.mark.slow
def test_campaign_rejects_nondivisible_eval_chunk(tmp_path, monkeypatch):
    """--fid-n must be a multiple of --eval-chunk (one compiled dispatch
    shape) — the refusal happens before any training."""
    from scripts import campaign

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "campaign.py", "smoke2",
            "--dim", "16", "--n", "64", "--batch-size", "4",
            "--fid-n", "33", "--eval-chunk", "16",
            "--data", str(tmp_path / "d"), "--result-dir", str(tmp_path / "r"),
        ],
    )
    with pytest.raises(SystemExit, match="multiple of the eval chunk"):
        campaign.main()


@pytest.mark.slow
def test_autotune_smoke(tmp_path, monkeypatch, capsys):
    """scripts/autotune.py end to end on CPU: one measured point through the
    bench harness, JSON per point, RECOMMEND line with a parity pick, and
    the --out file written."""
    from scripts import autotune

    out = tmp_path / "rec.json"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "autotune.py",
            "--dim", "16",
            "--batch", "4",
            "--ks", "2",
            "--skip-adj-half",
            "--skip-moment-dtype",
            "--measure-dispatches", "1",
            "--out", str(out),
        ],
    )
    assert autotune.main() == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    points = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(points) == 1 and points[0]["steps_per_dispatch"] == 2
    assert points[0]["step_ms"] > 0
    rec_lines = [l for l in lines if l.startswith("RECOMMEND ")]
    assert len(rec_lines) == 1
    rec = json.loads(rec_lines[0][len("RECOMMEND "):])
    # with both levers skipped the fastest pick IS the parity pick
    assert rec["parity"] == rec["fastest"]
    assert rec["opt_ins"] == []
    assert json.loads(out.read_text())["parity"]["steps_per_dispatch"] == 2


@pytest.mark.slow
def test_scaling_curve_virtual_smoke(tmp_path):
    """scripts/scaling_curve.py --virtual: the curve harness (mesh build,
    DP + spatial points, efficiency math, artifact write) runs end to end
    on the in-suite virtual CPU mesh — so ROADMAP missing-#3 ('real
    multi-chip measurements') stays one command when a slice appears.

    Runs in-process: the suite's conftest already forces 8 virtual CPU
    devices, which is exactly the harness's --virtual target."""
    from scripts import scaling_curve

    out = tmp_path / "curve.json"
    rc = scaling_curve.main(
        [
            "--virtual", "8",
            "--devices", "1,2,4",
            "--batch", "2",
            "--iters", "2",
            "--warmup", "1",
            "--out", str(out),
        ]
    )
    assert rc == 0
    with open(out) as f:
        got = json.load(f)
    recs = got["results"]
    dp = [r for r in recs if r["regime"] == "dp"]
    sp = [r for r in recs if r["regime"] == "spatial_model2"]
    assert [r["n_devices"] for r in dp] == [1, 2, 4]
    assert [r["n_devices"] for r in sp] == [2, 4]  # odd/1-chip points skipped
    for r in recs:
        assert r["backend"] == "cpu-virtual"  # never mistakable for a perf claim
        assert r["img_s"] > 0 and r["step_ms"] > 0
        assert r["batch_global"] == 2 * r["n_devices"] * (
            1 if r["regime"] == "dp" else 0.5
        )
    assert dp[0]["efficiency"] == 1.0  # single-chip anchor
