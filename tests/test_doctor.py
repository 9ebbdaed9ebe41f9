"""scripts/doctor.py — environment diagnosis runs green in the test env."""

import importlib.util
import json
import os

import pytest


def _load_doctor():
    spec = importlib.util.spec_from_file_location(
        "doctor_under_test",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "doctor.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_doctor_passes_on_cpu(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)  # config resolution is cwd-based
    doctor = _load_doctor()
    rc = doctor.main([])
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert rc == 0 and summary["ok"] is True
    by_check = {r["check"]: r["level"] for r in summary["results"]}
    assert by_check["devices"] == "PASS"
    assert by_check["train-step"] == "PASS"
    # test env has no CelebA: path checks must WARN, not fail the run
    assert by_check["image_path"] == "WARN"


def test_doctor_fails_fast_on_hung_backend(monkeypatch, capsys):
    doctor = _load_doctor()
    from littlegan_tpu.utils import backend_probe

    monkeypatch.setattr(backend_probe, "backend_may_hang", lambda: True)
    monkeypatch.setattr(backend_probe, "probe_backend", lambda t: False)
    rc = doctor.main(["--probe-timeout", "0.01"])
    assert rc == 1
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["ok"] is False
    assert summary["results"][0]["check"] == "backend-probe"
    assert summary["results"][0]["level"] == "FAIL"
