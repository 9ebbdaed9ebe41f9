"""Config system tests (reference semantics: config.py:8-39)."""

import json

import pytest

pytestmark = pytest.mark.core  # sub-5-min gate tier (round-4 verdict #4)

from littlegan_tpu.config import Config, load_config


def test_defaults_match_reference_sample():
    cfg = Config()
    # spot-check the reference sample.config.json values
    assert cfg.batch_size == 32
    assert cfg.noise_dim == 93
    assert cfg.conv_filter == [384, 256, 128, 64, 32]
    assert cfg.lr == 5e-5
    assert cfg.beta_1 == 0.5 and cfg.beta_2 == 0.9
    assert cfg.attr == [8, 15, 20, 22, 26, 36, 39]


def test_derived_fields():
    cfg = Config(attr=[1, 2, 3], all_result_dir="/r", exp_name="x", prefetch_batch=3, batch_size=32)
    # reference config.py:32-39
    assert cfg.cond_dim == 3
    assert cfg.result_dir == "/r/x"
    assert cfg.prefetch == 96


def test_three_layer_merge(tmp_path):
    (tmp_path / "sample.config.json").write_text(json.dumps({"batch_size": 8, "lr": 1e-3}))
    (tmp_path / "myenv.config.json").write_text(json.dumps({"lr": 2e-3, "custom_key": 7}))
    cfg = load_config("myenv", overrides={"epoch": 5}, search_dirs=[str(tmp_path)])
    assert cfg.batch_size == 8  # from sample layer
    assert cfg.lr == 2e-3  # env overrides sample
    assert cfg.epoch == 5  # CLI overrides env
    assert cfg.extra["custom_key"] == 7  # unknown keys preserved for provenance


def test_json_roundtrip(tmp_path):
    cfg = Config(exp_name="t", all_result_dir=str(tmp_path))
    p = tmp_path / "config.json"
    cfg.dump(str(p))
    d = json.loads(p.read_text())
    assert d["cond_dim"] == cfg.cond_dim
    assert d["result_dir"] == cfg.result_dir


def test_cli_parse_config_overrides(tmp_path, monkeypatch):
    import json as _json

    from littlegan_tpu.cli import parse_config

    monkeypatch.chdir(tmp_path)
    (tmp_path / "sample.config.json").write_text(_json.dumps({"batch_size": 8}))
    cfg = parse_config(["train", "exp9", "--epochs", "3", "--batch-size", "16", "--debug", "--synthetic-data"])
    assert cfg.mode == "train" and cfg.exp_name == "exp9"
    assert cfg.epoch == 3
    assert cfg.batch_size == 16  # CLI beats the sample layer
    assert cfg.debug is True
    assert cfg.extra["synthetic_data"] is True


def test_cli_rejects_bad_mode():
    import pytest as _pytest

    from littlegan_tpu.cli import parse_config

    with _pytest.raises(SystemExit):
        parse_config(["frobnicate", "x"])


def test_repo_sample_config_matches_defaults():
    """The committed sample.config.json (the reference ships one,
    config.py:17-23; round-1 verdict missing #3) must equal the dataclass
    defaults so the file is a faithful, copyable template."""
    import os

    from littlegan_tpu.config import Config, load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert os.path.isfile(os.path.join(repo, "sample.config.json"))
    cfg = load_config("sample", search_dirs=(repo,))
    assert cfg == Config(env="sample")
