"""Provenance / experiment-hygiene tests (reference main.py:27-29,
eager_trainer.py:231-245)."""

import os
import subprocess
import tarfile

import pytest

from littlegan_tpu.utils.provenance import (
    RESULT_SUBDIRS,
    ensure_clean_tree,
    git_is_dirty,
    init_result_dirs,
    snapshot_run,
)


@pytest.fixture()
def git_repo(tmp_path):
    subprocess.run(["git", "init", "-q"], cwd=tmp_path, check=True)
    (tmp_path / "f.txt").write_text("hello")
    subprocess.run(["git", "add", "-A"], cwd=tmp_path, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-qm", "init"],
        cwd=tmp_path,
        check=True,
    )
    return tmp_path


def test_git_dirty_detection(git_repo):
    assert not git_is_dirty(str(git_repo))
    (git_repo / "f.txt").write_text("changed")
    assert git_is_dirty(str(git_repo))


def test_train_refuses_dirty_tree(git_repo, tiny_cfg):
    (git_repo / "f.txt").write_text("changed")
    cfg = tiny_cfg.replace(mode="train", debug=False)
    with pytest.raises(EnvironmentError):  # reference main.py:27-29
        ensure_clean_tree(cfg, str(git_repo))
    # --debug bypasses (reference semantics)
    ensure_clean_tree(cfg.replace(debug=True), str(git_repo))
    # non-train modes never check
    ensure_clean_tree(cfg.replace(mode="plot"), str(git_repo))


def test_result_tree_created(tiny_cfg, tmp_path):
    cfg = tiny_cfg.replace(all_result_dir=str(tmp_path / "r"), test_data_dir=str(tmp_path / "t"))
    init_result_dirs(cfg)
    for sub in RESULT_SUBDIRS:
        assert os.path.isdir(os.path.join(cfg.result_dir, sub)), sub


def test_snapshot_writes_config_and_code_tar(git_repo, tiny_cfg, tmp_path):
    cfg = tiny_cfg.replace(
        all_result_dir=str(tmp_path / "r"), test_data_dir=str(tmp_path / "t"), debug=False
    )
    snapshot_run(cfg, str(git_repo))
    assert os.path.isfile(os.path.join(cfg.result_dir, "config.json"))
    tar = os.path.join(cfg.result_dir, "code.tar")
    assert os.path.isfile(tar)  # reference eager_trainer.py:242-245
    with tarfile.open(tar) as t:
        assert "f.txt" in t.getnames()
