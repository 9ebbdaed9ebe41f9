"""Checkpoint / resume.

Capability parity with the reference (eager_trainer.py:31-43,171-178,229,
300-303):
- full train-state checkpoints (params + all three optimizer states) saved
  per epoch under ``result/<exp>/checkpoint/``,
- ``status.json`` carrying the resume epoch/step,
- latest-checkpoint restore on startup when ``restore`` is set,
- SIGINT-path ``interrupt`` checkpoint (wired in trainer.py),
- weights-only export (``export-model`` mode -> ``model/``).

Format: one ``.npz`` per checkpoint with path-keyed leaves — dependency-light,
byte-exact, structure-validated on restore against a template pytree. (orbax
is available in the environment; this custom format keeps restores exact and
greppable, and the save path is a single fsync'd file rename — atomic enough
for the preemption/resume story in SURVEY §5.)
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from littlegan_tpu.utils.tree import path_str


def _write_status(directory: str, status: Dict[str, Any]) -> None:
    """Atomic status.json write (tmp + fsync + rename) — a kill mid-write must
    not leave a truncated file that blocks every subsequent startup."""
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".status.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(status, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(directory, "status.json"))
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _flatten(tree) -> Dict[str, np.ndarray]:
    return {
        path_str(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def _unflatten(template, flat: Dict[str, np.ndarray]):
    paths_leaves = jax.tree_util.tree_leaves_with_path(template)
    leaves = []
    for path, tmpl_leaf in paths_leaves:
        key = path_str(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf: {key}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(tmpl_leaf)):
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != expected {np.shape(tmpl_leaf)}"
            )
        # .dtype, not np.asarray(...).dtype: the template is the LIVE train
        # state — materializing it would pull params + 3 opt states to host
        tdt = np.dtype(getattr(tmpl_leaf, "dtype", np.asarray(tmpl_leaf).dtype))
        if arr.dtype.kind == "V" and arr.dtype.itemsize == tdt.itemsize:
            # np.savez stores ml_dtypes (bfloat16 moments, Config.moment_dtype)
            # as raw void bytes; reinterpret against the template dtype
            arr = arr.view(tdt)
        leaves.append(arr.astype(tdt))
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class Checkpointer:
    """Tag-based checkpoints in a directory (tags: epoch numbers, 'interrupt',
    'model' for weights-only export)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, f"ckpt-{tag}.npz")

    def save(self, tag: str, tree, status: Optional[Dict[str, Any]] = None) -> str:
        """Atomic save: write to temp file in the same dir, fsync, rename."""
        flat = _flatten(tree)
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **flat)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._path(tag))
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        if status is not None:
            _write_status(self.directory, status)
        return self._path(tag)

    def wait(self) -> None:
        """No-op (synchronous backend); uniform API with OrbaxCheckpointer."""

    def restore(self, tag: str, template):
        with np.load(self._path(tag)) as z:
            flat = {k: z[k] for k in z.files}
        return _unflatten(template, flat)

    def tag_fingerprint(self, tag: str) -> Optional[float]:
        """Opaque change token for ``tag`` (mtime): lets a poller (serving
        hot-reload) notice an OVERWRITTEN same-tag checkpoint — re-running
        ``export-model`` always rewrites the fixed tag 'model'."""
        try:
            return os.path.getmtime(self._path(str(tag)))
        except OSError:
            return None

    def epoch_tags(self) -> list:
        """Numeric (epoch) tags, ascending — the prunable set."""
        tags = []
        for fn in os.listdir(self.directory):
            m = re.match(r"ckpt-(\d+)\.npz$", fn)
            if m:
                tags.append(int(m.group(1)))
        return sorted(tags)

    def delete(self, tag) -> None:
        try:
            os.remove(self._path(str(tag)))
        except FileNotFoundError:
            pass

    def latest_tag(self) -> Optional[str]:
        """Numerically-latest epoch tag; a non-numeric tag ('interrupt',
        'model') wins only when its FILE is newer than that epoch's.

        Epoch order is decided by the tag NUMBER, not mtime: a result dir
        copied without mtime preservation (cp/untar) or two saves landing in
        one mtime tick must not silently resume from a stale epoch."""
        numeric: Dict[int, float] = {}
        other: Dict[str, float] = {}
        for fn in os.listdir(self.directory):
            m = re.match(r"ckpt-(.+)\.npz$", fn)
            if not m:
                continue
            mt = os.path.getmtime(os.path.join(self.directory, fn))
            if m.group(1).isdigit():
                numeric[int(m.group(1))] = mt
            else:
                other[m.group(1)] = mt
        if not numeric:
            return max(other, key=lambda t: other[t]) if other else None
        best = max(numeric)
        newer = [t for t, mt in other.items() if mt > numeric[best]]
        if newer:
            return max(newer, key=lambda t: other[t])
        return str(best)

    def restore_latest(self, template) -> Tuple[Optional[Any], Dict[str, Any]]:
        """(state or None, status dict). Reference: eager_trainer.py:37-43."""
        tag = self.latest_tag()
        if tag is None:
            return None, {}
        state = self.restore(tag, template)
        status_path = os.path.join(self.directory, "status.json")
        status: Dict[str, Any] = {}
        if os.path.isfile(status_path):
            with open(status_path) as f:
                status = json.load(f)
        # crash window: a kill between the checkpoint rename (save, line
        # above _write_status) and the status write leaves status one epoch
        # behind the newest checkpoint — resuming would train that epoch
        # TWICE on its own weights. Reconcile from the tag, exactly like the
        # orbax backend's deferred-status reconcile below.
        if tag.isdigit() and int(status.get("epoch", 1)) <= int(tag):
            print(
                f"WARNING: status.json lags checkpoint {tag} (crash between "
                f"checkpoint rename and status write); resuming at epoch "
                f"{int(tag) + 1} with the stale global_step {status.get('step', 0)}"
            )
            # "batch" (mid-epoch resume point) belongs to the stale status'
            # epoch — carrying it into the re-derived epoch would silently
            # skip that epoch's first batches
            status = {**status, "epoch": int(tag) + 1, "batch": 0}
        return state, status


class OrbaxCheckpointer:
    """Orbax-backed alternative with the same API (async save, multi-host
    aware). The default ``Checkpointer`` is the dependency-light npz format;
    select this one with ``Config.extra['checkpoint_backend'] = 'orbax'``.
    """

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._ocp = ocp
        self._pending_status: Optional[Dict[str, Any]] = None

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, f"ocp-{tag}")

    def save(self, tag: str, tree, status: Optional[Dict[str, Any]] = None) -> str:
        self.wait()  # an in-flight async save must finish before the next one
        path = self._path(tag)
        self._ckptr.save(path, args=self._ocp.args.StandardSave(tree), force=True)
        # status is written by the NEXT wait(), after the async save commits:
        # save stays async (the backend's point), yet status.json never
        # points at a checkpoint that did not finish (crash mid-save -> the
        # old status + old checkpoint still pair up). Every exit path calls
        # wait() (trainer's finally / interrupt handler), flushing this.
        self._pending_status = status
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()
        if self._pending_status is not None:
            _write_status(self.directory, self._pending_status)
            self._pending_status = None

    def restore(self, tag: str, template):
        self.wait()
        # Normalize fully-addressable template leaves to host numpy: restore
        # then always yields host arrays (matching the npz backend), and a
        # per-host SingleDeviceSharding template can never constrain a
        # MULTI-HOST restore of cross-host sharded state (shard_opt_state /
        # shard_dense save global sharded arrays; the trainer re-places the
        # restored host tree with place_state). A non-addressable template
        # leaf keeps its global sharding and restores straight into it.
        template = jax.tree_util.tree_map(
            lambda x: np.asarray(x)
            if isinstance(x, jax.Array) and x.is_fully_addressable
            else x,
            template,
        )
        return self._ckptr.restore(self._path(tag), args=self._ocp.args.StandardRestore(template))

    def latest_tag(self) -> Optional[str]:
        self.wait()
        tags = {}
        for fn in os.listdir(self.directory):
            # tags are epoch numbers / 'interrupt' / 'model' — the dot-free
            # match excludes orbax's '*.orbax-checkpoint-tmp-*' partial dirs
            # left by a crash mid-async-save (restoring one would fail instead
            # of falling back to the last good checkpoint)
            m = re.match(r"ocp-([A-Za-z0-9_-]+)$", fn)
            if m and os.path.isdir(os.path.join(self.directory, fn)):
                tags[m.group(1)] = os.path.getmtime(os.path.join(self.directory, fn))
        return max(tags, key=lambda t: tags[t]) if tags else None

    def tag_fingerprint(self, tag: str) -> Optional[float]:
        """Opaque change token (checkpoint-dir mtime); see Checkpointer."""
        try:
            return os.path.getmtime(self._path(str(tag)))
        except OSError:
            return None

    def restore_latest(self, template) -> Tuple[Optional[Any], Dict[str, Any]]:
        tag = self.latest_tag()
        if tag is None:
            return None, {}
        state = self.restore(tag, template)
        status_path = os.path.join(self.directory, "status.json")
        status: Dict[str, Any] = {}
        if os.path.isfile(status_path):
            with open(status_path) as f:
                status = json.load(f)
        # deferred-status window: a kill after the async save committed but
        # before the next wait() leaves status one epoch behind the newest
        # checkpoint. Reconcile from the tag (conservative: re-derive the
        # resume epoch; global_step stays the stale value and is said so).
        if tag.isdigit() and int(status.get("epoch", 1)) <= int(tag):
            print(
                f"WARNING: status.json lags checkpoint {tag} (crash between "
                f"async commit and status write); resuming at epoch "
                f"{int(tag) + 1} with the stale global_step {status.get('step', 0)}"
            )
            # stale-status "batch" must not leak into the re-derived epoch
            # (see the npz backend's reconcile above)
            status = {**status, "epoch": int(tag) + 1, "batch": 0}
        return state, status

    def epoch_tags(self) -> list:
        # no wait(): pruning OLD tags must not join the just-launched async
        # save of the NEWEST tag (orbax commits via rename, so an in-flight
        # save is invisible to this listing until complete)
        tags = []
        for fn in os.listdir(self.directory):
            m = re.match(r"ocp-(\d+)$", fn)
            if m and os.path.isdir(os.path.join(self.directory, fn)):
                tags.append(int(m.group(1)))
        return sorted(tags)

    def delete(self, tag) -> None:
        import shutil

        shutil.rmtree(self._path(str(tag)), ignore_errors=True)


def make_checkpointer(cfg, directory: str):
    """Backend selector: npz (default) or orbax (async, multi-host)."""
    if getattr(cfg, "extra", {}).get("checkpoint_backend") == "orbax":
        return OrbaxCheckpointer(directory)
    return Checkpointer(directory)
