"""Trainer: the host loop around the jitted train step.

Capability parity with the reference ``EagerTrainer`` (eager_trainer.py),
redesigned for TPU throughput:

- result-dir/provenance init (eager_trainer.py:231-245 -> utils/provenance.py)
- pinned eval fixture (noise, cond, image) persisted as
  ``test_data_<env>.npz`` with the reference's reuse contract
  (eager_trainer.py:65-83)
- epoch loop with the reference cadences: per-step scalar logging
  (203-207), train-sample grids every ``freq_gen`` (216-220), fixture
  ``predict`` every ``freq_test`` (221-226), per-epoch checkpoint (229),
  wall-time report (227-228)
- SIGINT -> save ``interrupt`` checkpoint + status.json -> exit(1)
  (171-178, 182-183); auto-restore on restart (37-43)
- ``predict`` (265-298): generation timing, D-score MSE stats vs soft
  targets, rounded-percentage JSON, adjuster on real AND generated images,
  tiled grids
- ``plot`` (247-263): human-readable model/parameter summaries
- weights-only export (300-303)

TPU-specific redesign (SURVEY §7 hard part (f)): the step never syncs the
host. Metrics stay on device; the loop keeps at most 16 steps (a fixed
internal threshold) in flight and flushes them to the TensorBoard writer in
one device_get.
Input batches transfer via ``jax.device_put`` while the previous step
executes (JAX dispatch is async).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from littlegan_tpu.config import Config
from littlegan_tpu.models import adjuster_apply, discriminator_apply, generator_apply
from littlegan_tpu.ops.losses import mean_squared_error
from littlegan_tpu.training.checkpoint import make_checkpointer
from littlegan_tpu.training.state import TrainState, create_train_state, eval_params
from littlegan_tpu.training.step import make_train_step
from littlegan_tpu.utils.image import ensure_pm1, save_image, soft
from littlegan_tpu.utils.provenance import init_result_dirs, snapshot_run
from littlegan_tpu.utils.tensorboard import SummaryWriter


def _fetch_artifact(x) -> np.ndarray:
    """Host copy of a step artifact image. Artifacts leave the step sharded
    P('data'[, 'model']); in a multi-host run ``np.asarray`` on the global
    array raises ("spans non-addressable devices"), so gather it first —
    cadence-rare (freq_gen), so the cross-host all-gather is cheap."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _pairwise(it):
    """Group a batch stream into the step's 2-batch pulls
    (eager_trainer.py:117-118); a trailing odd batch is dropped."""
    while True:
        try:
            b1 = next(it)
            b2 = next(it)
        except StopIteration:
            return
        yield b1, b2


def _accum_groups(pairs, m: int):
    """Stack ``m`` HOST (batch1, batch2) pairs into (M, B, ...) numpy arrays
    for the gradient-accumulation step (Config.grad_accum); a trailing
    partial group is dropped. Stacking happens host-side so the group can be
    device_put in one (mesh-shardable) transfer (_accum_prefetch)."""
    while True:
        chunk = []
        for _ in range(m):
            p = next(pairs, None)
            if p is None:
                return
            chunk.append(p)
        b1s = tuple(np.stack([np.asarray(c[0][j]) for c in chunk]) for j in range(2))
        b2s = tuple(np.stack([np.asarray(c[1][j]) for c in chunk]) for j in range(2))
        yield b1s, b2s


def d_score_stats(cond, real_pr, real_c, fake_pr, fake_c) -> Dict:
    """The predict-mode D-score JSON payload (eager_trainer.py:277-289):
    rounded percentage score lists + MSE against the softened targets.
    Shared by ``predict`` and the fused ``sample_u8`` path so the JSON
    semantics cannot drift between modes."""
    save: Dict = {"real_cond": np.asarray(cond)}
    save["real_pr"], save["real_c"] = np.asarray(real_pr), np.asarray(real_c)
    save["fake_pr"], save["fake_c"] = np.asarray(fake_pr), np.asarray(fake_c)
    save["real_pr_mse"] = float(np.mean(np.asarray(mean_squared_error(soft(1.0), real_pr))))
    save["real_c_mse"] = float(np.mean(np.asarray(mean_squared_error(jnp.asarray(cond), real_c))))
    save["fake_pr_mse"] = float(np.mean(np.asarray(mean_squared_error(soft(0.0), fake_pr))))
    save["fake_c_mse"] = float(np.mean(np.asarray(mean_squared_error(jnp.asarray(cond), fake_c))))
    for key in ("real_cond", "real_pr", "real_c", "fake_c", "fake_pr"):
        save[key] = np.round(save[key] * 100).astype(int).tolist()
    return save


class Trainer:
    def __init__(self, cfg: Config, dataset=None, init_rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.dataset = dataset
        init_result_dirs(cfg)
        snapshot_run(cfg)

        rng = init_rng if init_rng is not None else jax.random.PRNGKey(cfg.seed)
        # single-use key discipline: independent streams for init, fixture,
        # and the per-step fold_in base
        init_key, fixture_rng, self._base_rng = jax.random.split(rng, 3)
        self.state: TrainState = create_train_state(cfg, init_key)
        self.global_epoch = 1
        self.global_step = 0
        # mid-epoch resume point: only interrupt checkpoints carry "batch"
        # (per-epoch saves resume at batch 0 of the NEXT epoch). Every
        # pipeline mode shares one deterministic (seed, epoch) batch order
        # and the step RNG keys off the restored global_step, so resuming at
        # the exact batch is bitwise-identical to never having stopped
        # (tests/test_trainer.py::test_mid_epoch_resume_*).
        self._resume_batch = 0
        self._cur_batch_no = 0  # batches completed in the CURRENT epoch

        self.checkpointer = make_checkpointer(cfg, os.path.join(cfg.result_dir, "checkpoint"))
        if cfg.restore:
            restored, status = self.checkpointer.restore_latest(self.state)
            if restored is not None:
                print("Restored checkpoint", self.checkpointer.latest_tag())
                self.state = restored
                self.global_epoch = int(status.get("epoch", 1))
                self.global_step = int(status.get("step", 0))
                self._resume_batch = int(status.get("batch", 0))

        self._writer: Optional[SummaryWriter] = None  # created lazily (train only)
        self._device_store = None  # device-resident dataset (cfg.device_data)
        self._metrics_buffer = []  # device-side metrics pending TB flush
        self._flushing = False  # guards the flush against SIGINT reentrancy
        self._interrupt_requested = False  # set by the SIGINT handler; acted
        # on at train-loop safe points (_request_interrupt)
        self._nonfinite_warned = False  # one divergence warning per run
        self._pinned_tags: set = set()  # epoch tags exempt from retention
        self._in_train = False  # predict() logs TB images only mid-training
        self._store_s2d = False  # store layout, set at upload

        n_dev = len(jax.devices())
        axes = tuple(cfg.mesh_axes)
        n_proc = jax.process_count()
        # multi-host: every host computes collectively; only host 0 WRITES
        # shared artifacts (fixture npz, cadence grids/JSONs) — concurrent
        # identical-path writes on a shared filesystem tear files
        self._host0 = jax.process_index() == 0
        # The spatial mesh is built BEFORE the decode-slicing gate below:
        # whether a host may feed local rows under ('data','model') depends
        # on the mesh's process layout (model axis within one process).
        self._spatial = False
        if axes == ("data", "model") and n_dev > 1:
            from littlegan_tpu.parallel import make_mesh

            self.mesh = make_mesh(n_dev, axis_names=axes, shape=cfg.mesh_shape)
            self._spatial = True
        # Multi-host host-fed feeding (round-2 verdict #5b, extended to the
        # spatial mesh in round 3): each host decodes ONLY the
        # batch_size/n_proc rows its own devices train; the global batch is
        # assembled from every host's rows (shard_local_batch). Under
        # ('data','model') this additionally needs the model (H) axis within
        # one process, so each host ships (rows, FULL_H, ...) blocks.
        # Must run BEFORE the fixture pull so even that decodes local rows.
        self._hostfed_rows_sliced = False
        hostfed_axes_ok = axes == ("data",) and cfg.batch_size % n_dev == 0
        if self._spatial:
            from littlegan_tpu.parallel import model_groups_within_process

            data_size = self.mesh.devices.shape[0]
            hostfed_axes_ok = (
                cfg.batch_size % data_size == 0
                and cfg.batch_size % n_proc == 0
                and model_groups_within_process(self.mesh)
            )
        if (
            n_proc > 1
            and self.dataset is not None
            and not cfg.device_data
            and hostfed_axes_ok
            and n_dev > 1
            and hasattr(self.dataset, "set_rows_per_batch")
        ):
            rows = cfg.batch_size // n_proc
            self.dataset.set_rows_per_batch(rows)
            self._hostfed_rows_sliced = True
            print(
                f"multi-host host-fed: each host decodes {rows}/{cfg.batch_size} "
                "rows per batch (its own devices' slice)"
            )
        self._init_fixture(fixture_rng)

        # Parallelism selection (cfg.mesh_axes / cfg.mesh_shape):
        # - ['data'] (default): 1-D data-parallel mesh over all local devices
        #   when the batch divides evenly (XLA all-reduce over ICI),
        # - ['data','model']: spatial sharding — batch over 'data', image
        #   HEIGHT over 'model' (parallel/spatial.py), for activations too
        #   large for one chip (>128^2 resolutions).
        # donate=False throughout: the SIGINT handler may fire between step
        # dispatch and state reassignment; donated input buffers would then
        # be dead when the interrupt checkpoint reads them (bench donates).
        if (
            cfg.grad_accum > 1
            and self.dataset is not None
            and getattr(self.dataset, "batches", None) is not None
            and self.dataset.batches < 2 * cfg.grad_accum
        ):
            # both accumulation paths drop a trailing partial group — an
            # epoch smaller than ONE group would train zero steps silently
            print(
                f"WARNING: dataset has {self.dataset.batches} batches but one "
                f"accumulation group consumes {2 * cfg.grad_accum}; every "
                "epoch would apply ZERO updates. Lower grad_accum or grow "
                "the dataset."
            )
        if self._spatial:
            from littlegan_tpu.parallel.spatial import make_spatial_train_step
            from littlegan_tpu.parallel.zero import (
                check_shard_dense,
                check_shard_opt_state,
                place_state,
            )

            check_shard_opt_state(cfg, self.mesh)
            check_shard_dense(cfg, self.mesh)
            self.state = place_state(self.state, self.mesh, cfg)
            if (
                n_proc > 1
                and self.dataset is not None  # dataset-less modes (plot,
                # export-model, predict) never feed a batch — don't refuse
                and not cfg.device_data
                and not self._hostfed_rows_sliced
            ):
                # without per-host row slicing each host would feed FULL-B
                # rows into shard_local_batch and inflate the global batch
                # n_proc-fold, failing deep in XLA at first dispatch
                raise ValueError(
                    "host-fed spatial multi-host needs per-host row slicing: "
                    "a dataset with set_rows_per_batch, batch_size divisible "
                    "by the data-axis size AND the process count, and the "
                    "'model' axis within one process (mesh_shape = "
                    "(n_hosts * k, devices_per_host / k)) — or use "
                    "device_data=true (the HBM store shards rows per host)"
                )
            if cfg.grad_accum > 1 and not cfg.device_data:
                from littlegan_tpu.training.step import make_accum_train_step

                self._train_step = make_accum_train_step(
                    cfg, self.state.params, donate=False, mesh=self.mesh
                )
                print(
                    f"Spatially-sharded training with {cfg.grad_accum}-pair "
                    f"gradient accumulation (effective batch {cfg.grad_accum * cfg.batch_size})"
                )
            else:
                # device_data + grad_accum: train() dispatches the scan-accum
                # step (make_scan_accum_train_step) over the HBM store
                self._train_step = make_spatial_train_step(cfg, self.state.params, self.mesh, donate=False)
            print(f"Spatially-sharded training over a {dict(zip(axes, self.mesh.devices.shape))} mesh")
        elif n_dev > 1 and cfg.batch_size % n_dev == 0:
            from littlegan_tpu.parallel import make_mesh, make_parallel_train_step
            from littlegan_tpu.parallel.zero import (
                check_shard_dense,
                check_shard_opt_state,
                place_state,
            )

            self.mesh = make_mesh(n_dev)
            check_shard_opt_state(cfg, self.mesh)
            check_shard_dense(cfg, self.mesh)  # raises: DP mesh has no 'model' axis
            # replicates everything; with cfg.shard_opt_state the Adam
            # moments land sharded over the mesh (ZeRO-1, parallel/zero.py)
            self.state = place_state(self.state, self.mesh, cfg)
            if (
                n_proc > 1
                and self.dataset is not None
                and not cfg.device_data
                and not self._hostfed_rows_sliced
            ):
                # a dataset without set_rows_per_batch would feed FULL-B rows
                # from every host into shard_local_batch, silently training at
                # an n_proc-inflated (and likely row-duplicated) global batch
                raise ValueError(
                    "host-fed DP multi-host needs per-host row slicing: a "
                    "dataset with set_rows_per_batch (CelebA/Synthetic have "
                    "it) — or use device_data=true"
                )
            if cfg.grad_accum > 1:
                from littlegan_tpu.training.step import make_accum_train_step

                self._train_step = make_accum_train_step(
                    cfg, self.state.params, donate=False, mesh=self.mesh
                )
                print(
                    f"Data-parallel training over {n_dev} devices with "
                    f"{cfg.grad_accum}-pair gradient accumulation (effective "
                    f"batch {cfg.grad_accum * cfg.batch_size})"
                )
            else:
                self._train_step = make_parallel_train_step(cfg, self.state.params, self.mesh, donate=False)
                print(f"Data-parallel training over {n_dev} devices")
        else:
            self.mesh = None
            if cfg.shard_opt_state:
                from littlegan_tpu.parallel.zero import check_shard_opt_state

                check_shard_opt_state(cfg, None)  # raises: needs a mesh
            if cfg.shard_dense:
                from littlegan_tpu.parallel.zero import check_shard_dense

                check_shard_dense(cfg, None)  # raises: needs a ('data','model') mesh
            if n_proc > 1 and self.dataset is not None:
                # without a global mesh there is NO cross-host all-reduce:
                # each process would silently train its own independent model
                # on its shard, all writing the same result_dir. The
                # device-store path refuses this exact config; so must this.
                raise ValueError(
                    f"multi-host training needs a global mesh: batch_size "
                    f"{cfg.batch_size} is not divisible by the {n_dev} global "
                    "devices (or pick spatial mesh_axes) — as configured, "
                    f"{n_proc} processes would train {n_proc} independent "
                    "models"
                )
            if cfg.grad_accum > 1:
                from littlegan_tpu.training.step import make_accum_train_step

                self._train_step = make_accum_train_step(cfg, self.state.params, donate=False)
                print(
                    f"Gradient accumulation: {cfg.grad_accum} micro-pairs per "
                    f"update (effective batch {cfg.grad_accum * cfg.batch_size})"
                )
            else:
                self._train_step = make_train_step(cfg, self.state.params, donate=False)
            if n_dev > 1:
                print(
                    f"WARNING: {n_dev} devices visible but batch_size "
                    f"{cfg.batch_size} is not divisible by {n_dev}; training "
                    "single-device. Pick a divisible batch_size for DP."
                )
        # inference entry points return f32 images (the apply fns emit
        # compute dtype — bf16 by default; external consumers expect f32)
        gen_fn = lambda p, n, c: generator_apply(p, n, c, cfg).astype(jnp.float32)
        disc_fn = lambda p, i: discriminator_apply(p, i, cfg)
        adj_fn = lambda p, i, c: adjuster_apply(p, i, c, cfg).astype(jnp.float32)
        from littlegan_tpu.parallel.infer import data_parallel_infer, infer_mesh_devices

        # fused evaluate-sample batch (round-4 verdict #5, measured at the
        # 30k protocol): ONE dispatch computes gen + both D scores (+ both
        # adjusts), with images uint8 in BOTH directions. The unfused path
        # moved four f32 image batches per batch (~200 MB at b256/128²)
        # against ~0.8 s of device compute — transfer-bound 25 s/batch over
        # this container's tunnel. The on-device quantization is the
        # identical np.round((y+1)*127.5) the host writer applies
        # (utils/image.py:34-36), so written JPEG bytes are unchanged.
        def sample_fn(p, noise, cond, image_u8):
            from littlegan_tpu.utils.image import data_rescale

            q = lambda y: jnp.clip(
                jnp.round((y.astype(jnp.float32) + 1.0) * 127.5), 0, 255
            ).astype(jnp.uint8)
            img = data_rescale(image_u8.astype(jnp.float32))
            gen = generator_apply(p, noise, cond, cfg).astype(jnp.float32)
            real_pr, real_c = discriminator_apply(p, img, cfg)
            fake_pr, fake_c = discriminator_apply(p, gen, cfg)
            scores = (real_pr, real_c, fake_pr, fake_c)
            if not cfg.train_adj:
                return q(gen), scores
            adj_r = adjuster_apply(p, img, cond, cfg).astype(jnp.float32)
            adj_f = adjuster_apply(p, gen, cond, cfg).astype(jnp.float32)
            return q(gen), scores, q(adj_r), q(adj_f)

        if cfg.eval_data_parallel and infer_mesh_devices() > 1:
            # offline tools (evaluate-sample's 30k images, predict, sampling
            # modes) shard their batches over all local chips; row-wise DP of
            # the pure forwards is value-equivalent (parallel/infer.py)
            self._gen_jit = data_parallel_infer(gen_fn, 2, cfg=cfg)
            self._disc_jit = data_parallel_infer(disc_fn, 1, cfg=cfg)
            self._adj_jit = data_parallel_infer(adj_fn, 2, cfg=cfg)
            self._sample_jit = data_parallel_infer(sample_fn, 3, cfg=cfg)
        else:
            self._gen_jit = jax.jit(gen_fn)
            self._disc_jit = jax.jit(disc_fn)
            self._adj_jit = jax.jit(adj_fn)
            self._sample_jit = jax.jit(sample_fn)

    # ---------------------------------------------------------- fixture ----

    def _init_fixture(self, rng: jax.Array) -> None:
        """Pinned (noise, cond, image) eval triplet (eager_trainer.py:65-83).

        Multi-host: every process takes the SAME branch (the reuse decision
        is all-gathered — per-host dirs may hold the file on some hosts
        only), the triplet is broadcast from process 0 so the predict
        cadence computes one consistent result everywhere, and only process
        0 writes the npz (atomically — a kill mid-write must not leave a
        truncated file that crashes every later reuse)."""
        cfg = self.cfg
        n_proc = jax.process_count()
        npz = os.path.join(cfg.test_data_dir, f"test_data_{cfg.env}.npz")
        reuse = cfg.reuse and os.path.isfile(npz)
        if n_proc > 1:
            from jax.experimental import multihost_utils

            reuse = bool(
                multihost_utils.process_allgather(np.asarray(reuse)).all()
            )
        if reuse:
            data = np.load(npz)
            noise, cond, image = (
                data["n"].astype(np.float32),
                data["c"].astype(np.float32),
                data["i"].astype(np.float32),
            )
        else:
            k_img, k_noise = jax.random.split(rng)
            if self.dataset is not None:
                image, cond = next(self.dataset.epoch_iterator(0))
                image = ensure_pm1(image)  # pipeline may ship uint8
            else:  # plot/sample modes without a dataset: synthesize a fixture
                image = np.asarray(
                    jax.random.uniform(k_img, (cfg.batch_size, *cfg.image_shape), minval=-1, maxval=1)
                )
                cond = np.asarray(
                    soft(np.where(np.random.default_rng(cfg.seed).random((cfg.batch_size, cfg.cond_dim)) < 0.5, -1.0, 1.0))
                ).astype(np.float32)
            noise = np.asarray(jax.random.normal(k_noise, (cond.shape[0], cfg.noise_dim)), np.float32)
        if n_proc > 1:
            from jax.experimental import multihost_utils

            noise, cond, image = (
                np.asarray(x)
                for x in multihost_utils.broadcast_one_to_all(
                    (np.asarray(noise), np.asarray(cond), np.asarray(image, np.float32))
                )
            )
        self.test_noise, self.test_cond, self.test_image = noise, cond, image
        if not reuse and self._host0:
            os.makedirs(cfg.test_data_dir, exist_ok=True)
            tmp = npz + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(f, n=noise, c=cond, i=image)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, npz)

    # ------------------------------------------------------------- train ----

    def _put(self, batch):
        """Host batch -> device(s): sharded over the mesh when parallel.
        Multi-host: each process passes only its local rows and the global
        batch is assembled across hosts (shard_local_batch)."""
        if self._spatial:
            if jax.process_count() > 1:
                # per-host (rows, FULL_H, ...) blocks -> global H-sharded
                # batch; requires the row slicing + within-process model
                # axis established at build time (else __init__ refused)
                from jax.sharding import PartitionSpec as P

                from littlegan_tpu.parallel import shard_local_batch

                img, cond = batch
                return (
                    shard_local_batch(img, self.mesh, P("data", "model")),
                    shard_local_batch(cond, self.mesh, P("data")),
                )
            from littlegan_tpu.parallel.spatial import shard_spatial_batch

            return shard_spatial_batch(batch, self.mesh)
        if self.mesh is not None:
            from littlegan_tpu.parallel import shard_batch, shard_local_batch

            if jax.process_count() > 1:
                return shard_local_batch(batch, self.mesh)
            return shard_batch(batch, self.mesh)
        return jax.device_put(batch)

    def _ensure_device_store(self):
        """Upload the full decoded uint8 dataset to HBM once (cfg.device_data).

        The store is reshaped to (n_batches, batch, ...) — batch membership
        is fixed (reference quirk: shuffle-after-batch, dataset.py:21-23), so
        per-step selection is a dynamic-slice on the leading axis. Under a
        mesh the store is sharded P(None, 'data'[, 'model']): each device
        holds its batch-shard of EVERY batch, making the per-step slice local
        (no collectives) and already step-sharded."""
        if self._device_store is None:
            cfg = self.cfg
            n_proc = jax.process_count()
            # spatial ('data','model') multi-host: supported when the
            # 'model' (H) axis shards within each process — every host then
            # contributes whole-H blocks of its b_local rows and the
            # P(None,'data','model') store assembles across hosts exactly
            # like pure DP (2-process test: test_multihost spatial_store)
            if n_proc > 1 and self._spatial:
                from littlegan_tpu.parallel import model_groups_within_process

                if not model_groups_within_process(self.mesh):
                    raise ValueError(
                        "device_data + spatial across hosts needs the "
                        "'model' axis within one process (hosts ship "
                        "whole-H store blocks); pick mesh_shape = "
                        "(n_hosts * k, devices_per_host / k)"
                    )
            if n_proc > 1 and self.mesh is None:
                # without the DP mesh each host would silently train its own
                # independent model on half-size batches (no all-reduce)
                raise ValueError(
                    "device_data multi-host requires the DP mesh: pick a "
                    f"batch_size divisible by the {len(jax.devices())} global "
                    f"devices (got {cfg.batch_size})"
                )
            images, conds = [], []
            # canonical (unshuffled) order: store row j == canonical batch j,
            # so _device_epoch's permutation reproduces the host pipeline's
            # batch sequence exactly (epoch_batch_order is the shared stream)
            # cache_decoded is dead weight here — after this one-shot upload
            # the hot loop is HBM-resident and the host cache is never read
            # again (~10 GB RAM for CelebA-128); disable it for the pass
            saved_cache = getattr(self.dataset, "_cache", None)
            if saved_cache is not None:
                self.dataset._cache = None
            try:
                for img, cond in self.dataset.epoch_iterator(0, shuffle=False):
                    images.append(img)
                    conds.append(cond)
            finally:
                if saved_cache is not None:
                    self.dataset._cache = saved_cache
            imgs = np.concatenate(images)
            cs = np.concatenate(conds)
            # Store layout: RAW, not s2d. Measured on v5e (sustained scan
            # path, 128px b32): an s2d-layout uint8 store ran 5.3k img/s vs
            # 6.0k raw — the step's raw->s2d transposes fuse in for free,
            # while C=12 uint8 slicing and the view-heavy s2d augment cost
            # more. The s2d-store machinery stays available at the step level
            # (make_gather/scan_train_step(store_s2d=True), augment_s2d) and
            # is equivalence-tested; the trainer keeps the faster raw store.
            self._store_s2d = False
            # Per-host rows of every batch: each host's DATASET SHARD becomes
            # its devices' slice of the 'data' axis. Unlike the host-fed
            # multi-host path (each host decodes a full batch but only its
            # 1/n slice trains), this covers the FULL global dataset each
            # epoch with zero decode waste.
            b_local = cfg.batch_size // n_proc
            n_batches = imgs.shape[0] // b_local
            if n_proc > 1:
                # make_array_from_process_local_data infers the GLOBAL shape
                # from each process's local shape: a cross-host n_batches
                # mismatch would deadlock the first collective deep in XLA.
                # CelebA computes batches from the GLOBAL item count, so the
                # expected local row count is process-consistent; verify.
                expected = getattr(self.dataset, "batches", None)
                if expected is not None:
                    expected_rows = expected * cfg.batch_size  # local shard rows
                    if imgs.shape[0] < expected_rows:
                        raise ValueError(
                            f"host {jax.process_index()} produced {imgs.shape[0]} "
                            f"rows, expected {expected_rows} (dataset.batches="
                            f"{expected}); per-host shards must agree in size"
                        )
                    n_batches = expected_rows // b_local
            imgs = imgs[: n_batches * b_local].reshape(n_batches, b_local, *imgs.shape[1:])
            cs = cs[: n_batches * b_local].reshape(n_batches, b_local, -1)
            print(
                f"device_data: uploading {imgs.nbytes * n_proc / 1e9:.2f} GB "
                f"uint8 dataset to HBM"
                + (f" ({n_proc}-host sharded, {imgs.nbytes / 1e9:.2f} GB/host)" if n_proc > 1 else "")
            )
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                img_axes = ("data", "model") if self._spatial else ("data",)
                img_sh = NamedSharding(self.mesh, P(None, *img_axes))
                cond_sh = NamedSharding(self.mesh, P(None, "data"))
                if n_proc > 1:
                    self._device_store = (
                        jax.make_array_from_process_local_data(img_sh, imgs),
                        jax.make_array_from_process_local_data(cond_sh, cs),
                    )
                else:
                    self._device_store = (
                        jax.device_put(imgs, img_sh),
                        jax.device_put(cs, cond_sh),
                    )
            else:
                self._device_store = (jax.device_put(imgs), jax.device_put(cs))
        return self._device_store

    def _device_epoch(self, epoch: int):
        """Device-resident dataset path (cfg.device_data): the full uint8
        dataset lives in HBM; per-step batches are on-device slices — zero
        image bytes cross host->device in the hot loop. Batch membership
        stays fixed and batch order is permuted per epoch with the SAME
        (seed, epoch) stream as the host pipeline (epoch_batch_order) — the
        same seed yields a bitwise-identical batch sequence in host-fed,
        device_data, and scan modes. Yields int32 batch ids into the
        (n_batches, B, ...) store (row j == canonical batch j)."""
        from littlegan_tpu.data.celeba import epoch_batch_order

        cfg = self.cfg
        imgs_dev, _ = self._ensure_device_store()
        for b in epoch_batch_order(cfg.seed, epoch, imgs_dev.shape[0]):
            yield int(b)

    def _device_prefetch(self, it, depth: int = 2):
        """Yield device-resident (batch1, batch2) pairs, keeping ``depth``
        pairs in flight so host->device transfer overlaps step compute
        (device_put is async; the step blocks only when it consumes)."""
        from collections import deque

        pairs = _pairwise(it)  # two batches per step (eager_trainer.py:117-118)
        buf = deque()
        exhausted = False
        while True:
            while not exhausted and len(buf) < depth:
                pair = next(pairs, None)
                if pair is None:
                    exhausted = True
                    break
                buf.append((self._put(pair[0]), self._put(pair[1])))
            if not buf:
                return
            yield buf.popleft()

    def _accum_prefetch(self, it, depth: int = 2):
        """Yield device-resident (M, B, ...) accumulation groups, ``depth``
        in flight. Under the DP mesh each group is sharded P(None, 'data'):
        the micro-batch scan runs batch-sharded across the mesh with ONE
        all-reduced optimizer apply per group (grad_accum x DP — effective
        batch M x B x n_devices at one micro-shard's activation memory)."""
        from collections import deque

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # (M, B, ...) micro stacks: images additionally H-sharded on
            # 'model' under the spatial mesh; conds always P(None, 'data')
            img_spec = P(None, "data", "model") if self._spatial else P(None, "data")
            if jax.process_count() > 1:  # per-host rows -> global group
                from littlegan_tpu.parallel import shard_local_batch

                put = lambda g: tuple(
                    (
                        shard_local_batch(img, self.mesh, img_spec),
                        shard_local_batch(cond, self.mesh, P(None, "data")),
                    )
                    for img, cond in g
                )
            else:
                img_sh = NamedSharding(self.mesh, img_spec)
                cond_sh = NamedSharding(self.mesh, P(None, "data"))
                put = lambda g: tuple(
                    (jax.device_put(img, img_sh), jax.device_put(cond, cond_sh))
                    for img, cond in g
                )
        else:
            put = jax.device_put
        groups = _accum_groups(_pairwise(it), self.cfg.grad_accum)
        buf = deque()
        exhausted = False
        while True:
            while not exhausted and len(buf) < depth:
                g = next(groups, None)
                if g is None:
                    exhausted = True
                    break
                buf.append(put(g))
            if not buf:
                return
            yield buf.popleft()

    def _flush_buffered(self) -> None:
        """Flush + clear the shared metrics buffer, reentrancy-safe: a SIGINT
        landing INSIDE a flush must not re-flush the same entries from the
        interrupt handler (duplicate TB points). With cfg.halt_on_nonfinite,
        a diverged run stops here (after the flush, so TB has the evidence)."""
        if self._flushing or not self._metrics_buffer:
            return
        self._flushing = True
        try:
            self._flush_metrics(self._metrics_buffer)
            self._metrics_buffer.clear()
        finally:
            self._flushing = False
        if self.cfg.halt_on_nonfinite and self._nonfinite_warned:
            self.writer.flush()
            raise RuntimeError(
                "halting: non-finite loss (halt_on_nonfinite=true); restore "
                "a pre-divergence epoch checkpoint to recover"
            )

    def _request_interrupt(self, signum=None, frame=None):
        """SIGINT handler: set a flag ONLY. The train loop performs the
        flush/checkpoint/exit at its next safe point (advisor r2: orbax's
        AsyncCheckpointer is not reentrant — saving from inside the signal
        handler could interrupt an in-flight epoch save mid-write and hang
        or corrupt the interrupt checkpoint). Same deferred design as the
        atomic status.json write.

        A SECOND Ctrl-C escalates to an immediate KeyboardInterrupt (no
        checkpoint) — a run blocked in a collective or a long decode would
        otherwise be unkillable short of SIGKILL. Handler-side output uses
        os.write (print() can re-enter a held stdout buffer lock and crash
        the run from inside the handler)."""
        if self._interrupt_requested:  # second Ctrl-C: abort immediately
            signal.signal(signal.SIGINT, signal.default_int_handler)
            raise KeyboardInterrupt
        self._interrupt_requested = True
        os.write(
            2,
            b"\nSIGINT: checkpointing at the next step boundary "
            b"(Ctrl-C again to abort without a checkpoint)\n",
        )

    def _save_interrupt(self, signum=None, frame=None):
        """SIGINT semantics (eager_trainer.py:171-178): checkpoint + exit(1).
        Runs from the train loop (deferred via _request_interrupt), never
        from signal-handler context. Buffered device-side metrics are
        flushed first (they would otherwise be lost — up to flush_every
        dispatches of scalars), and an async (orbax) save is waited out so
        the checkpoint status points at a complete checkpoint before the
        process dies."""
        self._flush_buffered()
        self.writer.flush()
        # "batch" = batches already completed in the in-flight epoch: resume
        # continues at the NEXT batch instead of restarting the epoch. After
        # an interrupt that lands during the end-of-epoch save, batch equals
        # the full epoch count — resume then skips the (finished) epoch
        # instead of double-training it on its own weights.
        self.checkpointer.save(
            "interrupt",
            self.state,
            {
                "epoch": self.global_epoch,
                "step": self.global_step,
                "batch": self._cur_batch_no,
            },
        )
        self.checkpointer.wait()
        print("\nCheckpoint has been saved (interrupt)")
        sys.exit(1)

    def _save_epoch_checkpoint(self, epoch: int) -> None:
        """End-of-epoch checkpoint (eager_trainer.py:229), on the
        ``ckpt_every`` cadence. The final epoch ALWAYS saves (training must
        end durable); skipped epochs resume from the last saved one and
        deterministically retrain the gap (the same (seed, epoch) batch
        order that makes mid-epoch resume exact). One full-state pull is
        gigabytes at 512²+ over this container's tunnel — the cadence is
        the difference between checkpointing dominating an epoch and not."""
        cfg = self.cfg
        if cfg.ckpt_every > 1 and epoch % cfg.ckpt_every != 0 and epoch != cfg.epoch:
            return
        self.checkpointer.save(
            str(epoch), self.state, {"epoch": epoch + 1, "step": self.global_step}
        )
        if cfg.keep_checkpoints > 0:
            self._prune_checkpoints(cfg.keep_checkpoints)

    def train(self, epoch_callback=None) -> None:
        """Run the training loop from the restored epoch to ``cfg.epoch``.

        ``epoch_callback(epoch)``, when given, fires after each epoch's
        checkpoint is written (post-prune, post-deferred-SIGINT handling;
        under ``ckpt_every > 1`` it still fires EVERY epoch — align the
        cadences if the callback needs a checkpoint file for its epoch) —
        long-horizon harnesses (scripts/campaign.py) hook their periodic
        evals here instead of reconstructing a Trainer per eval chunk,
        which re-uploads the device store (~2.5 GB at 512²) every chunk.
        The callback runs OUTSIDE the jitted step; exceptions propagate
        and end the run after the epoch's checkpoint is already durable."""
        cfg = self.cfg
        assert self.dataset is not None, "train mode needs a dataset"
        self._interrupt_requested = False
        self._in_train = True  # predict cadences log TB images (tb_images)
        prev_handler = signal.signal(signal.SIGINT, self._request_interrupt)
        self._metrics_buffer = []  # (step, device metrics) — flushed lazily,
        metrics_buffer = self._metrics_buffer  # shared with _save_interrupt
        flush_every = 16
        # tracing/profiling subsystem (SURVEY §5): capture an xplane trace of
        # steps [10, 10+profile_steps) of the first epoch, viewable in
        # TensorBoard's profile plugin / xprof.
        profile_dir = os.path.join(cfg.result_dir, "log", "profile")
        profiling = False
        profile_started = False  # one trace per run
        first_epoch = self.global_epoch
        step_fn = self._train_step
        gather_mode = cfg.device_data
        accum_m = cfg.grad_accum if gather_mode else 1  # micro-pairs/update
        scan_k = cfg.steps_per_dispatch if gather_mode else 1
        # accumulation over the device store always rides the scan path
        # (make_scan_accum_train_step), even at one update per dispatch
        use_scan = gather_mode and (scan_k > 1 or accum_m > 1)
        if cfg.steps_per_dispatch > 1 and not gather_mode:
            print(
                "WARNING: steps_per_dispatch > 1 requires device_data=True "
                "(HBM-resident dataset); running one step per dispatch."
            )
        if gather_mode:
            # store-slicing step: ONE dispatch per step (profiled: per-batch
            # device slices cost ~12ms/step of host dispatch on the remote
            # runtime). steps_per_dispatch > 1 scans K steps per dispatch.
            # Composes with DP/spatial meshes: the store is mesh-sharded and
            # the slice is local on every device (training/step.py).
            from littlegan_tpu.training.step import (
                make_gather_train_step,
                make_scan_accum_train_step,
                make_scan_train_step,
            )

            imgs_dev, conds_dev = self._ensure_device_store()
            make_scan = (
                make_scan_accum_train_step if accum_m > 1 else make_scan_train_step
            )
            # donate=None: honor cfg.donate_state (default True). Donation
            # aliases the output state onto the input — at 1024² that is
            # ~2.3 GB of peak HBM the un-donated step double-counts (the
            # r3_1024 campaign OOM showed "Output ... shares 0B with
            # arguments"). Safe here: the trainer replaces self.state with
            # the dispatch output before anything else reads it, and every
            # between-dispatch consumer (predict cadence, epoch callback,
            # checkpoint, deferred SIGINT save) sees the NEW buffers.
            if use_scan:
                scan_step = make_scan(
                    cfg, self.state.params, scan_k, donate=None, mesh=self.mesh,
                    store_s2d=self._store_s2d,
                )
                if accum_m > 1:
                    print(
                        f"device_data x grad_accum: {accum_m} micro-pairs per "
                        f"update (effective batch {accum_m * cfg.batch_size}), "
                        f"{scan_k} updates per dispatch"
                    )
            else:
                gather_step = make_gather_train_step(
                    cfg, self.state.params, donate=None, mesh=self.mesh,
                    store_s2d=self._store_s2d,
                )
                step_fn = lambda s, i1, i2, rng, bno: gather_step(
                    s, imgs_dev, conds_dev, jnp.int32(i1), jnp.int32(i2), rng, bno
                )
        rem_steps = {}  # remainder-scan compiles, keyed by K_r (scan path)
        try:
            for epoch in range(self.global_epoch, cfg.epoch + 1):
                self.global_epoch = epoch
                print(f"Experiment: {cfg.exp_name} Epoch: {epoch} starting...")
                start = time.time()
                if use_scan:
                    # K-updates-per-dispatch fast path: group 2*K*M batch ids
                    # (M = grad_accum micro-pairs per applied update)
                    ids_per_update = 2 * accum_m
                    idx_stream = self._device_epoch(epoch)
                    resume_b = self._resume_batch if epoch == first_epoch else 0
                    if resume_b:
                        print(
                            f"mid-epoch resume: continuing epoch {epoch} at "
                            f"batch {resume_b + 1} (skipping {resume_b} "
                            "already-trained batches)"
                        )
                        for _ in range(ids_per_update * resume_b):
                            next(idx_stream, None)
                    batch_no = resume_b
                    self._cur_batch_no = batch_no
                    images_done = 0
                    dropped = 0
                    while True:
                        group = []
                        for _ in range(ids_per_update * scan_k):
                            nxt = next(idx_stream, None)
                            if nxt is None:
                                break
                            group.append(nxt)
                        k_r, step, last = scan_k, scan_step, False
                        if len(group) < ids_per_update * scan_k:
                            # trailing partial group: run it with a remainder-
                            # sized scan (n_batches is constant, so this is
                            # ONE extra compile, first epoch only) — full
                            # dataset coverage per epoch; only a partial
                            # update's batches can be dropped (a single odd
                            # batch at parity; up to 2M-1 with accumulation,
                            # matching the host-fed accumulation path)
                            rem = len(group) // ids_per_update
                            dropped = len(group) - ids_per_update * rem
                            if rem == 0:
                                break
                            k_r, last = rem, True
                            group = group[: ids_per_update * rem]
                            step = rem_steps.get(rem)
                            if step is None:
                                step = make_scan(
                                    cfg, self.state.params, rem, donate=None,
                                    mesh=self.mesh, store_s2d=self._store_s2d,
                                )
                                rem_steps[rem] = step
                        # profiling at group granularity: skip the first
                        # (warm-up) group, then trace until profile_steps
                        # steps are covered (or the epoch ends, whichever
                        # comes first). An epoch whose SECOND group is
                        # already the trailing remainder would never pass
                        # the warm-up gate — trace it anyway rather than
                        # silently ignoring profile_steps (advisor r2).
                        if cfg.profile_steps > 0 and epoch == first_epoch:
                            if not profile_started and (batch_no >= scan_k or last):
                                jax.block_until_ready(self.state.params)
                                jax.profiler.start_trace(profile_dir)
                                profile_started = profiling = True
                            elif profiling and batch_no >= scan_k + cfg.profile_steps:
                                jax.block_until_ready(self.state.params)
                                jax.profiler.stop_trace()
                                profiling = False
                                print("profiler trace written to", profile_dir)
                        # within a group, pair p = (ids[2p], ids[2p+1]); update
                        # u consumes pairs [u*M, (u+1)*M) — so the even/odd
                        # de-interleave reshapes to (K, M) id matrices
                        b1_ids = np.asarray(group[0::2], np.int32)
                        b2_ids = np.asarray(group[1::2], np.int32)
                        if accum_m > 1:
                            b1_ids = b1_ids.reshape(k_r, accum_m)
                            b2_ids = b2_ids.reshape(k_r, accum_m)
                        out = step(
                            self.state,
                            imgs_dev,
                            conds_dev,
                            b1_ids,
                            b2_ids,
                            self._base_rng,
                            jnp.int32(self.global_step + 1),
                            jnp.int32(batch_no + 1),
                        )
                        self.state = out.state
                        # stacked (K,) metric arrays stay on device; expanded
                        # per step at flush time (no per-step slicing here —
                        # each slice would be another host dispatch)
                        metrics_buffer.append(
                            (self.global_step + 1, batch_no + 1, out.metrics)
                        )
                        prev_batch = batch_no
                        batch_no += k_r
                        self._cur_batch_no = batch_no
                        self.global_step += k_r
                        images_done += 2 * cfg.batch_size * k_r * accum_m
                        if len(metrics_buffer) >= flush_every:
                            self._flush_buffered()
                        # cadences snap to dispatch-group boundaries: fire once
                        # if any step in the group crossed the cadence (the
                        # remainder group shares this path — a cadence inside
                        # the epoch tail still fires)
                        if cfg.freq_gen > 0 and (
                            batch_no // cfg.freq_gen > prev_batch // cfg.freq_gen
                        ):
                            # fetch on EVERY host (the cross-host gather is a
                            # collective); only host 0 writes the file
                            fake_np = _fetch_artifact(out.fake_image)
                            adj_np = _fetch_artifact(out.adj_image) if cfg.train_adj else None
                            if self._host0:
                                save_image(
                                    fake_np,
                                    os.path.join(cfg.result_dir, "train", "gen", f"{epoch}-{batch_no}.jpg"),
                                )
                                if cfg.train_adj:
                                    save_image(
                                        adj_np,
                                        os.path.join(cfg.result_dir, "train", "adj", f"{epoch}-{batch_no}.jpg"),
                                    )
                        if cfg.freq_test > 0 and (
                            batch_no // cfg.freq_test > prev_batch // cfg.freq_test
                        ):
                            self.predict(
                                self.test_noise, self.test_cond, self.test_image,
                                os.path.join(cfg.result_dir, "test", "gen", f"{epoch}-{batch_no}.jpg"),
                                os.path.join(cfg.result_dir, "test", "disc", f"{epoch}-{batch_no}.json"),
                                os.path.join(cfg.result_dir, "test", "adj", f"{epoch}-{batch_no}.jpg"),
                            )
                        if self._interrupt_requested:  # deferred SIGINT
                            self._save_interrupt()
                        if last:
                            break
                    if profiling:  # short first epoch: stop at epoch end —
                        # later epochs never pass the first-epoch gate, so an
                        # open trace would silently span the whole run
                        jax.block_until_ready(self.state.params)
                        jax.profiler.stop_trace()
                        profiling = False
                        print("profiler trace written to", profile_dir)
                    self._flush_buffered()
                    elapsed = time.time() - start
                    rate = images_done / elapsed if elapsed > 0 else 0.0
                    drop_note = (  # a single odd batch at parity; up to
                        # 2M-1 batches of a partial accumulation group
                        f"  [{dropped} trailing batch(es) dropped]" if dropped else ""
                    )
                    print(f"Time usage: {elapsed:.1f}s  ({rate:.1f} images/s){drop_note}")
                    self._save_epoch_checkpoint(epoch)
                    if self._interrupt_requested:  # SIGINT during epoch save
                        self._save_interrupt()
                    if epoch_callback is not None:
                        # async (orbax) saves: join so the callback really
                        # does see a durable epoch checkpoint, as documented
                        self.checkpointer.wait()
                        epoch_callback(epoch)
                    continue

                resume_b = self._resume_batch if epoch == first_epoch else 0
                if resume_b:
                    print(
                        f"mid-epoch resume: continuing epoch {epoch} at batch "
                        f"{resume_b + 1} (skipping {resume_b} already-trained "
                        "batches)"
                    )
                if cfg.grad_accum > 1:  # host-fed (device_data rides use_scan)
                    # each applied update consumes 2*M dataset batches
                    pairs = self._accum_prefetch(
                        self.dataset.epoch_iterator(
                            epoch, start_batch=2 * cfg.grad_accum * resume_b
                        )
                    )
                elif cfg.device_data:
                    ids = self._device_epoch(epoch)
                    for _ in range(2 * resume_b):
                        next(ids, None)
                    pairs = _pairwise(ids)
                else:
                    pairs = self._device_prefetch(
                        self.dataset.epoch_iterator(epoch, start_batch=2 * resume_b)
                    )
                batch_no = resume_b
                self._cur_batch_no = batch_no
                images_done = 0
                for b1, b2 in pairs:
                    batch_no += 1
                    self._cur_batch_no = batch_no
                    self.global_step += 1
                    if cfg.profile_steps > 0 and epoch == first_epoch:
                        if batch_no == 10 and not profiling:
                            # drain the async in-flight steps first: device
                            # time from dispatches 1-9 must not bleed into
                            # the captured window (the scan path blocks too)
                            jax.block_until_ready(self.state.params)
                            jax.profiler.start_trace(profile_dir)
                            profiling = True
                        elif profiling and batch_no == 10 + cfg.profile_steps:
                            jax.block_until_ready(self.state.params)
                            jax.profiler.stop_trace()
                            profiling = False
                            print("profiler trace written to", profile_dir)
                    step_rng = jax.random.fold_in(self._base_rng, self.global_step)
                    out = step_fn(self.state, b1, b2, step_rng, jnp.int32(batch_no))
                    self.state = out.state
                    metrics_buffer.append((self.global_step, batch_no, out.metrics))
                    images_done += 2 * cfg.batch_size * max(1, cfg.grad_accum)

                    if len(metrics_buffer) >= flush_every:
                        self._flush_buffered()

                    if cfg.freq_gen > 0 and batch_no % cfg.freq_gen == 0:  # eager_trainer.py:216-220
                        # fetch on EVERY host (cross-host gather is a
                        # collective); only host 0 writes the file
                        fake_np = _fetch_artifact(out.fake_image)
                        adj_np = _fetch_artifact(out.adj_image) if cfg.train_adj else None
                        if self._host0:
                            save_image(
                                fake_np,
                                os.path.join(cfg.result_dir, "train", "gen", f"{epoch}-{batch_no}.jpg"),
                            )
                            if cfg.train_adj:
                                save_image(
                                    adj_np,
                                    os.path.join(cfg.result_dir, "train", "adj", f"{epoch}-{batch_no}.jpg"),
                                )
                    if cfg.freq_test > 0 and batch_no % cfg.freq_test == 0:  # eager_trainer.py:221-226
                        self.predict(
                            self.test_noise,
                            self.test_cond,
                            self.test_image,
                            os.path.join(cfg.result_dir, "test", "gen", f"{epoch}-{batch_no}.jpg"),
                            os.path.join(cfg.result_dir, "test", "disc", f"{epoch}-{batch_no}.json"),
                            os.path.join(cfg.result_dir, "test", "adj", f"{epoch}-{batch_no}.jpg"),
                        )
                    if self._interrupt_requested:  # deferred SIGINT
                        self._save_interrupt()
                if profiling:  # short first epoch: stop at epoch end, not run end
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                    print("profiler trace written to", profile_dir)
                self._flush_buffered()
                elapsed = time.time() - start
                rate = images_done / elapsed if elapsed > 0 else 0.0
                print(f"Time usage: {elapsed:.1f}s  ({rate:.1f} images/s)")
                self._save_epoch_checkpoint(epoch)
                if self._interrupt_requested:  # SIGINT during epoch save
                    self._save_interrupt()
                if epoch_callback is not None:
                    # async (orbax) saves: join so the callback really does
                    # see a durable epoch checkpoint, as documented
                    self.checkpointer.wait()
                    epoch_callback(epoch)
        finally:
            self._in_train = False
            if profiling:
                jax.profiler.stop_trace()
            signal.signal(signal.SIGINT, prev_handler)
            self.checkpointer.wait()  # async backend: join the in-flight save
            self.writer.flush()

    def _prune_checkpoints(self, keep: int) -> None:
        """Drop all but the newest ``keep`` epoch checkpoints (on-disk naming
        lives with each backend: Checkpointer.epoch_tags/delete).

        Once a non-finite loss has been seen, pruning stops entirely:
        retention would otherwise rotate the pre-divergence checkpoints —
        the only recovery path — out of existence while NaN-weight epochs
        keep saving."""
        if self._nonfinite_warned:
            return
        for tag in self.checkpointer.epoch_tags()[:-keep]:
            if int(tag) in self._pinned_tags:
                continue
            self.checkpointer.delete(tag)

    def pin_checkpoint(self, tag) -> None:
        """Exempt an epoch checkpoint from retention pruning.

        For eval-driven callers (scripts/campaign.py's epoch_callback): with
        ``keep_checkpoints`` small, the rolling window otherwise deletes the
        best-metric epoch — the 512² campaign's best-FID epoch-90 checkpoint
        was pruned before the final grids could be drawn (CAMPAIGN.md).
        Pinning is per-Trainer state: a RESUMED run starts with no pins, so
        callers re-pin from their recorded trajectory."""
        self._pinned_tags.add(int(tag))

    def unpin_checkpoint(self, tag) -> None:
        """Drop a pin (the tag becomes prunable again at the NEXT rotation)."""
        self._pinned_tags.discard(int(tag))

    @property
    def writer(self) -> SummaryWriter:
        if self._writer is None:
            self._writer = SummaryWriter(os.path.join(self.cfg.result_dir, "log"))
        return self._writer

    def _flush_metrics(self, buffer) -> None:
        """One host sync for many steps (SURVEY §7 hard part (f)).

        Entries are (step0, batch_no0, metrics) where metric values are
        scalars (one step) or (K,) arrays (a scanned dispatch group)."""
        host = jax.device_get([m for _, _, m in buffer])
        last_g = last_d = last_a = 0.0
        last_step = buffer[-1][0]
        for (step0, batch0, _), m in zip(buffer, host):
            vals = {k: np.atleast_1d(v) for k, v in m.items()}
            k_steps = len(vals["loss/gen"])
            for k in range(k_steps):
                step, batch_no = step0 + k, batch0 + k
                pairs = [("loss/gen", vals["loss/gen"][k]), ("loss/disc", vals["loss/disc"][k])]
                # reference logs no adj loss during the warm-up window
                # (eager_trainer.py:152,206-207: adjuster skipped for batch <= 10)
                if self.cfg.train_adj and batch_no > 10:
                    pairs.append(("loss/adj", vals["loss/adj"][k]))
                self.writer.scalars(pairs, step)
                last_g, last_d, last_a = (
                    float(vals["loss/gen"][k]),
                    float(vals["loss/disc"][k]),
                    float(vals["loss/adj"][k]),
                )
                last_step = step
                if not self._nonfinite_warned and not (
                    np.isfinite(last_g) and np.isfinite(last_d) and np.isfinite(last_a)
                ):
                    # GAN divergence observability (beyond reference): a NaN
                    # loss propagates into every weight within a step and the
                    # metric flush is the first host-side sighting — warn
                    # LOUDLY once. From here on checkpoint PRUNING stops, so
                    # the pre-divergence epoch checkpoints (the recovery
                    # path) survive even though post-divergence epochs keep
                    # saving on top.
                    self._nonfinite_warned = True
                    print(
                        f"WARNING: non-finite loss at step {step} "
                        f"(G={last_g} D={last_d} A={last_a}) — training has "
                        "diverged; recover by restoring a checkpoint from "
                        f"BEFORE step {step} (checkpoint pruning is now "
                        "disabled so those epochs stay on disk)."
                    )
        print(f"  step {last_step}: LossG {last_g:.4f} LossD {last_d:.4f} LossA {last_a:.4f}")

    # ----------------------------------------------------------- predict ----

    def generate(self, noise, cond) -> np.ndarray:
        """G(noise, cond) with the eval weights (EMA when enabled) — the
        bare forward predict() wraps; public for sampling tooling
        (cli.py interpolate mode, scripts)."""
        params = eval_params(self.state)
        return np.asarray(self._gen_jit(params, jnp.asarray(noise), jnp.asarray(cond)))

    def adjust(self, image, cond) -> np.ndarray:
        """Adjuster(image, cond) with the eval weights; [-1,1] NHWC in/out."""
        params = eval_params(self.state)
        return np.asarray(self._adj_jit(params, jnp.asarray(image), jnp.asarray(cond)))

    def sample_u8(
        self, noise, cond, image
    ) -> Tuple[np.ndarray, Dict, Optional[np.ndarray], Optional[np.ndarray]]:
        """evaluate-sample's per-batch inference: ONE fused device dispatch
        with uint8 images in both directions (the 30k protocol is transfer-
        bound otherwise — see the sample_fn comment in __init__).

        ``image``: uint8 [0,255] rows straight from the pipeline, or f32
        [-1,1] (quantized host-side before upload — same rounding). Returns
        ``(gen_u8, d_score_stats dict, adj_real_u8 | None, adj_fake_u8 |
        None)``; image arrays are writer-ready uint8."""
        params = eval_params(self.state)
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            from littlegan_tpu.utils.image import inverse_rescale

            # clip like the device-side q(): an input marginally outside
            # [-1,1] must saturate, not wrap (1.01 -> 256 -> 0)
            arr = np.clip(inverse_rescale(arr), 0, 255).astype(np.uint8)
        out = self._sample_jit(
            params, jnp.asarray(np.asarray(noise)), jnp.asarray(np.asarray(cond)), jnp.asarray(arr)
        )
        if self.cfg.train_adj:
            gen_u8, scores, adj_r, adj_f = out
        else:
            (gen_u8, scores), adj_r, adj_f = out, None, None
        save = d_score_stats(np.asarray(cond), *scores)
        return (
            np.asarray(gen_u8),
            save,
            None if adj_r is None else np.asarray(adj_r),
            None if adj_f is None else np.asarray(adj_f),
        )

    def predict(
        self,
        noise,
        cond,
        image,
        gen_image_save_path: Optional[str] = None,
        json_save_path: Optional[str] = None,
        adj_image_save_path: Optional[str] = None,
    ) -> Tuple[np.ndarray, Dict, Optional[np.ndarray], Optional[np.ndarray]]:
        """Inference + D-score stats + artifacts (eager_trainer.py:265-298).

        Multi-host: the fixture is broadcast (identical on every host), so
        all processes compute the same result together; only host 0 writes
        the artifact files (identical-path concurrent writes tear)."""
        cfg = self.cfg
        write = getattr(self, "_host0", True)
        params = eval_params(self.state)  # EMA generator weights when enabled
        start = time.time()
        gen_image = self._gen_jit(params, jnp.asarray(noise), jnp.asarray(cond))
        gen_image.block_until_ready()
        print(f"Generate Time {time.time() - start:.4f}s")
        if gen_image_save_path and write:
            save_image(np.asarray(gen_image), gen_image_save_path)

        real_pr, real_c = self._disc_jit(params, jnp.asarray(image))
        fake_pr, fake_c = self._disc_jit(params, gen_image)
        save = d_score_stats(cond, real_pr, real_c, fake_pr, fake_c)
        if json_save_path and write:
            with open(json_save_path, "w") as f:
                json.dump(save, f)

        adj_real_image, adj_fake_image = None, None
        if cfg.train_adj:  # adjust real AND generated (eager_trainer.py:291-297)
            adj_real_image = np.asarray(self._adj_jit(params, jnp.asarray(image), jnp.asarray(cond)))
            adj_fake_image = np.asarray(self._adj_jit(params, gen_image, jnp.asarray(cond)))
            if adj_image_save_path and write:
                save_image(
                    np.concatenate([adj_real_image, adj_fake_image], axis=0), adj_image_save_path
                )
        # TB image summaries (beyond-reference): the same grids the test
        # cadence writes to disk, under TensorBoard's Images tab. Only
        # inside a training run — predict() from the sampling modes must
        # not create an event file.
        if cfg.tb_images and self._in_train and write:
            from littlegan_tpu.utils.image import inverse_rescale, to_grid

            u8_grid = lambda b: to_grid(inverse_rescale(np.asarray(b)).astype(np.uint8))
            self.writer.image("test/gen", u8_grid(gen_image), self.global_step)
            if adj_real_image is not None:
                self.writer.image(
                    "test/adj",
                    u8_grid(np.concatenate([adj_real_image, adj_fake_image], axis=0)),
                    self.global_step,
                )
        return np.asarray(gen_image), save, adj_real_image, adj_fake_image

    # -------------------------------------------------------------- plot ----

    def plot(self) -> str:
        """Model summaries -> models.txt (eager_trainer.py:247-263)."""
        from littlegan_tpu.models import param_count

        p = self.state.params
        sections = []
        specs = [
            ("Encoder", {"encoder": p["encoder"]}),
            ("Decoder", {"decoder": p["decoder"]}),
            ("Discriminator", {"encoder": p["encoder"], "d_head": p["d_head"]}),
            ("Generator", {k: p[k] for k in ("g_head", "decoder", "out_conv")}),
        ]
        if self.cfg.train_adj:
            specs.append(
                ("Adjuster", {
                    "encoder (shared w/ D)": p["encoder"],
                    "adj_head (own)": p["adj_head"],
                    "decoder (shared w/ G)": p["decoder"],
                    "out_conv (shared w/ G)": p["out_conv"],
                })
            )
        from littlegan_tpu.utils.tree import path_str

        for name, tree in specs:
            pad = max(0, (53 - len(name)) // 2)
            lines = ["=" * pad + f"   Model: {name}  " + "=" * pad]
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                key = path_str(path)
                lines.append(f"  {key:<48} {str(leaf.shape):<18} {leaf.size}")
            lines.append(f"  total parameters: {param_count(tree)}")
            sections.append("\n".join(lines))
            # graphviz .dot architecture graph (the reference emits
            # plot_model PNGs, eager_trainer.py:261-263; .dot is the
            # renderer-free equivalent)
            self._write_dot(name, tree)
        text = "\n\n".join(sections) + "\n"
        out = os.path.join(self.cfg.result_dir, "models.txt")
        with open(out, "w") as f:
            f.write(text)
        return text

    def _write_dot(self, name: str, tree) -> None:
        from littlegan_tpu.utils.tree import path_str

        lines = [f'digraph "{name}" {{', "  rankdir=TB;", '  node [shape=record];']
        prev = None
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            key = path_str(path)
            if not key.endswith("kernel"):
                continue
            node = key.replace("/", "_").replace(" ", "_")
            label = key.rsplit("/", 1)[0] + "\\n" + str(tuple(leaf.shape))
            lines.append(f'  {node} [label="{label}"];')
            if prev:
                lines.append(f"  {prev} -> {node};")
            prev = node
        lines.append("}")
        with open(os.path.join(self.cfg.result_dir, f"{name}.dot"), "w") as f:
            f.write("\n".join(lines) + "\n")

    # ------------------------------------------------------------ export ----

    def export_model_checkpoint(self) -> str:
        """Weights-only export (eager_trainer.py:300-303) — same backend as
        the training checkpoints (Config checkpoint_backend)."""
        ck = make_checkpointer(self.cfg, os.path.join(self.cfg.result_dir, "model"))
        path = ck.save("model", eval_params(self.state))
        ck.wait()
        return path
