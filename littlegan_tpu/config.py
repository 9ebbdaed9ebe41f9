"""Layered configuration system.

Re-designs the reference ``Arg`` class (reference: config.py:8-39) as a typed
dataclass with the same three-layer merge semantics:

    sample.config.json  ->  <env>.config.json  ->  CLI overrides

and the same derived fields (``cond_dim = len(attr)``, ``result_dir``,
``prefetch = prefetch_batch * batch_size``; reference: config.py:32-39).

Differences from the reference, on purpose:
- typed dataclass instead of an untyped attribute bag; unknown JSON keys are
  still accepted (stored in ``extra``) so user env files keep working,
- ``gpu`` is kept for CLI compatibility but device selection is JAX-native
  (the reference only sets CUDA_VISIBLE_DEVICES, config.py:35-37),
- TPU-specific knobs: ``compute_dtype``, ``mesh_shape``, ``donate_state``.

The merged config is JSON-serializable for run provenance, matching the
reference's ``config.json`` dump (reference: eager_trainer.py:240-241).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

MODES = (
    "train",
    "plot",
    "visual",
    "random-sample",
    "evaluate",
    "condition-sample",
    "evaluate-sample",
    "export-model",
    # beyond the reference's 8 (main.py:12-13): latent slerp + per-attribute
    # adjuster sweep grids (cli.py)
    "interpolate",
    # beyond-reference: HTTP inference server (littlegan_tpu/serving.py);
    # also reachable directly as `python -m littlegan_tpu.serving`
    "serve",
    # beyond-reference: self-contained HTML experiment report rendered from
    # the run's own artifacts (littlegan_tpu/report.py — the reference links
    # an external report site instead, README.md:2-7)
    "report",
)


@dataclass
class Config:
    """Full experiment configuration (defaults mirror reference sample.config.json)."""

    # --- run identity (CLI positional in the reference, config.py:12-15) ---
    mode: str = "train"
    exp_name: str = "default"
    env: str = "sample"
    gpu: List[int] = field(default_factory=list)  # kept for CLI parity only
    debug: bool = False

    # --- data (reference: sample.config.json:2-7, dataset.py) ---
    batch_size: int = 32
    image_channel: int = 3
    image_path: str = "/path/to/image"
    attr_path: str = "/path/to/attr/list.txt"
    image_ext: str = "jpg"
    image_dim: int = 128
    attr: List[int] = field(default_factory=lambda: [8, 15, 20, 22, 26, 36, 39])

    # --- model (reference: sample.config.json:16-27, model.py) ---
    noise_dim: int = 93
    init_dim: int = 8
    norm: str = "instance"
    conv_filter: List[int] = field(default_factory=lambda: [384, 256, 128, 64, 32])
    kernel_size: int = 5
    leaky_alpha: float = 0.3
    dropout_rate: float = 0.5

    # --- optimization (reference: sample.config.json:28-37, eager_trainer.py:28-30) ---
    l1_lambda: float = 0.02
    lr: float = 5e-5
    beta_1: float = 0.5
    beta_2: float = 0.9
    epoch: int = 100
    use_gp: bool = False
    gp_weight: float = 5.0
    use_clip: bool = True
    clip_range: float = 0.5
    use_partition: bool = True
    partition_interval: int = 4

    # --- cadences / output (reference: sample.config.json:38-50) ---
    # 0 disables a cadence entirely (pure-throughput runs); the reference
    # would modulo-by-zero on that, so the disable is a documented extension
    freq_gen: int = 100
    freq_test: int = 2000
    all_result_dir: str = "result"
    test_data_dir: str = "test-data"
    evaluate_pre_calculated: str = "fid_stats_celeba_128_all.npz"
    random_sample_batch: int = 4
    condition_sample_batch: int = 100
    # interpolate mode (beyond-reference): grid geometry — `rows` latent
    # pairs slerped over `steps` columns, and one adjuster sweep row per
    # attribute over the same number of columns.
    interpolate_steps: int = 10
    interpolate_rows: int = 8
    evaluate_sample_size: int = 30000
    restore: bool = True
    reuse: bool = False
    train_adj: bool = True
    prefetch_batch: int = 3
    threads: int = 8

    # --- TPU-native additions (no reference equivalent) ---
    seed: int = 0
    compute_dtype: str = "bfloat16"  # dtype of conv/matmul compute inside the step
    param_dtype: str = "float32"  # params + optimizer state stay f32
    # OPT-IN, beyond the reference: storage dtype of the Adam mu/nu moment
    # trees ('float32' | 'bfloat16'). bfloat16 halves optimizer-state HBM —
    # the dominant train-state cost at 512²+ (docs/SCALING.md table) — and
    # composes with shard_opt_state for another n_devices x on top. Update
    # math stays f32 (upcast on load, round on store); with the G/D betas
    # (0.5, 0.9) the moment increments are large relative to the running
    # values, so bf16's ~0.4% rounding is far below gradient noise. Default
    # keeps the historical update bit-identical (golden tests pin it).
    moment_dtype: str = "float32"
    mesh_shape: Optional[List[int]] = None  # None -> 1D data mesh over all devices
    mesh_axes: List[str] = field(default_factory=lambda: ["data"])
    # OPT-IN, beyond the reference: ZeRO-1 optimizer-state sharding — the
    # Adam mu/nu moment trees are sharded over the mesh instead of
    # replicated per chip (params stay replicated; parallel/zero.py). XLA's
    # SPMD partitioner turns the optimizer tail into reduce-scatter(grads)
    # -> 1/n local Adam -> all-gather(params): same collective volume as
    # plain DP's all-reduce, n x less optimizer HBM. Matters at 512²+ where
    # the init_dim²-scaled dense heads dominate state size (docs/SCALING.md
    # table). Needs a mesh; across HOSTS additionally needs
    # extra.checkpoint_backend='orbax' (the npz backend gathers the full
    # state, which cannot see other hosts' shards — 2-process orbax
    # round-trip tested). Update-equivalence tested on the virtual 8-dev mesh.
    shard_opt_state: bool = False
    # OPT-IN, beyond the reference: tensor-parallel dense heads — the
    # init_dim²-scaled dense kernels (g_head/adj_head dense: output dim;
    # d_head pr/cond: input dim) are sharded over the spatial mesh's
    # 'model' axis instead of replicated (parallel/zero.py). Output-dim
    # sharding maps EXACTLY onto the H-sharded decoder activations (the
    # row-major (B, H·W·C) -> (B, H, W, C) reshape keeps H major), so the
    # forward pass needs no new collectives and the kernels' grads reduce
    # over 'data' only, at 1/n_model volume each. Their Adam moments (and
    # the EMA g_head) follow the param sharding. This is where the params
    # live at 512²+: at 1024² the G dense kernel alone is 629 MB f32.
    # Needs a ('data','model') mesh with init_dim % model-axis == 0; across
    # HOSTS additionally needs extra.checkpoint_backend='orbax'. Update-
    # equivalence tested on the virtual (4,2) mesh (tests/test_shard_dense.py).
    shard_dense: bool = False
    donate_state: bool = True  # donate train-state buffers into the jitted step
    # Fused Pallas norm+activation kernel (ops/pallas/norm_lrelu.py).
    # Default OFF: measured on v5e (2026-08), XLA's own conv-epilogue fusion
    # of the jnp instance-norm is ~1.8x faster than the hand-written kernel
    # for this model's shapes (17.8ms vs 31.9ms full step, batch 32) — the
    # sequential per-sample grid + custom-VJP residual pinning cost more
    # than the saved HBM round trips. Kept as an opt-in and a kernel pattern.
    use_pallas: bool = False
    # Pallas im2col-GEMM kernel for the s2d boundary conv (encoder block1:
    # 12->64 channels at 64², ops/pallas/boundary_conv.py). The xplane
    # profile shows XLA lowers this narrow-channel family with an N-minor
    # layout at ~3% MFU; the kernel runs it as one MXU GEMM per sample.
    # Default OFF: measured on v5e (2026-08-17), the b32 step REGRESSES
    # 10.4 -> 17.5 ms — the per-sample VMEM relayouts (scratch-realigned
    # im2col, forced by a Mosaic concatenate compiler crash on misaligned
    # operands) cost as much as XLA's mis-layout, plus boundary copies.
    # Full measurement record in the kernel docstring. Kept as an opt-in
    # pattern; disabled automatically under meshes (not partitionable).
    use_pallas_boundary: bool = False
    # OPT-IN: stop training (RuntimeError) when a flushed loss is NaN/inf.
    # Default keeps the reference's keep-running behavior, but once a loss
    # is non-finite the weights are unrecoverable — unattended runs burn
    # the remaining epochs for nothing. Either way the first sighting
    # prints a loud warning and checkpoint pruning stops so the
    # pre-divergence epochs stay restorable (training/trainer.py).
    halt_on_nonfinite: bool = False
    # OPT-IN, beyond the reference: G-only EMA (StyleGAN-style). 0 = off
    # (reference parity — the TrainState pytree is then byte-identical to
    # historical checkpoints). >0 keeps an exponential moving average of
    # the generator subtrees (g_head/decoder/out_conv) updated inside the
    # jitted step; predict/export-model/condition-sample then use the EMA
    # weights (training/state.py::eval_params). Typical: 0.999. Enabling
    # it on an EXISTING experiment needs a fresh run (the checkpoint
    # structure gains the ema subtree).
    ema_decay: float = 0.0
    # OPT-IN, beyond the reference: gradient accumulation — mean grads over
    # M micro-batch pairs, one optimizer apply (effective batch M*batch_size
    # with one micro-batch's activation memory; for 512²+ where the target
    # batch no longer fits, see README resolution table). 1 = off. Composes
    # with every pipeline and mesh: host-fed or device_data, single device,
    # DP 'data' mesh, and the spatial ('data','model') mesh (README
    # composition table; training/step.py make_accum_train_step /
    # make_scan_accum_train_step).
    grad_accum: int = 1
    # OPT-IN, beyond the reference: the adjuster trains on ONE N-row batch
    # per step — the real-image task on even batch_no, the generated-image
    # task on odd (exact reference pairings, equal frequency) — instead of
    # the reference's concat([real, fake]) 2N pass (eager_trainer.py:152-164,
    # ~40% of step FLOPs at 128²/b32). Measured v5e b32: 10.43 -> 8.60 ms
    # (6,134 -> 7,446 img/s, 1.21x); conditioning validated by a 100-epoch
    # campaign (CAMPAIGN.md). False = exact reference math (golden-tested).
    adj_half_batch: bool = False
    # OPT-IN, beyond the reference: rematerialize each NETWORK APPLICATION
    # (the G forward, each of the 4 D forwards, the A forward) in the fused
    # backward (jax.checkpoint in training/step.py::total_loss_fn).
    # Identical math and gradients — each application's internals are
    # replayed during its own backward segment instead of being stored
    # until the reverse pass reaches it, so peak activation HBM drops from
    # ~sum(all seven applications) toward ~max(one application), for ~one
    # extra forward of FLOPs per network. Granularity matters and was
    # measured: BLOCK-level checkpoints inside the networks were useless-
    # to-harmful on v5e (1024² b32 donated step peak 20.4 -> 28.2 GB)
    # because XLA's fused conv+norm-stat epilogues already recompute block
    # internals; the real cost is cross-network liveness. Worth it only
    # where activations, not FLOPs, bind (large image_dim / batch — see the
    # README resolution table for measured fit/speed points). Composes with
    # every step variant, mesh, and grad_accum.
    remat: bool = False
    # XLA scoped-VMEM budget for the train-step compiles on TPU backends
    # (passed as a per-jit compiler option; XLA's default on v5e is 16 MiB).
    # Swept on v5e at reference scale (2026-08): 32768 KiB is the optimum
    # (b32 step 10.4 -> 10.2 ms; 64 MiB regresses). 0 disables the override.
    scoped_vmem_kib: int = 32768
    # Extra per-jit XLA compiler options for TPU compiles, merged over the
    # scoped-VMEM option above (these keys win on collision). Unknown option
    # names fail at compile time with the backend's error — sweep candidates
    # with scripts/sweep_xla_options.py before baking one in. Swept on v5e
    # (2026-08-17, scan path, b32/128²): no candidate beat the default
    # pipeline; see the sweep script docstring for the measured table.
    xla_options: Dict[str, str] = field(default_factory=dict)
    use_native_loader: bool = True  # C++ JPEG loader (falls back to PIL)
    profile_steps: int = 0  # >0: capture a jax.profiler trace of N steps -> result/<exp>/log/profile
    # Cache decoded uint8 images in host RAM after first touch. CelebA-128 is
    # ~10 GB decoded; on decode-bound hosts (few cores per chip) this makes
    # epochs >= 2 memcpy-speed. Off by default (RAM cost).
    cache_decoded: bool = False
    # Host-side [0,255]->[-1,1] rescale (the reference's placement,
    # dataset.py:31-32). Default OFF: the pipeline ships uint8 to the device
    # (4x less host->device traffic) and the jitted step rescales on-chip —
    # the BASELINE north-star's "fused device-side preprocessing path".
    host_rescale: bool = False
    # Device-resident dataset: upload the ENTIRE decoded uint8 dataset to HBM
    # once and gather batches on-device — zero per-step host->device traffic.
    # CelebA-128 decoded is ~10 GB uint8 (vs 16 GB HBM/v5e chip): opt-in.
    device_data: bool = False
    # With device_data: run N train steps per XLA dispatch (lax.scan) to
    # amortize host dispatch latency. 1 = one step per dispatch. Artifact
    # cadences (freq_gen/freq_test) snap to dispatch-group boundaries.
    steps_per_dispatch: int = 1
    # Space-to-depth execution of the image-resolution boundary (ops/s2d.py):
    # exact same math, 2x2-block layout. Measured necessity on v5e: ~40% of
    # the b32 step was narrow-channel (3..32ch) work at 128^2 — 3/128 vector
    # lanes and a ~1 TFLOP/s [5,5,3,32] grad conv; s2d took the step from
    # 16.8 to 12.3 ms. Default ON; auto-disabled when kernel_size != 5,
    # image_dim is odd, or under spatial (H-sharded) meshes.
    use_s2d: bool = True
    # OPT-IN, NON-PARITY extension (off = exact reference architecture):
    # a per-sample, condition-dependent channel bias added before the output
    # tanh (out_conv gains a zeros-initialized (cond_dim, image_channel)
    # kernel). Rationale (ROADMAP #7): the reference's axis=None InstanceNorm
    # removes per-sample global mean/scale at EVERY block, so attributes that
    # are global statistics (overall brightness/tint) structurally cannot be
    # conditioned; this gives them one re-entry path. Measured in the round-2
    # campaign (CAMPAIGN.md).
    cond_bias: bool = False
    # TF-v1 Adam bias-correction parity: v1 ticks its shared beta-power
    # accumulators on EVERY apply_gradients call, even for weights the
    # partition schedule excluded that step. True reproduces that exact lr_t
    # schedule; False (default) counts per-leaf updates (self-consistent
    # per-leaf Adam). Matters only with use_partition / the adjuster warm-up.
    adam_tf_parity: bool = False
    # OPT-IN, beyond the reference (constant AdamOptimizer lr,
    # eager_trainer.py:28-30): learning-rate schedule, evaluated INSIDE the
    # masked Adam update from the per-leaf step count its state already
    # carries — no global-step threading through step signatures, so it
    # composes unchanged with every pipeline, mesh, scan, grad-accum, and
    # partition variant. "constant" (the default, with no warmup) is
    # bit-identical to the historical update. Steps are optimizer APPLIES:
    # per-leaf counts by default, the global v1 tick under adam_tf_parity.
    lr_schedule: str = "constant"  # constant | linear | cosine | exponential
    lr_warmup_steps: int = 0  # linear 0->lr ramp over this many applies
    lr_decay_steps: int = 0  # decay horizon after warmup (0 = no decay)
    lr_min_ratio: float = 0.0  # decay floor as a fraction of lr (exponential needs > 0)
    # checkpoint retention: keep the newest N epoch checkpoints (0 = keep all,
    # the reference's behavior — tf.train.Checkpoint.save never prunes).
    # 'interrupt' and weights-only exports are never pruned.
    keep_checkpoints: int = 0
    # checkpoint cadence: save an epoch checkpoint every N epochs (1 = every
    # epoch, the reference's behavior, eager_trainer.py:229). The FINAL epoch
    # always saves, and SIGINT always writes 'interrupt' — a crash between
    # cadence points resumes from the last saved epoch and deterministically
    # retrains the gap. Matters at 512²+ where one full-state pull is
    # gigabytes over this container's host<->chip tunnel.
    ckpt_every: int = 1
    # FID standard: torchvision inception_v3 weights converted via
    # scripts/convert_inception.py (pytorch-FID "torchvision" flavor;
    # values are NOT bit-identical to the reference's 2015 GraphDef but
    # comparable to other torchvision-based FID implementations).
    fid_weights: str = ""  # npz from scripts/convert_inception.py
    # With fid_weights unset, FID runs a deterministic random-init Inception:
    # self-consistent trend metric only, NOT comparable to published numbers.
    # Evaluation refuses to run in that state unless this is set.
    allow_random_fid: bool = False
    # Metrics the `evaluate` MODE computes (the standalone eval CLI has
    # per-flag control). Beyond "fid" (the reference's only metric): "is"
    # (Inception Score), "kid", "prdc" (precision/recall/density/coverage)
    # — all from the same features; kid/prdc need a stats npz written with
    # --save-features (eval/evaluate.py).
    eval_metrics: List[str] = field(default_factory=lambda: ["fid"])
    # Shard offline inference batches (predict / sampling modes / Inception
    # featurization) row-wise over all LOCAL devices (parallel/infer.py) —
    # value-equivalent to single-device; single-process only. Off = always
    # single-device inference.
    eval_data_parallel: bool = True
    # Log the freq_test predict grids (test/gen, test/adj) as TensorBoard
    # image summaries too (utils/tensorboard.py::SummaryWriter.image) —
    # beyond the reference's scalar-only logging. PNG-encoded; the cadence
    # is rare, so event-file growth is modest.
    tb_images: bool = True

    # unknown keys from user env files are preserved here for provenance
    extra: Dict[str, Any] = field(default_factory=dict)

    # --- derived (reference: config.py:32-39) ---
    @property
    def cond_dim(self) -> int:
        return len(self.attr)

    @property
    def result_dir(self) -> str:
        return os.path.join(self.all_result_dir, self.exp_name)

    @property
    def prefetch(self) -> int:
        return self.prefetch_batch * self.batch_size

    @property
    def image_shape(self):
        return (self.image_dim, self.image_dim, self.image_channel)

    def replace(self, **kw) -> "Config":
        # copy `extra` unless explicitly overridden: dataclasses.replace would
        # alias the dict, so mutating one config's extra would leak into every
        # config derived from it
        kw.setdefault("extra", dict(self.extra))
        return dataclasses.replace(self, **kw)

    def to_json_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        # include derived fields like the reference's dumped attribute bag
        d["cond_dim"] = self.cond_dim
        d["result_dir"] = self.result_dir
        d["prefetch"] = self.prefetch
        return d

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_json_dict(), f, indent=2)


_FIELD_NAMES = {f.name for f in dataclasses.fields(Config)}
_DERIVED = {"cond_dim", "result_dir", "prefetch"}


def _apply_layer(base: Dict[str, Any], layer: Dict[str, Any]) -> None:
    for key, value in layer.items():
        if key in _DERIVED:
            continue  # recomputed, never taken from files
        if key in _FIELD_NAMES:
            base[key] = value
        else:
            base.setdefault("extra", {})
            base["extra"][key] = value


def load_config(
    env: str = "sample",
    overrides: Optional[Dict[str, Any]] = None,
    search_dirs: Sequence[str] = (".",),
) -> Config:
    """Three-layer merge: sample.config.json -> <env>.config.json -> overrides.

    Mirrors reference config.py:17-31. The sample layer is optional here (the
    dataclass defaults already encode it); the env layer is optional unless
    ``env`` names a file that genuinely exists nowhere, in which case the env
    layer is simply skipped (the reference hard-fails; we degrade gracefully
    for programmatic use but CLI validates existence).
    """
    merged: Dict[str, Any] = {}
    names = ["sample.config.json"]
    if env != "sample":
        names.append(f"{env}.config.json")
    for name in names:
        for d in search_dirs:
            p = os.path.join(d, name)
            if os.path.isfile(p):
                with open(p) as f:
                    _apply_layer(merged, json.load(f))
                break
    if overrides:
        _apply_layer(merged, {k: v for k, v in overrides.items() if v is not None})
    merged.setdefault("env", env)
    return Config(**merged)
