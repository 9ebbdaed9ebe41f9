"""The fused, jitted adversarial train step — the framework's hot loop.

The reference's hot loop (eager_trainer.py:115-169) runs per step:
two data batches, noise sampling, host-side TF augmentation, a joint forward
under TWO GradientTapes (G and D), an optional third tape for the Adjuster,
clipping, and three Adam applies — ~6 forwards + 3 backwards in eager mode.

TPU-first redesign — everything below is ONE XLA program:

1. **Augmentation on device** (ops/augment.py) — no host round-trip.
2. **One fused backward** instead of three tapes: a single scalar
   ``total = gen_loss + disc_loss + adj_loss`` differentiated once, with
   ``stop_gradient`` placed so each loss's gradient reaches EXACTLY the
   parameters its reference tape would have touched:
     - ``disc_loss`` sees ``stop_gradient(fake)``          -> no grad to G,
     - ``gen_loss``  queries D through frozen d-params     -> no grad to D,
     - ``adj_loss``  sees every shared subtree frozen      -> grad only to
       adj_head (reference trains only weights[16:20], eager_trainer.py:59-63),
       and ``stop_gradient(fake)`` as its input image.
   The identical-forward D calls (live vs frozen params) are CSE'd by XLA.
   (Same observation as FusedProp, arXiv:2004.03335, derived independently
   for this pytree layout.)
3. **Masked Adam** applies the partition schedule (training/partition.py) and
   the adjuster warm-up gate ``batch_no > 10`` (eager_trainer.py:152) as
   traced 0/1 masks — one compiled program for every batch index.
4. **Gradient clipping** on D only: elementwise clip to ±clip_range
   (eager_trainer.py:146-148).
5. **Gradient penalty**: the reference declares ``use_gp`` but raises
   NotImplementedError (eager_trainer.py:141-143). We implement a real
   WGAN-GP penalty on interpolates (grad-of-grad under jit), default OFF for
   parity with the reference's effective behavior.
6. For data parallelism the step is jitted with a batch-sharded data axis;
   XLA inserts the gradient all-reduce over ICI automatically (parallel/).

Loss/data semantics preserved exactly (see ops/losses.py):
noise ~ N(0,1) (eager_trainer.py:125); G consumes batch-2 conds; D's real
input is the augmented batch-1 image; adjuster consumes
``concat([real_1, fake])`` with conds remapped ``(c+1)/2``
(eager_trainer.py:152-164).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from littlegan_tpu.config import Config
from littlegan_tpu.models import adjuster_apply, discriminator_apply, generator_apply
from littlegan_tpu.models.littlegan import s2d_active
from littlegan_tpu.ops.augment import augment, augment_s2d
from littlegan_tpu.ops.losses import adjuster_loss, discriminator_loss, generator_loss
from littlegan_tpu.training.optimizer import lr_scale_from_config, masked_adam_update
from littlegan_tpu.training.partition import build_partition_masks, resolve_mask
from littlegan_tpu.training.state import A_KEYS, D_KEYS, G_KEYS, TrainState, subtree
from littlegan_tpu.utils.jax_cache import tpu_compiler_options


class StepOutput(NamedTuple):
    state: TrainState
    metrics: Dict[str, jnp.ndarray]  # gen/disc/adj scalar losses
    fake_image: jnp.ndarray
    adj_image: jnp.ndarray  # zeros when train_adj is off


def _freeze(params, live_keys: Tuple[str, ...]):
    """stop_gradient on every subtree except ``live_keys``."""
    sg = jax.lax.stop_gradient
    return {k: (v if k in live_keys else sg(v)) for k, v in params.items()}


def gradient_penalty(params, real: jnp.ndarray, fake: jnp.ndarray, rng: jax.Array, cfg: Config) -> jnp.ndarray:
    """WGAN-GP on interpolates (capability the reference only stubs,
    eager_trainer.py:141-143)."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
    inter = eps * real + (1.0 - eps) * fake

    def d_pr(x):
        pr, _ = discriminator_apply(params, x, cfg, s2d_in=s2d_active(cfg))
        return jnp.sum(pr)

    g = jax.grad(d_pr)(inter)
    norms = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)), axis=(1, 2, 3)) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def total_loss_fn(
    params, batch1, batch2, noise, new_image, gp_rng, cfg: Config,
    inputs_s2d: bool = False, adj_sel=None, spatial_mesh=None,
):
    """Single differentiable scalar; stop_gradient routes each loss's grads.

    With cfg.use_s2d every image tensor is carried in 2x2-block space end to
    end (ops/s2d.py — exact same values, lane-aligned layouts); the losses
    are elementwise/reduce-all, so they are rearrangement-invariant.
    ``inputs_s2d`` marks batches that ALREADY arrive in block space (the
    s2d-layout device store) — no per-step conversion at all.

    ``adj_sel`` (cfg.adj_half_batch only): traced ``batch_no % 2``. The
    adjuster then consumes ONE N-row batch per step — the real-image task
    (img1 -> img2 targets, reference row 1) on even steps, the generated-
    image task (fake -> img1) on odd — instead of the reference's
    concat([real, fake]) 2N pass (eager_trainer.py:152-164). Both tasks
    keep their exact reference pairings and appear with equal frequency;
    each optimizer apply just sees one of them. ~40% of step FLOPs are the
    adjuster's 2N pass at reference scale (ROADMAP #3), so this is the
    measured step-time lever past the 10.4 ms parity plateau.
    """
    sg = jax.lax.stop_gradient
    img1, cond1 = batch1
    img2, cond2 = batch2
    s2 = s2d_active(cfg)
    if s2 and not inputs_s2d:
        from littlegan_tpu.ops.s2d import space_to_depth

        img1 = space_to_depth(img1)
        img2 = space_to_depth(img2)
        new_image = space_to_depth(new_image)

    # bf16 tails: carry the image tensors in compute dtype. Every consumer
    # either computes in that dtype anyway (D/A stems cast, littlegan.py:188)
    # or upcasts at its f32 reduction (losses). Halves the bandwidth of the
    # adjuster-input concats and the s2d layout copies. No-op in f32 mode.
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.float32:
        img1, img2, new_image = img1.astype(dt), img2.astype(dt), new_image.astype(dt)

    # cfg.remat: rematerialize each NETWORK APPLICATION in the backward.
    # The fused single backward otherwise keeps the activations of ALL
    # seven applications (1 G + 4 D + 1 A's encoder+decoder) live at once —
    # the backward traverses in reverse, so G's internals survive until the
    # end. jax.checkpoint at this granularity stores only each call's
    # inputs/outputs (boundary images + aliased params) and replays one
    # forward during that call's own backward segment: peak activation HBM
    # drops from ~sum(applications) toward ~max(one application) + images,
    # for ~one extra forward of FLOPs per network. Block-level checkpoints
    # INSIDE the networks were measured useless here (1024² b32 donated
    # step: 20.4G -> 28.2G peak) because XLA's fused conv+norm-stat
    # epilogues already recompute block internals instead of storing them —
    # the win is cross-network liveness, not block internals. Identical
    # math either way (tests/test_train_step.py::test_remat_step_equivalence).
    # spatial_mesh: explicit activation shardings at the head->decoder
    # junctions under a ('data','model') mesh (parallel/act_sharding.py) —
    # None everywhere else, keeping the step sharding-agnostic by default
    ck = jax.checkpoint if cfg.remat else (lambda f: f)
    d_apply = ck(
        lambda p, img: discriminator_apply(p, img, cfg, s2d_in=s2, spatial_mesh=spatial_mesh)
    )
    g_apply = ck(
        lambda p, nz, c: generator_apply(p, nz, c, cfg, s2d_out=s2, spatial_mesh=spatial_mesh)
    )
    a_apply = ck(
        lambda p, img, c: adjuster_apply(
            p, img, c, cfg, s2d_in=s2, s2d_out=s2, spatial_mesh=spatial_mesh
        )
    )

    fake = g_apply(params, noise, cond2)

    # --- D loss: grads to encoder + d_head only (fake is data) ---
    real_pr, real_c = d_apply(params, new_image)
    fake_pr_d, _ = d_apply(params, sg(fake))
    d_loss = discriminator_loss(cond1, real_c, real_pr, fake_pr_d)
    if cfg.use_gp:
        # interpolate from the AUGMENTED real (new_image) — the sample D is
        # actually trained on; penalizing off-manifold raw img1 points would
        # weaken the Lipschitz constraint where it matters
        d_loss = d_loss + cfg.gp_weight * gradient_penalty(params, new_image, sg(fake), gp_rng, cfg)

    # --- G loss: D queried with frozen params -> grads to G subtrees only ---
    d_frozen = _freeze(params, G_KEYS)
    fake_pr_g, fake_c_g = d_apply(d_frozen, fake)
    g_loss = generator_loss(cond2, fake_c_g, fake_pr_g, img2, fake, cfg.l1_lambda)

    total = g_loss + d_loss
    # train_adj=False: a (1,1,1,1) placeholder instead of a dead (2N,H,W,C)
    # zeros buffer (~12.6 MB/step of HBM writes at reference scale)
    adj_image = jnp.zeros((1, 1, 1, 1), jnp.float32)
    a_loss = jnp.float32(0.0)
    if cfg.train_adj:
        # reference eager_trainer.py:152-164: input conds remapped to ~[0,1],
        # targets stay soft ±1; input images are [real_1, fake] (fake as DATA)
        if cfg.adj_half_batch:
            if adj_sel is None:
                raise ValueError("adj_half_batch requires adj_sel (= batch_no % 2)")
            even = (adj_sel == 0)
            # one N-row task per step: even -> reference row 1 (real),
            # odd -> reference row 2 (generated); exact same pairings
            adj_tgt_cond = jnp.where(even, cond2, cond1)
            adj_in_img = jnp.where(even, img1, sg(fake))
            adj_tgt_img = jnp.where(even, img2, img1)
        else:
            adj_tgt_cond = jnp.concatenate([cond2, cond1], axis=0)
            adj_in_img = jnp.concatenate([img1, sg(fake)], axis=0)
            adj_tgt_img = jnp.concatenate([img2, img1], axis=0)
        adj_in_cond = (adj_tgt_cond + 1.0) * 0.5
        adj_params = _freeze(params, A_KEYS)
        adj_image = a_apply(adj_params, adj_in_img, adj_in_cond)
        adj_pr, adj_c = d_apply(_freeze(params, ()), adj_image)
        a_loss = adjuster_loss(adj_tgt_cond, adj_c, adj_pr, adj_tgt_img, adj_image, cfg.l1_lambda)
        total = total + a_loss

    if s2:  # artifacts leave the step in raw image form
        from littlegan_tpu.ops.s2d import depth_to_space

        fake_out = depth_to_space(fake)
        adj_out = depth_to_space(adj_image) if cfg.train_adj else adj_image
    else:
        fake_out, adj_out = fake, adj_image
    aux = {
        "loss/gen": g_loss,
        "loss/disc": d_loss,
        "loss/adj": a_loss,
        "fake": fake_out,
        "adj": adj_out,
    }
    return total, aux


def _prep_images(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side [0,255] uint8 -> [-1,1] f32 rescale (utils.data_rescale,
    reference dataset.py:31-32 moved on-chip). The pipeline ships uint8 to
    cut host->device bandwidth 4x; f32 batches pass through untouched
    (fixtures, tests, host_rescale mode)."""
    from littlegan_tpu.utils.image import data_rescale

    if x.dtype == jnp.uint8:
        return data_rescale(x.astype(jnp.float32))
    return x


def _micro_grads(
    state, batch1, batch2, rng, cfg: Config, inputs_s2d: bool, adj_sel=None,
    spatial_mesh=None,
):
    """One micro-batch's (grads, aux): data prep, noise, augmentation, and
    the fused backward — everything in train_step up to the optimizer."""
    batch1 = (_prep_images(batch1[0]), batch1[1])
    batch2 = (_prep_images(batch2[0]), batch2[1])
    k_noise, k_aug, k_gp = jax.random.split(rng, 3)
    img1, _ = batch1
    noise = jax.random.normal(k_noise, (img1.shape[0], cfg.noise_dim), jnp.float32)
    # eager_trainer.py:127-131, on device; layout-matched variant for the
    # s2d device store (identical math + PRNG stream, ops/augment.py)
    aug = augment_s2d if inputs_s2d else augment
    new_image = aug(k_aug, img1)
    return jax.grad(total_loss_fn, has_aux=True)(
        state.params, batch1, batch2, noise, new_image, k_gp, cfg, inputs_s2d,
        adj_sel, spatial_mesh,
    )


def apply_updates(
    state: TrainState, grads, aux, batch_no, cfg: Config, part_masks: Any
) -> StepOutput:
    """Optimizer tail shared by train_step and the grad-accumulation step:
    D-grad clipping, partition-schedule masks, adjuster warm-up gate, three
    masked TF-v1 Adam applies."""
    d_grads = subtree(grads, D_KEYS)
    if cfg.use_clip:  # eager_trainer.py:146-148 — D grads only
        d_grads = jax.tree_util.tree_map(
            lambda g: jnp.clip(g, -cfg.clip_range, cfg.clip_range), d_grads
        )
    g_grads = subtree(grads, G_KEYS)
    a_grads = subtree(grads, A_KEYS)

    g_mask = resolve_mask(part_masks["generator"], batch_no, cfg.use_partition, cfg.partition_interval)
    d_mask = resolve_mask(part_masks["discriminator"], batch_no, cfg.use_partition, cfg.partition_interval)
    a_mask = resolve_mask(part_masks["adjuster"], batch_no, cfg.use_partition, cfg.partition_interval)
    if cfg.train_adj:
        # adjuster warm-up: only after batch 10 of every epoch (eager_trainer.py:152)
        adj_gate = (batch_no > 10).astype(jnp.float32)
        a_mask = jax.tree_util.tree_map(lambda m: m * adj_gate, a_mask)
    else:
        a_mask = jax.tree_util.tree_map(lambda m: m * 0.0, a_mask)

    tick_all = cfg.adam_tf_parity
    # lr schedule (Config.lr_schedule, beyond the reference's constant lr):
    # a pure function of the apply count already in AdamState — None (the
    # default) keeps the historical constant-lr update bit-identical.
    lr_scale = lr_scale_from_config(cfg)
    new_g, opt_g = masked_adam_update(
        g_grads, state.opt_g, subtree(state.params, G_KEYS), g_mask, cfg.lr, cfg.beta_1, cfg.beta_2,
        tick_all=tick_all, lr_scale=lr_scale,
    )
    new_d, opt_d = masked_adam_update(
        d_grads, state.opt_d, subtree(state.params, D_KEYS), d_mask, cfg.lr, cfg.beta_1, cfg.beta_2,
        tick_all=tick_all, lr_scale=lr_scale,
    )
    # adjuster Adam uses default betas (eager_trainer.py:30). NO tick_all
    # here even in parity mode: the reference calls the adjuster's
    # apply_gradients only when batch > 10 (eager_trainer.py:152), and its
    # partition group is always the full own-subtree, so the per-leaf count
    # already equals v1's beta-power tick count exactly.
    new_a, opt_a = masked_adam_update(
        a_grads, state.opt_a, subtree(state.params, A_KEYS), a_mask, cfg.lr, 0.9, 0.999,
        lr_scale=lr_scale,
    )

    new_params = {**new_g, **new_d, **new_a}
    ema = state.ema
    if cfg.ema_decay > 0 and ema is not None:
        # G-only EMA (Config.ema_decay): track the post-update generator
        # subtrees; masked-off partition groups decay toward themselves
        # (p unchanged), which is the correct schedule-agnostic behavior
        d = jnp.float32(cfg.ema_decay)
        ema = jax.tree_util.tree_map(
            lambda e, p: (d * e.astype(jnp.float32) + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
            ema,
            new_g,
        )
    metrics = {k: aux[k] for k in ("loss/gen", "loss/disc", "loss/adj")}
    return StepOutput(
        state=TrainState(params=new_params, opt_g=opt_g, opt_d=opt_d, opt_a=opt_a, ema=ema),
        metrics=metrics,
        fake_image=aux["fake"],
        adj_image=aux["adj"],
    )


def train_step(
    state: TrainState,
    batch1: Tuple[jnp.ndarray, jnp.ndarray],
    batch2: Tuple[jnp.ndarray, jnp.ndarray],
    rng: jax.Array,
    batch_no: jnp.ndarray,
    cfg: Config,
    part_masks: Any,
    inputs_s2d: bool = False,
    spatial_mesh=None,
) -> StepOutput:
    adj_sel = (batch_no % 2) if cfg.adj_half_batch else None
    grads, aux = _micro_grads(
        state, batch1, batch2, rng, cfg, inputs_s2d, adj_sel, spatial_mesh
    )
    return apply_updates(state, grads, aux, batch_no, cfg, part_masks)


def accum_train_step(
    state: TrainState,
    batch1s: Tuple[jnp.ndarray, jnp.ndarray],
    batch2s: Tuple[jnp.ndarray, jnp.ndarray],
    rng: jax.Array,
    batch_no: jnp.ndarray,
    cfg: Config,
    part_masks: Any,
    spatial_mesh=None,
) -> StepOutput:
    """Gradient accumulation (OPT-IN, beyond the reference): MEAN gradients
    over M micro-batch pairs, then ONE optimizer application — effective
    batch M x batch_size with one micro-batch's activation memory. For
    resolutions where the target batch no longer fits (512²+, README table).

    ``batch1s``/``batch2s`` leaves carry a leading (M,) axis. Per micro-step
    the noise/augment PRNG stream is ``fold_in(rng, i)`` (distinct per
    micro-batch, deterministic). The partition schedule, adjuster warm-up
    gate, and D-grad clipping see one ``batch_no`` tick per APPLIED update —
    clipping applies to the mean gradient, matching a single big batch, not
    per-micro-batch. Metrics and artifact images are the last micro-step's.
    """
    adj_sel = (batch_no % 2) if cfg.adj_half_batch else None
    grads, aux = accum_grads(
        state, batch1s, batch2s, rng, cfg, adj_sel=adj_sel, spatial_mesh=spatial_mesh
    )
    return apply_updates(state, grads, aux, batch_no, cfg, part_masks)


def accum_grads(
    state: TrainState, batch1s, batch2s, rng: jax.Array, cfg: Config,
    inputs_s2d: bool = False, adj_sel=None, spatial_mesh=None,
):
    """(mean grads over the M stacked micro-pairs, last micro-step's aux).

    aux (which includes (B,H,W,C) image buffers) rides the scan CARRY — a
    stacked (M,B,H,W,C) output would burn exactly the activation-memory
    headroom this feature exists to create (same fix as the K-step scan's
    artifact carry)."""
    m = batch1s[0].shape[0]

    def body(carry, i):
        acc, _ = carry
        b1 = jax.tree_util.tree_map(lambda x: x[i], batch1s)
        b2 = jax.tree_util.tree_map(lambda x: x[i], batch2s)
        grads, aux = _micro_grads(
            state, b1, b2, jax.random.fold_in(rng, i), cfg, inputs_s2d, adj_sel, spatial_mesh
        )
        acc = jax.tree_util.tree_map(lambda a, g: a + g.astype(jnp.float32), acc, grads)
        return (acc, aux), None

    zeros = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), state.params
    )
    b1_0 = jax.tree_util.tree_map(lambda x: x[0], batch1s)
    b2_0 = jax.tree_util.tree_map(lambda x: x[0], batch2s)
    aux0_sd = jax.eval_shape(
        lambda st: _micro_grads(st, b1_0, b2_0, rng, cfg, inputs_s2d, adj_sel)[1], state
    )
    aux0 = jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), aux0_sd)
    (acc, aux), _ = jax.lax.scan(body, (zeros, aux0), jnp.arange(m, dtype=jnp.int32))
    grads = jax.tree_util.tree_map(lambda a: a / m, acc)
    return grads, aux


def make_train_step(cfg: Config, params, donate: bool | None = None):
    """Build the jitted single-device train step (multi-device: parallel/)."""
    part_masks = build_partition_masks(params)
    donate = cfg.donate_state if donate is None else donate
    fn = partial(train_step, cfg=cfg, part_masks=part_masks)
    return jax.jit(fn, donate_argnums=(0,) if donate else (), compiler_options=tpu_compiler_options(cfg))


def make_accum_train_step(cfg: Config, params, donate: bool | None = None, mesh=None):
    """Jitted gradient-accumulation step (cfg.grad_accum micro-pairs per
    update); signature ``step(state, batch1s, batch2s, rng, batch_no)`` with
    (M, B, ...) stacked batches.

    With ``mesh`` (a pure-DP 'data' mesh) the stacked batches are sharded
    ``P(None, 'data')``: each scanned micro-step runs batch-sharded across
    the mesh and the single optimizer apply per group sees the all-reduced
    mean gradient — effective batch M x B x n_devices with one micro-batch
    shard's activation memory per chip (the 1024²+ regime where both levers
    are needed at once). Update-equivalence with the single-device
    accumulation step is asserted in tests/test_parallel.py."""
    part_masks = build_partition_masks(params)
    donate = cfg.donate_state if donate is None else donate
    if mesh is not None and (cfg.use_pallas or cfg.use_pallas_boundary):
        cfg = cfg.replace(use_pallas=False, use_pallas_boundary=False)  # Mosaic is not auto-partitionable
    smesh = mesh if (mesh is not None and "model" in mesh.axis_names) else None
    fn = partial(accum_train_step, cfg=cfg, part_masks=part_masks, spatial_mesh=smesh)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else (), compiler_options=tpu_compiler_options(cfg))
    from jax.sharding import NamedSharding, PartitionSpec as P

    # spatial ('data','model') mesh: micro-batch images additionally sharded
    # on H over 'model' (same layout as make_spatial_train_step, with the
    # leading (M,) accumulation axis unsharded)
    spatial = "model" in mesh.axis_names
    if spatial:
        # same validation as make_spatial_train_step — a divisibility
        # mismatch should be a clear ValueError at build time, not an
        # opaque GSPMD error at first dispatch
        assert set(mesh.axis_names) == {"data", "model"}, "need a ('data','model') mesh"
        shape = dict(zip(mesh.axis_names, mesh.devices.shape))
        if cfg.batch_size % shape["data"] != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the data-axis size ({shape['data']})"
            )
        if cfg.image_dim % shape["model"] != 0:
            raise ValueError(
                f"image_dim {cfg.image_dim} must be divisible by the model-axis size ({shape['model']})"
            )
    else:
        # pure-DP 'data' mesh: the same mismatch must also be a clear
        # build-time error, not an opaque GSPMD failure at first dispatch
        n_data = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
        if cfg.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the data-axis size ({n_data})"
            )
    if spatial and cfg.use_s2d and not spatial_s2d_compatible(cfg, mesh):
        cfg = cfg.replace(use_s2d=False)  # block space can't tile this model axis
        fn = partial(accum_train_step, cfg=cfg, part_masks=part_masks, spatial_mesh=smesh)
    from littlegan_tpu.parallel.zero import train_state_shardings

    img_axes = ("data", "model") if spatial else ("data",)
    rep = NamedSharding(mesh, P())
    micro_img = NamedSharding(mesh, P(None, *img_axes))  # (M, B, H, ...)
    micro_cond = NamedSharding(mesh, P(None, "data"))
    micro = (micro_img, micro_cond)
    bsh = NamedSharding(mesh, P(*img_axes))
    adj_sh = bsh if cfg.train_adj else rep  # placeholder adj output is tiny
    state_sh = train_state_shardings(cfg, params, mesh)  # ZeRO-1 when opted in
    return jax.jit(
        fn,
        in_shardings=(state_sh, micro, micro, rep, rep),
        out_shardings=StepOutput(state=state_sh, metrics=rep, fake_image=bsh, adj_image=adj_sh),
        donate_argnums=(0,) if donate else (),
        compiler_options=tpu_compiler_options(cfg),
    )


def spatial_s2d_compatible(cfg: Config, mesh) -> bool:
    """Does the s2d boundary layout compose with this H-sharded mesh?

    The 2x2-block rearrangement splits H into (H/2, 2); when the BLOCK-space
    height H/2 tiles the 'model' axis, that reshape keeps every shard
    boundary on whole blocks (local, no resharding) and the 3x3 block-space
    convolutions halo-exchange like any conv. Round-4: the blanket disable
    measured 1.43x/1.69x per-chip cost at 256²/512² (bench --no-s2d,
    SCALING.md), so spatial meshes now KEEP s2d whenever the tiling works;
    equality + clean-SPMD gates in tests/test_spatial.py."""
    if mesh is None or "model" not in mesh.axis_names:
        return True
    msize = dict(zip(mesh.axis_names, mesh.devices.shape))["model"]
    return (cfg.image_dim // 2) % msize == 0


def _resolve_mesh_s2d(cfg: Config, mesh) -> Config:
    """Flip use_s2d off ONLY when the mesh's model axis cannot tile block
    space (the pre-round-4 behavior was an unconditional disable)."""
    if mesh is not None and cfg.use_s2d and "model" in mesh.axis_names:
        if not spatial_s2d_compatible(cfg, mesh):
            cfg = cfg.replace(use_s2d=False)
    return cfg


def _take_batch(store, b):
    """Select batch ``b`` from a (n_batches, B, ...) device store.

    A dynamic-slice along the UNSHARDED leading axis: under a mesh where the
    store is sharded P(None, 'data'[, 'model']) on (n_batches, B[, H]), every
    device slices its local shard — no collectives, and the result lands
    already sharded P('data'[, 'model']), exactly the train step's batch
    sharding. This is what lets device_data compose with DP/spatial meshes."""
    return jax.lax.dynamic_index_in_dim(store, b, axis=0, keepdims=False)


def _device_data_shardings(cfg: Config, mesh, params):
    """(state/replicated/store shardings, out_shardings) for the
    device-store step under ``mesh``. The state sharding is replicated
    unless cfg.shard_opt_state (ZeRO-1, parallel/zero.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from littlegan_tpu.parallel.zero import train_state_shardings

    rep = NamedSharding(mesh, P())
    state_sh = train_state_shardings(cfg, params, mesh)
    spatial = "model" in mesh.axis_names
    img_axes = ("data", "model") if spatial else ("data",)
    store_img = NamedSharding(mesh, P(None, *img_axes))
    store_cond = NamedSharding(mesh, P(None, "data"))
    out_img = NamedSharding(mesh, P(*img_axes))
    adj_sh = out_img if cfg.train_adj else rep
    out = StepOutput(state=state_sh, metrics=rep, fake_image=out_img, adj_image=adj_sh)
    return state_sh, rep, store_img, store_cond, out


def _check_store_layout(cfg: Config, store_s2d: bool) -> None:
    """An s2d-layout store requires the s2d step to be ACTIVE for this
    (possibly mesh-adjusted) config — otherwise the 12-channel block-layout
    images feed the raw 3-channel model and the user gets an opaque conv
    shape error at trace time. Fail clearly at build time instead."""
    if store_s2d and not s2d_active(cfg):
        raise ValueError(
            "store_s2d=True but the s2d step is inactive for this config "
            "(H-sharded 'model' meshes disable use_s2d; s2d also needs "
            "kernel_size=5 and an even image_dim) — upload a RAW-layout "
            "store instead"
        )


def _make_scan_dispatch(
    cfg: Config, params, n_steps: int, donate, mesh, update_fn, store_s2d: bool = False
):
    """Shared K-updates-per-dispatch scaffold for the device-store steps.

    ``lax.scan`` over per-dispatch id rows with the artifact CARRY: only the
    LAST update's images leave the dispatch (cadence artifacts snap to group
    granularity) — carrying them instead of scan-stacking (K,B,H,W,C)
    buffers saves K-1 image-batch HBM writes per dispatch (~0.3 ms/step at
    b32). ``update_fn(state, images, conds, b1, b2, rng, batch_no, cfg,
    part_masks) -> StepOutput`` performs ONE applied update from its id row
    — a scalar pair for the plain scan step, (M,) id vectors for the
    accumulation step. Per-update PRNG is ``fold_in(base_rng, global_step0
    + i)`` (the trainer's exact stream); the partition schedule sees the
    true ``batch_no0 + i``.
    """
    part_masks = build_partition_masks(params)
    donate = cfg.donate_state if donate is None else donate
    if mesh is not None and (cfg.use_pallas or cfg.use_pallas_boundary):
        cfg = cfg.replace(use_pallas=False, use_pallas_boundary=False)  # Mosaic is not auto-partitionable
    cfg = _resolve_mesh_s2d(cfg, mesh)  # keep s2d when block space tiles the model axis
    _check_store_layout(cfg, store_s2d)

    def fn(state, images, conds, b1s, b2s, base_rng, global_step0, batch_no0):
        def body(carry, xs):
            st, _, _ = carry
            i, b1, b2 = xs
            rng = jax.random.fold_in(base_rng, global_step0 + i)
            out = update_fn(st, images, conds, b1, b2, rng, batch_no0 + i, cfg, part_masks)
            return (out.state, out.fake_image, out.adj_image), out.metrics

        steps = jnp.arange(n_steps, dtype=jnp.int32)
        out0 = jax.eval_shape(
            lambda st: update_fn(
                st, images, conds, b1s[0], b2s[0], base_rng, batch_no0, cfg, part_masks
            ),
            state,
        )
        zero = lambda sd: jnp.zeros(sd.shape, sd.dtype)
        init = (state, zero(out0.fake_image), zero(out0.adj_image))
        (final_state, fake, adj), metrics = jax.lax.scan(body, init, (steps, b1s, b2s))
        return StepOutput(
            state=final_state,
            metrics=metrics,  # each entry shape (K,)
            fake_image=fake,
            adj_image=adj,
        )

    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else (), compiler_options=tpu_compiler_options(cfg))
    state_sh, rep, store_img, store_cond, out = _device_data_shardings(cfg, mesh, params)
    return jax.jit(
        fn,
        in_shardings=(state_sh, store_img, store_cond, rep, rep, rep, rep, rep),
        out_shardings=out,
        donate_argnums=(0,) if donate else (),
        compiler_options=tpu_compiler_options(cfg),
    )


def make_scan_train_step(
    cfg: Config, params, n_steps: int, donate: bool | None = None, mesh=None, store_s2d: bool = False
):
    """K train steps per dispatch: ``lax.scan`` over the store-slicing step.

    For the HBM-resident dataset mode on hosts where per-dispatch latency
    dominates (remote runtimes; ~30 ms RTT in this container), one dispatch
    per K steps amortizes it K-fold. Math is IDENTICAL to K sequential steps:
    the per-step PRNG is ``fold_in(base_rng, global_step0 + i)`` (the
    trainer's exact stream) and the partition schedule sees the true
    ``batch_no0 + i``.

    Signature: step(state, images, conds, b1s (K,), b2s (K,), base_rng,
    global_step0, batch_no0) -> (state, metrics (K,), fake, adj) where
    images/conds are the (n_batches, B, ...) device store, b1s/b2s are int32
    batch ids, and fake/adj are the LAST step's images (cadence artifacts
    snap to dispatch-group granularity). With ``mesh`` the store is sharded
    P(None, 'data'[, 'model']) and each scanned step runs data-parallel.
    """
    smesh = mesh if (mesh is not None and "model" in mesh.axis_names) else None

    def update(st, images, conds, b1, b2, rng, batch_no, cfg, part_masks):
        batch1 = (_take_batch(images, b1), _take_batch(conds, b1))
        batch2 = (_take_batch(images, b2), _take_batch(conds, b2))
        return train_step(
            st, batch1, batch2, rng, batch_no, cfg, part_masks,
            inputs_s2d=store_s2d, spatial_mesh=smesh,
        )

    return _make_scan_dispatch(cfg, params, n_steps, donate, mesh, update, store_s2d=store_s2d)


def make_scan_accum_train_step(
    cfg: Config, params, n_steps: int, donate: bool | None = None, mesh=None, store_s2d: bool = False
):
    """grad_accum x device_data: K APPLIED updates per dispatch, each
    accumulating ``cfg.grad_accum`` micro-pairs gathered from the HBM store.

    Signature: step(state, images, conds, b1s (K, M), b2s (K, M), base_rng,
    global_step0, batch_no0) — b1s/b2s are int32 batch ids into the
    (n_batches, B, ...) store; update ``i`` consumes micro-pairs
    ``(b1s[i, j], b2s[i, j])`` for j < M with the accumulation step's exact
    PRNG stream (``fold_in(fold_in(base_rng, global_step0 + i), j)``) and
    ONE masked-Adam apply at ``batch_no0 + i`` — bit-identical updates to
    the host-fed accumulation path on the same batch sequence (the id
    gather is a (M, B, ...) uint8 copy: micro-batch data is small next to
    the activation memory the accumulation exists to avoid). Under a mesh
    the store is sharded P(None, 'data'[, 'model']); ids are replicated, so
    the gather is device-local and micro-batches come out step-sharded.
    """
    smesh = mesh if (mesh is not None and "model" in mesh.axis_names) else None

    def update(st, images, conds, b1m, b2m, rng, batch_no, cfg, part_masks):
        gather = lambda ids: (jnp.take(images, ids, axis=0), jnp.take(conds, ids, axis=0))
        grads, aux = accum_grads(
            st, gather(b1m), gather(b2m), rng, cfg, inputs_s2d=store_s2d, spatial_mesh=smesh
        )
        return apply_updates(st, grads, aux, batch_no, cfg, part_masks)

    return _make_scan_dispatch(cfg, params, n_steps, donate, mesh, update, store_s2d=store_s2d)


def make_gather_train_step(
    cfg: Config, params, donate: bool | None = None, mesh=None, store_s2d: bool = False
):
    """Train step with the batch selection FUSED into the XLA program, for
    the HBM-resident dataset mode (cfg.device_data).

    Signature: step(state, images, conds, b1, b2, rng, batch_no).
    ``images``/``conds`` are the full device-resident dataset reshaped to
    (n_batches, B, ...); ``b1``/``b2`` are int32 batch ids. Profiling showed
    naive per-batch device slices cost ~12 ms/step of HOST dispatch over the
    remote runtime — one fused dispatch removes all of it. With ``mesh`` the
    store is sharded over the device mesh and the slice is local (see
    ``_take_batch``), composing device_data with DP/spatial training.
    """
    part_masks = build_partition_masks(params)
    donate = cfg.donate_state if donate is None else donate
    if mesh is not None and (cfg.use_pallas or cfg.use_pallas_boundary):
        cfg = cfg.replace(use_pallas=False, use_pallas_boundary=False)  # Mosaic is not auto-partitionable
    cfg = _resolve_mesh_s2d(cfg, mesh)  # keep s2d when block space tiles the model axis
    _check_store_layout(cfg, store_s2d)
    smesh = mesh if (mesh is not None and "model" in mesh.axis_names) else None
    base = partial(
        train_step, cfg=cfg, part_masks=part_masks, inputs_s2d=store_s2d, spatial_mesh=smesh
    )

    def fn(state, images, conds, b1, b2, rng, batch_no):
        batch1 = (_take_batch(images, b1), _take_batch(conds, b1))
        batch2 = (_take_batch(images, b2), _take_batch(conds, b2))
        return base(state, batch1, batch2, rng, batch_no)

    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else (), compiler_options=tpu_compiler_options(cfg))
    state_sh, rep, store_img, store_cond, out = _device_data_shardings(cfg, mesh, params)
    return jax.jit(
        fn,
        in_shardings=(state_sh, store_img, store_cond, rep, rep, rep, rep),
        out_shardings=out,
        donate_argnums=(0,) if donate else (),
        compiler_options=tpu_compiler_options(cfg),
    )
