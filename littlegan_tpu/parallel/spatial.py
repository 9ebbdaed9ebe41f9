"""Spatial (data x model) sharded training — the SURVEY §2 #23 stretch goal.

For resolutions beyond 128² a single chip's HBM can't hold the activations of
a large batch; the natural second sharding axis for a conv GAN is the IMAGE
HEIGHT. This module jits the same fused train step over a 2-D
``('data', 'model')`` mesh with image tensors sharded
``P('data', 'model')`` on (N, H):

- convolutions over H-sharded activations: XLA's SPMD partitioner inserts
  the halo exchanges for the 5x5 kernels automatically (the reason to shard
  H rather than W or C: NHWC keeps C on the lane dimension and W in-sublane,
  so H is the cheapest axis to split),
- instance-norm's per-sample reductions over (H, W, C) become cross-shard
  all-reduces over the ``model`` axis, also inserted by XLA,
- gradients meet replicated params exactly as in plain DP -> one all-reduce
  over BOTH axes.

No kernel changes: the step (training/step.py) is sharding-agnostic. The
equality test vs single-device training lives in tests/test_spatial.py on a
(4 data x 2 model) virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from littlegan_tpu.config import Config
from littlegan_tpu.training.partition import build_partition_masks
from littlegan_tpu.training.step import StepOutput, train_step
from littlegan_tpu.utils.jax_cache import tpu_compiler_options


def make_spatial_train_step(cfg: Config, params, mesh: Mesh, donate: bool | None = None):
    """Jit the train step over a ('data', 'model') mesh with H-sharded images.

    Batches are ((image NHWC, cond NC), ...): images sharded P('data','model')
    on (N, H); conds sharded P('data') on N. The data-axis size must divide
    the global batch; the model-axis size must divide the image height.
    """
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
    if cfg.use_pallas or cfg.use_pallas_boundary:
        cfg = cfg.replace(use_pallas=False, use_pallas_boundary=False)  # Mosaic is not auto-partitionable
    # s2d composes with the H-sharded mesh when block space tiles the model
    # axis (round-4: the blanket disable measured 1.43x/1.69x per-chip at
    # 256²/512² — training/step.py::spatial_s2d_compatible)
    from littlegan_tpu.training.step import _resolve_mesh_s2d

    cfg = _resolve_mesh_s2d(cfg, mesh)
    rep = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P("data", "model"))
    cond_sh = NamedSharding(mesh, P("data"))
    batch_sh = (img_sh, cond_sh)

    from littlegan_tpu.parallel.zero import train_state_shardings

    part_masks = build_partition_masks(params)
    # spatial_mesh: explicit head/decoder activation shardings
    # (parallel/act_sharding.py) — without them XLA's propagation falls back
    # to involuntary full rematerialization at the dense-head junctions
    fn = partial(train_step, cfg=cfg, part_masks=part_masks, spatial_mesh=mesh)
    donate = cfg.donate_state if donate is None else donate
    adj_sh = img_sh if cfg.train_adj else rep
    state_sh = train_state_shardings(cfg, params, mesh)  # ZeRO-1 when opted in
    return jax.jit(
        fn,
        in_shardings=(state_sh, batch_sh, batch_sh, rep, rep),
        out_shardings=StepOutput(state=state_sh, metrics=rep, fake_image=img_sh, adj_image=adj_sh),
        donate_argnums=(0,) if donate else (),
        compiler_options=tpu_compiler_options(cfg),
    )


def shard_spatial_batch(batch, mesh: Mesh):
    img, cond = batch
    return (
        jax.device_put(img, NamedSharding(mesh, P("data", "model"))),
        jax.device_put(cond, NamedSharding(mesh, P("data"))),
    )
