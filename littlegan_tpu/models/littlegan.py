"""The LittleGAN model family as ONE shared parameter pytree + pure apply fns.

The reference wires five Keras models with aliased sub-modules
(model.py:6-136, main.py:20-24):

    Decoder  ⊂ Generator
    Encoder  ⊂ Discriminator
    Adjuster = D.encoder + own(dense, norm) + G.decoder + G.out_conv

Here that topology is a single dict-of-dicts pytree with five named subtrees —
``encoder``, ``decoder``, ``g_head``, ``out_conv``, ``d_head``, ``adj_head`` —
and three pure apply functions. Sharing is by construction: the same subtree
is read by every consumer, and the fused train step controls which subtree
each loss's gradient reaches via ``stop_gradient`` (see training/step.py).

Architecture (reference model.py, sample.config.json):
  conv_filter = [384, 256, 128, 64, 32], k=5, leaky_alpha=0.3
  Encoder  (model.py:6-27):  4x [Conv(s2) -> InstanceNorm -> LeakyReLU -> dropout*]
           channels 3 -> 64 -> 128 -> 256 -> 384 (conv_filter[4-i]); returns all
           4 feature maps for U-Net skips into the Adjuster.
           *reference dropout is a no-op at train time (tf.compat.v1.layers.dropout
           with default training=False, model.py:25) — reproduced as inert by
           default, activatable via ``dropout_rng``.
  Decoder  (model.py:30-51): 4x [skip-add? -> ConvT(s2) -> InstanceNorm -> LeakyReLU]
           channels 384 -> 256 -> 128 -> 64 -> 32 (conv_filter[i]).
  Generator (model.py:76-105): concat(noise 93, cond 7) -> Dense(8^2*384)
           -> LeakyReLU -> reshape 8x8x384 -> InstanceNorm -> Decoder(no skips)
           -> ConvT(3, s1, tanh).  22 weight arrays.
  Discriminator (model.py:54-73): Encoder -> flatten(8*8*384) -> Dense(1,sigmoid)
           + Dense(cond_dim, sigmoid).  20 weight arrays.
  Adjuster (model.py:108-136): D.encoder(image); Dense(cond) -> LeakyReLU ->
           InstanceNorm -> reshape; Decoder with REVERSED encoder fmaps as
           skips; G.out_conv.  4 own weight arrays (dense+norm).

All compute is NHWC; convs hit the MXU in the configured compute dtype
(bfloat16 by default) with f32 accumulation; instance-norm stats in f32.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from littlegan_tpu.config import Config
from littlegan_tpu.ops.conv import conv2d, deconv2d, dense, leaky_relu
from littlegan_tpu.ops.norm import instance_norm

Params = Dict[str, jnp.ndarray]

# Named-subtree views of each model, replacing the reference's fragile
# weight-index bookkeeping (eager_trainer.py:48-63).
GENERATOR_SUBTREES = ("g_head", "decoder", "out_conv")
DISCRIMINATOR_SUBTREES = ("encoder", "d_head")
ADJUSTER_TRAINABLE = ("adj_head",)  # reference trains ONLY weights[16:20]


# ------------------------------------------------------------------ init ----


def _glorot(rng, shape, in_axis=-2, out_axis=-1):
    return jax.nn.initializers.glorot_uniform(in_axis=in_axis, out_axis=out_axis)(
        rng, shape, jnp.float32
    )


def _conv_block(rng, kh: int, in_ch: int, out_ch: int) -> Params:
    return {
        "conv": {"kernel": _glorot(rng, (kh, kh, in_ch, out_ch)), "bias": jnp.zeros((out_ch,))},
        "norm": {"gamma": jnp.ones((1,)), "beta": jnp.zeros((1,))},
    }


def _deconv_block(rng, kh: int, in_ch: int, out_ch: int) -> Params:
    # TF conv2d_transpose kernel layout: (kh, kw, out_ch, in_ch); glorot fans
    # computed on that layout exactly as Keras does (fan_in from axis -2).
    return {
        "conv": {"kernel": _glorot(rng, (kh, kh, out_ch, in_ch)), "bias": jnp.zeros((out_ch,))},
        "norm": {"gamma": jnp.ones((1,)), "beta": jnp.zeros((1,))},
    }


def init_params(cfg: Config, rng: jax.Array) -> Params:
    """Initialize the full shared pytree (46 arrays: 16+16+4+2+4+4)."""
    cf = cfg.conv_filter
    k = cfg.kernel_size
    keys = iter(jax.random.split(rng, 16))

    # encoder: channels in 3 -> cf[3], cf[3] -> cf[2], cf[2] -> cf[1], cf[1] -> cf[0]
    enc_ch = [cfg.image_channel, cf[3], cf[2], cf[1], cf[0]]
    encoder = {
        f"block{i}": _conv_block(next(keys), k, enc_ch[i - 1], enc_ch[i]) for i in range(1, 5)
    }
    # decoder: cf[0] -> cf[1] -> cf[2] -> cf[3] -> cf[4]
    decoder = {
        f"block{i}": _deconv_block(next(keys), k, cf[i - 1], cf[i]) for i in range(1, 5)
    }
    # g_head/adj_head dense width == flattened final encoder fmap (8*8*384
    # at reference scale) — ONE size by construction (model.py:80,112,127)
    feat = cfg.init_dim * cfg.init_dim * cf[0]
    g_head = {
        "dense": {
            "kernel": _glorot(next(keys), (cfg.noise_dim + cfg.cond_dim, feat)),
            "bias": jnp.zeros((feat,)),
        },
        "norm": {"gamma": jnp.ones((1,)), "beta": jnp.zeros((1,))},
    }
    out_conv = {
        "kernel": _glorot(next(keys), (k, k, cfg.image_channel, cf[4])),
        "bias": jnp.zeros((cfg.image_channel,)),
    }
    if cfg.cond_bias:
        # opt-in conditional output bias (Config.cond_bias): zeros-initialized
        # so training starts EXACTLY at reference behavior; lands in the
        # generator's partition group 3 with the rest of out_conv
        out_conv["cond_kernel"] = jnp.zeros((cfg.cond_dim, cfg.image_channel))
    d_head = {
        "pr": {"kernel": _glorot(next(keys), (feat, 1)), "bias": jnp.zeros((1,))},
        "cond": {"kernel": _glorot(next(keys), (feat, cfg.cond_dim)), "bias": jnp.zeros((cfg.cond_dim,))},
    }
    adj_head = {
        "dense": {
            "kernel": _glorot(next(keys), (cfg.cond_dim, feat)),
            "bias": jnp.zeros((feat,)),
        },
        "norm": {"gamma": jnp.ones((1,)), "beta": jnp.zeros((1,))},
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "g_head": g_head,
        "out_conv": out_conv,
        "d_head": d_head,
        "adj_head": adj_head,
    }


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


# ----------------------------------------------------------------- apply ----


def _compute_dtype(cfg: Config):
    return jnp.dtype(cfg.compute_dtype)


def s2d_active(cfg: Config) -> bool:
    """Whether the space-to-depth boundary path applies: the exact kernel
    rearrangements in ops/s2d.py are derived for 5x5 kernels and need an
    even image size."""
    return cfg.use_s2d and cfg.kernel_size == 5 and cfg.image_dim % 2 == 0


def _norm_lrelu(x: jnp.ndarray, norm_params: Params, cfg: Config) -> jnp.ndarray:
    """InstanceNorm -> LeakyReLU block epilogue (model.py:22-24, 46-48).

    Uses the fused single-VMEM-pass Pallas kernel (ops/pallas/norm_lrelu.py)
    when enabled and the per-sample map fits on-chip; jnp otherwise (XLA
    fuses the fallback into the surrounding conv reasonably well).
    """
    if cfg.use_pallas:
        from littlegan_tpu.ops.pallas.norm_lrelu import fused_instance_norm_lrelu, supports

        if supports(x.shape, x.dtype):
            return fused_instance_norm_lrelu(
                x, norm_params["gamma"], norm_params["beta"], cfg.leaky_alpha
            )
    x = instance_norm(x, norm_params["gamma"], norm_params["beta"])
    return leaky_relu(x, cfg.leaky_alpha)


def encoder_apply(
    enc: Params,
    x: jnp.ndarray,
    cfg: Config,
    dropout_rng: Optional[jax.Array] = None,
    s2d_in: bool = False,
    spatial_mesh=None,
) -> List[jnp.ndarray]:
    """Reference model.py:18-27 — returns ALL four feature maps.

    ``dropout_rng=None`` reproduces the reference's inert dropout
    (tf.compat.v1.layers.dropout training=False default, model.py:25).
    With cfg.use_s2d, block1 runs in 2x2-block space (exact math, ops/s2d.py);
    ``s2d_in`` marks an input already in s2d form.

    ``spatial_mesh``: pin each feature map's sharding under a
    ('data','model') mesh (parallel/act_sharding.py policy: H-sharded when
    the height tiles the model axis, batch-only otherwise). Without it a
    sub-model-axis-height e4 gets a degenerate H-sharded guess that
    conflicts with the (pinned) decoder skip-add cotangents inside the
    scan-accum while body — the round-5 accum x spatial involuntary-remat
    source.
    """
    x = x.astype(_compute_dtype(cfg))
    if s2d_active(cfg) and not s2d_in:
        from littlegan_tpu.ops.s2d import space_to_depth

        x = space_to_depth(x)
    outputs = []
    for i in range(1, 5):
        blk = enc[f"block{i}"]
        if spatial_mesh is not None:
            from littlegan_tpu.parallel.act_sharding import (
                constrain_data,
                model_axis_size,
            )

            # mirror of decoder_apply's degenerate-output pin: when this
            # block's conv will produce a sub-model-axis height, pin the
            # OPERAND batch-only so forward AND backward convs run
            # model-replicated — otherwise the dx conv demands a degenerate
            # H-sharded cotangent (transposed device order) and the
            # partitioner falls back to involuntary full remat inside the
            # scan-accum while body (round-5 accum x spatial finding)
            out_h = x.shape[1] if (i == 1 and s2d_active(cfg)) else x.shape[1] // 2
            msize = model_axis_size(spatial_mesh)
            if msize > 1 and out_h % msize != 0:
                x = constrain_data(x, spatial_mesh)
        normed = False
        if i == 1 and s2d_active(cfg):
            from littlegan_tpu.ops.s2d import s2d_conv1_kernel

            kern = s2d_conv1_kernel(blk["conv"]["kernel"])
            if cfg.use_pallas_boundary:
                from littlegan_tpu.ops.norm import instance_norm_from_stats
                from littlegan_tpu.ops.pallas.boundary_conv import boundary_conv_s2d, supports

                if supports(x.shape):
                    y, s1, s2 = boundary_conv_s2d(
                        x, kern.astype(x.dtype), blk["conv"]["bias"], True
                    )
                    x = leaky_relu(
                        instance_norm_from_stats(
                            y, s1, s2, blk["norm"]["gamma"], blk["norm"]["beta"]
                        ),
                        cfg.leaky_alpha,
                    )
                    normed = True
            if not normed:
                x = conv2d(x, kern, blk["conv"]["bias"], stride=1)
        else:
            x = conv2d(x, blk["conv"]["kernel"], blk["conv"]["bias"], stride=2)
        if not normed:
            x = _norm_lrelu(x, blk["norm"], cfg)
        if dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - cfg.dropout_rate
            mask = jax.random.bernoulli(sub, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
        if spatial_mesh is not None:
            from littlegan_tpu.parallel.act_sharding import constrain_spatial

            x = constrain_spatial(x, spatial_mesh)
        outputs.append(x)
    return outputs


def decoder_apply(
    dec: Params,
    x: jnp.ndarray,
    skips: Sequence[Optional[jnp.ndarray]],
    cfg: Config,
    spatial_mesh=None,
) -> jnp.ndarray:
    """Reference model.py:43-51 — optional skip-ADD before each deconv.

    With cfg.use_s2d, block4's output is produced directly in s2d form
    [N, H/2, W/2, 4*C] (a lane-aligned 128-channel tensor at reference
    scale); skips are unaffected — they add to block INPUTS, all <= H/2.

    ``spatial_mesh`` (a ('data','model') mesh or None): pin each block
    input's sharding explicitly — the head-reshape/skip-add junction is
    where XLA's propagation otherwise falls back to involuntary full
    rematerialization (parallel/act_sharding.py).
    """
    if spatial_mesh is not None:
        from littlegan_tpu.parallel.act_sharding import (
            constrain_data,
            constrain_spatial,
            h_shardable,
        )

    x = x.astype(_compute_dtype(cfg))
    for i in range(1, 5):
        blk = dec[f"block{i}"]
        if skips[i - 1] is not None:
            x = x + skips[i - 1].astype(x.dtype)
        input_degenerate = False
        if spatial_mesh is not None:
            x = constrain_spatial(x, spatial_mesh)
            input_degenerate = not h_shardable(x, spatial_mesh)
        if i == 4 and s2d_active(cfg):
            from littlegan_tpu.ops.s2d import s2d_deconv_kernel, tile_bias

            x = conv2d(
                x, s2d_deconv_kernel(blk["conv"]["kernel"]), tile_bias(blk["conv"]["bias"]), stride=1
            )
        else:
            x = deconv2d(x, blk["conv"]["kernel"], blk["conv"]["bias"], stride=2)
        if spatial_mesh is not None and input_degenerate:
            # pin the conv's result batch-only too: with a sub-model-axis
            # input height the partitioner would otherwise demand a
            # degenerate H-sharded operand (act_sharding.constrain_data)
            x = constrain_data(x, spatial_mesh)
        x = _norm_lrelu(x, blk["norm"], cfg)
    return x


def _out_conv(
    params: Params, x: jnp.ndarray, cfg: Config, cond: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """G's stride-1 tanh output deconv (model.py:90), shared with the Adjuster.
    In s2d mode both input and output stay in block space. With the
    Config.cond_bias extension, a per-sample cond-dependent channel bias is
    added before the tanh (see config.py — off by default, reference parity)."""
    if s2d_active(cfg):
        from littlegan_tpu.ops.s2d import s2d_outconv_kernel, tile_bias

        y = conv2d(
            x, s2d_outconv_kernel(params["out_conv"]["kernel"]),
            tile_bias(params["out_conv"]["bias"]), stride=1,
        )
    else:
        y = deconv2d(x, params["out_conv"]["kernel"], params["out_conv"]["bias"], stride=1)
    if cfg.cond_bias and cond is not None and "cond_kernel" in params["out_conv"]:
        b = dense(cond.astype(y.dtype), params["out_conv"]["cond_kernel"])  # (N, C)
        if s2d_active(cfg):
            b = jnp.tile(b, (1, 4))  # channel order (pi, pj, c)
        y = y + b[:, None, None, :]
    # tanh in f32 for accuracy; the IMAGE is carried in compute dtype. In bf16
    # mode this keeps the 2B adjuster/G output tails (concats, D re-encodes,
    # s2d layout copies, scan-stacked artifacts) at half bandwidth — losses
    # upcast to f32 at their reductions (ops/losses.py:26,34,57). float32
    # mode (the parity/golden-test mode) is bit-identical to before.
    return jnp.tanh(y.astype(jnp.float32)).astype(_compute_dtype(cfg))


def generator_apply(
    params: Params, noise: jnp.ndarray, cond: jnp.ndarray, cfg: Config, s2d_out: bool = False,
    spatial_mesh=None,
) -> jnp.ndarray:
    """Reference model.py:89-105. Returns an image in [-1,1], in
    cfg.compute_dtype (callers wanting f32 cast at the jit boundary).
    ``s2d_out=True`` (only with cfg.use_s2d) skips the final depth-to-space —
    the train step keeps images in block space end to end."""
    dt = _compute_dtype(cfg)
    x = jnp.concatenate([noise, cond], axis=-1).astype(dt)
    x = dense(x, params["g_head"]["dense"]["kernel"], params["g_head"]["dense"]["bias"])
    x = leaky_relu(x, cfg.leaky_alpha)
    x = x.reshape(-1, cfg.init_dim, cfg.init_dim, cfg.conv_filter[0])
    x = instance_norm(x, params["g_head"]["norm"]["gamma"], params["g_head"]["norm"]["beta"])
    x = decoder_apply(params["decoder"], x, [None] * 4, cfg, spatial_mesh=spatial_mesh)
    y = _out_conv(params, x, cfg, cond=cond)
    if s2d_active(cfg) and not s2d_out:
        from littlegan_tpu.ops.s2d import depth_to_space

        y = depth_to_space(y)
    return y


def discriminator_apply(
    params: Params,
    image: jnp.ndarray,
    cfg: Config,
    dropout_rng: Optional[jax.Array] = None,
    s2d_in: bool = False,
    spatial_mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference model.py:65-73. Returns (pr, cond) sigmoid outputs in f32."""
    fmaps = encoder_apply(
        params["encoder"], image, cfg, dropout_rng, s2d_in=s2d_in, spatial_mesh=spatial_mesh
    )
    flat = fmaps[-1].reshape(fmaps[-1].shape[0], -1)
    pr = dense(flat, params["d_head"]["pr"]["kernel"], params["d_head"]["pr"]["bias"])
    cond = dense(flat, params["d_head"]["cond"]["kernel"], params["d_head"]["cond"]["bias"])
    return jax.nn.sigmoid(pr.astype(jnp.float32)), jax.nn.sigmoid(cond.astype(jnp.float32))


def adjuster_apply(
    params: Params,
    image: jnp.ndarray,
    cond: jnp.ndarray,
    cfg: Config,
    dropout_rng: Optional[jax.Array] = None,
    s2d_in: bool = False,
    s2d_out: bool = False,
    spatial_mesh=None,
) -> jnp.ndarray:
    """Reference model.py:125-136: encode image, embed cond, decode with
    REVERSED encoder feature maps as U-Net skip-adds, share G's output conv.

    Note the reference order here is dense -> LeakyReLU -> InstanceNorm ->
    reshape (model.py:128-131), slightly different from G's dense -> LeakyReLU
    -> reshape -> InstanceNorm; preserved (norm over all non-batch axes is
    reshape-invariant, but order is kept faithful anyway).
    """
    dt = _compute_dtype(cfg)
    fmaps = encoder_apply(
        params["encoder"], image, cfg, dropout_rng, s2d_in=s2d_in, spatial_mesh=spatial_mesh
    )
    c = dense(cond.astype(dt), params["adj_head"]["dense"]["kernel"], params["adj_head"]["dense"]["bias"])
    c = leaky_relu(c, cfg.leaky_alpha)
    c = instance_norm(c, params["adj_head"]["norm"]["gamma"], params["adj_head"]["norm"]["beta"])
    c = c.reshape(-1, cfg.init_dim, cfg.init_dim, cfg.conv_filter[0])
    x = decoder_apply(params["decoder"], c, fmaps[::-1], cfg, spatial_mesh=spatial_mesh)
    y = _out_conv(params, x, cfg, cond=cond)
    if s2d_active(cfg) and not s2d_out:
        from littlegan_tpu.ops.s2d import depth_to_space

        y = depth_to_space(y)
    return y
