"""Pallas TPU kernel: fused InstanceNorm + LeakyReLU with custom VJP.

Every encoder/decoder block in the model ends with
``instance_norm(x) -> leaky_relu`` over full (H, W, C) feature maps
(reference model.py:22-24, 46-48). This kernel computes the whole epilogue —
mean, population std, normalize with scalar gamma/beta (the reference's
``axis=None`` semantics, instance.py:82-116, eps added to the STD), and the
LeakyReLU — with the feature map resident in VMEM once per sample, instead
of the separate reduce + normalize + activation HLOs XLA would schedule.

Grid: one program per batch sample; the block is that sample's full
(H, W, C) map. Inside the kernel, compute streams over ROW CHUNKS
(``fori_loop`` over 8-row slices) so f32 temporaries stay at chunk size —
a whole-sample f32 materialization of a 128x128x32 map plus its temporaries
blows the ~16 MiB VMEM scoped-allocation budget (observed: 23.8M requested).
Stats use the sum/sum-of-squares one-pass form; variance is clamped at 0.

Backward is a second Pallas kernel implementing the analytic VJP with the
same chunked structure:

    d = std + eps,  n = (x - mean)/d,  z = gamma*n + beta,  y = lrelu(z)
    dz = dy * (z >= 0 ? 1 : alpha)
    dbeta += sum(dz);  dgamma += sum(dz*n)     (accumulated across the
        sequential TPU grid into one SMEM cell)
    dn = dz * gamma
    dx = (dn - mean(dn))/d - n * mean(dn*n)/std

tests/test_pallas.py asserts fwd and grad agreement vs the jnp reference
(interpret mode on the CPU test backend) and bit-level f32 stats tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_SAMPLE_LIMIT = 8 * 1024 * 1024  # per-sample fmap bytes (input dtype)
_CHUNK_ROWS = 8  # sublane-aligned row slice for streamed compute
_WHOLE_SAMPLE_F32_LIMIT = 512 * 1024  # below this, skip chunking entirely


# The default Mosaic scoped-VMEM cap (16 MiB) is conservative; large-sample
# blocks plus double-buffered grid DMA need a little more headroom on v5e.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_chunk(h: int, w: int, c: int) -> Optional[int]:
    """Rows per compute chunk; None = whole-sample math (small maps)."""
    if h * w * c * 4 <= _WHOLE_SAMPLE_F32_LIMIT or h % _CHUNK_ROWS != 0:
        return None
    return _CHUNK_ROWS


# ---------------------------------------------------------------- forward ----


def _moments(x_ref, chunk: Optional[int], h: int):
    """(mean, std) of the sample, f32, streamed over row chunks."""
    if chunk is None:
        x = x_ref[...].astype(jnp.float32)
        m = jnp.mean(x)
        return m, jnp.sqrt(jnp.mean((x - m) * (x - m)))
    n_elems = jnp.float32(h * x_ref.shape[2] * x_ref.shape[3])

    def body(i, acc):
        xs = x_ref[0, pl.ds(i * chunk, chunk), :, :].astype(jnp.float32)
        return acc[0] + jnp.sum(xs), acc[1] + jnp.sum(xs * xs)

    s, ss = lax.fori_loop(0, h // chunk, body, (jnp.float32(0), jnp.float32(0)))
    m = s / n_elems
    var = jnp.maximum(ss / n_elems - m * m, 0.0)
    return m, jnp.sqrt(var)


def _fwd_kernel(x_ref, scale_ref, out_ref, *, alpha: float, eps: float, chunk: Optional[int]):
    h = x_ref.shape[1]
    gamma = scale_ref[0, 0]
    beta = scale_ref[0, 1]
    m, s = _moments(x_ref, chunk, h)
    inv = gamma / (s + eps)

    if chunk is None:
        z = (x_ref[...].astype(jnp.float32) - m) * inv + beta
        out_ref[...] = jnp.where(z >= 0, z, alpha * z).astype(out_ref.dtype)
        return

    def body(i, _):
        xs = x_ref[0, pl.ds(i * chunk, chunk), :, :].astype(jnp.float32)
        z = (xs - m) * inv + beta
        out_ref[0, pl.ds(i * chunk, chunk), :, :] = jnp.where(z >= 0, z, alpha * z).astype(
            out_ref.dtype
        )
        return 0

    lax.fori_loop(0, h // chunk, body, 0)


def _fwd_pallas(x, gamma, beta, alpha, eps):
    n, h, w, c = x.shape
    scale = jnp.stack([gamma.reshape(()), beta.reshape(())]).reshape(1, 2).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, alpha=alpha, eps=eps, chunk=_pick_chunk(h, w, c)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=_use_interpret(),
    )(x, scale)


# --------------------------------------------------------------- backward ----


def _bwd_kernel(
    x_ref, dy_ref, scale_ref, dx_ref, dg_ref, db_ref, *, alpha: float, eps: float, chunk: Optional[int]
):
    h = x_ref.shape[1]
    gamma = scale_ref[0, 0]
    beta = scale_ref[0, 1]
    m, s = _moments(x_ref, chunk, h)
    d = s + eps
    s_safe = jnp.maximum(s, 1e-20)

    if chunk is None:
        x = x_ref[...].astype(jnp.float32)
        dy = dy_ref[...].astype(jnp.float32)
        n_ = (x - m) / d
        z = n_ * gamma + beta
        dz = dy * jnp.where(z >= 0, 1.0, alpha)
        db_p = jnp.sum(dz)
        dg_p = jnp.sum(dz * n_)
        dn = dz * gamma
        mean_dn = jnp.mean(dn)
        mean_dnn = jnp.mean(dn * n_)
        dx = (dn - mean_dn) / d - n_ * (mean_dnn / s_safe)
        dx_ref[...] = dx.astype(dx_ref.dtype)
    else:
        n_elems = jnp.float32(h * x_ref.shape[2] * x_ref.shape[3])

        def stat_body(i, acc):
            xs = x_ref[0, pl.ds(i * chunk, chunk), :, :].astype(jnp.float32)
            dys = dy_ref[0, pl.ds(i * chunk, chunk), :, :].astype(jnp.float32)
            n_c = (xs - m) / d
            z = n_c * gamma + beta
            dz = dys * jnp.where(z >= 0, 1.0, alpha)
            return (acc[0] + jnp.sum(dz), acc[1] + jnp.sum(dz * n_c))

        sum_dz, sum_dzn = lax.fori_loop(
            0, h // chunk, stat_body, (jnp.float32(0), jnp.float32(0))
        )
        db_p = sum_dz
        dg_p = sum_dzn
        mean_dn = gamma * sum_dz / n_elems
        mean_dnn = gamma * sum_dzn / n_elems

        def write_body(i, _):
            xs = x_ref[0, pl.ds(i * chunk, chunk), :, :].astype(jnp.float32)
            dys = dy_ref[0, pl.ds(i * chunk, chunk), :, :].astype(jnp.float32)
            n_c = (xs - m) / d
            z = n_c * gamma + beta
            dn = dys * jnp.where(z >= 0, 1.0, alpha) * gamma
            dx = (dn - mean_dn) / d - n_c * (mean_dnn / s_safe)
            dx_ref[0, pl.ds(i * chunk, chunk), :, :] = dx.astype(dx_ref.dtype)
            return 0

        lax.fori_loop(0, h // chunk, write_body, 0)

    # TPU grid iterations run sequentially -> accumulate scalar partials
    # across samples into one SMEM cell.
    @pl.when(pl.program_id(0) == 0)
    def _():
        db_ref[0, 0] = db_p
        dg_ref[0, 0] = dg_p

    @pl.when(pl.program_id(0) != 0)
    def _():
        db_ref[0, 0] += db_p
        dg_ref[0, 0] += dg_p


def _bwd_pallas(x, dy, gamma, beta, alpha, eps):
    n, h, w, c = x.shape
    scale = jnp.stack([gamma.reshape(()), beta.reshape(())]).reshape(1, 2).astype(jnp.float32)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, alpha=alpha, eps=eps, chunk=_pick_chunk(h, w, c)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_use_interpret(),
    )(x, dy, scale)
    return dx, dg.reshape(1), db.reshape(1)


# -------------------------------------------------------------- public op ----


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_instance_norm_lrelu(
    x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, alpha: float = 0.3, eps: float = 1e-3
) -> jnp.ndarray:
    """leaky_relu(instance_norm(x, gamma, beta), alpha) with VMEM-resident math.

    x: (N, H, W, C); gamma/beta: shape (1,) scalars (reference axis=None).
    """
    return _fwd_pallas(x, gamma, beta, alpha, eps)


def _vjp_fwd(x, gamma, beta, alpha, eps):
    return _fwd_pallas(x, gamma, beta, alpha, eps), (x, gamma, beta)


def _vjp_bwd(alpha, eps, res, dy):
    x, gamma, beta = res
    dx, dg, db = _bwd_pallas(x, dy, gamma, beta, alpha, eps)
    return dx, dg.astype(gamma.dtype), db.astype(beta.dtype)


fused_instance_norm_lrelu.defvjp(_vjp_fwd, _vjp_bwd)


def supports(shape: Tuple[int, ...], dtype) -> bool:
    """True if the per-sample fmap fits the kernel's VMEM budget."""
    if len(shape) != 4:
        return False
    per_sample = shape[1] * shape[2] * shape[3] * jnp.dtype(dtype).itemsize
    return per_sample <= _VMEM_SAMPLE_LIMIT
