"""Pallas TPU kernel: s2d boundary 3x3 conv as an im2col MXU GEMM.

WHY (round-3 perf work, xplane-measured on v5e): with the s2d boundary on,
the train step's worst ops are the block-space 3x3 convolutions with 12
input channels (encoder conv1: (N,64,64,12)->(N,64,64,64), weights
(3,3,12,64), fused with the instance-norm sum/sumsq epilogue). XLA lowers
them with an N-minor layout (``bf16[64,64,64,64]{0,3,2,1}`` — batch in the
LANE dimension) and they run at ~6.6 TFLOP/s, ~3% of v5e's bf16 peak:
0.55 ms for a 3.6-GFLOP op whose HBM floor is ~50 us. The big-channel
convolutions in the same step run at 40%+ MFU — only this narrow-channel
family is mis-lowered.

The kernel streams one sample per grid step and computes the conv as one
im2col GEMM on the MXU:

    scratch[t] <- x_pad[ty : ty+H, tx : tx+W, :]    (9 shifted slices of
        the zero-padded sample, STORED to VMEM scratch first — Mosaic's
        concatenate crashes on misaligned-offset operands, measured; the
        store realigns each piece)
    patches = concat(scratch, lanes)                (H*W, 9*Cpad)
    y = patches @ w + bias                          (one dot, K = 9*Cpad,
        M = H*W pixels in sublanes, f32 accumulation)

Channels pad 12 -> Cpad=16 (weights zero-padded to match) so the concat
offsets are tile-aligned. The per-sample instance-norm scalars (sum,
sum-of-squares over the f32 accumulator — the reference's ``axis=None``
stats, instance.py:82-116) are computed before the downcast, so the stats
pass XLA fuses into the conv stays fused here too
(ops/norm.py::instance_norm_from_stats consumes them).

Integration: ``boundary_conv_s2d`` wraps the kernel in ``jax.custom_vjp``
— backward reuses the exact ``lax.conv_general_dilated`` calls JAX's
autodiff would emit for the plain conv (dx via transposed kernel, dw via
the activation/cotangent contraction, db by reduction), so only the
forward compute changes. Enabled by Config.use_pallas_boundary (encoder
block1's s2d path, models/littlegan.py). tests/test_pallas.py asserts fwd
+ grad agreement in interpret mode.

MEASURED OUTCOME (v5e, 2026-08-17, round-3 time-boxed attempt — XLA WINS,
kernel ships opt-in/default-off as a pattern):

- In the b32 train step the kernel REGRESSES 10.4 -> 17.5 ms. The xplane
  trace shows the Pallas custom-call itself costs 0.48 ms per 64-batch
  instance — no better than the 0.55 ms XLA fusion it replaces — plus new
  layout copies at the pallas_call boundaries ({3,2,1,0} kernel output vs
  the {0,3,2,1} layouts XLA picked around it).
- Per-sample accounting: the (4096,144)x(144,64) GEMM is ~0.8 us of MXU
  time but each sample pays ~7 us of VMEM relayout (9 scratch stores +
  concat + pads). The scratch realign is forced: Mosaic's concatenate
  CRASHES the compiler (tpu_compile_helper exit 1) on shifted/misaligned-
  offset operands at these shapes — measured on 12- AND 16-channel pieces;
  aligned-operand concat compiles fine.
- Alternative lowerings all lose too (same session, same chip):
  9 accumulated K=12 dots in Pallas 1531 us/64-batch; XLA
  conv_general_dilated_patches + dot ~1.2 ms; XLA pad-slice-concat + dot
  1.7-3.1 ms. The isolated XLA conv itself measures 1.1-2.5 ms — SLOWER
  than its own 0.55 ms in-step fusion (layout context matters; isolation
  wall-clock over this host tunnel is unreliable in both directions, so
  the step benchmark is the only decision metric).

Conclusion: the narrow-channel boundary family's ~3% MFU is a relayout
problem that Mosaic pays just as dearly for as XLA does; with the concat
path compiler-broken there is no Pallas formulation here that beats XLA's
in-step fusion. Matches the round-2 norm+lrelu result (config.use_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
_CPAD = 16  # channel pad: concat offsets must be tile-aligned (see docstring)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def supports(x_shape) -> bool:
    """Shapes the kernel handles efficiently: narrow input channels (the
    mis-lowered family), 8-aligned spatial dims, sample + patches in VMEM."""
    _, h, w, c = x_shape
    if c > _CPAD or h % 8 or w % 8:
        return False
    # patches + 9 scratch pieces + in/out blocks, bf16, well under the limit
    return h * w * (9 * _CPAD + 2 * _CPAD + 256) * 2 <= 24 * 1024 * 1024


def _conv3x3_kernel(x_ref, w_ref, b_ref, y_ref, s1_ref, s2_ref, *scratch, with_stats: bool):
    """One sample: pad, 9 realigned tap slices, ONE MXU GEMM, bias, f32 stats."""
    h, w = x_ref.shape[1], x_ref.shape[2]
    cout = w_ref.shape[1]
    xp = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))
    for t in range(9):
        i, j = t // 3, t % 3
        scratch[t][...] = xp[i : i + h, j : j + w, :]
    patches = jnp.concatenate([s[...] for s in scratch], axis=-1)
    y = jnp.dot(
        patches.reshape(h * w, 9 * _CPAD), w_ref[...], preferred_element_type=jnp.float32
    )
    y = y + b_ref[...].astype(jnp.float32)  # (1, Cout) broadcast
    i = pl.program_id(0)
    if with_stats:
        s1_ref[i, 0] = jnp.sum(y)
        s2_ref[i, 0] = jnp.sum(y * y)
    else:  # never hand back uninitialized SMEM as if it were stats
        s1_ref[i, 0] = 0.0
        s2_ref[i, 0] = 0.0
    y_ref[0] = y.reshape(h, w, cout).astype(y_ref.dtype)


def conv3x3_same_stats(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, with_stats: bool = True):
    """3x3 stride-1 SAME conv + bias, NHWC x HWIO -> (y, sum, sumsq).

    ``sum``/``sumsq`` are the instance-norm one-pass stats over each
    sample's full (H, W, C) output (bias included), computed from the f32
    GEMM accumulator — exactly what the XLA conv+stats fusion produces."""
    n, h, wd, cin = x.shape
    assert w.shape[:2] == (3, 3) and w.shape[2] == cin, w.shape
    assert cin <= _CPAD, cin
    cout = w.shape[3]
    x16 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, _CPAD - cin)))
    # weight matrix in the kernel's (tap-major, padded-ci) K order
    w16 = jnp.pad(w, ((0, 0), (0, 0), (0, _CPAD - cin), (0, 0))).reshape(9 * _CPAD, cout)
    kern = functools.partial(_conv3x3_kernel, with_stats=with_stats)
    y, s1, s2 = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wd, _CPAD), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * _CPAD, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((h, wd, _CPAD), x.dtype)] * 9,
        compiler_params=_COMPILER_PARAMS,
        interpret=_use_interpret(),
    )(x16, w16, b.reshape(1, cout).astype(x.dtype))
    return y, s1[:, 0], s2[:, 0]


# ------------------------------------------------------------- custom VJP ----


def _xla_conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def boundary_conv_s2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, with_stats: bool = True):
    """Drop-in fused boundary conv+bias: (y, sum, sumsq), XLA grads."""
    return conv3x3_same_stats(x, w, b, with_stats)


def _fwd(x, w, b, with_stats):
    y, s1, s2 = conv3x3_same_stats(x, w, b, with_stats)
    return (y, s1, s2), (x, w, y, b)


def _bwd(with_stats, res, cts):
    x, w, y, b = res
    b_dtype = b.dtype
    gy, gs1, gs2 = cts
    gy = gy.astype(jnp.float32)
    if with_stats:
        # d(sum)/dy = 1, d(sumsq)/dy = 2y — fold into the output cotangent
        gy = gy + gs1[:, None, None, None] + 2.0 * y.astype(jnp.float32) * gs2[:, None, None, None]
    # the bias cotangent must match the bias PRIMAL's dtype (f32 even under
    # bf16 compute, where w arrives pre-cast) — custom_vjp enforces it
    db = gy.sum(axis=(0, 1, 2)).astype(b_dtype)
    gy = gy.astype(x.dtype)
    # dx: conv with spatially-flipped, IO-transposed kernel (what JAX's
    # autodiff emits for a stride-1 SAME conv)
    w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = lax.conv_general_dilated(
        gy, w_t.astype(gy.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # dw: contraction of x with gy over (N, H, W) — the fgrad conv form
    dw = lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0),  # (Cin, H, W, N)
        gy.transpose(1, 2, 0, 3),  # (H, W, N, Cout)
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3).astype(w.dtype)  # (Cin,3,3,Cout)->(3,3,Cin,Cout)
    return dx, dw, db


boundary_conv_s2d.defvjp(_fwd, _bwd)
