"""Convolution primitives with TF-parity padding semantics.

The reference stacks are built from ``tf.compat.v1.layers.Conv2D(k=5, s=2,
"same")`` (model.py:15) and ``Conv2DTranspose(k=5, s=(2,2), "same")``
(model.py:38) plus a stride-1 output ``Conv2DTranspose`` (model.py:90).

TF's ``conv2d_transpose`` is *defined* as the gradient (transpose) of the
corresponding forward SAME conv — XLA's default ``conv_transpose`` padding
math differs (SURVEY hard part (d)), so we use
``lax.conv_transpose(..., transpose_kernel=True)`` which reproduces exactly
that transpose relationship; ``tests/test_conv.py`` asserts equality with
``jax.vjp`` of the forward conv.

Layouts are NHWC / HWIO throughout (TPU-native; channels on the 128-lane
minor dimension). Kernels are stored f32 and cast to the compute dtype at
each call; under bf16 compute the TPU MXU still accumulates partial products
in f32 internally (bf16 in/out is the idiomatic training configuration —
``preferred_element_type=f32`` is deliberately NOT used because its mixed
f32-cotangent/bf16-operand transpose breaks under jax.grad).

Kernel shape convention for ``deconv2d``: ``(kh, kw, out_ch, in_ch)`` — the
kernel of the *forward* conv being transposed, which is also TF's
``conv2d_transpose`` kernel layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None, stride: int = 2) -> jnp.ndarray:
    """SAME-padded strided conv (reference: model.py:15, tf Conv2D).

    kernel: (kh, kw, in_ch, out_ch) HWIO.
    """
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=_DN,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def deconv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None, stride: int = 2) -> jnp.ndarray:
    """SAME-padded transposed conv with TF semantics (reference: model.py:38,90).

    kernel: (kh, kw, out_ch, in_ch) — TF conv2d_transpose layout. With
    ``transpose_kernel=True`` this computes the exact transpose (input
    gradient) of ``conv2d(y, kernel_as_HWIO, stride)``, matching TF.
    """
    y = lax.conv_transpose(
        x,
        kernel.astype(x.dtype),
        strides=(stride, stride),
        padding="SAME",
        dimension_numbers=_DN,
        transpose_kernel=True,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fully-connected layer (reference: tf.compat.v1.layers.Dense)."""
    y = jnp.dot(x, kernel.astype(x.dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def leaky_relu(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """LeakyReLU (reference: tf.nn.leaky_relu, model.py:24)."""
    return jax.nn.leaky_relu(x, negative_slope=alpha)
