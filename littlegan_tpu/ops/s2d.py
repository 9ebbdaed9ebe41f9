"""Space-to-depth (block 2x2) execution of the 128x128 boundary — exact math.

WHY (round-2 perf work, measured on v5e): an xplane profile of the b32 train
step showed ~40% of device time burned at the image-resolution boundary where
channel counts are 3..32: the [5,5,3,32] weight-grad convolution alone ran at
~1 TFLOP/s (1.2 ms), and every 128^2 x 3 elementwise op (tanh, L1, augment
epilogues) used 3 of 128 vector lanes. The MXU and VPU want >=128-channel
tensors; the reference architecture (model.py:15,38,90) simply doesn't have
them at the outer layers.

Space-to-depth fixes the LAYOUT without changing the MATH: every 128^2 image
tensor is carried as its 2x2-block rearrangement [N, 64, 64, 4C] (channel
order (row-phase, col-phase, c)), and the three boundary convolutions become
3x3 block-space convolutions whose kernels are exact index-rearrangements of
the reference-shaped parameters:

- encoder block1 (5x5 stride-2 SAME conv, model.py:15):
    z[i] = sum_t w[t] y[2i + t - 1]  (SAME pad_lo=1 for even input)
  block/phase split y[2c+q]:  t = 2m + q - 1 for block offset m-1
    => K[m, q] = w[2m + q - 1]                      (0 outside [0,5))
- decoder block4 (5x5 stride-2 SAME conv_transpose, model.py:38), defined as
  the transpose of the above forward conv (ops/conv.py):
    out[2b+p] = sum_t w[t] x[(2b + p + 1 - t)/2]
    => K[m, p] = w[3 - 2m + p]                      (0 outside [0,5))
  The OUTPUT lands directly in s2d form [N, 64, 64, 4*32] — a perfectly
  lane-aligned 128-channel tensor.
- out_conv (5x5 stride-1 SAME conv_transpose, model.py:90): transpose of a
  stride-1 SAME conv (pad 2):
    out[2b+p] = sum_t w[t] x[2b + p + 2 - t]
    => K[m, p, q] = w[4 - 2m + p - q]               (0 outside [0,5))

(The same index algebra applies per spatial axis; kernels are built by one
fancy-gather over a zero-ring-padded copy of the parameter, so gradients flow
back to the ORIGINAL reference-shaped arrays and checkpoints / param counts /
weight sharing are completely unchanged.)

Instance-norm (reduction over all non-batch axes), LeakyReLU, tanh, L1, and
the sigmoid heads are value-identical under the rearrangement, so the whole
train step computes exactly the reference numbers (tests/test_s2d.py asserts
f32 equality vs the plain path). Enable with Config.use_s2d.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/2, W/2, 4C], channel order (pi, pj, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def _ring_pad(w: jnp.ndarray) -> jnp.ndarray:
    """Zero ring around the spatial axes so indices -1..k land in range."""
    return jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))


def _gather_kernel(w: jnp.ndarray, ih: np.ndarray, iw: np.ndarray) -> jnp.ndarray:
    """K[..., a, b] = w_padded[ih[...], iw[...], a, b] with ih/iw broadcast
    against each other (static numpy index arrays -> one XLA gather)."""
    wp = _ring_pad(w)
    return wp[jnp.asarray(ih), jnp.asarray(iw)]


def s2d_conv1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(5,5,C,OC) HWIO stride-2 SAME kernel -> (3,3,4C,OC) block-space kernel
    consuming an s2d input. K[m,q] = w[2m+q-1]."""
    assert w.shape[0] == w.shape[1] == 5, "s2d path assumes kernel_size=5"
    m = np.arange(3)[:, None, None, None]  # block offset (rows)
    n = np.arange(3)[None, :, None, None]  # block offset (cols)
    qi = np.arange(2)[None, None, :, None]  # input row phase
    qj = np.arange(2)[None, None, None, :]  # input col phase
    ih = 2 * m + qi - 1 + 1  # +1 for the zero ring
    iw = 2 * n + qj - 1 + 1
    k = _gather_kernel(w, np.broadcast_to(ih, (3, 3, 2, 2)), np.broadcast_to(iw, (3, 3, 2, 2)))
    # k: (m, n, qi, qj, C, OC) -> (m, n, (qi, qj, C), OC)
    c, oc = w.shape[2], w.shape[3]
    return k.reshape(3, 3, 4 * c, oc)


def s2d_deconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(5,5,OC,IC) TF-convt stride-2 SAME kernel -> (3,3,IC,4OC) HWIO
    block-space kernel producing an s2d output. K[m,p] = w[3-2m+p]."""
    assert w.shape[0] == w.shape[1] == 5, "s2d path assumes kernel_size=5"
    m = np.arange(3)[:, None, None, None]
    n = np.arange(3)[None, :, None, None]
    pi = np.arange(2)[None, None, :, None]  # output row phase
    pj = np.arange(2)[None, None, None, :]
    ih = 3 - 2 * m + pi + 1
    iw = 3 - 2 * n + pj + 1
    k = _gather_kernel(w, np.broadcast_to(ih, (3, 3, 2, 2)), np.broadcast_to(iw, (3, 3, 2, 2)))
    # k: (m, n, pi, pj, OC, IC) -> HWIO (m, n, IC, (pi, pj, OC))
    oc, ic = w.shape[2], w.shape[3]
    k = k.transpose(0, 1, 5, 2, 3, 4)
    return k.reshape(3, 3, ic, 4 * oc)


def s2d_outconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(5,5,OC,IC) TF-convt stride-1 SAME kernel -> (3,3,4IC,4OC) HWIO
    block-space kernel, s2d input AND output. K[m,p,q] = w[4-2m+p-q]."""
    assert w.shape[0] == w.shape[1] == 5, "s2d path assumes kernel_size=5"
    sh = (3, 3, 2, 2, 2, 2)  # m, n, pi, pj, qi, qj
    m = np.arange(3).reshape(3, 1, 1, 1, 1, 1)
    n = np.arange(3).reshape(1, 3, 1, 1, 1, 1)
    pi = np.arange(2).reshape(1, 1, 2, 1, 1, 1)
    pj = np.arange(2).reshape(1, 1, 1, 2, 1, 1)
    qi = np.arange(2).reshape(1, 1, 1, 1, 2, 1)
    qj = np.arange(2).reshape(1, 1, 1, 1, 1, 2)
    ih = 4 - 2 * m + pi - qi + 1
    iw = 4 - 2 * n + pj - qj + 1
    k = _gather_kernel(w, np.broadcast_to(ih, sh), np.broadcast_to(iw, sh))
    # k: (m, n, pi, pj, qi, qj, OC, IC) -> (m, n, (qi, qj, IC), (pi, pj, OC))
    oc, ic = w.shape[2], w.shape[3]
    k = k.transpose(0, 1, 4, 5, 7, 2, 3, 6)
    return k.reshape(3, 3, 4 * ic, 4 * oc)


def tile_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """Per-channel bias for an s2d tensor: channel order (pi, pj, c) means
    plain tiling reproduces the raw-space broadcast."""
    return jnp.tile(bias, 4)
