"""Instance normalization, exact reference math.

The reference uses a custom Keras layer with ``axis=None`` everywhere
(model.py constructs ``InstanceNormalization()`` with defaults), which means:

- reduction over ALL non-batch axes (instance.py:108-114 with axis=None),
- scalar learnable gamma/beta of shape ``(1,)`` (instance.py:82-85),
- epsilon added to the STD, not the variance:
  ``(x - mean) / (std + eps)`` with ``eps = 1e-3`` (instance.py:114-116),
  where std is the population std (Keras ``K.std``).

All three details are load-bearing for numerical parity and are preserved.

On TPU this is a bandwidth-bound VPU op; XLA fuses the reductions and the
normalization into the surrounding conv epilogue. A fused Pallas
conv-epilogue variant lives in ``littlegan_tpu.ops.pallas`` (perf path).
"""

from __future__ import annotations

import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Normalize each batch element over all its axes (reference: instance.py:105-129).

    Args:
      x: ``(N, ...)`` activations; typically NHWC.
      gamma, beta: scalar scale/offset, shape ``(1,)`` (reference axis=None).
      eps: added to the standard deviation (NOT the variance).
    """
    red = tuple(range(1, x.ndim))
    dtype = x.dtype
    xf = x.astype(jnp.float32)  # stats in f32 even under bf16 compute
    mean = jnp.mean(xf, axis=red, keepdims=True)
    centered = xf - mean
    std = jnp.sqrt(jnp.mean(jnp.square(centered), axis=red, keepdims=True))
    normed = centered / (std + eps)
    out = normed * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(dtype)
