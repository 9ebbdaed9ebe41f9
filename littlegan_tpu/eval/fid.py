"""FID: activation statistics + Fréchet distance.

Math parity with reference fid.py:
- ``activation_statistics``: feature mean + covariance (fid.py:169-188)
- ``frechet_distance``: d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
  with the reference's numerical fallbacks (fid.py:112-163): on a singular
  product add ``eps`` to the diagonals and retry; discard a negligible
  imaginary component (error out if it is not negligible).
- ``frechet_distance_newton_schulz``: a TPU-friendly alternative that
  computes trace(sqrtm) via a Newton–Schulz iteration entirely on device —
  no host scipy round-trip; matches scipy to ~1e-4 relative (tested).

The feature extractor lives in eval/inception.py; the two-mode eval driver
(pre-calculate / calc, reference evaluate.py) in eval/evaluate.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu (D,), sigma (D, D)); reference fid.py:169-188."""
    feats = np.asarray(features, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray, eps: float = 1e-6
) -> float:
    """Host-side Fréchet distance, scipy sqrtm + fallbacks (fid.py:112-163)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    import warnings

    diff = mu1 - mu2
    try:  # scipy >= 1.16 deprecates disp; errors surface as exceptions/NaNs
        with warnings.catch_warnings():
            # singularities are handled by the eps-offset retry below
            # (reference fid.py:131-136) — the warning is expected, not noise
            warnings.simplefilter("ignore")
            covmean = linalg.sqrtm(sigma1.dot(sigma2))
    except Exception:
        covmean = np.full_like(sigma1, np.nan)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def _trace_sqrtm_ns(a: jnp.ndarray, num_iters: int = 30) -> jnp.ndarray:
    """trace(sqrtm(a)) by Newton–Schulz iteration (device-friendly: only
    matmuls, so it runs on the MXU)."""
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a))
    y = a / norm
    eye = jnp.eye(dim, dtype=a.dtype)
    z = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return (y @ t, t @ z)

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return jnp.trace(y) * jnp.sqrt(norm)


@jax.jit
def _fid_device(mu1, sigma1, mu2, sigma2):
    diff = mu1 - mu2
    # plain product: sigma1 @ sigma2 is similar to the SPD matrix
    # sqrt(sigma1) @ sigma2 @ sqrt(sigma1), so its eigenvalues are real
    # non-negative and trace(sqrtm(.)) is identical; Newton–Schulz converges
    # on it directly (verified ~1e-4 vs scipy in tests/test_fid.py) without
    # paying an extra sqrtm for explicit symmetrization
    prod = sigma1 @ sigma2
    tr_covmean = _trace_sqrtm_ns(prod)
    return jnp.sum(diff * diff) + jnp.trace(sigma1) + jnp.trace(sigma2) - 2.0 * tr_covmean


def frechet_distance_newton_schulz(mu1, sigma1, mu2, sigma2) -> float:
    """On-device FID (f32 Newton–Schulz); ~1e-4 relative agreement w/ scipy."""
    return float(
        _fid_device(
            jnp.asarray(mu1, jnp.float32),
            jnp.asarray(sigma1, jnp.float32),
            jnp.asarray(mu2, jnp.float32),
            jnp.asarray(sigma2, jnp.float32),
        )
    )
