"""On-device symmetric matrix square roots for the Fréchet distance.

Replaces the reference's host round-trip through scipy.linalg.sqrtm
(reference model/EmbeddingSpaceEvaluator.py:576) so FGD never leaves HBM.
The covariances are tiny (32x32 / latent_dim), so an eigendecomposition is
exact and effectively free.
"""

from __future__ import annotations

import jax.numpy as jnp


def sqrtm_psd(mat: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Principal square root of a symmetric PSD matrix via eigh."""
    mat = 0.5 * (mat + mat.T)
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.sqrt(jnp.clip(vals, 0.0, None))
    return (vecs * vals[None, :]) @ vecs.T


def trace_sqrtm_product(sigma1: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    """tr(sqrtm(sigma1 @ sigma2)) for symmetric PSD sigma1, sigma2.

    Uses the similarity trick: with A = sqrtm(sigma1),
    sqrtm(sigma1 sigma2) is similar to sqrtm(A sigma2 A), which is symmetric
    PSD — identical trace to scipy's general sqrtm of the (possibly
    non-symmetric) product, but computable with two eigh calls.
    """
    a = sqrtm_psd(sigma1)
    inner = a @ sigma2 @ a
    inner = 0.5 * (inner + inner.T)
    vals = jnp.linalg.eigvalsh(inner)
    return jnp.sum(jnp.sqrt(jnp.clip(vals, 0.0, None)))


def frechet_distance(mu1: jnp.ndarray, sigma1: jnp.ndarray,
                     mu2: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    """d^2 = ||mu1-mu2||^2 + tr(C1 + C2 - 2 sqrt(C1 C2)).

    Same quantity as reference EmbeddingSpaceEvaluator.py:541-594 (pytorch-fid
    math), computed entirely on device.
    """
    diff = mu1 - mu2
    return (diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2)
            - 2.0 * trace_sqrtm_product(sigma1, sigma2))
