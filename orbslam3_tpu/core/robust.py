"""Robust loss kernels for iteratively-reweighted least squares.

Replaces g2o's `RobustKernelHuber`/`RobustKernelCauchy`
(`/root/reference/Thirdparty/g2o/g2o/core/robust_kernel_impl.h`) used by every
optimization in `src/Optimizer.cc` (e.g. Huber deltas `thHuber2D = sqrt(5.99)`,
`thHuberMono = sqrt(5.991)` at `Optimizer.cc:106-109,893-894`).

In an IRLS Gauss-Newton step the robust kernel enters as a per-residual
weight ``w = rho'(e2)`` applied to both J^T J and J^T r; these functions
return that weight, vectorized over all edges at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# chi-square 95% thresholds used throughout the reference optimizer
CHI2_MONO = 5.991  # 2 DoF
CHI2_STEREO = 7.815  # 3 DoF


def huber_weight(e2: jax.Array, delta: jax.Array | float) -> jax.Array:
    """IRLS weight for the Huber kernel, as a function of squared error.

    rho(e2) = e2                 if e <= delta
            = 2*delta*e - delta² otherwise
    weight  = rho'(e2) = min(1, delta / e).
    """
    delta = jnp.asarray(delta, e2.dtype)
    e = jnp.sqrt(jnp.maximum(e2, 0.0))
    return jnp.minimum(jnp.ones_like(e), delta / jnp.maximum(e, 1e-12))


def cauchy_weight(e2: jax.Array, delta: jax.Array | float) -> jax.Array:
    """IRLS weight for the Cauchy kernel: w = 1 / (1 + e2/delta²)."""
    delta = jnp.asarray(delta, e2.dtype)
    return 1.0 / (1.0 + e2 / (delta * delta))


def tukey_weight(e2: jax.Array, delta: jax.Array | float) -> jax.Array:
    """IRLS weight for Tukey's biweight (hard redescender)."""
    delta = jnp.asarray(delta, e2.dtype)
    r = e2 / (delta * delta)
    w = jnp.square(1.0 - r)
    return jnp.where(r < 1.0, w, jnp.zeros_like(w))


def huber_rho(e2: jax.Array, delta: jax.Array | float) -> jax.Array:
    """Huber robustified cost (for chi2 reporting / LM accept tests)."""
    delta = jnp.asarray(delta, e2.dtype)
    e = jnp.sqrt(jnp.maximum(e2, 0.0))
    quad = e2
    lin = 2.0 * delta * e - delta * delta
    return jnp.where(e <= delta, quad, lin)
