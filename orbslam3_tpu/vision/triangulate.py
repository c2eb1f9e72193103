"""Batched DLT triangulation.

Replacement for `GeometricTools::Triangulate`
(`/root/reference/src/GeometricTools.cc:39-68`, SVD of the stacked 4x4 DLT
system) — identical math, but vmapped over all candidate matches at once so
LocalMapping's `CreateNewMapPoints` triangulates an entire keyframe pair in
one device call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_points(P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array):
    """Linear triangulation.

    P1, P2: (3,4) projection matrices (in normalized or pixel units).
    x1, x2: (..., 2) observed points in the same units.
    Returns (..., 3) world points (homogeneous solution dehomogenized) and
    the smallest singular value (conditioning signal).
    """
    rows = [
        x1[..., 0, None] * P1[2] - P1[0],
        x1[..., 1, None] * P1[2] - P1[1],
        x2[..., 0, None] * P2[2] - P2[0],
        x2[..., 1, None] * P2[2] - P2[1],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # null vector of A: right singular vector of smallest singular value
    _, s, vt = jnp.linalg.svd(A)
    X = vt[..., 3, :]  # (..., 4)
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w_safe[..., None], s[..., 3]


def projection_matrix(R: jax.Array, t: jax.Array, K: jax.Array | None = None):
    """(3,4) projection from world->camera pose (R, t); optionally K-premultiplied."""
    P = jnp.concatenate([R, t[..., None]], axis=-1)
    if K is not None:
        P = K @ P
    return P
