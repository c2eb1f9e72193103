"""SO(3) / SE(3) / Sim(3) Lie-group operations as pure JAX functions.

TPU-native replacement for the vendored Sophus headers used throughout the
reference (`/root/reference/Thirdparty/Sophus/sophus`, consumed by e.g.
`src/ImuTypes.cc`, `src/G2oTypes.cc`, `src/Optimizer.cc`). Unlike Sophus'
templated classes, everything here is a plain function over jnp arrays with
arbitrary leading batch dimensions, so the optimizer stack can `vmap` over
thousands of poses and XLA can fuse the algebra into surrounding kernels.

Conventions:
  * Rotations are 3x3 matrices ``R`` with leading batch dims ``(..., 3, 3)``.
  * SE(3) is the pair ``(R, t)``; Sim(3) the triple ``(s, R, t)`` with scalar
    scale ``s`` of shape ``(...,)``.
  * ``exp``/``log`` use the right-handed axis-angle convention; small-angle
    branches are Taylor expansions selected with ``jnp.where`` so the code is
    branch-free under jit (no data-dependent control flow).
  * Everything is dtype-polymorphic; fp32 on TPU, fp64 in CPU tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Angle below which Taylor expansions replace trig ratios. sqrt(eps_f32)-ish;
# safe for both fp32 and fp64 inputs.
_SMALL = 1e-5


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_terms(theta2: jax.Array):
    """Return (A, B, C) = (sin th/th, (1-cos th)/th^2, (th - sin th)/th^3).

    Branch-free small-angle handling; used by exp maps and Jacobians.
    """
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL
    # Guard the denominators so the unused branch stays finite under jit.
    th2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    th = jnp.sqrt(th2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (th - jnp.sin(th)) / (th2 * th))
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3) (Rodrigues), (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def so3_log(R: jax.Array) -> jax.Array:
    """Logarithm map SO(3) -> so(3), (...,3,3) -> (...,3).

    Handles the theta -> pi neighborhood via the symmetric-part fallback
    (axis from the diagonal of R + R^T), so round-trips are stable over the
    whole group — needed by essential-graph/Sim3 optimization where relative
    rotations near pi occur (reference: `src/Optimizer.cc` essential graph).
    """
    # atan2 formulation (NOT arccos: d/dx arccos at 1 is -inf, and jacfwd
    # through a log at the identity — every converged pose-graph edge — would
    # produce inf*0 = NaN tangents).
    v = 0.5 * vee(R - jnp.swapaxes(R, -1, -2))  # = sin(theta) * axis
    s2 = jnp.sum(v * v, axis=-1)                # sin^2(theta)
    cos_theta = jnp.clip(
        (R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0)
    s_safe = jnp.sqrt(jnp.maximum(s2, 1e-24))   # clamp: finite tangent at 0
    theta = jnp.arctan2(s_safe, cos_theta)
    small = theta < _SMALL
    near_pi = theta > jnp.pi - 1e-3
    # Generic: w = theta/sin(theta) * v ; Small: Taylor of theta/sin(theta)
    # in s2 (theta^2 ~= s2) — polynomial, clean derivatives at the identity.
    f_generic = theta / jnp.where(small | near_pi, jnp.ones_like(s_safe), s_safe)
    f_small = 1.0 + s2 / 6.0 + 7.0 * s2 * s2 / 360.0
    w_generic = f_generic[..., None] * v
    w_small = f_small[..., None] * v
    # Near-pi branch: |w_i| from diagonal, signs from the largest column of
    # S = R + I (S columns are parallel to the axis).
    S = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None].repeat(3, axis=-2), axis=-1)[
        ..., 0
    ]
    axis = col / jnp.maximum(
        jnp.linalg.norm(col, axis=-1, keepdims=True), jnp.asarray(1e-12, R.dtype)
    )
    # Resolve the sign ambiguity using the off-diagonal antisymmetric part;
    # when it vanishes (theta == pi exactly) either sign is a valid log.
    sign_vec = vee(R - jnp.swapaxes(R, -1, -2))
    s_dot = jnp.sum(sign_vec * axis, axis=-1)
    sign = jnp.where(s_dot < 0, -1.0, 1.0).astype(R.dtype)
    w_pi = axis * (sign * theta)[..., None]
    w = jnp.where(small[..., None], w_small, w_generic)
    return jnp.where(near_pi[..., None], w_pi, w)


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): integrates exp-map perturbations.

    J_l = I + B*W + C*W^2 with B=(1-cos)/th^2, C=(th-sin)/th^3.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_terms(theta2)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * WW


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian J_r(w) = J_l(-w).

    Matches the reference's `RightJacobianSO3` (`src/ImuTypes.cc:254-260`,
    used by the preintegration covariance propagation and inertial factors).
    """
    return so3_left_jacobian(-w)


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse right Jacobian (reference `InverseRightJacobianSO3`).

    J_r^{-1} = I + W/2 + (1/th^2 - (1+cos)/(2 th sin)) * W^2, with the
    small-angle expansion 1/12 + th^2/720.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _SMALL
    th2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    th = jnp.sqrt(th2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / th2 - (1.0 + jnp.cos(th)) / (2.0 * th * jnp.sin(th)),
    )
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + coef[..., None, None] * WW


def so3_normalize(R: jax.Array) -> jax.Array:
    """Project a near-rotation matrix back onto SO(3) via SVD.

    Reference normalizes with `Sophus::SO3::fitToSO3`-style machinery after
    long integration chains; here we re-orthonormalize periodically in the
    preintegration scan to bound fp32 drift.
    """
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (u * d[..., None, :]) @ vt


# ----------------------------------------------------------------------------
# Quaternions (x, y, z, w) — scalar-last, matching Eigen's storage order that
# the reference serializes (e.g. trajectory files `System.cc:666-724`).
# ----------------------------------------------------------------------------


def quat_from_matrix(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (x,y,z,w), Shepperd's method.

    Branch-free: computes all four candidate constructions and selects the
    numerically safest by the largest pivot.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def build(qw2_like, x, y, z, w):
        q = jnp.stack([x, y, z, w], axis=-1)
        return q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), jnp.asarray(1e-12, R.dtype)
        )

    one = jnp.ones_like(tr)
    sw = jnp.sqrt(jnp.maximum(one + tr, 1e-12))
    q0 = build(tr, (m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw), (m10 - m01) / (2 * sw), 0.5 * sw)
    sx = jnp.sqrt(jnp.maximum(one + m00 - m11 - m22, 1e-12))
    q1 = build(tr, 0.5 * sx, (m01 + m10) / (2 * sx), (m02 + m20) / (2 * sx), (m21 - m12) / (2 * sx))
    sy = jnp.sqrt(jnp.maximum(one - m00 + m11 - m22, 1e-12))
    q2 = build(tr, (m01 + m10) / (2 * sy), 0.5 * sy, (m12 + m21) / (2 * sy), (m02 - m20) / (2 * sy))
    sz = jnp.sqrt(jnp.maximum(one - m00 - m11 + m22, 1e-12))
    q3 = build(tr, (m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz), 0.5 * sz, (m10 - m01) / (2 * sz))

    cand = jnp.stack([tr, m00, m11, m22], axis=-1)
    k = jnp.argmax(cand, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (...,4cand,4)
    return jnp.take_along_axis(qs, k[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (x,y,z,w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


# ----------------------------------------------------------------------------
# SE(3)
# ----------------------------------------------------------------------------


def se3_exp(xi: jax.Array):
    """Exponential map se(3) -> SE(3). ``xi = (rho, phi)`` (...,6) -> (R, t).

    Translation-first ordering (rho = translation part, phi = rotation part),
    matching the update convention of the reference's `VertexPose::oplusImpl`
    (`include/G2oTypes.h:130-153`).
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """Logarithm map SE(3) -> se(3), returns (...,6) = (rho, phi)."""
    phi = so3_log(R)
    Vinv = _left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def _left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3): J_l(w)^{-1} = J_r(-w)^{-1}."""
    return so3_right_jacobian_inv(-w)


def se3_inverse(R: jax.Array, t: jax.Array):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, p):
    """Transform points p (...,3) by (R, t)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack (R, t) into homogeneous (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ----------------------------------------------------------------------------
# Sim(3) — used by loop closure (Sim3Solver, OptimizeSim3, essential graph;
# reference `src/Sim3Solver.cc`, `src/Optimizer.cc:1501,2115`).
# ----------------------------------------------------------------------------


def sim3_apply(s, R, t, p):
    """Transform points by the similarity (s, R, t): s*R*p + t."""
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) * (sb,Rb,tb)."""
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


def sim3_exp(xi: jax.Array):
    """Exponential map sim(3) -> Sim(3). xi = (rho, phi, sigma), (...,7).

    Uses the closed-form W matrix from Strasdat's thesis; small-angle /
    small-scale branches are Taylor-expanded, branch-free.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    # Clamp before sqrt: d(sqrt)/dx at 0 is inf, and inf*0 = NaN would poison
    # jacfwd through the (otherwise branch-guarded) Taylor terms in _sim3_W.
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    W = _sim3_W(theta, sigma, phi)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return s, R, t


def sim3_log(s, R, t):
    """Logarithm map Sim(3) -> sim(3), returns (...,7) = (rho, phi, sigma)."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    # clamped sqrt: keeps jacfwd finite at phi = 0 (see sim3_exp)
    theta = jnp.sqrt(jnp.maximum(jnp.sum(phi * phi, axis=-1), 1e-24))
    W = _sim3_W(theta, sigma, phi)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def _sim3_W(theta, sigma, phi):
    """The Sim(3) translation matrix W = C*I + A*hat(phi) + B*hat(phi)^2.

    Closed form per Strasdat's similarity-transform derivation, with Taylor
    branches for small sigma and/or small theta, selected branch-free.
    """
    dtype = phi.dtype
    eps = 1e-5
    s2 = sigma * sigma
    t2 = theta * theta
    es = jnp.exp(sigma)
    small_sig = jnp.abs(sigma) < eps
    small_th = theta < eps
    sig_safe = jnp.where(small_sig, jnp.ones_like(sigma), sigma)
    th_safe = jnp.where(small_th, jnp.ones_like(theta), theta)
    t2_safe = jnp.where(small_th, jnp.ones_like(t2), t2)
    s2_safe = jnp.where(small_sig, jnp.ones_like(s2), s2)
    sin_t, cos_t = jnp.sin(th_safe), jnp.cos(th_safe)
    denom_safe = jnp.where(small_sig & small_th, jnp.ones_like(s2), s2 + t2)

    # C = (e^sigma - 1)/sigma  (sigma->0: 1 + sigma/2 + sigma^2/6)
    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + s2 / 6.0, (es - 1.0) / sig_safe)

    # sigma ~ 0 branch: standard SO(3) left-Jacobian coefficients.
    A_s0 = jnp.where(small_th, 0.5 - t2 / 24.0, (1.0 - cos_t) / t2_safe)
    B_s0 = jnp.where(
        small_th, 1.0 / 6.0 - t2 / 120.0, (th_safe - sin_t) / (t2_safe * th_safe)
    )
    # theta ~ 0, sigma != 0 branch.
    A_t0 = ((sig_safe - 1.0) * es + 1.0) / s2_safe
    B_t0 = ((0.5 * s2 - sig_safe + 1.0) * es - 1.0) / (s2_safe * sig_safe)
    # Generic branch.
    a, b = es * sin_t, es * cos_t
    A_gen = (sigma * a + (1.0 - b) * th_safe) / (th_safe * denom_safe)
    B_gen = (C - ((b - 1.0) * sigma + a * th_safe) / denom_safe) / t2_safe

    A = jnp.where(small_sig, A_s0, jnp.where(small_th, A_t0, A_gen))
    B = jnp.where(small_sig, B_s0, jnp.where(small_th, B_t0, B_gen))

    W = hat(phi)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * WW
