"""Quaternion / SE(3) primitives.

TPU-native replacement for the Eigen pose math used throughout the reference
(``laserOdometry.cpp:93-148``, ``laserMapping.cpp:142-173``): unit quaternions
as ``(..., 4)`` arrays in **wxyz** order, vectors as ``(..., 3)``. Everything
is shape-polymorphic over leading batch dims and works under jit/vmap.

The solver's local parameterization (``retract``) matches the convention of
Ceres' ``EigenQuaternionParameterization`` (used at ``laserOdometry.cpp:286``):
a 3-dof tangent perturbation applied as a left multiplication,
``q' = exp(delta) * q``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def qidentity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b (wxyz)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (= conjugate)."""
    return qconj(q)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the 15-mul form: v + 2*qw*(u×v) + 2*u×(u×v), u = q.xyz.
    """
    u = q[..., 1:4]
    w = q[..., 0:1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def qrot_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q^{-1}."""
    return qrot(qconj(q), v)


def q_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_q(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion (wxyz), branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned
    one with a masked argmax (jit-friendly; no data-dependent branches).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate 0: w dominant
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # candidate 1: x dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # candidate 2: y dominant
    s2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # candidate 3: z dominant
    s3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return qnormalize(q)


def exp_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) tangent -> unit quaternion exp(phi).

    Small-angle-safe via the sinc expansion.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    half = 0.5 * theta
    small = theta_sq < 1e-8
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small[..., 0], 1.0 - theta_sq[..., 0] / 8.0,
                  jnp.cos(half[..., 0]))
    return jnp.concatenate([w[..., None], k * phi], axis=-1)


def log_so3(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> axis-angle tangent (inverse of exp_so3)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # take the w>=0 representative
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(vn < 1e-8, 2.0, theta / jnp.maximum(vn, _EPS))
    return k[..., None] * v


def retract(q: jnp.ndarray, dtheta: jnp.ndarray) -> jnp.ndarray:
    """Local-parameterization update q' = exp(dtheta) ⊗ q (left-multiply)."""
    return qnormalize(qmul(exp_so3(dtheta), q))


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, s) -> jnp.ndarray:
    """Spherical interpolation from q0 to q1 by fraction s ∈ [0, 1].

    Matches Eigen's ``Quaterniond::slerp`` (used at ``laserOdometry.cpp:120``
    and ``lidarFactor.hpp:29`` for motion undistortion), including the
    shortest-path sign flip and the small-angle LERP fallback.
    """
    s = jnp.asarray(s)[..., None]
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - s, jnp.sin((1.0 - s) * theta)
                   / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, s, jnp.sin(s * theta)
                   / jnp.where(small, 1.0, sin_theta))
    return qnormalize(w0 * q0 + w1 * q1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product (hat) matrix [v]x with [v]x @ u = v × u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def compose(q_a: jnp.ndarray, t_a: jnp.ndarray,
            q_b: jnp.ndarray, t_b: jnp.ndarray):
    """SE(3) composition (q_a,t_a) ∘ (q_b,t_b): first apply b, then a.

    Mirrors the odometry world-pose accumulation
    ``t_w = t_w + q_w * t_lc; q_w = q_w * q_lc`` (laserOdometry.cpp:504-505).
    """
    return qmul(q_a, q_b), t_a + qrot(q_a, t_b)


def inverse_pose(q: jnp.ndarray, t: jnp.ndarray):
    qi = qconj(q)
    return qi, -qrot(qi, t)


def transform(q: jnp.ndarray, t: jnp.ndarray, pts: jnp.ndarray):
    """Apply SE(3) (q, t) to points (..., 3)."""
    return qrot(q, pts) + t
