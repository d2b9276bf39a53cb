"""Batched Levenberg-Marquardt on SE(3) with analytic LOAM Jacobians.

TPU-native replacement for Ceres (SURVEY.md §2.3): the reference solves each
stage with ``AutoDiffCostFunction`` + Huber(0.1) + DENSE_QR + an
``EigenQuaternionParameterization`` (``laserOdometry.cpp:284-291,493-499``,
``laserMapping.cpp:564-572,712-721``). Here the three residual families of
``lidarFactor.hpp`` carry hand-derived Jacobians, factors are fixed-capacity
masked batches, the robust loss enters as block-wise IRLS weights, and each
iteration reduces to one 6×6 damped normal-equation solve — all inside jit.

Local parameterization: 6-dof tangent ``[dtheta, dt]`` applied as
``q' = exp(dtheta) ⊗ q``, ``t' = t + dt`` (matching the reference's
left-multiplied quaternion perturbation).

``s = 1`` (no per-point interpolation) is the default — the reference's
compiled ``DISTORTION 0`` path (laserOdometry.cpp:59; mapping always passes
1.0, laserMapping.cpp:618). Factors carrying per-point time fractions ``s``
implement the ``DISTORTION 1`` path: slerp-interpolated residuals
(lidarFactor.hpp:26-33) with first-order s-scaled Jacobians.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from aloam_tpu import geometry as geo


class EdgeFactors(NamedTuple):
    """Point-to-line (LidarEdgeFactor, lidarFactor.hpp:12-55): residual
    (3,) = (u−a)×(u−b)/‖a−b‖ with u = q_s·p + s·t, where q_s interpolates
    identity→q by the per-point time fraction s (motion undistortion,
    lidarFactor.hpp:26-33). s=None means the undistorted s≡1 path
    (DISTORTION 0, the only one the reference exercises)."""
    p: jnp.ndarray      # (N, 3) current points
    a: jnp.ndarray      # (N, 3) line point a (last frame / map)
    b: jnp.ndarray      # (N, 3) line point b
    mask: jnp.ndarray   # (N,)
    s: jnp.ndarray | None = None  # (N,) time fractions, or None for s=1


class PlaneFactors(NamedTuple):
    """Point-to-plane (LidarPlaneFactor / LidarPlaneNormFactor,
    lidarFactor.hpp:57-138): residual (1,) = n·(q_s·p + s·t) + d."""
    p: jnp.ndarray      # (N, 3)
    n: jnp.ndarray      # (N, 3) unit normal
    d: jnp.ndarray      # (N,)
    mask: jnp.ndarray   # (N,)
    s: jnp.ndarray | None = None  # (N,) time fractions, or None for s=1


class PointFactors(NamedTuple):
    """Point-to-point (LidarDistanceFactor, lidarFactor.hpp:141-172):
    residual (3,) = q·p + t − target. Defined for completeness — the
    reference only references it from commented-out code
    (laserMapping.cpp:623-639)."""
    p: jnp.ndarray
    target: jnp.ndarray
    mask: jnp.ndarray


def _interp_pose(q, t, s):
    """Per-point pose interpolation identity→(q,t) by fraction s (N,):
    slerp on the quaternion (matching Eigen's slerp in lidarFactor.hpp:29)
    and linear scaling on the translation (:30)."""
    n = s.shape[0]
    qs = geo.slerp(jnp.broadcast_to(geo.qidentity(), (n, 4)),
                   jnp.broadcast_to(q, (n, 4)), s)
    return qs, s[:, None] * t


def edge_residuals(f: EdgeFactors, q, t):
    """Residual (N,3) and Jacobian (N,3,6) of the edge factor at (q, t).

    With per-point time fractions (motion undistortion) the residual uses
    the exact slerp-interpolated pose; the Jacobian uses the standard
    first-order scaling d(exp(s·log(exp(δ)q)))/dδ ≈ s·(…), which matches
    autodiff to O(s(1-s)·|δθ|²) — negligible at LiDAR inter-frame rates.
    """
    if f.s is None:
        u = geo.qrot(q, f.p) + t
        rp = u - t  # = R p
        j_scale = 1.0
    else:
        qs, ts = _interp_pose(q, t, f.s)
        rp = geo.qrot(qs, f.p)
        u = rp + ts
        j_scale = f.s[:, None, None]
    dv = f.a - f.b
    inv_norm = 1.0 / jnp.maximum(jnp.linalg.norm(dv, axis=-1, keepdims=True),
                                 1e-12)
    r = jnp.cross(u - f.a, u - f.b) * inv_norm
    # dr/du = -[d]x / ||d||  (r = (u×d + a×b)/||d||)
    j_u = -geo.skew(dv) * inv_norm[..., None]
    # J_theta = J_u @ (-[Rp]x) = ([d]x [Rp]x)/||d|| = (rp d^T - (d.rp) I)/||d||
    # (closed form: avoids a 3x3 matmul that TPUs would run at bf16 precision)
    eye = jnp.eye(3, dtype=u.dtype)
    j_theta = (rp[:, :, None] * dv[:, None, :]
               - jnp.sum(dv * rp, axis=-1)[:, None, None] * eye) \
        * inv_norm[..., None]
    jac = jnp.concatenate([j_theta * j_scale, j_u * j_scale], axis=-1)
    return r, jac  # (N, 3), (N, 3, 6)


def plane_residuals(f: PlaneFactors, q, t):
    """Residual (N,1) and Jacobian (N,1,6) of the plane factor."""
    if f.s is None:
        u = geo.qrot(q, f.p) + t
        rp = u - t
        j_scale = 1.0
    else:
        qs, ts = _interp_pose(q, t, f.s)
        rp = geo.qrot(qs, f.p)
        u = rp + ts
        j_scale = f.s[:, None]
    r = (jnp.sum(f.n * u, axis=-1) + f.d)[:, None]
    # d r / d theta = -n^T [Rp]x = (Rp × n)^T
    j_theta = jnp.cross(rp, f.n)
    jac = jnp.concatenate([j_theta * j_scale,
                           f.n * j_scale], axis=-1)[:, None, :]
    return r, jac


def point_residuals(f: PointFactors, q, t):
    u = geo.qrot(q, f.p) + t
    r = u - f.target
    rp = u - t
    j_theta = -geo.skew(rp)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=u.dtype), j_theta.shape)
    jac = jnp.concatenate([j_theta, eye], axis=-1)
    return r, jac


_RESIDUAL_FNS = {
    EdgeFactors: edge_residuals,
    PlaneFactors: plane_residuals,
    PointFactors: point_residuals,
}


def huber_weight(s: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight rho'(s) for Huber on the squared block norm s = ‖r‖²:
    rho(s) = s for s ≤ δ², else 2δ√s − δ² (Ceres HuberLoss convention)."""
    d2 = delta * delta
    return jnp.where(s <= d2, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-20)))


def huber_cost(s: jnp.ndarray, delta: float) -> jnp.ndarray:
    d2 = delta * delta
    return jnp.where(s <= d2, s, 2.0 * delta * jnp.sqrt(
        jnp.maximum(s, 1e-20)) - d2)


def _accumulate(factors: Sequence, q, t, delta: float):
    """Robust-weighted normal equations H (6,6), g (6,), cost, n_active."""
    h = jnp.zeros((6, 6), jnp.float32)
    g = jnp.zeros((6,), jnp.float32)
    cost = jnp.float32(0.0)
    n_active = jnp.int32(0)
    for f in factors:
        r, jac = _RESIDUAL_FNS[type(f)](f, q, t)
        m = f.mask.astype(jnp.float32)
        # hard-zero masked rows: a w=0 weight alone cannot neutralize
        # non-finite padding (0 * inf = nan would poison H)
        r = jnp.where(f.mask[:, None], r, 0.0)
        jac = jnp.where(f.mask[:, None, None], jac, 0.0)
        s = jnp.sum(r * r, axis=-1)
        w = huber_weight(s, delta) * m
        # full-f32 accumulation: TPU einsum defaults to bf16 passes, which
        # is far too coarse for 6x6 normal equations
        hi = jax.lax.Precision.HIGHEST
        jw = jac * w[:, None, None]
        h = h + jnp.einsum("nbi,nbj->ij", jw, jac, precision=hi)
        g = g + jnp.einsum("nbi,nb->i", jw, r, precision=hi)
        cost = cost + 0.5 * jnp.sum(huber_cost(s, delta) * m)
        n_active = n_active + jnp.sum(f.mask)
    return h, g, cost, n_active


class SolveStats(NamedTuple):
    cost0: jnp.ndarray
    cost: jnp.ndarray
    n_factors: jnp.ndarray
    clamped: jnp.ndarray     # iterations whose update hit the norm clamp
    nonfinite: jnp.ndarray   # iterations rejected for NaN/Inf deltas


# Per-iteration update-norm ceilings (SURVEY.md §5 failure detection):
# LOAM inter-frame motion is <= ~3 m / ~0.3 rad at the design point; a
# singular/ill-conditioned 6x6 solve produces deltas orders of magnitude
# larger. Clamping preserves the direction, bounds the damage.
_MAX_DTHETA = 0.5   # rad
_MAX_DT = 5.0       # m


def lm_solve(factors: Sequence, q0, t0, n_iters: int,
             huber_delta: float = 0.1, lambda0: float = 1e-4):
    """Fixed-iteration Levenberg-Marquardt over the given factor batches.

    Mirrors the reference's per-round schedule (max 4 iterations of Ceres LM,
    laserOdometry.cpp:496). Accept/reject with multiplicative damping; a step
    that increases the robust cost is rolled back and λ grows. With zero
    active factors the gradient is zero and the pose is returned unchanged
    (like Ceres on an empty problem).

    Hardening beyond the reference (SURVEY.md §5): non-finite deltas from a
    singular H are rejected *explicitly* (pose keeps its prior value — the
    equivalent of Ceres' FAILURE return leaving the blocks untouched) and
    oversized updates are norm-clamped; both events are surfaced in
    SolveStats so callers can export them as metrics.
    """

    def body(_, st):
        # H/g/cost at the CURRENT pose are carried from the iteration that
        # accepted it (or from the init evaluation): one factor sweep per
        # iteration instead of accumulate + cost_only — the sweep over all
        # factor rows is the LM iteration's dominant cost at SLAM sizes.
        # After a rejected step the pose is unchanged, so the carried
        # H/g/cost are exactly what re-evaluation would produce.
        q, t, lam, cost, h, g, n_clamp, n_nan = st
        # Marquardt damping on the diagonal + floor for empty problems
        diag = jnp.diag(jnp.diagonal(h)) + 1e-8 * jnp.eye(6)
        delta = jnp.linalg.solve(h + lam * diag, -g)
        finite = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(finite, delta, 0.0)
        # norm-clamp rotation and translation blocks independently
        nth = jnp.linalg.norm(delta[:3])
        ntr = jnp.linalg.norm(delta[3:])
        sc_th = jnp.minimum(1.0, _MAX_DTHETA / jnp.maximum(nth, 1e-20))
        sc_tr = jnp.minimum(1.0, _MAX_DT / jnp.maximum(ntr, 1e-20))
        hit_clamp = finite & ((sc_th < 1.0) | (sc_tr < 1.0))
        delta = jnp.concatenate([delta[:3] * sc_th, delta[3:] * sc_tr])
        q_new = geo.retract(q, delta[:3])
        t_new = t + delta[3:]
        h_new, g_new, cost_new, _ = _accumulate(factors, q_new, t_new,
                                                huber_delta)
        accept = finite & (cost_new < cost)
        q = jnp.where(accept, q_new, q)
        t = jnp.where(accept, t_new, t)
        h = jnp.where(accept, h_new, h)
        g = jnp.where(accept, g_new, g)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                        jnp.minimum(lam * 10.0, 1e4))
        return (q, t, lam, jnp.where(accept, cost_new, cost), h, g,
                n_clamp + hit_clamp.astype(jnp.int32),
                n_nan + (~finite).astype(jnp.int32))

    h0, g0, cost0, n_factors = _accumulate(factors, q0, t0, huber_delta)
    q, t, _, cost, _, _, n_clamp, n_nan = jax.lax.fori_loop(
        0, n_iters, body,
        (q0, t0, jnp.float32(lambda0), cost0, h0, g0,
         jnp.int32(0), jnp.int32(0)))
    # belt-and-braces: a non-finite pose (cannot happen with the guards
    # above, but cheap) falls back to the prior
    pose_ok = jnp.all(jnp.isfinite(q)) & jnp.all(jnp.isfinite(t))
    q = jnp.where(pose_ok, q, q0)
    t = jnp.where(pose_ok, t, t0)
    return q, t, SolveStats(cost0=cost0, cost=cost, n_factors=n_factors,
                            clamped=n_clamp, nonfinite=n_nan)


def lm_solve_b(edges: EdgeFactors, planes: PlaneFactors, q0, t0,
               n_iters: int, huber_delta: float = 0.1,
               lambda0: float = 1e-4):
    """Batched ``lm_solve`` over a leading stream axis (one edge + one
    plane factor batch, the shape both pipeline stages use).

    On TPU dispatches to the fused one-dispatch Pallas solve
    (``ops/pallas_lm.py``) — the vmapped fori_loop form executes ~50
    small ops per LM iteration and is dispatch-bound (~14 ms of the B=16
    step, tools/profile_lm.py). Falls back to the vmapped XLA path off
    TPU, under ``ALOAM_DISABLE_PALLAS=lm``, for per-point-time factors
    (s != None) or factor caps not divisible by 128."""
    from aloam_tpu.ops.pallas_gate import use_pallas
    fusable = (edges.s is None and planes.s is None
               and edges.mask.shape[1] % 128 == 0
               and planes.mask.shape[1] % 128 == 0)
    if fusable and use_pallas("lm"):
        from aloam_tpu.ops import pallas_lm
        ef = pallas_lm.pack_edge_channels(edges)
        pf = pallas_lm.pack_plane_channels(planes)
        pose = jnp.concatenate(
            [q0, t0, jnp.zeros_like(t0[:, :1])], axis=1)
        out = pallas_lm.lm_fused(ef, pf, pose, n_iters, huber_delta,
                                 lambda0)
        return out[:, 0:4], out[:, 4:7], SolveStats(
            cost0=out[:, 7], cost=out[:, 8],
            n_factors=out[:, 9].astype(jnp.int32),
            clamped=out[:, 10].astype(jnp.int32),
            nonfinite=out[:, 11].astype(jnp.int32))
    f = lambda e, p, qq, tt: lm_solve(  # noqa: E731
        (e, p), qq, tt, n_iters, huber_delta, lambda0)
    return jax.vmap(f)(edges, planes, q0, t0)
