"""Pallas TPU kernel: one-dispatch Levenberg-Marquardt solve.

Replaces the vmapped ``solver.lm_solve`` fori_loop on the batched hot
path. The XLA form is dispatch-bound, not compute-bound: each of the
step's 4 solves (2 odometry rounds + 2 mapping rounds, mirroring
``laserOdometry.cpp:278,496`` / ``laserMapping.cpp:562,715``) executes
~50 small device ops (factor-sweep einsums, 6x6 solve, retraction,
accept/reject selects) x 4 LM iterations, ~30 us fixed latency each —
measured 4.1 ms (odometry shapes) + 3.1 ms (mapping shapes) per solve
at B=16, ~14 ms of the 94.8 ms step (tools/profile_lm.py, round 5).
This kernel runs the ENTIRE fixed-iteration solve — factor sweeps,
Huber IRLS weights, damped 6x6 normal equations, quaternion retraction,
accept/reject — in ONE device dispatch per solve, VMEM-resident.

Semantics are solver.lm_solve's exactly (same accept/reject ladder,
same clamps, same carried H/g/cost), with two numerical deviations of
the same class the other kernels carry:

* reductions accumulate in f32 VPU adds over (rows, 128) tiles instead
  of XLA's HIGHEST-precision einsum reduction tree (different summation
  order, same f32 precision);
* the damped 6x6 system is solved by unpivoted Gaussian elimination
  (valid: H + lam*diag is symmetric positive definite by construction)
  instead of jnp.linalg.solve's pivoted LU;
* sin/cos in the retraction use Taylor forms exact to f32 resolution on
  the clamped |dtheta| <= 0.5 rad domain (Mosaic has no trig lowering).

An accept/reject decision can flip on a cost tie at f32 resolution, so
the contract is pose agreement within tolerance, not bit-exactness —
pinned by tests/test_pallas_lm.py (interpret mode) and verified on-chip
by bench.verify_pallas_kernels ("lm").

Only the s = None (DISTORTION 0) factor path is fused — the only path
the reference compiles (laserOdometry.cpp:59); per-point-time factors
fall back to the XLA twin in solver.lm_solve_b.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output lane map (out (B, 128) f32)
OUT_Q = 0           # 0:4  quaternion (wxyz)
OUT_T = 4           # 4:7  translation
OUT_COST0 = 7
OUT_COST = 8
OUT_NFAC = 9
OUT_CLAMP = 10
OUT_NAN = 11

_MAX_DTHETA = 0.5   # solver._MAX_DTHETA
_MAX_DT = 5.0       # solver._MAX_DT


def _sin_half_over_theta(ts):
    """sin(theta/2)/theta for theta = sqrt(ts) <= ~0.5 rad: 0.5 * the
    sinc(theta/2) Taylor series in h2 = ts/4 (err < 1e-10 at 0.5 rad)."""
    h2 = 0.25 * ts
    return 0.5 * (1.0 + h2 * (-1.0 / 6.0 + h2 * (1.0 / 120.0
                                                 + h2 * (-1.0 / 5040.0))))


def _cos_half(ts):
    """cos(theta/2), theta = sqrt(ts) <= ~0.5 rad (err < 1e-11)."""
    h2 = 0.25 * ts
    return 1.0 + h2 * (-0.5 + h2 * (1.0 / 24.0 + h2 * (-1.0 / 720.0)))


def _edge_sweep(ef, r00, r01, r02, r10, r11, r12, r20, r21, r22,
                tx, ty, tz, d2h, delta):
    """Edge-factor sweep at the given pose: returns (h21, g6, cost, nact).

    ef: list of 10 (rows, 128) channel tiles
    [px,py,pz, ax,ay,az, bx,by,bz, mask]. Scalar-expanded form of
    solver.edge_residuals + the Huber/normal-equation accumulation of
    solver._accumulate (LidarEdgeFactor, lidarFactor.hpp:12-55)."""
    px, py, pz, ax, ay, az, bx, by, bz, m = ef
    mb = m > 0.5
    rpx = r00 * px + r01 * py + r02 * pz
    rpy = r10 * px + r11 * py + r12 * pz
    rpz = r20 * px + r21 * py + r22 * pz
    ux, uy, uz = rpx + tx, rpy + ty, rpz + tz
    dx, dy, dz = ax - bx, ay - by, az - bz
    dn = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inl = 1.0 / jnp.maximum(dn, 1e-12)
    vax, vay, vaz = ux - ax, uy - ay, uz - az
    vbx, vby, vbz = ux - bx, uy - by, uz - bz
    r0 = (vay * vbz - vaz * vby) * inl
    r1 = (vaz * vbx - vax * vbz) * inl
    r2 = (vax * vby - vay * vbx) * inl
    zero = jnp.zeros_like(r0)
    r0 = jnp.where(mb, r0, zero)
    r1 = jnp.where(mb, r1, zero)
    r2 = jnp.where(mb, r2, zero)
    s = r0 * r0 + r1 * r1 + r2 * r2
    sr = jnp.sqrt(jnp.maximum(s, 1e-20))
    w = jnp.where(s <= d2h, 1.0, delta / sr) * m
    cost = 0.5 * jnp.sum(jnp.where(s <= d2h, s, 2.0 * delta * sr - d2h) * m)
    nact = jnp.sum(m)

    # jacobian (3, 6): j_theta = (rp d^T - (d.rp) I) inl ; j_u = -[d]x inl
    dot = dx * rpx + dy * rpy + dz * rpz
    j = [[None] * 6 for _ in range(3)]
    rp = (rpx, rpy, rpz)
    dv = (dx, dy, dz)
    for b in range(3):
        for i in range(3):
            e = rp[b] * dv[i] * inl
            if b == i:
                e = e - dot * inl
            j[b][i] = jnp.where(mb, e, zero)
    # -skew(d) * inl rows
    j[0][3] = zero
    j[0][4] = jnp.where(mb, dz * inl, zero)
    j[0][5] = jnp.where(mb, -dy * inl, zero)
    j[1][3] = jnp.where(mb, -dz * inl, zero)
    j[1][4] = zero
    j[1][5] = jnp.where(mb, dx * inl, zero)
    j[2][3] = jnp.where(mb, dy * inl, zero)
    j[2][4] = jnp.where(mb, -dx * inl, zero)
    j[2][5] = zero

    h21 = []
    for i in range(6):
        for k in range(i, 6):
            h21.append(jnp.sum(
                w * (j[0][i] * j[0][k] + j[1][i] * j[1][k]
                     + j[2][i] * j[2][k])))
    g6 = [jnp.sum(w * (j[0][i] * r0 + j[1][i] * r1 + j[2][i] * r2))
          for i in range(6)]
    return h21, g6, cost, nact


def _plane_sweep(pf, r00, r01, r02, r10, r11, r12, r20, r21, r22,
                 tx, ty, tz, d2h, delta):
    """Plane-factor sweep (LidarPlaneNormFactor, lidarFactor.hpp:106-138):
    pf = [px,py,pz, nx,ny,nz, d, mask] channel tiles."""
    px, py, pz, nx, ny, nz, d, m = pf
    mb = m > 0.5
    rpx = r00 * px + r01 * py + r02 * pz
    rpy = r10 * px + r11 * py + r12 * pz
    rpz = r20 * px + r21 * py + r22 * pz
    r = nx * (rpx + tx) + ny * (rpy + ty) + nz * (rpz + tz) + d
    zero = jnp.zeros_like(r)
    r = jnp.where(mb, r, zero)
    s = r * r
    sr = jnp.sqrt(jnp.maximum(s, 1e-20))
    w = jnp.where(s <= d2h, 1.0, delta / sr) * m
    cost = 0.5 * jnp.sum(jnp.where(s <= d2h, s, 2.0 * delta * sr - d2h) * m)
    nact = jnp.sum(m)

    # j_theta = rp x n ; j_u = n
    j = [jnp.where(mb, rpy * nz - rpz * ny, zero),
         jnp.where(mb, rpz * nx - rpx * nz, zero),
         jnp.where(mb, rpx * ny - rpy * nx, zero),
         jnp.where(mb, nx, zero),
         jnp.where(mb, ny, zero),
         jnp.where(mb, nz, zero)]
    h21 = []
    for i in range(6):
        for k in range(i, 6):
            h21.append(jnp.sum(w * j[i] * j[k]))
    g6 = [jnp.sum(w * j[i] * r) for i in range(6)]
    return h21, g6, cost, nact


def _accumulate(ef, pf, qw, qx, qy, qz, tx, ty, tz, d2h, delta):
    """Both sweeps at pose (q, t): scalars (h21 list, g6 list, cost, n)."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    rot = (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
           2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
           2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))
    he, ge, ce, ne = _edge_sweep(ef, *rot, tx, ty, tz, d2h, delta)
    hp, gp, cp, np_ = _plane_sweep(pf, *rot, tx, ty, tz, d2h, delta)
    h21 = [a + b for a, b in zip(he, hp)]
    g6 = [a + b for a, b in zip(ge, gp)]
    return h21, g6, ce + cp, ne + np_


def _solve6(h21, g6, lam):
    """delta = solve(H + lam*diag(diagonal(H)) + lam*1e-8*I, -g) by
    unpivoted Gaussian elimination (H + damping is SPD)."""
    a = [[None] * 6 for _ in range(6)]
    idx = 0
    for i in range(6):
        for k in range(i, 6):
            a[i][k] = h21[idx]
            if k != i:
                a[k][i] = h21[idx]
            idx += 1
    for i in range(6):
        a[i][i] = a[i][i] + lam * (a[i][i] + 1e-8)
    rhs = [-g for g in g6]
    for k in range(6):
        inv = 1.0 / a[k][k]
        for i in range(k + 1, 6):
            f = a[i][k] * inv
            for jj in range(k + 1, 6):
                a[i][jj] = a[i][jj] - f * a[k][jj]
            rhs[i] = rhs[i] - f * rhs[k]
    x = [None] * 6
    for k in range(5, -1, -1):
        acc = rhs[k]
        for jj in range(k + 1, 6):
            acc = acc - a[k][jj] * x[jj]
        x[k] = acc / a[k][k]
    return x


def _finite(v):
    """NaN/Inf check without jnp.isfinite (Mosaic-safe arithmetic form)."""
    big = jnp.float32(3.0e38)
    return (v == v) & (jnp.abs(v) < big)


def _lm_kernel(ef_ref, pf_ref, pose_ref, out_ref, *, n_iters: int,
               delta: float, lam0: float):
    ef = [ef_ref[0, c] for c in range(10)]
    pf = [pf_ref[0, c] for c in range(8)]
    q = [pose_ref[0, 0, j] for j in range(4)]       # SMEM scalars
    t = [pose_ref[0, 0, j] for j in range(4, 7)]
    q0, t0 = list(q), list(t)
    d2h = jnp.float32(delta * delta)
    deltaf = jnp.float32(delta)

    h21, g6, cost, nfac = _accumulate(ef, pf, *q, *t, d2h, deltaf)
    cost0 = cost
    lam = jnp.float32(lam0)
    n_clamp = jnp.float32(0.0)
    n_nan = jnp.float32(0.0)

    for _ in range(n_iters):
        dlt = _solve6(h21, g6, lam)
        finite = _finite(dlt[0])
        for v in dlt[1:]:
            finite = finite & _finite(v)
        dlt = [jnp.where(finite, v, 0.0) for v in dlt]
        nth = jnp.sqrt(dlt[0] * dlt[0] + dlt[1] * dlt[1] + dlt[2] * dlt[2])
        ntr = jnp.sqrt(dlt[3] * dlt[3] + dlt[4] * dlt[4] + dlt[5] * dlt[5])
        sc_th = jnp.minimum(1.0, _MAX_DTHETA / jnp.maximum(nth, 1e-20))
        sc_tr = jnp.minimum(1.0, _MAX_DT / jnp.maximum(ntr, 1e-20))
        hit_clamp = finite & ((sc_th < 1.0) | (sc_tr < 1.0))
        d0, d1, d2 = dlt[0] * sc_th, dlt[1] * sc_th, dlt[2] * sc_th
        d3, d4, d5 = dlt[3] * sc_tr, dlt[4] * sc_tr, dlt[5] * sc_tr

        # retract: q_new = normalize(exp_so3([d0,d1,d2]) x q)
        ts = d0 * d0 + d1 * d1 + d2 * d2
        small = ts < 1e-8
        k = jnp.where(small, 0.5 - ts / 48.0, _sin_half_over_theta(ts))
        ew = jnp.where(small, 1.0 - ts / 8.0, _cos_half(ts))
        ex, ey, ez = k * d0, k * d1, k * d2
        qw = ew * q[0] - ex * q[1] - ey * q[2] - ez * q[3]
        qx = ew * q[1] + ex * q[0] + ey * q[3] - ez * q[2]
        qy = ew * q[2] - ex * q[3] + ey * q[0] + ez * q[1]
        qz = ew * q[3] + ex * q[2] - ey * q[1] + ez * q[0]
        qn = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
        inv_qn = 1.0 / jnp.maximum(qn, 1e-12)
        q_new = [qw * inv_qn, qx * inv_qn, qy * inv_qn, qz * inv_qn]
        t_new = [t[0] + d3, t[1] + d4, t[2] + d5]

        h_new, g_new, cost_new, _ = _accumulate(
            ef, pf, *q_new, *t_new, d2h, deltaf)
        accept = finite & (cost_new < cost)
        q = [jnp.where(accept, a, b) for a, b in zip(q_new, q)]
        t = [jnp.where(accept, a, b) for a, b in zip(t_new, t)]
        h21 = [jnp.where(accept, a, b) for a, b in zip(h_new, h21)]
        g6 = [jnp.where(accept, a, b) for a, b in zip(g_new, g6)]
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7),
                        jnp.minimum(lam * 10.0, 1e4))
        n_clamp = n_clamp + jnp.where(hit_clamp, 1.0, 0.0)
        n_nan = n_nan + jnp.where(finite, 0.0, 1.0)

    # belt-and-braces non-finite pose fallback (solver.lm_solve tail)
    pose_ok = _finite(q[0]) & _finite(q[1]) & _finite(q[2]) & _finite(q[3]) \
        & _finite(t[0]) & _finite(t[1]) & _finite(t[2])
    q = [jnp.where(pose_ok, a, b) for a, b in zip(q, q0)]
    t = [jnp.where(pose_ok, a, b) for a, b in zip(t, t0)]

    vals = [q[0], q[1], q[2], q[3], t[0], t[1], t[2],
            cost0, cost, nfac, n_clamp, n_nan]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    acc = jnp.zeros((1, 1, 128), jnp.float32)
    for i, v in enumerate(vals):
        acc = acc + jnp.where(lane == i, v, 0.0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=(
    "n_iters", "delta", "lam0", "interpret"))
def lm_fused(ef: jnp.ndarray, pf: jnp.ndarray, pose: jnp.ndarray,
             n_iters: int, delta: float, lam0: float = 1e-4,
             interpret: bool = False) -> jnp.ndarray:
    """One-dispatch LM solve per stream.

    ef: (B, 10, Er, 128) f32 edge channels [px,py,pz,ax,ay,az,bx,by,bz,m]
    pf: (B, 8, Pr, 128) f32 plane channels [px,py,pz,nx,ny,nz,d,m]
    pose: (B, 8) f32 [qw,qx,qy,qz,tx,ty,tz,0]
    Returns (B, 128) f32 per the OUT_* lane map.
    """
    b = ef.shape[0]
    assert ef.shape[1] == 10 and pf.shape[1] == 8, (ef.shape, pf.shape)
    er, pr = ef.shape[2], pf.shape[2]
    pose = pose.reshape(b, 1, 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 10, er, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, pr, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_lm_kernel, n_iters=int(n_iters),
                          delta=float(delta), lam0=float(lam0)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
        interpret=interpret,
    )(ef, pf, pose)
    return out.reshape(b, 128)


def pack_edge_channels(edges) -> jnp.ndarray:
    """(B, N, 3) EdgeFactors -> (B, 10, N//128, 128) planar channels."""
    b, n = edges.mask.shape
    assert n % 128 == 0, n
    ch = jnp.stack([
        edges.p[..., 0], edges.p[..., 1], edges.p[..., 2],
        edges.a[..., 0], edges.a[..., 1], edges.a[..., 2],
        edges.b[..., 0], edges.b[..., 1], edges.b[..., 2],
        edges.mask.astype(jnp.float32)], axis=1)
    return ch.reshape(b, 10, n // 128, 128)


def pack_plane_channels(planes) -> jnp.ndarray:
    """(B, N, 3) PlaneFactors -> (B, 8, N//128, 128) planar channels."""
    b, n = planes.mask.shape
    assert n % 128 == 0, n
    ch = jnp.stack([
        planes.p[..., 0], planes.p[..., 1], planes.p[..., 2],
        planes.n[..., 0], planes.n[..., 1], planes.n[..., 2],
        planes.d, planes.mask.astype(jnp.float32)], axis=1)
    return ch.reshape(b, 8, n // 128, 128)
