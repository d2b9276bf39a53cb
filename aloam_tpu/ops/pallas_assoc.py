"""Pallas TPU kernel: fully fused mapping association.

Replaces the association tail of ``mapping.corner_associations_b`` /
``surf_associations_b`` (the TPU-native re-design of the per-query
KD-tree search + PCA / plane fits of ``laserMapping.cpp:577-705``):

XLA schedule (round 2)                     fused kernel (round 3)
----------------------                     ----------------------
crow = cand_flat[cid]   (one 3-4.6 KB      per-TQ-query tile: ONE contiguous
row gather PER QUERY — ~600 MB per surf    DMA of the tile's cell-block
call at B=16, row-latency-bound)           window + a one-hot MXU broadcast
k-pass select (pallas_knn)                 same select, same VMEM residency
centroid/Gram einsums, eigh3/solve3,       scalar-expanded in-kernel on the
inlier checks (several elementwise         (TQ,) select outputs; emits 8
HBM passes over (B,Q,5,3) arrays)          floats per query, no (B,Q,5,3)
                                           intermediates at all

The contiguous-window trick: ``gridmap.knn_cache_b`` sorts queries by
base cell, so in sorted order the per-query cell slot ``cid`` is
NON-DECREASING — any TQ consecutive queries reference at most TQ distinct
cells, all inside ``[cid[i*TQ], cid[i*TQ] + TQ)``. That window is DMA'd
as one block (rows are 3-4.6 KB, so the block read is bandwidth-bound,
not latency-bound) and each query's row is selected with a one-hot
matmul — exact in f32 at HIGHEST precision (one nonzero per reduction).

Layout contract (ops/gridmap.py docstring): candidate rows are
block-planar — 8 sub-blocks of ``[x(bw) | y(bw) | z(bw)]``; every
in-kernel intermediate is (TQ, W)-shaped per the (8, 128) VMEM rule.

Semantics are pinned to the XLA path (mapping.py round-2 code) by
interpret-mode tests: same lowest-index argmin tie-break, same
``near = 0`` zeroing of gate-failing rows, same solve3/eigh3 closed
forms (ops/linalg3.py), same inlier/line thresholds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")
_EPS = 1e-12          # linalg3._EPS
_HI = jax.lax.Precision.HIGHEST

# packed output columns (both kinds emit (N, 8) f32):
#   corner: [ax, ay, az, bx, by, bz, ok, d2_4]
#   surf:   [nx, ny, nz, neg_oa, ok, d2_4, 0, 0]
OUT_W = 8


def _fit_surf(nx, ny, nz, gate_sq: float, plane_tol: float, d2_4):
    """Scalar expansion of mapping.surf_associations_b's fit: centered-Gram
    normal equations (laserMapping.cpp:662-668 semantics), Cramer solve
    (linalg3.solve3, reg=1e-9), unit normal, 0.2 m inlier check (:669-679).
    Inputs are 5-element lists of (TQ,) vectors, already gate-zeroed."""
    sx = nx[0] + nx[1] + nx[2] + nx[3] + nx[4]
    sy = ny[0] + ny[1] + ny[2] + ny[3] + ny[4]
    sz = nz[0] + nz[1] + nz[2] + nz[3] + nz[4]
    cx, cy, cz = sx / 5.0, sy / 5.0, sz / 5.0
    ax = [v - cx for v in nx]
    ay = [v - cy for v in ny]
    az = [v - cz for v in nz]

    def dot5(u, v):
        return (u[0] * v[0] + u[1] * v[1] + u[2] * v[2] + u[3] * v[3]
                + u[4] * v[4])

    # ata = centered Gram + 5 c c^T (== sum p p^T, f32-conditioned)
    reg = 1e-9
    a00 = dot5(ax, ax) + 5.0 * cx * cx + reg
    a01 = dot5(ax, ay) + 5.0 * cx * cy
    a02 = dot5(ax, az) + 5.0 * cx * cz
    a11 = dot5(ay, ay) + 5.0 * cy * cy + reg
    a12 = dot5(ay, az) + 5.0 * cy * cz
    a22 = dot5(az, az) + 5.0 * cz * cz + reg
    bx_, by_, bz_ = -sx, -sy, -sz

    c00 = a11 * a22 - a12 * a12
    c01 = a12 * a02 - a01 * a22
    c02 = a01 * a12 - a11 * a02
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS,
                              jnp.where(det < 0, -_EPS, _EPS), det)
    # symmetric adjugate
    adj00, adj01, adj02 = c00, c01, c02
    adj11 = a00 * a22 - a02 * a02
    adj12 = a02 * a01 - a00 * a12
    adj22 = a00 * a11 - a01 * a01
    n0 = (adj00 * bx_ + adj01 * by_ + adj02 * bz_) * inv_det
    n1 = (adj01 * bx_ + adj11 * by_ + adj12 * bz_) * inv_det
    n2 = (adj02 * bx_ + adj12 * by_ + adj22 * bz_) * inv_det

    n_norm = jnp.sqrt(n0 * n0 + n1 * n1 + n2 * n2)
    neg_oa = 1.0 / jnp.maximum(n_norm, 1e-12)
    nh0, nh1, nh2 = n0 * neg_oa, n1 * neg_oa, n2 * neg_oa

    ok = d2_4 < gate_sq
    for j in range(5):
        res = jnp.abs(nx[j] * nh0 + ny[j] * nh1 + nz[j] * nh2 + neg_oa)
        ok = ok & (res <= plane_tol)
    return nh0, nh1, nh2, neg_oa, ok


def _acos(x):
    """Mosaic has no acos lowering: Abramowitz–Stegun 4.4.46 minimax,
    |err| <= 2e-8 rad on [-1, 1] — below f32 resolution of the
    downstream eigenvalues."""
    ax = jnp.abs(x)
    p = jnp.full_like(x, -0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + c
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0, jnp.pi - r, r)


def _cos_small(x):
    """cos on [0, pi/3] (Taylor to x^8: err < 5e-7 at pi/3)."""
    x2 = x * x
    return 1.0 + x2 * (-0.5 + x2 * (1.0 / 24.0 + x2 * (
        -1.0 / 720.0 + x2 * (1.0 / 40320.0))))


def _sin_small(x):
    """sin on [0, pi/3] (Taylor to x^9: err < 5e-8 at pi/3)."""
    x2 = x * x
    return x * (1.0 + x2 * (-1.0 / 6.0 + x2 * (1.0 / 120.0 + x2 * (
        -1.0 / 5040.0 + x2 * (1.0 / 362880.0)))))


def _fit_corner(nx, ny, nz, gate_sq: float, eigen_ratio: float,
                half_len: float, d2_4):
    """Scalar expansion of mapping.corner_associations_b's fit: 3×3
    covariance PCA via linalg3.eigh3's closed form (trig eigenvalues +
    spectral-projector eigenvector), line test λ_max > ratio·λ_mid,
    virtual points at centroid ± half_len·direction
    (laserMapping.cpp:595-624 semantics)."""
    sx = nx[0] + nx[1] + nx[2] + nx[3] + nx[4]
    sy = ny[0] + ny[1] + ny[2] + ny[3] + ny[4]
    sz = nz[0] + nz[1] + nz[2] + nz[3] + nz[4]
    cx, cy, cz = sx / 5.0, sy / 5.0, sz / 5.0
    dx = [v - cx for v in nx]
    dy = [v - cy for v in ny]
    dz = [v - cz for v in nz]

    def dot5(u, v):
        return (u[0] * v[0] + u[1] * v[1] + u[2] * v[2] + u[3] * v[3]
                + u[4] * v[4])

    m00, m01, m02 = dot5(dx, dx), dot5(dx, dy), dot5(dx, dz)
    m11, m12, m22 = dot5(dy, dy), dot5(dy, dz), dot5(dz, dz)

    # eigh3 (linalg3.py): Smith's trigonometric eigenvalues
    q_tr = (m00 + m11 + m22) / 3.0
    b00, b11, b22 = m00 - q_tr, m11 - q_tr, m22 - q_tr
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (m01 * m01 + m02 * m02 + m12 * m12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = m01 * inv_p, m02 * inv_p, m12 * inv_p
    r = 0.5 * (c00 * (c11 * c22 - c12 * c12)
               - c01 * (c01 * c22 - c12 * c02)
               + c02 * (c01 * c12 - c11 * c02))
    phi = _acos(jnp.clip(r, -1.0, 1.0)) / 3.0         # in [0, pi/3]
    cphi, sphi = _cos_small(phi), _sin_small(phi)
    # cos(phi + 2pi/3) = -cphi/2 - sqrt(3)/2 * sphi  (angle addition)
    cphi2 = -0.5 * cphi - 0.8660254037844386 * sphi
    lam0 = q_tr + 2.0 * p * cphi                      # largest
    lam2 = q_tr + 2.0 * p * cphi2                     # smallest
    lam1 = 3.0 * q_tr - lam0 - lam2

    # spectral projector (A - lam1 I)(A - lam2 I), A = cov (symmetric)
    a1 = (m00 - lam1, m01, m02, m11 - lam1, m12, m22 - lam1)
    a2 = (m00 - lam2, m01, m02, m11 - lam2, m12, m22 - lam2)
    p00 = a1[0] * a2[0] + a1[1] * a2[1] + a1[2] * a2[2]
    p01 = a1[0] * a2[1] + a1[1] * a2[3] + a1[2] * a2[4]
    p02 = a1[0] * a2[2] + a1[1] * a2[4] + a1[2] * a2[5]
    p10 = a1[1] * a2[0] + a1[3] * a2[1] + a1[4] * a2[2]
    p11 = a1[1] * a2[1] + a1[3] * a2[3] + a1[4] * a2[4]
    p12 = a1[1] * a2[2] + a1[3] * a2[4] + a1[4] * a2[5]
    p20 = a1[2] * a2[0] + a1[4] * a2[1] + a1[5] * a2[2]
    p21 = a1[2] * a2[1] + a1[4] * a2[3] + a1[5] * a2[4]
    p22 = a1[2] * a2[2] + a1[4] * a2[4] + a1[5] * a2[5]

    # largest-norm column (jnp.argmax: FIRST max index)
    n0 = p00 * p00 + p10 * p10 + p20 * p20
    n1 = p01 * p01 + p11 * p11 + p21 * p21
    n2 = p02 * p02 + p12 * p12 + p22 * p22
    s0 = (n0 >= n1) & (n0 >= n2)
    s1 = (~s0) & (n1 >= n2)
    vx = jnp.where(s0, p00, jnp.where(s1, p01, p02))
    vy = jnp.where(s0, p10, jnp.where(s1, p11, p12))
    vz = jnp.where(s0, p20, jnp.where(s1, p21, p22))
    vn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    inv_vn = 1.0 / jnp.maximum(vn, _EPS)
    good = vn > 1e-8
    vx = jnp.where(good, vx * inv_vn, 1.0)
    vy = jnp.where(good, vy * inv_vn, 0.0)
    vz = jnp.where(good, vz * inv_vn, 0.0)

    is_line = lam0 > eigen_ratio * lam1
    ok = (d2_4 < gate_sq) & is_line
    ax_ = cx + half_len * vx
    ay_ = cy + half_len * vy
    az_ = cz + half_len * vz
    bx_ = cx - half_len * vx
    by_ = cy - half_len * vy
    bz_ = cz - half_len * vz
    return ax_, ay_, az_, bx_, by_, bz_, ok


def _emit(out_ref, cols):
    for j, c in enumerate(cols):
        out_ref[:, j] = c


def _fit_and_emit(out_ref, ds, nxs, nys, nzs, *, kind, gate_sq, plane_tol,
                  eigen_ratio, half_len):
    d2_4 = ds[4]
    gate = d2_4 < gate_sq
    # zero gate-failing rows' neighbors BEFORE the fit — exactly the XLA
    # path's `near = where(gate, near, 0)` NaN guard
    nxs = [jnp.where(gate, v, 0.0) for v in nxs]
    nys = [jnp.where(gate, v, 0.0) for v in nys]
    nzs = [jnp.where(gate, v, 0.0) for v in nzs]
    zero = jnp.zeros_like(d2_4)
    if kind == "surf":
        nh0, nh1, nh2, neg_oa, ok = _fit_surf(
            nxs, nys, nzs, gate_sq, plane_tol, d2_4)
        _emit(out_ref, (nh0, nh1, nh2, neg_oa,
                        ok.astype(jnp.float32), d2_4, zero, zero))
    else:
        axx, ayy, azz, bxx, byy, bzz, ok = _fit_corner(
            nxs, nys, nzs, gate_sq, eigen_ratio, half_len, d2_4)
        _emit(out_ref, (axx, ayy, azz, bxx, byy, bzz,
                        ok.astype(jnp.float32), d2_4))


def _assoc_cell_kernel(base8_ref, q_ref, cand_ref, out_ref, scratch, sem, *,
                       kind: str, bw: int, tq: int, win: int,
                       gate_sq: float, plane_tol: float, eigen_ratio: float,
                       half_len: float):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    def dma(idx, s):
        # one contiguous cell-window DMA (bandwidth-bound, ~3-4.6 KB rows).
        # The window start is align8(cid0) passed as base8 = start // 8 and
        # multiplied back HERE: Mosaic must statically prove the HBM slice
        # offset divisible by the (8, 128) sublane tiling, and `x * 8` is
        # provable where an opaque prefetched scalar is not.
        return pltpu.make_async_copy(
            cand_ref.at[pl.ds(base8_ref[idx] * 8, win)], scratch.at[s],
            sem.at[s])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    # prefetch the NEXT tile's window while this tile computes
    @pl.when(i + 1 < n_i)
    def _():
        dma(i + 1, nslot).start()

    q = q_ref[:]                                     # (TQ, 8)
    local = q[:, 4].astype(jnp.int32)                # cid - base, [0, TQ+8)
    oh = (local[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (tq, win), 1)).astype(jnp.float32)
    if win < tq + 8:
        # CSPAN < TQ: queries whose cell lies beyond the clipped window
        # must be poisoned, not silently matched against a zero crow —
        # callers count them (arithmetic poison: Mosaic-safe bool form)
        spilled = (local >= win).astype(jnp.float32)
        q = jnp.concatenate(
            [q[:, :3], jnp.maximum(q[:, 3:4], spilled[:, None])], axis=1)
    dma(i, slot).wait()
    # one-hot row select: exact (single nonzero per reduction, f32 HIGHEST)
    crow = jax.lax.dot_general(oh, scratch[slot], (((1,), (0,)), ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)
    from aloam_tpu.ops.pallas_knn import select_passes
    ds, nxs, nys, nzs = select_passes(crow, q, bw, 5)
    _fit_and_emit(out_ref, ds, nxs, nys, nzs, kind=kind, gate_sq=gate_sq,
                  plane_tol=plane_tol, eigen_ratio=eigen_ratio,
                  half_len=half_len)


@functools.partial(jax.jit, static_argnames=(
    "kind", "tq", "bw", "gate_sq", "plane_tol", "eigen_ratio", "half_len",
    "cspan", "interpret"))
def assoc_cell(cand_flat: jnp.ndarray, cid0: jnp.ndarray, q8: jnp.ndarray,
               kind: str, gate_sq: float, plane_tol: float = 0.2,
               eigen_ratio: float = 3.0, half_len: float = 0.1,
               tq: int = 256, bw: int = 0, cspan: int = 0,
               interpret: bool = False):
    """Fused association over cell-sorted queries.

    cand_flat: (Ctot, 8·3·bw) block-planar candidate rows (all streams'
      cell slots flattened, padded so every ``[align8(cid0),
      align8(cid0) + tq + 8)`` window is in-bounds — align8 rounds the
      window start DOWN to a multiple of 8 for the Mosaic HBM-slice
      sublane-tiling constraint, so callers pad tq + 8 rows past the
      largest cid).
    cid0: (N/tq,) i32 — first query's flattened cell slot per tile
      (cid is non-decreasing within each tile by the cache-build sort).
    q8: (N, 8) f32 — [x, y, z, poison, local_cid, 0, 0, 0] per query,
      poison > 0 masks the query (spilled / invalid / solve-skipped),
      local_cid = cid - cid0[tile] ∈ [0, tq); the align8 remainder is
      folded in here, not by the caller.

    cspan: cap on the cell-window span (0 = tq, the exact full window).
      With 0 < cspan < tq the per-tile DMA and one-hot matmul shrink to
      (cspan + 8) rows; queries whose local cid lands beyond that window
      are poisoned in-kernel (gated factors) — callers must count them
      (mapping._assoc_out8_b folds the count into the overflow metric).

    Returns (N, 8) f32 packed factors (see OUT_W column map). N must be a
    multiple of tq, and tiles must not straddle stream boundaries (Q per
    stream divisible by tq).
    """
    n = q8.shape[0]
    w3 = cand_flat.shape[-1]
    if bw == 0:
        bw = w3 // 24
    assert n % tq == 0, (n, tq)
    if cspan <= 0 or cspan > tq:
        cspan = tq
    assert cspan % 8 == 0, cspan
    win = cspan + 8                                  # +8: align8 start
    base8 = jnp.floor_divide(cid0, 8)
    rem = (cid0 - base8 * 8).astype(q8.dtype)        # [0, 8) per tile
    q8 = q8.at[:, 4].add(jnp.repeat(rem, tq))        # local vs align8 base
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tq,),
        in_specs=[
            pl.BlockSpec((tq, 8), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tq, OUT_W), lambda i, c: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # double-buffered windows, +8 rows for the align8 start
            pltpu.VMEM((2, win, w3), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _assoc_cell_kernel, kind=kind, bw=bw, tq=tq, win=win,
            gate_sq=float(gate_sq), plane_tol=float(plane_tol),
            eigen_ratio=float(eigen_ratio), half_len=float(half_len)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, OUT_W), jnp.float32),
        interpret=interpret,
    )(base8, q8, cand_flat)


def assoc_xla(d2: jnp.ndarray, near: jnp.ndarray, gate_sq: float,
              kind: str, plane_tol: float = 0.2, eigen_ratio: float = 3.0,
              half_len: float = 0.1):
    """XLA reference/fallback: identical fit semantics on (…, 5) neighbor
    arrays from ``gridmap.knn_from_cache_b`` — the round-2 association
    math factored out of mapping.py. Returns the same (…, 8) packed
    columns as the kernel."""
    from aloam_tpu.ops.linalg3 import eigh3, solve3
    gate = d2[..., 4] < gate_sq
    near = jnp.where(gate[..., None, None], near, 0.0)
    zero = jnp.zeros_like(d2[..., 4])
    if kind == "surf":
        c = jnp.mean(near, axis=-2)
        a_c = near - c[..., None, :]
        gram = jnp.einsum("...ki,...kj->...ij", a_c, a_c, precision=_HI)
        ata = gram + 5.0 * c[..., :, None] * c[..., None, :]
        atb = -jnp.sum(near, axis=-2)
        nv = solve3(ata, atb, reg=1e-9)
        n_norm = jnp.linalg.norm(nv, axis=-1)
        neg_oa = 1.0 / jnp.maximum(n_norm, 1e-12)
        n_hat = nv * neg_oa[..., None]
        res = jnp.abs(jnp.einsum("...ki,...i->...k", near, n_hat,
                                 precision=_HI) + neg_oa[..., None])
        ok = gate & jnp.all(res <= plane_tol, axis=-1)
        return jnp.stack([n_hat[..., 0], n_hat[..., 1], n_hat[..., 2],
                          neg_oa, ok.astype(jnp.float32), d2[..., 4],
                          zero, zero], axis=-1)
    center = jnp.mean(near, axis=-2)
    diff = near - center[..., None, :]
    cov = jnp.einsum("...ki,...kj->...ij", diff, diff, precision=_HI)
    vals, direction = eigh3(cov)
    is_line = vals[..., 2] > eigen_ratio * vals[..., 1]
    ok = gate & is_line
    a = center + half_len * direction
    b = center - half_len * direction
    return jnp.stack([a[..., 0], a[..., 1], a[..., 2],
                      b[..., 0], b[..., 1], b[..., 2],
                      ok.astype(jnp.float32), d2[..., 4]], axis=-1)
