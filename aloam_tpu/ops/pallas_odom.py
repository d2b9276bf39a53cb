"""Pallas TPU kernel: fused odometry correspondence search (flash-style).

Replaces ``neighbors.odom_window_mins_b``'s XLA scan, which materializes
(B, Q, M) distance-matrix chunks in HBM twice per call (~50 ms at B=16
for the surf pass). Here the reference cloud lives in VMEM for the whole
query block — (M, 4) at the odometry cloud sizes is only ~400 KB — and
both passes (global 1-NN, then the ring-window mins around the found
neighbor's ring, laserOdometry.cpp:312-361/402-455) stream over it in
VMEM chunks with running min/argmin carries. Nothing Q x M ever touches
HBM.

Layout contract: the reference cloud arrives coordinate-PLANAR
``(B, 4, M) = [x | y | z | ring]`` with invalid rows poisoned
(coords/ring = 1e9); see the minor-dim rule in ops/gridmap.py.

Tie-breaks match the XLA path: chunks merge in order with a strict <,
and argmin takes the lowest index inside a chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _window_kernel(sel_ref, ref_ref, out_ref, *, m_chunk: int,
                   m_chunk1: int, nearby: float, ring_seg: int):
    sel = sel_ref[0]                          # (TQ, 4): x y z 0
    m_total = ref_ref.shape[2]
    n_chunks = m_total // m_chunk
    tq = sel.shape[0]
    q2 = jnp.sum(sel * sel, axis=1, keepdims=True)           # (TQ, 1)

    def d2_of(c, mc):
        # dynamic chunk loads from the VMEM ref inside fori_loop bodies:
        # an unrolled python loop kept every chunk temporary live and
        # OOM'd the VMEM stack, and lax.dynamic_slice on VALUES has no
        # Mosaic lowering — pl.ds on the Ref is the supported form.
        # d2 rides the MXU via the q² − 2q·r + r² expansion (sel's 4th
        # column is 0, so the ring row drops out of the contraction);
        # HIGHEST keeps f32 accuracy (a bare bf16 pass would corrupt the
        # 25 m² gates). Poisoned refs sit at 1e9 → d2 ≈ 3e18, failing
        # every merge, like the direct form.
        sl = pl.ds(c * mc, mc)
        refc = ref_ref[0, :, sl]                             # (4, mc)
        rx = refc[0:1, :]
        ry = refc[1:2, :]
        rz = refc[2:3, :]
        r2 = rx * rx + ry * ry + rz * rz                     # (1, mc)
        cross = jax.lax.dot_general(
            sel, refc, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)             # (TQ, mc)
        return jnp.maximum(q2 - 2.0 * cross + r2, 0.0)

    def ring_of(c, mc):
        return ref_ref[0, 3, pl.ds(c * mc, mc)][None, :]

    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, m_chunk), 1)

    def upd(best, d2, c, mc=m_chunk, ring_c=None, best_ring=None):
        # lowest-index tie-break must be explicit: Mosaic argmin ties HIGH
        from aloam_tpu.ops.pallas_knn import min_argmin_low
        loc, am = min_argmin_low(d2)
        better = loc < best[0]
        bd = jnp.where(better, loc, best[0])
        bi = jnp.where(better, am + c * mc, best[1])
        if ring_c is None:
            return bd, bi
        sel_r = jax.lax.broadcasted_iota(
            jnp.int32, d2.shape, 1) == am[:, None]
        r_at = jnp.sum(jnp.where(sel_r, ring_c, 0.0), axis=1)
        return bd, bi, jnp.where(better, r_at, best_ring)

    # ---- pass 1: global 1-NN (+ the neighbor's ring) ---------------------
    # Pass 1 has no chunk skip (the NN may be anywhere), so it runs over
    # COARSER chunks (m_chunk1 >= m_chunk): the per-chunk argmin/merge
    # machinery dominates over the d2 matmul at SLAM shapes, and bigger
    # chunks amortize it. Merging order is unchanged (strict <, lowest
    # index inside a chunk), so the result is bit-identical.
    def body1(c, st):
        bd, bi, br = st
        ring_c = jnp.broadcast_to(ring_of(c, m_chunk1), (tq, m_chunk1))
        return upd((bd, bi), d2_of(c, m_chunk1), c, m_chunk1, ring_c, br)

    bd, bi, br = jax.lax.fori_loop(
        0, m_total // m_chunk1, body1,
        (jnp.full((tq,), _INF, jnp.float32), jnp.zeros((tq,), jnp.int32),
         jnp.full((tq,), 1e9, jnp.float32)))

    # ---- pass 2: ring-window mins around ring_nn -------------------------
    # Both pass-2 outputs live within |ring - br| <= nearby. When the
    # caller declares the reference ring-SEGMENTED (ring r occupies rows
    # [r*ring_seg, (r+1)*ring_seg), the frontend ring_heads layout), a
    # chunk's geometric ring range is static arithmetic of c, so chunks
    # outside the tile's [min(br), max(br)] ± nearby window are skipped
    # whole — at HDL-64 shapes a 256-query tile spans ~11 of 64 rings,
    # so ~3/4 of pass 2's chunks skip. Poisoned rows (ring = 1e9) never
    # contribute to either output, so the static range stays valid.
    if ring_seg > 0:
        br_real = jnp.where(br < 1e8, br, -jnp.inf)
        lo = jnp.min(jnp.where(br < 1e8, br, jnp.inf)) - nearby
        hi = jnp.max(br_real) + nearby
        any_unfound = jnp.max(jnp.where(br < 1e8, 0.0, 1.0)) > 0.0
        # a query whose pass-1 NN was never found (empty cloud) has no
        # pass-2 window either — but keep the scan exhaustive in that
        # case anyway (cheap: only pre-init frames hit it)
        lo = jnp.where(any_unfound, -jnp.inf, lo)
        hi = jnp.where(any_unfound, jnp.inf, hi)

    def body2(c, st):
        def compute(st):
            dd, di, sd, si = st
            d2 = d2_of(c, m_chunk)
            adiff = jnp.abs(ring_of(c, m_chunk) - br[:, None])
            w_diff = (adiff >= 1.0) & (adiff <= nearby)
            dd, di = upd((dd, di), jnp.where(w_diff, d2, _INF), c)
            gidx = iota + c * m_chunk
            w_same = (adiff < 0.5) & (gidx != bi[:, None])
            sd, si = upd((sd, si), jnp.where(w_same, d2, _INF), c)
            return dd, di, sd, si

        if ring_seg <= 0:
            return compute(st)
        c_rlo = ((c * m_chunk) // ring_seg).astype(jnp.float32)
        c_rhi = (((c + 1) * m_chunk - 1) // ring_seg).astype(jnp.float32)
        overlap = (c_rhi >= lo) & (c_rlo <= hi)
        return jax.lax.cond(overlap, compute, lambda st: st, st)

    dd, di, sd, si = jax.lax.fori_loop(
        0, n_chunks, body2,
        (jnp.full((tq,), _INF, jnp.float32), jnp.zeros((tq,), jnp.int32),
         jnp.full((tq,), _INF, jnp.float32), jnp.zeros((tq,), jnp.int32)))

    out_ref[0] = jnp.stack(
        [bd, bi.astype(jnp.float32), dd, di.astype(jnp.float32),
         sd, si.astype(jnp.float32), br, jnp.zeros((tq,), jnp.float32)],
        axis=1)


def window_mins(sel: jnp.ndarray, ref_planar: jnp.ndarray,
                nearby: float, tq: int = 256, m_chunk: int = 2048,
                m_chunk1: int = 0,
                interpret: bool = False, ring_seg: int = 0):
    """sel (B, Q, 3); ref_planar (B, 4, M) [x|y|z|ring], invalid poisoned.

    Returns (d2_nn, idx_nn, d2_diff, idx_diff, d2_same, idx_same), each
    (B, Q) — idx as int32, d2 +inf where no candidate.

    ring_seg > 0 declares the reference ring-segmented: ring r's points
    (and only ring r's) live in rows [r*ring_seg, (r+1)*ring_seg). That
    layout makes pass 2's ring window a static chunk range, enabling the
    chunk skip above. Output-identical to ring_seg=0.

    m_chunk1 is pass 1's (coarser) chunk; 0 picks 2*m_chunk — pass 1
    cannot skip chunks, so it only pays per-chunk merge overhead from fine
    granularity, but the pass-1 temporaries ((TQ, m_chunk1) d2 + argmin
    machinery) live on the scoped-VMEM stack: 4*2048 measured 18.9 MB > the
    16 MB limit on v5e. Must be a multiple of m_chunk; output-identical
    for any value. ``ALOAM_ODOM_P1_CHUNK`` overrides for sweeps — resolved
    HERE (outside jit) so it participates in the static-argument cache key
    and in-process sweeps re-compile instead of reusing a stale trace.
    """
    import os as _os
    if m_chunk1 <= 0:
        m_chunk1 = int(_os.environ.get("ALOAM_ODOM_P1_CHUNK",
                                       str(2 * m_chunk)))
    if m_chunk1 % m_chunk:
        raise ValueError(f"m_chunk1={m_chunk1} not a multiple of {m_chunk}")
    return _window_mins_jit(sel, ref_planar, nearby, tq, m_chunk, m_chunk1,
                            interpret, ring_seg)


@functools.partial(jax.jit,
                   static_argnames=("nearby", "tq", "m_chunk", "m_chunk1",
                                    "interpret", "ring_seg"))
def _window_mins_jit(sel: jnp.ndarray, ref_planar: jnp.ndarray,
                     nearby: float, tq: int, m_chunk: int, m_chunk1: int,
                     interpret: bool, ring_seg: int):
    assert m_chunk1 > 0, "resolve ALOAM_ODOM_P1_CHUNK in window_mins"
    bsz, q_n, _ = sel.shape
    m = ref_planar.shape[2]
    # don't pad a small cloud up to a coarse pass-1 chunk
    m_chunk1 = min(m_chunk1, -(-m // m_chunk) * m_chunk)
    pad_q = (-q_n) % tq
    pad_m = (-m) % m_chunk1
    if pad_q:
        sel = jnp.pad(sel, ((0, 0), (0, pad_q), (0, 0)))
    if pad_m:
        ref_planar = jnp.pad(ref_planar, ((0, 0), (0, 0), (0, pad_m)),
                             constant_values=1e9)
    sel4 = jnp.pad(sel, ((0, 0), (0, 0), (0, 1)))
    qt = (q_n + pad_q) // tq
    out = pl.pallas_call(
        functools.partial(_window_kernel, m_chunk=m_chunk,
                          m_chunk1=m_chunk1, nearby=nearby,
                          ring_seg=ring_seg),
        grid=(bsz, qt),
        in_specs=[
            pl.BlockSpec((1, tq, 4), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, m + pad_m), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, 8), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, q_n + pad_q, 8), jnp.float32),
        interpret=interpret,
    )(sel4, ref_planar)
    out = out[:, :q_n]
    return (out[..., 0], out[..., 1].astype(jnp.int32),
            out[..., 2], out[..., 3].astype(jnp.int32),
            out[..., 4], out[..., 5].astype(jnp.int32))
