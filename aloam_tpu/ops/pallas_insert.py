"""Pallas TPU kernel: fused map-insert merge/append over bucket tiles.

Replaces the dense one-hot tail of ``gridmap.insert_b`` (the TPU-native
re-design of laserMapping.cpp:736-801's append + re-voxelize): the XLA
form materializes several (B, C, P, Bk) one-hot intermediates (~100 MB
each at B=16) and runs two (B, C, Bk) sorts for the eviction-priority
slot order; this kernel keeps each bucket tile resident in VMEM and
replays the same semantics as an unrolled per-point loop:

* merge: per point p, match on the hashed voxel id against the bucket's
  slots; the LAST matching point wins (the XLA ``best = max p`` rule) and
  the slot becomes the midpoint of its old centroid and the point.
* append: non-matching points take slots in eviction-priority order
  (empty < out-of-window-far < in-window-far). The XLA path materializes
  ``argsort(prio)`` and indexes it by append rank; here the same order
  falls out of iterative min-extraction with consumption — identical
  values AND identical tie-breaks (stable argsort ascending-index ties ==
  lowest-index argmin ties).
* appended slots recompute cell/vox from the written coordinates; merged
  slots keep theirs (midpoints stay inside their convex voxel).

Exactness: every arithmetic step mirrors gridmap._merge_dense_xla
op-for-op (midpoint ``0.5*(s+p)``, f32 priority formula, counter
definitions); the interpret-mode test pins the two bit-for-bit.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EMPTY = 32767          # gridmap._EMPTY
_P1, _P2, _P3 = 73856093, 19349663, 83492791
_INF = float("inf")


def _merge_kernel(pts_ref, int_ref, cell_ref, vox_ref, px_ref, py_ref,
                  pz_ref, pi_ref, pvox_ref, meta_ref,
                  opts_ref, oint_ref, ocell_ref, ovox_ref, stats_ref, *,
                  p_cap: int, bk: int, cell_size: float, leaf: float):
    pts = pts_ref[:]                                     # (TB, 3Bk) planar
    s_px, s_py, s_pz = pts[:, :bk], pts[:, bk:2 * bk], pts[:, 2 * bk:]
    cell = cell_ref[:]                                   # (TB, 3Bk) i32
    s_cx, s_cy, s_cz = cell[:, :bk], cell[:, bk:2 * bk], cell[:, 2 * bk:]
    s_int = int_ref[:]
    s_vox = vox_ref[:]
    occ = s_cx != _EMPTY
    meta = meta_ref[:]                                   # (TB, 8)
    cnt = meta[:, 0:1]                                   # f32, exact ints

    # eviction priority from the ORIGINAL slots (appends never re-rank):
    # int math in f32 — cell coords are i16-ranged, exact
    adx = jnp.abs(s_cx.astype(jnp.float32) - meta[:, 1:2])
    ady = jnp.abs(s_cy.astype(jnp.float32) - meta[:, 2:3])
    adz = jnp.abs(s_cz.astype(jnp.float32) - meta[:, 3:4])
    dist = jnp.maximum(adx, jnp.maximum(ady, adz))
    in_win = ((adx <= meta[:, 4:5]) & (ady <= meta[:, 5:6])
              & (adz <= meta[:, 6:7]))
    far = 4000.0 - jnp.minimum(dist, 4000.0)
    prio = jnp.where(occ, jnp.where(in_win, 1e6 + far, 1e3 + far), 0.0)

    tb = s_vox.shape[0]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (tb, bk), 1)
    zero_k = jnp.zeros((tb, bk), jnp.float32)
    false_k = jnp.zeros((tb, bk), bool)
    zero_1 = jnp.zeros((tb, 1), jnp.float32)

    m_any, cand_x, cand_y, cand_z, cand_i = (
        false_k, zero_k, zero_k, zero_k, zero_k)
    wr_any, a_x, a_y, a_z, a_i = false_k, zero_k, zero_k, zero_k, zero_k
    merged_c, app_c, evict_c = zero_1, zero_1, zero_1
    prio_cur = prio
    for p in range(p_cap):
        pv = float(p) < cnt                              # (TB, 1)
        match_p = pv & occ & (pvox_ref[:, p:p + 1] == s_vox)
        hm = jnp.any(match_p, axis=1, keepdims=True)
        merged_c = merged_c + hm.astype(jnp.float32)
        # later p overrides: the XLA best = max-matching-p rule
        m_any = m_any | match_p
        cand_x = jnp.where(match_p, px_ref[:, p:p + 1], cand_x)
        cand_y = jnp.where(match_p, py_ref[:, p:p + 1], cand_y)
        cand_z = jnp.where(match_p, pz_ref[:, p:p + 1], cand_z)
        cand_i = jnp.where(match_p, pi_ref[:, p:p + 1], cand_i)

        # append: extract the current-min-priority slot, consume it.
        # Ties are SYSTEMATIC here (every empty slot shares prio 0.0), so
        # the lowest-index tie-break must be explicit — Mosaic's argmin
        # ties HIGH (measured on v5e; see pallas_knn.min_argmin_low). The
        # shared iota_k keeps this unrolled loop's VMEM footprint flat.
        can = pv & ~hm & (app_c < float(bk))
        chosen = jnp.min(prio_cur, axis=1, keepdims=True)
        low = jnp.min(jnp.where(prio_cur == chosen, iota_k, jnp.int32(bk)),
                      axis=1, keepdims=True)
        wsel = can & (iota_k == low)
        wr_any = wr_any | wsel
        a_x = jnp.where(wsel, px_ref[:, p:p + 1], a_x)
        a_y = jnp.where(wsel, py_ref[:, p:p + 1], a_y)
        a_z = jnp.where(wsel, pz_ref[:, p:p + 1], a_z)
        a_i = jnp.where(wsel, pi_ref[:, p:p + 1], a_i)
        prio_cur = jnp.where(wsel, _INF, prio_cur)
        canf = can.astype(jnp.float32)
        app_c = app_c + canf
        evict_c = evict_c + canf * (chosen >= 1e3).astype(jnp.float32)

    o_x = jnp.where(m_any, 0.5 * (s_px + cand_x), s_px)
    o_y = jnp.where(m_any, 0.5 * (s_py + cand_y), s_py)
    o_z = jnp.where(m_any, 0.5 * (s_pz + cand_z), s_pz)
    o_i = jnp.where(m_any, 0.5 * (s_int + cand_i), s_int)
    o_x = jnp.where(wr_any, a_x, o_x)
    o_y = jnp.where(wr_any, a_y, o_y)
    o_z = jnp.where(wr_any, a_z, o_z)
    o_i = jnp.where(wr_any, a_i, o_i)

    inv_cell, inv_leaf = 1.0 / cell_size, 1.0 / leaf
    n_cx = jnp.where(wr_any, jnp.floor(o_x * inv_cell).astype(jnp.int32),
                     s_cx)
    n_cy = jnp.where(wr_any, jnp.floor(o_y * inv_cell).astype(jnp.int32),
                     s_cy)
    n_cz = jnp.where(wr_any, jnp.floor(o_z * inv_cell).astype(jnp.int32),
                     s_cz)
    a_vox = ((jnp.floor(o_x * inv_leaf).astype(jnp.int32) * _P1)
             ^ (jnp.floor(o_y * inv_leaf).astype(jnp.int32) * _P2)
             ^ (jnp.floor(o_z * inv_leaf).astype(jnp.int32) * _P3))
    o_vox = jnp.where(wr_any, a_vox, s_vox)

    opts_ref[:] = jnp.concatenate([o_x, o_y, o_z], axis=1)
    oint_ref[:] = o_i
    ocell_ref[:] = jnp.concatenate([n_cx, n_cy, n_cz], axis=1)
    ovox_ref[:] = o_vox
    stats_ref[:, 0] = merged_c[:, 0]
    stats_ref[:, 1] = app_c[:, 0]
    stats_ref[:, 2] = evict_c[:, 0]
    for j in range(3, 8):
        stats_ref[:, j] = zero_1[:, 0]


@functools.partial(jax.jit, static_argnames=("cell_size", "leaf", "tb",
                                             "interpret"))
def _merge_tiles_flat(pts_tile, int_tile, cell_tile, vox_tile,
                      px, py, pz, pi, pvox, meta,
                      cell_size: float, leaf: float, tb: int = 0,
                      interpret: bool = False):
    assert tb > 0, "resolve ALOAM_INSERT_TB in merge_tiles, not under jit"
    # tb=256 with a multi-tile grid exceeds the 16 MB scoped-VMEM limit
    # (the unrolled p_cap append loop's live set, double-buffered by the
    # Mosaic pipeline, measured 18.7 MB on v5e); 128 fits with headroom.
    n, w3 = pts_tile.shape
    bk = w3 // 3
    p_cap = px.shape[-1]
    pad = (-n) % tb
    if pad:
        padf = lambda a: jnp.pad(a, ((0, pad), (0, 0)))  # noqa: E731
        pts_tile, int_tile, cell_tile, vox_tile = map(
            padf, (pts_tile, int_tile, cell_tile, vox_tile))
        px, py, pz, pi, pvox, meta = map(padf, (px, py, pz, pi, pvox, meta))
    grid = ((n + pad) // tb,)

    def spec(w):
        return pl.BlockSpec((tb, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_merge_kernel, p_cap=p_cap, bk=bk,
                          cell_size=float(cell_size), leaf=float(leaf)),
        grid=grid,
        in_specs=[spec(w3), spec(bk), spec(w3), spec(bk),
                  spec(p_cap), spec(p_cap), spec(p_cap), spec(p_cap),
                  spec(p_cap), spec(8)],
        out_specs=[spec(w3), spec(bk), spec(w3), spec(bk), spec(8)],
        out_shape=[
            jax.ShapeDtypeStruct((n + pad, w3), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, bk), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, w3), jnp.int32),
            jax.ShapeDtypeStruct((n + pad, bk), jnp.int32),
            jax.ShapeDtypeStruct((n + pad, 8), jnp.float32),
        ],
        interpret=interpret,
    )(pts_tile, int_tile, cell_tile, vox_tile, px, py, pz, pi, pvox, meta)
    return [o[:n] for o in outs]


def merge_tiles(pts_tile, s_int, cell_tile, vox_tile,
                ppx, ppy, ppz, ppi, pvox, cnt, center, window,
                cell_size: float, leaf: float, interpret: bool = False):
    """Drop-in twin of ``gridmap._merge_dense_xla`` (same signature and
    return contract) running the fused kernel over flattened bucket rows.

    ``ALOAM_INSERT_TB`` is resolved HERE (outside jit) so it participates
    in the static-argument cache key — reading it at trace time made
    in-process sweeps silently re-measure the first compilation. Unset,
    the tile height adapts to the point cap: the unrolled p_cap append
    loop's scoped-VMEM live set scales ~tb*p_cap (measured on v5e:
    tb=256/p=16 -> 18.7 MB and tb=128/p=48 -> 21.5 MB both blow the
    16 MB limit; tb=128/p=16 fits with headroom), so keep
    tb*p_cap <= 2048 and tb <= 128."""
    cap_p_static = ppx.shape[-1]
    tb_env = _os.environ.get("ALOAM_INSERT_TB")
    if tb_env is not None:
        tb = int(tb_env)
        if tb <= 0 or tb % 8:
            raise ValueError(
                f"ALOAM_INSERT_TB={tb}: must be a positive multiple of 8")
    else:
        tb = max(8, min(128, (2048 // max(cap_p_static, 1)) // 8 * 8))
    if tb * cap_p_static > 2048:
        raise ValueError(
            f"insert kernel tile tb={tb} x point cap {cap_p_static} = "
            f"{tb * cap_p_static} > 2048: the unrolled append loop's "
            f"scoped-VMEM live set would exceed the 16 MB limit (opaque "
            f"Mosaic compile failure). Lower ALOAM_INSERT_TB or "
            f"map_insert_point_cap so tb*p_cap <= 2048.")
    bsz, cap_c, cap_p = ppx.shape
    bk = vox_tile.shape[-1]
    n = bsz * cap_c

    def flat(a):
        return a.reshape((n,) + a.shape[2:])

    meta = jnp.concatenate([
        cnt[..., None].astype(jnp.float32),
        jnp.broadcast_to(center[:, None, :].astype(jnp.float32),
                         (bsz, cap_c, 3)),
        jnp.broadcast_to(window[None, None, :].astype(jnp.float32),
                         (bsz, cap_c, 3)),
        jnp.zeros((bsz, cap_c, 1), jnp.float32)], axis=-1)

    o_pts, o_int, o_cell, o_vox, stats = _merge_tiles_flat(
        flat(pts_tile), flat(s_int), flat(cell_tile), flat(vox_tile),
        flat(ppx), flat(ppy), flat(ppz), flat(ppi), flat(pvox),
        meta.reshape(n, 8), cell_size, leaf, tb=tb, interpret=interpret)

    def unflat(a):
        return a.reshape((bsz, cap_c) + a.shape[1:])

    o_pts, o_cell = unflat(o_pts), unflat(o_cell)
    stats = unflat(stats)
    return (o_pts[..., :bk], o_pts[..., bk:2 * bk], o_pts[..., 2 * bk:],
            unflat(o_int),
            o_cell[..., :bk], o_cell[..., bk:2 * bk], o_cell[..., 2 * bk:],
            unflat(o_vox),
            stats[..., 0].astype(jnp.int32),
            stats[..., 1].astype(jnp.int32),
            stats[..., 2].astype(jnp.int32))
