"""Scan-to-map refinement on a rolling voxel-cube world map (C14-C24).

Re-design of ``/root/reference/src/laserMapping.cpp``. The reference keeps a
21×21×11 array of 50 m cubes and *physically rolls the whole 3-D array* (six
~30-line while-loops, :323-507) whenever the pose nears a boundary, clearing
the wrapped slabs. Here the grid is **toroidal**: a world cube with integer
coords w lives at slot ``w mod (W,H,D)``, each slot remembers which world
cube owns it (``cube_coord``), and a slot whose owner differs from the
requested cube is simply treated as empty and lazily reclaimed on insert.
Recentering therefore costs nothing and moves no data; the live window is
the same 21×21×11 neighborhood of the trajectory (the reference eagerly
discards cubes 3 slots from the boundary; we keep them until slot reuse —
strictly more map).

The 5-NN map associations (:577-705) become streamed distance-matmul top-k;
the 3×3 covariance eigendecomposition (:605) and the 5×3 plane solve (:663)
are batched; the two rounds of (associate + ≤4 LM iterations) mirror
:562/:715.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import solver
from aloam_tpu.config import AloamConfig
from aloam_tpu.ops import hashgrid
from aloam_tpu.ops.linalg3 import eigh3, solve3
from aloam_tpu.types import PointCloud
from aloam_tpu.frontend.voxel import voxel_downsample_masked
from aloam_tpu.utils.masked import compact


class MapState(NamedTuple):
    corner_xyz: jnp.ndarray     # (n_cubes, corner_cap, 3)
    corner_int: jnp.ndarray     # (n_cubes, corner_cap)
    corner_cnt: jnp.ndarray     # (n_cubes,)
    surf_xyz: jnp.ndarray       # (n_cubes, surf_cap, 3)
    surf_int: jnp.ndarray
    surf_cnt: jnp.ndarray
    cube_coord: jnp.ndarray     # (n_cubes, 3) world cube owning each slot
    q_wmap_wodom: jnp.ndarray   # odom-world -> map-world (laserMapping:116)
    t_wmap_wodom: jnp.ndarray
    q_w: jnp.ndarray            # latest mapped pose (parameters[], :110-112)
    t_w: jnp.ndarray


class MapMetrics(NamedTuple):
    from_map_corner: jnp.ndarray
    from_map_surf: jnp.ndarray
    corner_factors: jnp.ndarray
    surf_factors: jnp.ndarray
    solved: jnp.ndarray
    overflow: jnp.ndarray


def init_state(cfg: AloamConfig) -> MapState:
    n = cfg.n_cubes
    return MapState(
        corner_xyz=jnp.zeros((n, cfg.cube_corner_cap, 3), jnp.float32),
        corner_int=jnp.zeros((n, cfg.cube_corner_cap), jnp.float32),
        corner_cnt=jnp.zeros((n,), jnp.int32),
        surf_xyz=jnp.zeros((n, cfg.cube_surf_cap, 3), jnp.float32),
        surf_int=jnp.zeros((n, cfg.cube_surf_cap), jnp.float32),
        surf_cnt=jnp.zeros((n,), jnp.int32),
        # sentinel owner far outside any reachable cube -> all slots empty
        cube_coord=jnp.full((n, 3), 2 ** 20, jnp.int32),
        q_wmap_wodom=geo.qidentity(), t_wmap_wodom=jnp.zeros(3, jnp.float32),
        q_w=geo.qidentity(), t_w=jnp.zeros(3, jnp.float32))


def world_cube(pts: jnp.ndarray, cfg: AloamConfig) -> jnp.ndarray:
    """Integer world-cube coords per axis: the reference's exact
    int()-then-decrement-if-negative (laserMapping.cpp:312-321), which is
    floor((x+25)/50) everywhere except exact negative multiples of 50,
    where the reference still decrements."""
    v = pts + cfg.cube_size / 2.0
    i = jnp.trunc(v / cfg.cube_size).astype(jnp.int32)
    return i - (v < 0).astype(jnp.int32)


def cube_slot(w: jnp.ndarray, cfg: AloamConfig) -> jnp.ndarray:
    """Toroidal slot index of world cube w (..., 3) -> (...,)."""
    i = jnp.mod(w[..., 0], cfg.cube_width)
    j = jnp.mod(w[..., 1], cfg.cube_height)
    k = jnp.mod(w[..., 2], cfg.cube_depth)
    return i + cfg.cube_width * j + cfg.cube_width * cfg.cube_height * k


def _neighbor_cubes(center_w: jnp.ndarray, cfg: AloamConfig):
    """The 5×5×3 cube neighborhood (laserMapping.cpp:512-529): world coords
    (75, 3) and their slots (75,)."""
    di, dj, dk = jnp.meshgrid(jnp.arange(-2, 3), jnp.arange(-2, 3),
                              jnp.arange(-1, 2), indexing="ij")
    offs = jnp.stack([di.ravel(), dj.ravel(), dk.ravel()],
                     axis=-1).astype(jnp.int32)
    w = center_w[None, :] + offs
    return w, cube_slot(w, cfg)


def _gather_local_map(state: MapState, center_w, cfg: AloamConfig):
    """Concatenate the neighborhood cubes into masked from-map clouds
    (laserMapping.cpp:531-537)."""
    w, slots = _neighbor_cubes(center_w, cfg)
    own_ok = jnp.all(state.cube_coord[slots] == w, axis=-1)  # (75,)

    def grab(xyz, cnt, cap, out_cap):
        pts = xyz[slots]                      # (75, cap, 3)
        pos = jnp.arange(cap)[None, :]
        m = own_ok[:, None] & (pos < cnt[slots][:, None])
        # compact so every downstream sort/gather runs on ~valid-sized
        # arrays instead of 75*cap mostly-padding rows (scatters are cheap
        # on TPU; per-row gather/sort latency is not)
        out, out_mask, dropped = compact(pts.reshape(-1, 3), m.reshape(-1),
                                         out_cap)
        return out, out_mask, dropped

    c_xyz, c_mask, d1 = grab(state.corner_xyz, state.corner_cnt,
                             cfg.cube_corner_cap, cfg.from_map_corner_cap)
    s_xyz, s_mask, d2 = grab(state.surf_xyz, state.surf_cnt,
                             cfg.cube_surf_cap, cfg.from_map_surf_cap)
    return (c_xyz, c_mask), (s_xyz, s_mask), slots, d1 + d2


def corner_associations(stack_xyz, stack_mask, grid: hashgrid.HashGrid,
                        q, t, cfg: AloamConfig) -> solver.EdgeFactors:
    """Map-frame edge factors via gated 5-NN PCA (laserMapping.cpp:577-640):
    if λ₂ > 3λ₁ the neighborhood is a line; emit virtual points at
    centroid ± 0.1·direction."""
    sel = geo.qrot(q, stack_xyz) + t
    d2, near = hashgrid.knn(grid, sel, 5, cfg.knn_cell,
                            cfg.knn_table_corner, cfg.knn_radius)
    gate = stack_mask & (d2[:, 4] < cfg.map_knn_gate_sq)

    center = jnp.mean(near, axis=1)
    diff = near - center[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", diff, diff,
                     precision=jax.lax.Precision.HIGHEST)
    vals, direction = eigh3(cov)
    is_line = vals[:, 2] > cfg.map_eigen_ratio * vals[:, 1]

    a = center + cfg.map_edge_half_len * direction
    b = center - cfg.map_edge_half_len * direction
    return solver.EdgeFactors(p=stack_xyz, a=a, b=b,
                              mask=gate & is_line)


def surf_associations(stack_xyz, stack_mask, grid: hashgrid.HashGrid,
                      q, t, cfg: AloamConfig) -> solver.PlaneFactors:
    """Map-frame plane factors via gated 5-NN LSQ plane fit
    (laserMapping.cpp:642-705): solve A·n = -1, normalize, keep the plane iff
    every neighbor is within 0.2 m."""
    sel = geo.qrot(q, stack_xyz) + t
    d2, near = hashgrid.knn(grid, sel, 5, cfg.knn_cell, cfg.knn_table_surf,
                            cfg.knn_radius)
    gate = stack_mask & (d2[:, 4] < cfg.map_knn_gate_sq)
    # garbage rows (gate off) may carry +inf pads: zero them so the fit
    # arithmetic below stays finite
    near = jnp.where(jnp.isfinite(near), near, 0.0)

    # least squares A n = -1 via 3x3 normal equations; the Gram matrix is
    # accumulated on centered coordinates for f32 conditioning:
    # A^T A = sum_k p_k p_k^T = (centered Gram) + 5 c c^T since sum a_c = 0
    c = jnp.mean(near, axis=1)
    a_c = near - c[:, None, :]
    gram = jnp.einsum("nki,nkj->nij", a_c, a_c,
                      precision=jax.lax.Precision.HIGHEST)
    ata_full = gram + 5.0 * c[:, :, None] * c[:, None, :]
    atb = -jnp.sum(near, axis=1)
    n = solve3(ata_full, atb, reg=1e-9)
    n_norm = jnp.linalg.norm(n, axis=-1)
    neg_oa = 1.0 / jnp.maximum(n_norm, 1e-12)
    n_hat = n * neg_oa[:, None]

    # plane quality: |n̂·p + d| <= 0.2 for all 5 neighbors (:669-679)
    res = jnp.abs(jnp.einsum("nki,ni->nk", near, n_hat,
                             precision=jax.lax.Precision.HIGHEST)
                  + neg_oa[:, None])
    plane_ok = jnp.all(res <= cfg.map_plane_tol, axis=1)
    return solver.PlaneFactors(p=stack_xyz, n=n_hat, d=neg_oa,
                               mask=gate & plane_ok)


def _reclaim_slots(cube_coord, corner_cnt, surf_cnt, w, mask,
                   cfg: AloamConfig):
    """Lazy toroidal reclaim: any slot about to receive points of a world
    cube different from its current owner is emptied (both classes) and
    reassigned. Replaces the reference's eager slab-clearing recentering
    (laserMapping.cpp:323-507)."""
    n_cubes = cube_coord.shape[0]
    slot = jnp.where(mask, cube_slot(w, cfg), n_cubes)
    touched_w = jnp.full((n_cubes, 3), 2 ** 20, jnp.int32)
    touched_w = touched_w.at[slot].set(w, mode="drop")
    touched_mask = jnp.zeros((n_cubes,), bool).at[slot].set(True, mode="drop")
    stale = touched_mask & jnp.any(touched_w != cube_coord, axis=-1)
    corner_cnt = jnp.where(stale, 0, corner_cnt)
    surf_cnt = jnp.where(stale, 0, surf_cnt)
    cube_coord = jnp.where(touched_mask[:, None], touched_w, cube_coord)
    return cube_coord, corner_cnt, surf_cnt


def _insert_points(xyz_cubes, int_cubes, cnt, pts, inten, mask,
                   cfg: AloamConfig, cap: int):
    """Append masked points to their (already reclaimed) cubes
    (laserMapping.cpp:737-783)."""
    n_cubes = cnt.shape[0]
    w = world_cube(pts, cfg)
    slot = jnp.where(mask, cube_slot(w, cfg), n_cubes)

    # per-slot ranks (stable by arrival): sort by slot
    n = pts.shape[0]
    key = slot * jnp.int32(n) + jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(key)
    slot_s = slot[order]
    counts = jnp.bincount(slot_s, length=n_cubes + 1)[:n_cubes]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[
        jnp.minimum(slot_s, n_cubes)]
    pos = cnt[jnp.minimum(slot_s, n_cubes - 1)] + rank
    ok = (slot_s < n_cubes) & (pos < cap)
    dest = jnp.where(ok, jnp.minimum(slot_s, n_cubes - 1) * cap + pos,
                     n_cubes * cap)
    flat_xyz = xyz_cubes.reshape(-1, 3).at[dest].set(pts[order], mode="drop")
    flat_int = int_cubes.reshape(-1).at[dest].set(inten[order], mode="drop")
    new_cnt = jnp.minimum(cnt + counts, cap)
    overflow = jnp.sum(jnp.maximum(cnt + counts - cap, 0))
    return (flat_xyz.reshape(xyz_cubes.shape),
            flat_int.reshape(int_cubes.shape), new_cnt, overflow)


def _redownsample_cubes(xyz_cubes, int_cubes, cnt, slots, cube_coord, leaf,
                        cap: int, cfg: AloamConfig, work_cap: int):
    """Re-voxel-filter the local-neighborhood cubes in place
    (laserMapping.cpp:787-801).

    Compact-first design: the 75 gathered cubes flatten and compact to
    ~valid size, one packed (cube, voxel) int32 key sorts everything at
    once, segment centroids accumulate by scatter-add, and results scatter
    back to per-cube slots. Every gather/sort runs on work_cap rows rather
    than 75*cap mostly-padding rows.
    """
    n_local = slots.shape[0]
    pts = xyz_cubes[slots]
    its = int_cubes[slots]
    pos = jnp.arange(cap)[None, :]
    m = (pos < cnt[slots][:, None]).reshape(-1)
    local = jax.lax.broadcasted_iota(jnp.int32, (n_local, cap), 0)
    rows = jnp.concatenate(
        [pts.reshape(-1, 3), its.reshape(-1, 1),
         local.reshape(-1, 1).astype(jnp.float32)], axis=1)
    comp, cmask, _ = compact(rows, m, work_cap)
    vals_c = comp[:, :4]
    cube_c = comp[:, 4].astype(jnp.int32)

    anchors = (cube_coord[slots].astype(jnp.float32) * cfg.cube_size
               - cfg.cube_size / 2.0)                        # (75, 3)
    anchor_c = anchors[jnp.clip(cube_c, 0, n_local - 1)]     # narrow gather
    rel = vals_c[:, :3] - anchor_c
    ijk = jnp.clip(jnp.floor(rel / leaf).astype(jnp.int32), 0, 127)
    vox = (ijk[:, 2] * 128 + ijk[:, 1]) * 128 + ijk[:, 0]    # 21 bits
    key = jnp.where(cmask, cube_c * (1 << 21) + vox, jnp.int32(2 ** 30))

    order = jnp.argsort(key)
    key_s = key[order]
    vals_s = vals_c[order]
    mask_s = key_s < 2 ** 30
    new_seg = (key_s != jnp.roll(key_s, 1)).at[0].set(True) & mask_s
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    n_seg = seg[-1] + 1

    # per-segment centroids (scatter-add) and segment -> cube/rank mapping
    dest = jnp.where(mask_s, seg, work_cap)
    ext = jnp.concatenate([jnp.where(mask_s[:, None], vals_s, 0.0),
                           mask_s.astype(jnp.float32)[:, None]], axis=1)
    totals = jnp.zeros((work_cap, 5), jnp.float32).at[dest].add(
        ext, mode="drop")
    centroids = totals[:, :4] / jnp.maximum(totals[:, 4], 1.0)[:, None]

    cube_s = key_s >> 21
    cube_of_seg = jnp.zeros((work_cap,), jnp.int32).at[dest].set(
        cube_s, mode="drop")
    base = jnp.full((n_local + 1,), 2 ** 30, jnp.int32).at[
        jnp.where(mask_s, cube_s, n_local)].min(seg, mode="drop")
    seg_ids = jnp.arange(work_cap, dtype=jnp.int32)
    rank = seg_ids - base[jnp.clip(cube_of_seg, 0, n_local - 1)]
    seg_ok = (seg_ids < n_seg) & (rank >= 0) & (rank < cap)
    out_dest = jnp.where(seg_ok, cube_of_seg * cap + rank, n_local * cap)

    out = jnp.zeros((n_local * cap, 4), jnp.float32).at[out_dest].set(
        centroids, mode="drop")
    out = out.reshape(n_local, cap, 4)
    new_cnt = jnp.bincount(
        jnp.where(seg_ids < n_seg, cube_of_seg, n_local),
        length=n_local + 1)[:n_local]

    xyz_cubes = xyz_cubes.at[slots].set(out[..., :3])
    int_cubes = int_cubes.at[slots].set(out[..., 3])
    cnt = cnt.at[slots].set(jnp.minimum(new_cnt, cap).astype(jnp.int32))
    return xyz_cubes, int_cubes, cnt


def extract_map_cloud(state: MapState, cfg: AloamConfig):
    """Host-side full-map extraction — the /laser_cloud_map equivalent
    (laserMapping.cpp:823-836). Returns (corner (N,3), surf (M,3)) numpy."""
    import numpy as np

    def grab(xyz, cnt, cap):
        xyz = np.asarray(xyz)
        cnt = np.asarray(cnt)
        m = np.arange(cap)[None, :] < cnt[:, None]
        return xyz[m]

    return (grab(state.corner_xyz, state.corner_cnt, cfg.cube_corner_cap),
            grab(state.surf_xyz, state.surf_cnt, cfg.cube_surf_cap))


def extract_surround(state: MapState, cfg: AloamConfig):
    """Host-side local-neighborhood extraction around the latest pose — the
    /laser_cloud_surround equivalent (laserMapping.cpp:806-821)."""
    import numpy as np

    center_w = world_cube(state.t_w, cfg)
    (c_xyz, c_mask), (s_xyz, s_mask), _, _ = _gather_local_map(
        state, center_w, cfg)
    return (np.asarray(c_xyz)[np.asarray(c_mask)],
            np.asarray(s_xyz)[np.asarray(s_mask)])


def mapping_step(state: MapState, corner_in: PointCloud,
                 surf_in: PointCloud, q_wodom, t_wodom,
                 cfg: AloamConfig):
    """One mapping frame (laserMapping.cpp process(), :231-888).

    Returns (new_state, metrics); the refined pose is new_state.(q_w, t_w).
    """
    # initial guess from the odometry pose (transformAssociateToMap, :142-146)
    q_w = geo.qmul(state.q_wmap_wodom, q_wodom)
    t_w = geo.qrot(state.q_wmap_wodom, t_wodom) + state.t_wmap_wodom

    center_w = world_cube(t_w, cfg)
    (c_xyz, c_mask), (s_xyz, s_mask), slots, compact_drop = \
        _gather_local_map(state, center_w, cfg)
    n_map_corner = jnp.sum(c_mask)
    n_map_surf = jnp.sum(s_mask)

    # spatial-hash neighbor tables, built once per frame like the
    # reference's per-frame KD-trees (laserMapping.cpp:558-559)
    corner_grid = hashgrid.build(c_xyz, c_mask, cfg.knn_cell,
                                 cfg.knn_table_corner, cfg.knn_bucket_corner)
    surf_grid = hashgrid.build(s_xyz, s_mask, cfg.knn_cell,
                               cfg.knn_table_surf, cfg.knn_bucket_surf)
    gather_drop = corner_grid.overflow + surf_grid.overflow + compact_drop

    # input stack downsample (:542-550)
    c_vals = jnp.concatenate([corner_in.xyz, corner_in.intensity[:, None]],
                             axis=-1)
    c_ds, c_ds_mask, dc = voxel_downsample_masked(
        c_vals, corner_in.mask, cfg.line_resolution, cfg.corner_stack_cap)
    s_vals = jnp.concatenate([surf_in.xyz, surf_in.intensity[:, None]],
                             axis=-1)
    s_ds, s_ds_mask, ds_ = voxel_downsample_masked(
        s_vals, surf_in.mask, cfg.plane_resolution, cfg.surf_stack_cap)
    corner_stack = c_ds[:, :3]
    corner_stack_int = c_ds[:, 3]
    surf_stack = s_ds[:, :3]
    surf_stack_int = s_ds[:, 3]

    # solve only with enough map support (:554, else keep the guess)
    solve_ok = (n_map_corner > cfg.map_min_corner) \
        & (n_map_surf > cfg.map_min_surf)

    n_edge = jnp.int32(0)
    n_plane = jnp.int32(0)
    for _ in range(cfg.map_outer_rounds):
        edges = corner_associations(corner_stack, c_ds_mask & solve_ok,
                                    corner_grid, q_w, t_w, cfg)
        planes = surf_associations(surf_stack, s_ds_mask & solve_ok,
                                   surf_grid, q_w, t_w, cfg)
        q_w, t_w, stats = solver.lm_solve((edges, planes), q_w, t_w,
                                          cfg.map_lm_iters, cfg.huber_delta)
        n_edge = jnp.sum(edges.mask)
        n_plane = jnp.sum(planes.mask)

    # transformUpdate (:148-152)
    q_wmap_wodom = geo.qmul(q_w, geo.qconj(q_wodom))
    t_wmap_wodom = t_w - geo.qrot(q_wmap_wodom, t_wodom)

    # insert the stacks into the map (:736-784), reclaiming reused slots once
    c_map_pts = geo.qrot(q_w, corner_stack) + t_w
    s_map_pts = geo.qrot(q_w, surf_stack) + t_w
    all_w = jnp.concatenate([world_cube(c_map_pts, cfg),
                             world_cube(s_map_pts, cfg)])
    all_m = jnp.concatenate([c_ds_mask, s_ds_mask])
    cube_coord, corner_cnt0, surf_cnt0 = _reclaim_slots(
        state.cube_coord, state.corner_cnt, state.surf_cnt, all_w, all_m, cfg)
    corner_xyz, corner_int, corner_cnt, o1 = _insert_points(
        state.corner_xyz, state.corner_int, corner_cnt0,
        c_map_pts, corner_stack_int, c_ds_mask, cfg, cfg.cube_corner_cap)
    surf_xyz, surf_int, surf_cnt, o2 = _insert_points(
        state.surf_xyz, state.surf_int, surf_cnt0,
        s_map_pts, surf_stack_int, s_ds_mask, cfg, cfg.cube_surf_cap)

    # re-downsample the local cubes (:787-801)
    corner_xyz, corner_int, corner_cnt = _redownsample_cubes(
        corner_xyz, corner_int, corner_cnt, slots, cube_coord,
        cfg.line_resolution, cfg.cube_corner_cap, cfg,
        cfg.from_map_corner_cap + cfg.corner_stack_cap)
    surf_xyz, surf_int, surf_cnt = _redownsample_cubes(
        surf_xyz, surf_int, surf_cnt, slots, cube_coord,
        cfg.plane_resolution, cfg.cube_surf_cap, cfg,
        cfg.from_map_surf_cap + cfg.surf_stack_cap)

    new_state = MapState(
        corner_xyz=corner_xyz, corner_int=corner_int, corner_cnt=corner_cnt,
        surf_xyz=surf_xyz, surf_int=surf_int, surf_cnt=surf_cnt,
        cube_coord=cube_coord,
        q_wmap_wodom=q_wmap_wodom, t_wmap_wodom=t_wmap_wodom,
        q_w=q_w, t_w=t_w)
    metrics = MapMetrics(
        from_map_corner=n_map_corner, from_map_surf=n_map_surf,
        corner_factors=n_edge, surf_factors=n_plane, solved=solve_ok,
        overflow=gather_drop + dc + ds_ + o1 + o2)
    return new_state, metrics
