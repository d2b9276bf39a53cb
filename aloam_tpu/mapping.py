"""Scan-to-map refinement on a persistent voxel-hash world map (C14-C24).

Re-design of ``/root/reference/src/laserMapping.cpp``. The reference keeps a
21×21×11 array of 50 m map cubes that it rolls when the pose nears a
boundary (:323-507), gathers into per-frame KD-trees (:531-559), appends to,
and re-voxelizes (:736-801) — every frame. Here the map is a persistent
spatial-hash grid of voxel centroids (``ops/gridmap.py``) that is
query-ready at all times: no per-frame gather, no tree build, no cube
rolling. Insert-time voxel merging reproduces the reference's iterated
re-voxelization centroids; distance-based eviction reproduces the rolling
window's discard semantics (see gridmap's docstring for the exact mapping).

The associations keep the reference's math: 5-NN gated at 1.0 m², 3×3
covariance PCA for line features (λ₂ > 3λ₁, virtual points at ±0.1 m,
:577-640), least-squares plane fits with the 0.2 m inlier check (:642-705),
two rounds × ≤4 LM iterations (:562,:715), and the odom→map correction
chain transformAssociateToMap / transformUpdate (:142-152).
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import solver
from aloam_tpu.config import AloamConfig
from aloam_tpu.ops import gridmap
from aloam_tpu.types import PointCloud
from aloam_tpu.frontend.voxel import voxel_downsample_masked


class MapState(NamedTuple):
    corner: gridmap.GridMap
    surf: gridmap.GridMap
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
    overflow: jnp.ndarray   # capacity losses (stack truncation, full buckets)
    evicted: jnp.ndarray    # rolling-window discards (normal once moving)
    degenerate: jnp.ndarray  # clamped / non-finite LM iterations (all rounds)
    # queries whose knn base cell crossed a 2 m boundary between solver
    # rounds — the only deviation of the round-2 cache reuse vs the
    # reference's per-round re-search (laserMapping.cpp:562-727); ~0 in
    # practice (sub-cell pose deltas), asserted by the e2e tests
    cache_crossed: jnp.ndarray = 0  # plain int default: no backend init


def _fused_insert() -> bool:
    """ALOAM_FUSED_INSERT=0 restores the voxel_downsample+insert_b
    two-call form for on-chip A/B. Read at trace time — set it before
    the first step compile of the process (jit caches the traced
    branch), like ALOAM_DISABLE_PALLAS."""
    return _os.environ.get("ALOAM_FUSED_INSERT", "1") != "0"


def init_state(cfg: AloamConfig) -> MapState:
    return MapState(
        corner=gridmap.empty(cfg.map_table_corner, cfg.map_bucket_corner),
        surf=gridmap.empty(cfg.map_table_surf, cfg.map_bucket_surf),
        q_wmap_wodom=geo.qidentity(), t_wmap_wodom=jnp.zeros(3, jnp.float32),
        q_w=geo.qidentity(), t_w=jnp.zeros(3, jnp.float32))


def _window_cells(cfg: AloamConfig) -> jnp.ndarray:
    """Half-extent of the reference's rolling map window
    (21×21×11 cubes × 50 m, laserMapping.cpp:77-82) in grid cells."""
    import numpy as np
    half = np.array([cfg.cube_width, cfg.cube_height, cfg.cube_depth]) \
        * cfg.cube_size / 2.0
    return jnp.asarray(np.ceil(half / cfg.knn_cell), jnp.int32)


def _eager_evict_count(state: "MapState", pose_cell: jnp.ndarray,
                       cfg: AloamConfig):
    """Rolling-window discard + local-map census at the top of the
    mapping step — the eager analog of the reference's cube shift
    (laserMapping.cpp:323-507) fused with the 5×5×3-cube point count
    that gates the solve (:531-554): one table pass per class instead of
    two (gridmap.evict_and_count). Returns
    (state, n_cleared, n_map_corner, n_map_surf); with
    ``cfg.eager_window_evict`` False the discard is skipped (lazy mode:
    stale entries persist until insert-time bucket pressure) and only
    the census runs."""
    window = _window_cells(cfg)
    local = _local_cells(cfg)
    corner, n_c, near_c = gridmap.evict_and_count(
        state.corner, pose_cell, window, local, cfg.eager_window_evict)
    surf, n_s, near_s = gridmap.evict_and_count(
        state.surf, pose_cell, window, local, cfg.eager_window_evict)
    return state._replace(corner=corner, surf=surf), \
        (n_c + n_s).astype(jnp.int32), near_c, near_s


def _local_cells(cfg: AloamConfig) -> jnp.ndarray:
    """Half-extent of the reference's *local* 5×5×3-cube gather around the
    pose cube (I±2, J±2, K±1 of 50 m cubes, laserMapping.cpp:509-529) in
    grid cells — the neighborhood whose point counts gate the solve
    (laserMapping.cpp:554)."""
    import numpy as np
    half = np.array([2.5, 2.5, 1.5]) * cfg.cube_size
    return jnp.asarray(np.ceil(half / cfg.knn_cell), jnp.int32)


def _assoc_kw(cfg: AloamConfig) -> dict:
    return dict(plane_tol=cfg.map_plane_tol, eigen_ratio=cfg.map_eigen_ratio,
                half_len=cfg.map_edge_half_len)


def _factors_of(out8, stack_xyz, kind: str):
    """Unpack ops/pallas_assoc.py's packed (…, 8) factor columns."""
    if kind == "corner":
        return solver.EdgeFactors(p=stack_xyz, a=out8[..., 0:3],
                                  b=out8[..., 3:6], mask=out8[..., 6] > 0)
    return solver.PlaneFactors(p=stack_xyz, n=out8[..., 0:3],
                               d=out8[..., 3], mask=out8[..., 4] > 0)


def corner_associations(stack_xyz, stack_mask, grid: gridmap.GridMap,
                        q, t, cfg: AloamConfig) -> solver.EdgeFactors:
    """Map-frame edge factors via gated 5-NN PCA (laserMapping.cpp:577-640):
    if λ₂ > 3λ₁ the neighborhood is a line; emit virtual points at
    centroid ± 0.1·direction. The fit itself lives in
    ops/pallas_assoc.assoc_xla — ONE implementation shared by every
    association path (single, batched-XLA; the fused TPU kernel is its
    interpret-pinned twin)."""
    from aloam_tpu.ops import pallas_assoc
    sel = geo.qrot(q, stack_xyz) + t
    d2, near = gridmap.knn(grid, sel, 5, cfg.knn_cell, cfg.knn_radius,
                           cfg.map_query_chunk)
    # masked-out rows: poison d2 so the shared fit gates (and zeroes) them
    d2 = jnp.where(stack_mask[:, None], d2, jnp.inf)
    out8 = pallas_assoc.assoc_xla(d2, near, cfg.map_knn_gate_sq, "corner",
                                  **_assoc_kw(cfg))
    return _factors_of(out8, stack_xyz, "corner")


def surf_associations(stack_xyz, stack_mask, grid: gridmap.GridMap,
                      q, t, cfg: AloamConfig) -> solver.PlaneFactors:
    """Map-frame plane factors via gated 5-NN LSQ plane fit
    (laserMapping.cpp:642-705): solve A·n = -1, normalize, keep the plane
    iff every neighbor is within 0.2 m. Shared fit: see
    corner_associations."""
    from aloam_tpu.ops import pallas_assoc
    sel = geo.qrot(q, stack_xyz) + t
    d2, near = gridmap.knn(grid, sel, 5, cfg.knn_cell, cfg.knn_radius,
                           cfg.map_query_chunk)
    d2 = jnp.where(stack_mask[:, None], d2, jnp.inf)
    out8 = pallas_assoc.assoc_xla(d2, near, cfg.map_knn_gate_sq, "surf",
                                  **_assoc_kw(cfg))
    return _factors_of(out8, stack_xyz, "surf")


def _associations_b(stack_xyz, stack_mask, grid, q, t,
                    cfg: AloamConfig, kind: str, cache=None):
    """Batched associations over input-ordered stacks (the pre-round-3
    interface, kept for the single-call API and A/B profiling; the
    pipeline's hot path is _assoc_out8_b over cell-sorted stacks).
    Returns (factors, n_spilled, cache); see KnnCache for the reuse
    contract. Masked-out queries ride the spill slot (+inf d2 -> gated,
    zero-fit), identical to the shared fit's poison semantics."""
    from aloam_tpu.ops import pallas_assoc
    sel = geo.qrot(q[:, None, :], stack_xyz) + t[:, None, :]
    if cache is None:
        cache = gridmap.knn_cache_b(grid, sel, cfg.knn_cell,
                                    cfg.knn_radius, cfg.map_cell_cap)
    cid_p = jnp.where(stack_mask, cache.cid, cache.cell_cap)
    d2, near, spilled = gridmap.knn_from_cache_b(
        cache._replace(cid=cid_p), sel, 5, cfg.map_query_chunk)
    out8 = pallas_assoc.assoc_xla(d2, near, cfg.map_knn_gate_sq, kind,
                                  **_assoc_kw(cfg))
    return _factors_of(out8, stack_xyz, kind), spilled, cache


def corner_associations_b(stack_xyz, stack_mask, grid: gridmap.GridMap,
                          q, t, cfg: AloamConfig, cache=None):
    """Batched corner_associations (shared fit: see corner_associations)."""
    return _associations_b(stack_xyz, stack_mask, grid, q, t, cfg,
                           "corner", cache)


def surf_associations_b(stack_xyz, stack_mask, grid: gridmap.GridMap,
                        q, t, cfg: AloamConfig, cache=None):
    """Batched surf_associations (shared fit: see corner_associations)."""
    return _associations_b(stack_xyz, stack_mask, grid, q, t, cfg,
                           "surf", cache)


def _assoc_out8_b(sel, poison, cache: gridmap.KnnCache,
                  cfg: AloamConfig, kind: str,
                  force_kernel_interpret: bool = False):
    """One fused association round over CELL-SORTED queries.

    sel (B, Q, 3) world-frame queries in the cache's sorted order;
    poison (B, Q) True masks a query out (gate forced shut — identical to
    the XLA path's zeroed-neighbor semantics). Returns (out8, n_spilled):
    the packed (B, Q, 8) factor columns of ops/pallas_assoc.py plus the
    scalar count of live queries lost to the CSPAN window cap
    (gridmap.ASSOC_CSPAN; always 0 when the cap is off) — callers fold it
    into the overflow metric, never silent.

    On TPU this is the fully fused kernel (cell-window DMA + one-hot
    broadcast + select + fit, ops/pallas_assoc.assoc_cell); elsewhere an
    XLA pipeline with identical semantics on the same sorted inputs
    (interpret-mode tests + the bench's on-chip assertion pin the two
    paths together) — CSPAN spills are poisoned identically in both
    branches."""
    from aloam_tpu.ops import pallas_assoc
    from aloam_tpu.ops.pallas_gate import use_pallas
    kw = _assoc_kw(cfg)
    # spilled queries sit at the spill/pad slot, whose rows hold cell
    # (0,0,0)'s REAL bucket block — poison them (the +inf-d2 routing the
    # XLA path applies internally), or an origin-adjacent spilled query
    # would emit factors from the wrong cell neighborhood
    poison = poison | (cache.cid_sorted >= cache.cell_cap)

    # tile structure (shared by the kernel branch and the CSPAN spill
    # accounting): per-stream queries padded to TQ-multiples, flattened
    # with stream offsets so tiles never straddle streams
    bsz, q_n0 = sel.shape[:2]
    tq = gridmap.ASSOC_TQ
    # env (sweeps) wins over the config field; both static at trace time
    cspan = gridmap.ASSOC_CSPAN or cfg.assoc_cspan
    assert cspan % 8 == 0 and 0 <= cspan <= tq, (cspan, tq)
    crows = cache.cand_flat.shape[1]            # cell_cap + ASSOC_PAD
    cid_sorted = cache.cid_sorted
    q_pad = (-q_n0) % tq                        # per-stream tile alignment
    q_n = q_n0 + q_pad
    pad_sel, pad_poison = sel, poison
    if q_pad:
        # pad queries poisoned, pad cids with the stream's LAST value
        # (keeps cid non-decreasing and the tile's cell span <= tq)
        pad_sel = jnp.pad(sel, ((0, 0), (0, q_pad), (0, 0)))
        pad_poison = jnp.pad(poison, ((0, 0), (0, q_pad)),
                             constant_values=True)
        cid_sorted = jnp.concatenate(
            [cid_sorted,
             jnp.repeat(cid_sorted[:, -1:], q_pad, axis=1)], axis=1)
    cid_flat = (cid_sorted
                + (jnp.arange(bsz, dtype=jnp.int32) * crows)[:, None]
                ).reshape(bsz * q_n)
    cid0 = cid_flat[::tq]                       # (B·Q/tq,)
    local = (cid_flat - jnp.repeat(cid0, tq)).astype(jnp.float32)

    n_spilled = jnp.int32(0)
    if cspan and cspan < tq:
        # the kernel's clipped window starts at align8(cid0): a query
        # whose align8-local index reaches past cspan + 8 gets no factors
        rem = (cid0 - 8 * jnp.floor_divide(cid0, 8)).astype(jnp.float32)
        spill = (local + jnp.repeat(rem, tq)) >= float(cspan + 8)
        spill = spill.reshape(bsz, q_n) & ~pad_poison
        n_spilled = jnp.sum(spill).astype(jnp.int32)
        pad_poison = pad_poison | spill
        poison = pad_poison[:, :q_n0]

    # force_kernel_interpret: tests exercise the FULL kernel-branch
    # plumbing (padding, cid0/local windows, poison routing) on CPU via
    # the interpret-mode kernel — the branch a backend check would hide
    if use_pallas("assoc") or force_kernel_interpret:
        q8 = jnp.concatenate(
            [pad_sel.reshape(bsz * q_n, 3),
             pad_poison.reshape(bsz * q_n, 1).astype(jnp.float32),
             local[:, None],
             jnp.zeros((bsz * q_n, 3), jnp.float32)], axis=-1)
        out8 = pallas_assoc.assoc_cell(
            cache.cand_flat.reshape(bsz * crows, -1), cid0, q8, kind,
            cfg.map_knn_gate_sq, tq=tq, cspan=cspan,
            interpret=force_kernel_interpret, **kw)
        return out8.reshape(bsz, q_n, 8)[:, :q_n0], n_spilled
    # XLA fallback: poisoned queries routed to the spill slot (same
    # +inf-d2 semantics as the kernel's poison channel; CSPAN spills
    # were already folded into `poison` above)
    cid_p = jnp.where(poison, cache.cell_cap, cache.cid_sorted)
    d2, near, _ = gridmap.knn_from_cache_b(
        cache._replace(cid=cid_p), sel, 5, cfg.map_query_chunk)
    out8 = pallas_assoc.assoc_xla(d2, near, cfg.map_knn_gate_sq, kind, **kw)
    return out8, n_spilled


def mapping_step_b(state: MapState, corner_in: PointCloud,
                   surf_in: PointCloud, q_wodom, t_wodom,
                   cfg: AloamConfig):
    """Batched mapping_step: state leaves (B, ·), clouds (B, N, ·).
    Per-stream semantics identical to mapping_step; all gathers/scatters go
    through the flat batched kernels. Metrics fields are (B,) vectors.

    The association rounds run over CELL-SORTED stacks (the order
    ``gridmap.knn_cache_b``'s build sort produces): the LM solver and all
    metrics reduce over factors order-independently, so no per-query
    unsort is ever paid, and the fused kernel's contiguous cell-window
    DMA applies. The insert path is order-independent too (it re-sorts by
    bucket)."""
    from aloam_tpu.frontend.voxel import voxel_downsample_masked_b

    q_w = geo.qmul(state.q_wmap_wodom, q_wodom)
    t_w = geo.qrot(state.q_wmap_wodom, t_wodom) + state.t_wmap_wodom

    pose_cell = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)
    state, cleared, n_map_corner, n_map_surf = _eager_evict_count(
        state, pose_cell, cfg)
    solve_ok = (n_map_corner > cfg.map_min_corner) \
        & (n_map_surf > cfg.map_min_surf)

    c_vals = jnp.concatenate([corner_in.xyz, corner_in.intensity[..., None]],
                             axis=-1)
    c_ds, c_ds_mask, dc = voxel_downsample_masked_b(
        c_vals, corner_in.mask, cfg.line_resolution, cfg.corner_stack_cap)
    s_vals = jnp.concatenate([surf_in.xyz, surf_in.intensity[..., None]],
                             axis=-1)
    s_ds, s_ds_mask, ds_ = voxel_downsample_masked_b(
        s_vals, surf_in.mask, cfg.plane_resolution, cfg.surf_stack_cap)
    corner_stack, c_int = c_ds[..., :3], c_ds[..., 3]
    surf_stack, s_int = s_ds[..., :3], s_ds[..., 3]

    lm_b = lambda e, p, qq, tt: solver.lm_solve_b(  # noqa: E731
        e, p, qq, tt, cfg.map_lm_iters, cfg.huber_delta)
    n_edge = n_plane = None
    degen = jnp.zeros(q_w.shape[0], jnp.int32)
    spills = jnp.int32(0)
    crossed = jnp.zeros(q_w.shape[0], jnp.int32)
    cells0 = None
    c_cache = s_cache = None

    def build_cache(grid_s, stack, inten, m, qq, tt):
        """Cache build + the cell sort, carrying the stack through it."""
        sel0 = geo.qrot(qq[:, None, :], stack) + tt[:, None, :]
        cache, (sx, sy, sz, it, mi) = gridmap.knn_cache_b(
            grid_s, sel0, cfg.knn_cell, cfg.knn_radius, cfg.map_cell_cap,
            payloads=(stack[..., 0], stack[..., 1], stack[..., 2],
                      inten, m.astype(jnp.int32)))
        return cache, jnp.stack([sx, sy, sz], -1), it, mi > 0

    for rnd in range(cfg.map_outer_rounds):
        # round 2+ reuses round 1's candidate blocks (cfg.map_cache_reuse):
        # the reference re-runs its kd-tree search each round
        # (laserMapping.cpp:562-727). A query whose shifted base cell
        # crossed a 2 m boundary mid-solve sees a stale block — its
        # returned neighbors are still genuinely within the 1 m² gate
        # (distances use the true refined position) but may be a
        # suboptimal 5-subset. Measured rate: ~5-10% of queries while the
        # warm start is still coarse, ~0 at steady state; counted in
        # MapMetrics.cache_crossed, and map_cache_reuse=False restores
        # exact per-round re-search
        if c_cache is None or not cfg.map_cache_reuse:
            c_cache, corner_stack, c_int, c_ds_mask = build_cache(
                state.corner, corner_stack, c_int, c_ds_mask, q_w, t_w)
            s_cache, surf_stack, s_int, s_ds_mask = build_cache(
                state.surf, surf_stack, s_int, s_ds_mask, q_w, t_w)
            spills = spills + c_cache.n_spilled + s_cache.n_spilled
        # one world-frame rotation per class per round, shared by the
        # cache_crossed diagnostic and the association itself
        sel_c = geo.qrot(q_w[:, None, :], corner_stack) + t_w[:, None, :]
        sel_s = geo.qrot(q_w[:, None, :], surf_stack) + t_w[:, None, :]
        # quantify the cache-reuse deviation (see MapMetrics.cache_crossed):
        # a query participates in the deviation iff its shifted base cell
        # moved between rounds — count those, elementwise, no gathers
        # (only meaningful while the stack order is round-stable, i.e.
        # when the cache is reused)
        if cfg.map_cache_reuse:
            cc = gridmap._cells_of(sel_c - cfg.knn_radius, cfg.knn_cell)
            sc = gridmap._cells_of(sel_s - cfg.knn_radius, cfg.knn_cell)
            if rnd == 0:
                cells0 = (cc, sc)
            else:
                crossed = crossed + jnp.sum(
                    jnp.any(cc != cells0[0], axis=-1)
                    & c_ds_mask & solve_ok[:, None], axis=1) + jnp.sum(
                    jnp.any(sc != cells0[1], axis=-1)
                    & s_ds_mask & solve_ok[:, None], axis=1)
        c8, csp = _assoc_out8_b(sel_c, ~(c_ds_mask & solve_ok[:, None]),
                                c_cache, cfg, "corner")
        s8, ssp = _assoc_out8_b(sel_s, ~(s_ds_mask & solve_ok[:, None]),
                                s_cache, cfg, "surf")
        spills = spills + csp + ssp
        edges = _factors_of(c8, corner_stack, "corner")
        planes = _factors_of(s8, surf_stack, "surf")
        q_w, t_w, stats = lm_b(edges, planes, q_w, t_w)
        degen = degen + stats.clamped + stats.nonfinite
        n_edge = jnp.sum(edges.mask, axis=1)
        n_plane = jnp.sum(planes.mask, axis=1)

    q_wmap_wodom = geo.qmul(q_w, geo.qconj(q_wodom))
    t_wmap_wodom = t_w - geo.qrot(q_wmap_wodom, t_wodom)

    window = _window_cells(cfg)
    center = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)

    # fused map-frame re-voxelize + insert (gridmap.insert_vds_b — one
    # sort cheaper per class than the prep(voxel_downsample)+insert_b
    # form it is pinned bit-exact against; the prep compaction never
    # dropped: out_cap == the stack cap). ALOAM_FUSED_INSERT=0 restores
    # the two-call form for on-chip A/B (per-process: read at trace time)
    def ins(grid_s, stack, inten, m, leaf):
        pts_w = geo.qrot(q_w[:, None, :], stack) + t_w[:, None, :]
        if _fused_insert():
            return gridmap.insert_vds_b(
                grid_s, pts_w, inten, m, leaf, cfg.knn_cell, center,
                window, cfg.map_insert_point_cap, cfg.map_insert_cell_cap)
        vals = jnp.concatenate([pts_w, inten[..., None]], axis=-1)
        out, om, _ = voxel_downsample_masked_b(vals, m, leaf, m.shape[1])
        return gridmap.insert_b(
            grid_s, out[..., :3], out[..., 3], om, leaf, cfg.knn_cell,
            center, window, cfg.map_insert_point_cap,
            cfg.map_insert_cell_cap)

    corner, _, _, ev1, dr1 = ins(state.corner, corner_stack, c_int,
                                 c_ds_mask, cfg.line_resolution)
    surf, _, _, ev2, dr2 = ins(state.surf, surf_stack, s_int,
                               s_ds_mask, cfg.plane_resolution)

    new_state = MapState(
        corner=corner, surf=surf,
        q_wmap_wodom=q_wmap_wodom, t_wmap_wodom=t_wmap_wodom,
        q_w=q_w, t_w=t_w)
    metrics = MapMetrics(
        from_map_corner=n_map_corner, from_map_surf=n_map_surf,
        corner_factors=n_edge, surf_factors=n_plane, solved=solve_ok,
        overflow=(dc + ds_) + dr1 + dr2 + spills,
        evicted=ev1 + ev2 + cleared, degenerate=degen,
        cache_crossed=crossed)
    return new_state, metrics


def extract_map_cloud(state: MapState, cfg: AloamConfig):
    """Host-side full-map extraction — the /laser_cloud_map equivalent
    (laserMapping.cpp:823-836). Returns (corner (N,3), surf (M,3)) numpy."""
    c, _ = gridmap.extract(state.corner)
    s, _ = gridmap.extract(state.surf)
    return c, s


def extract_surround(state: MapState, cfg: AloamConfig):
    """Host-side local-neighborhood extraction around the latest pose — the
    /laser_cloud_surround equivalent (laserMapping.cpp:806-821): entries
    within the 5×5×2.5-cube neighborhood of the pose."""
    import numpy as np

    half = np.array([2.5, 2.5, 1.5]) * cfg.cube_size
    t = np.asarray(state.t_w)

    def near(grid):
        pts, _ = gridmap.extract(grid)
        keep = np.all(np.abs(pts - t) <= half, axis=1)
        return pts[keep]

    return near(state.corner), near(state.surf)


def mapping_step(state: MapState, corner_in: PointCloud,
                 surf_in: PointCloud, q_wodom, t_wodom,
                 cfg: AloamConfig):
    """One mapping frame (laserMapping.cpp process(), :231-888).

    Returns (new_state, metrics); the refined pose is new_state.(q_w, t_w).
    """
    # initial guess from the odometry pose (transformAssociateToMap, :142-146)
    q_w = geo.qmul(state.q_wmap_wodom, q_wodom)
    t_w = geo.qrot(state.q_wmap_wodom, t_wodom) + state.t_wmap_wodom

    # map-support gate (:554): like the reference, count map points in the
    # local 5×5×3-cube neighborhood of the (initial-guess) pose — after a
    # teleport/revisit far from map mass the solve is skipped and the
    # odometry prior held, exactly as laserMapping.cpp:554,730-733 would
    pose_cell = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)
    state, cleared, n_map_corner, n_map_surf = _eager_evict_count(
        state, pose_cell, cfg)
    solve_ok = (n_map_corner > cfg.map_min_corner) \
        & (n_map_surf > cfg.map_min_surf)

    # input stack downsample (:542-550), sensor frame like the reference
    c_vals = jnp.concatenate([corner_in.xyz, corner_in.intensity[:, None]],
                             axis=-1)
    c_ds, c_ds_mask, dc = voxel_downsample_masked(
        c_vals, corner_in.mask, cfg.line_resolution, cfg.corner_stack_cap)
    s_vals = jnp.concatenate([surf_in.xyz, surf_in.intensity[:, None]],
                             axis=-1)
    s_ds, s_ds_mask, ds_ = voxel_downsample_masked(
        s_vals, surf_in.mask, cfg.plane_resolution, cfg.surf_stack_cap)
    corner_stack = c_ds[:, :3]
    surf_stack = s_ds[:, :3]

    n_edge = jnp.int32(0)
    n_plane = jnp.int32(0)
    degen = jnp.int32(0)
    crossed = jnp.int32(0)
    cells0 = None
    for rnd in range(cfg.map_outer_rounds):
        # same boundary-crossing diagnostic as mapping_step_b (the metric
        # is pose-delta-driven, so it is meaningful — and comparable in
        # the batched-equivalence tests — even though this path re-runs
        # the exact search every round)
        sel_c = geo.qrot(q_w[None, :], corner_stack) + t_w[None, :]
        sel_s = geo.qrot(q_w[None, :], surf_stack) + t_w[None, :]
        cc = gridmap._cells_of(sel_c - cfg.knn_radius, cfg.knn_cell)
        sc = gridmap._cells_of(sel_s - cfg.knn_radius, cfg.knn_cell)
        if rnd == 0:
            cells0 = (cc, sc)
        else:
            crossed = crossed + jnp.sum(
                jnp.any(cc != cells0[0], axis=-1)
                & c_ds_mask & solve_ok) + jnp.sum(
                jnp.any(sc != cells0[1], axis=-1)
                & s_ds_mask & solve_ok)
        edges = corner_associations(corner_stack, c_ds_mask & solve_ok,
                                    state.corner, q_w, t_w, cfg)
        planes = surf_associations(surf_stack, s_ds_mask & solve_ok,
                                   state.surf, q_w, t_w, cfg)
        q_w, t_w, stats = solver.lm_solve((edges, planes), q_w, t_w,
                                          cfg.map_lm_iters, cfg.huber_delta)
        degen = degen + stats.clamped + stats.nonfinite
        n_edge = jnp.sum(edges.mask)
        n_plane = jnp.sum(planes.mask)

    # transformUpdate (:148-152)
    q_wmap_wodom = geo.qmul(q_w, geo.qconj(q_wodom))
    t_wmap_wodom = t_w - geo.qrot(q_wmap_wodom, t_wodom)

    # insert into the map (:736-801): transform to map frame, re-voxelize on
    # the map-anchored grid (PCL's origin-anchored leaves), then merge/append
    window = _window_cells(cfg)
    center = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)

    # fused re-voxelize + insert, B=1 through the batched kernel so there
    # is exactly one insert semantics (see mapping_step_b's ins())
    def ins(grid_s, stack, inten, m, leaf):
        pts_w = geo.qrot(q_w, stack) + t_w
        if _fused_insert():
            g1 = jax.tree.map(lambda x: x[None], grid_s)
            out = gridmap.insert_vds_b(
                g1, pts_w[None], inten[None], m[None], leaf, cfg.knn_cell,
                center[None], window, cfg.map_insert_point_cap,
                cfg.map_insert_cell_cap)
            return (jax.tree.map(lambda x: x[0], out[0]),) + tuple(
                o[0] for o in out[1:])
        vals = jnp.concatenate([pts_w, inten[:, None]], axis=1)
        out, om, _ = voxel_downsample_masked(vals, m, leaf, m.shape[0])
        return gridmap.insert(
            grid_s, out[:, :3], out[:, 3], om, leaf, cfg.knn_cell,
            center, window, cfg.map_insert_point_cap,
            cfg.map_insert_cell_cap)

    corner, _, _, ev1, dr1 = ins(state.corner, corner_stack, c_ds[:, 3],
                                 c_ds_mask, cfg.line_resolution)
    surf, _, _, ev2, dr2 = ins(state.surf, surf_stack, s_ds[:, 3],
                               s_ds_mask, cfg.plane_resolution)

    new_state = MapState(
        corner=corner, surf=surf,
        q_wmap_wodom=q_wmap_wodom, t_wmap_wodom=t_wmap_wodom,
        q_w=q_w, t_w=t_w)
    metrics = MapMetrics(
        from_map_corner=n_map_corner, from_map_surf=n_map_surf,
        corner_factors=n_edge, surf_factors=n_plane, solved=solve_ok,
        overflow=dc + ds_ + dr1 + dr2,
        evicted=ev1 + ev2 + cleared,
        degenerate=degen, cache_crossed=crossed)
    return new_state, metrics
