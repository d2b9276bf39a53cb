"""Scan-to-scan LiDAR odometry (components C7-C12 of SURVEY.md §2).

Re-design of ``/root/reference/src/laserOdometry.cpp:186-601``: the per-point
KD-tree query + ring-ordered linear walks (:299-483) collapse into one
distance matrix per feature class, from which the 1-NN *and* the
ring-windowed secondary minima come out as masked argmins (the walks' break
conditions are equivalent to integer ring-window constraints because the
previous-frame clouds are ring-major — see SURVEY.md §7.4). Two outer
rounds of correspondence + 4 LM iterations mirror :278/:496, the
constant-velocity warm start mirrors the never-reset ``para_q/para_t``
(:97-98), and pose accumulation mirrors :504-505.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import solver
from aloam_tpu.config import AloamConfig
from aloam_tpu.neighbors import odom_window_mins
from aloam_tpu.types import PointCloud, ScanFeatures

_INF = float("inf")  # plain scalar: jnp constants at import time would init backends


class OdomState(NamedTuple):
    q_w: jnp.ndarray            # odom-frame world pose (laserOdometry.cpp:93)
    t_w: jnp.ndarray
    q_lc: jnp.ndarray           # frame-to-frame curr->last (:97-101)
    t_lc: jnp.ndarray
    corner_last: PointCloud     # previous less-sharp cloud (:554-556)
    surf_last: PointCloud       # previous less-flat cloud (:558-560)
    initialized: jnp.ndarray    # bool scalar (systemInited, :267-271)


class OdomMetrics(NamedTuple):
    corner_corr: jnp.ndarray
    plane_corr: jnp.ndarray
    cost0: jnp.ndarray
    cost: jnp.ndarray
    degenerate: jnp.ndarray  # clamped or non-finite LM iterations (all rounds)


def init_state(cfg: AloamConfig) -> OdomState:
    def empty(cap):
        return PointCloud(xyz=jnp.zeros((cap, 3), jnp.float32),
                          intensity=jnp.zeros((cap,), jnp.float32),
                          mask=jnp.zeros((cap,), bool))
    return OdomState(
        q_w=geo.qidentity(), t_w=jnp.zeros(3, jnp.float32),
        q_lc=geo.qidentity(), t_lc=jnp.zeros(3, jnp.float32),
        corner_last=empty(cfg.less_sharp_cap),
        surf_last=empty(cfg.less_flat_cap),
        initialized=jnp.asarray(False))


def _point_s(pc: PointCloud, cfg: AloamConfig):
    """Per-point time fraction from the intensity encoding
    (s = (intensity - int(intensity)) / SCAN_PERIOD, laserOdometry.cpp:116).
    """
    frac = pc.intensity - jnp.floor(pc.intensity)
    return jnp.clip(frac / cfg.scan_period, 0.0, 1.0)


def _transform_to_start(q, t, pts, s=None):
    """TransformToStart (laserOdometry.cpp:111-129): map current-frame
    points into the last frame; with DISTORTION the pose is interpolated
    per point by its time fraction s."""
    if s is None:  # DISTORTION 0 path: s = 1
        return geo.qrot(q, pts) + t
    qs, ts = solver._interp_pose(q, t, s)
    return geo.qrot(qs, pts) + ts


def transform_to_end(pc: PointCloud, q, t, cfg: AloamConfig) -> PointCloud:
    """TransformToEnd (laserOdometry.cpp:131-148): undistort a cloud to the
    sweep-end frame — first to the sweep start by the per-point interpolated
    pose, then by the full inverse — and strip the fractional time from the
    intensity encoding (:146). The reference keeps the equivalent handoff
    re-projection under ``if (0)`` (:533-552); with the DISTORTION path
    active it is required for a consistent frame chain, so here it runs
    whenever cfg.distortion is set."""
    s = _point_s(pc, cfg)
    un = _transform_to_start(q, t, pc.xyz, s)
    end = geo.qrot_inv(q, un - t)
    return pc._replace(xyz=end, intensity=jnp.floor(pc.intensity))


def edge_correspondences(sharp: PointCloud, last: PointCloud,
                         q, t, cfg: AloamConfig) -> solver.EdgeFactors:
    """Corner correspondences (laserOdometry.cpp:299-384): 1-NN gated at
    25 m², plus the closest point on a *different* ring within ±2 rings
    (±NEARBY_SCAN = 2.5 on integer ring IDs), gated at 25 m².

    Streamed over reference chunks (O(Q·chunk) memory) so batched streams
    fit HBM; results are identical to the dense distance matrix."""
    s = _point_s(sharp, cfg) if cfg.distortion else None
    sel = _transform_to_start(q, t, sharp.xyz, s)
    d2_nn, nn, d2_diff, idx2 = odom_window_mins(
        sel, last.xyz, last.mask, last.ring(), int(cfg.nearby_scan),
        want_same_ring=False, chunk=cfg.knn_chunk)
    gate1 = d2_nn < cfg.dist_sq_threshold
    gate2 = d2_diff < cfg.dist_sq_threshold

    valid = sharp.mask & gate1 & gate2
    return solver.EdgeFactors(p=sharp.xyz, a=last.xyz[nn],
                              b=last.xyz[idx2], mask=valid, s=s)


def plane_correspondences(flat: PointCloud, last: PointCloud,
                          q, t, cfg: AloamConfig) -> solver.PlaneFactors:
    """Surf correspondences (laserOdometry.cpp:387-483): 1-NN gated at 25 m²,
    closest *same-ring* point (minPointInd2) and closest point within ±2
    *other* rings (minPointInd3), both gated at 25 m²; the plane normal is
    (j−l)×(j−m) normalized (lidarFactor.hpp:64-65). Streamed like
    edge_correspondences."""
    s = _point_s(flat, cfg) if cfg.distortion else None
    sel = _transform_to_start(q, t, flat.xyz, s)
    d2_nn, nn, val3, idx3, val2, idx2 = odom_window_mins(
        sel, last.xyz, last.mask, last.ring(), int(cfg.nearby_scan),
        want_same_ring=True, chunk=cfg.knn_chunk)
    gate1 = d2_nn < cfg.dist_sq_threshold

    valid = flat.mask & gate1 \
        & (val2 < cfg.dist_sq_threshold) & (val3 < cfg.dist_sq_threshold)

    a = last.xyz[nn]
    n = jnp.cross(a - last.xyz[idx2], a - last.xyz[idx3])
    n_norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(n_norm, 1e-12)
    # degenerate (collinear) triples produce a meaningless normal: drop them
    valid = valid & (n_norm[:, 0] > 1e-6)
    d = -jnp.sum(n * a, axis=-1)
    return solver.PlaneFactors(p=flat.xyz, n=n, d=d, mask=valid, s=s)


def _interp_pose_b(q, t, s):
    """Batched _interp_pose: q (B,4), t (B,3), s (B,N)."""
    b, n = s.shape
    qs = geo.slerp(jnp.broadcast_to(geo.qidentity(), (b, n, 4)),
                   jnp.broadcast_to(q[:, None, :], (b, n, 4)), s)
    return qs, s[..., None] * t[:, None, :]


def _transform_to_start_b(q, t, pts, s=None):
    """Batched TransformToStart: q (B,4), t (B,3), pts (B,N,3)."""
    if s is None:
        return geo.qrot(q[:, None, :], pts) + t[:, None, :]
    qs, ts = _interp_pose_b(q, t, s)
    return geo.qrot(qs, pts) + ts


def transform_to_end_b(pc: PointCloud, q, t, cfg: AloamConfig) -> PointCloud:
    """Batched transform_to_end."""
    s = _point_s(pc, cfg)
    un = _transform_to_start_b(q, t, pc.xyz, s)
    end = geo.qrot_inv(q[:, None, :], un - t[:, None, :])
    return pc._replace(xyz=end, intensity=jnp.floor(pc.intensity))


def _frontend_ring_seg(last: PointCloud, seg: int, cfg: AloamConfig) -> int:
    """Static ring-segment stride of a frontend ring_heads cloud. ONLY
    valid for odometry-state handoff clouds (``OdomState.corner_last`` /
    ``surf_last``), which are always ``features.ring_heads`` outputs —
    ring r's points live in rows [r*seg, (r+1)*seg), tail rows are padding
    (mask False, poisoned in the kernel). Callers with any other cloud
    must pass ring_seg=0 to the correspondence functions (exhaustive scan,
    always correct); provenance cannot be inferred from capacity alone
    (advisor round 3), so this helper is called only from odometry_step_b
    where the invariant is constructed.

    ``ALOAM_ODOM_RING_SEG=0`` force-disables the chunk-skip for perf
    A/B runs (read at trace time: set it before the process's first
    odometry trace, not mid-run)."""
    if os.environ.get("ALOAM_ODOM_RING_SEG") == "0":
        return 0
    assert last.xyz.shape[-2] >= cfg.scan_lines * seg, \
        (last.xyz.shape, cfg.scan_lines, seg)
    return seg


def edge_correspondences_b(sharp: PointCloud, last: PointCloud,
                           q, t, cfg: AloamConfig,
                           ring_seg: int = 0) -> solver.EdgeFactors:
    """Batched edge_correspondences (leaves carry a leading stream axis).

    ring_seg > 0 declares ``last`` ring_heads-segmented (ring r's points
    only in rows [r*ring_seg, (r+1)*ring_seg)) — lets the kernel skip
    pass-2 chunks outside the NN ring window (pallas_odom.window_mins).
    The default 0 is exhaustive and correct for any cloud."""
    from aloam_tpu.neighbors import odom_window_mins_b
    from aloam_tpu.utils.batch import bgather
    s = _point_s(sharp, cfg) if cfg.distortion else None
    sel = _transform_to_start_b(q, t, sharp.xyz, s)
    d2_nn, nn, d2_diff, idx2 = odom_window_mins_b(
        sel, last.xyz, last.mask, last.ring(), int(cfg.nearby_scan),
        want_same_ring=False, chunk=cfg.knn_chunk, ring_seg=ring_seg)
    valid = sharp.mask & (d2_nn < cfg.dist_sq_threshold) \
        & (d2_diff < cfg.dist_sq_threshold)
    return solver.EdgeFactors(p=sharp.xyz, a=bgather(last.xyz, nn),
                              b=bgather(last.xyz, idx2), mask=valid, s=s)


def plane_correspondences_b(flat: PointCloud, last: PointCloud,
                            q, t, cfg: AloamConfig,
                            ring_seg: int = 0) -> solver.PlaneFactors:
    """Batched plane_correspondences (ring_seg as edge_correspondences_b)."""
    from aloam_tpu.neighbors import odom_window_mins_b
    from aloam_tpu.utils.batch import bgather
    s = _point_s(flat, cfg) if cfg.distortion else None
    sel = _transform_to_start_b(q, t, flat.xyz, s)
    d2_nn, nn, val3, idx3, val2, idx2 = odom_window_mins_b(
        sel, last.xyz, last.mask, last.ring(), int(cfg.nearby_scan),
        want_same_ring=True, chunk=cfg.knn_chunk, ring_seg=ring_seg)
    valid = flat.mask & (d2_nn < cfg.dist_sq_threshold) \
        & (val2 < cfg.dist_sq_threshold) & (val3 < cfg.dist_sq_threshold)

    a = bgather(last.xyz, nn)
    n = jnp.cross(a - bgather(last.xyz, idx2), a - bgather(last.xyz, idx3))
    n_norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(n_norm, 1e-12)
    valid = valid & (n_norm[..., 0] > 1e-6)
    d = -jnp.sum(n * a, axis=-1)
    return solver.PlaneFactors(p=flat.xyz, n=n, d=d, mask=valid, s=s)


def odometry_step_b(state: OdomState, feats: ScanFeatures,
                    cfg: AloamConfig):
    """Batched odometry_step: all state/feature leaves carry a leading
    stream axis. Correspondences use the flat-op batched kernels; the 6-dof
    LM solve has no gathers, so a plain vmap is optimal there."""
    q, t = state.q_lc, state.t_lc
    lm_b = lambda e, p, qq, tt: solver.lm_solve_b(  # noqa: E731
        e, p, qq, tt, cfg.odom_lm_iters, cfg.huber_delta)
    metrics = None
    degen = None
    # state.corner_last/surf_last are always frontend ring_heads outputs
    # (constructed below from feats.less_sharp/less_flat; transform_to_end
    # preserves row layout), so the chunk-skip segment strides hold
    seg_e = _frontend_ring_seg(
        state.corner_last, cfg.n_regions * cfg.max_less_sharp, cfg)
    seg_p = _frontend_ring_seg(
        state.surf_last,
        min(cfg.ring_cap, cfg.less_flat_cap // cfg.scan_lines), cfg)
    for _ in range(cfg.odom_outer_rounds):
        edges = edge_correspondences_b(feats.sharp, state.corner_last,
                                       q, t, cfg, ring_seg=seg_e)
        planes = plane_correspondences_b(feats.flat, state.surf_last,
                                         q, t, cfg, ring_seg=seg_p)
        q, t, stats = lm_b(edges, planes, q, t)
        d = stats.clamped + stats.nonfinite
        degen = d if degen is None else degen + d
        metrics = OdomMetrics(
            corner_corr=jnp.sum(edges.mask, axis=1),
            plane_corr=jnp.sum(planes.mask, axis=1),
            cost0=stats.cost0, cost=stats.cost, degenerate=degen)

    inited = state.initialized[:, None]
    q_lc = jnp.where(inited, q, geo.qidentity())
    t_lc = jnp.where(inited, t, 0.0)
    q_w, t_w = geo.compose(state.q_w, state.t_w, q_lc, t_lc)

    if cfg.distortion:
        corner_last = transform_to_end_b(feats.less_sharp, q_lc, t_lc, cfg)
        surf_last = transform_to_end_b(feats.less_flat, q_lc, t_lc, cfg)
    else:
        corner_last, surf_last = feats.less_sharp, feats.less_flat

    new_state = OdomState(
        q_w=q_w, t_w=t_w, q_lc=q_lc, t_lc=t_lc,
        corner_last=corner_last, surf_last=surf_last,
        initialized=jnp.ones_like(state.initialized))
    return new_state, metrics


def odometry_step(state: OdomState, feats: ScanFeatures,
                  cfg: AloamConfig):
    """One odometry frame. Returns (new_state, metrics).

    The new world pose/clouds in the returned state are what the reference
    publishes to mapping (laserOdometry.cpp:510-591).
    """
    q, t = state.q_lc, state.t_lc  # warm start (constant-velocity prior)
    metrics = None
    degen = jnp.int32(0)
    for _ in range(cfg.odom_outer_rounds):
        edges = edge_correspondences(feats.sharp, state.corner_last,
                                     q, t, cfg)
        planes = plane_correspondences(feats.flat, state.surf_last,
                                       q, t, cfg)
        q, t, stats = solver.lm_solve((edges, planes), q, t,
                                      cfg.odom_lm_iters, cfg.huber_delta)
        degen = degen + stats.clamped + stats.nonfinite
        metrics = OdomMetrics(
            corner_corr=jnp.sum(edges.mask), plane_corr=jnp.sum(planes.mask),
            cost0=stats.cost0, cost=stats.cost, degenerate=degen)

    # first frame: initialization only (laserOdometry.cpp:267-271)
    inited = state.initialized
    q_lc = jnp.where(inited, q, geo.qidentity())
    t_lc = jnp.where(inited, t, jnp.zeros(3, jnp.float32))

    q_w, t_w = geo.compose(state.q_w, state.t_w, q_lc, t_lc)

    # handoff clouds: with DISTORTION the less-sharp/less-flat clouds are
    # re-projected to the sweep end so the next frame's TransformToStart
    # (and the mapping stage) see a consistent frame chain
    if cfg.distortion:
        corner_last = transform_to_end(feats.less_sharp, q_lc, t_lc, cfg)
        surf_last = transform_to_end(feats.less_flat, q_lc, t_lc, cfg)
    else:
        corner_last, surf_last = feats.less_sharp, feats.less_flat

    new_state = OdomState(
        q_w=q_w, t_w=t_w, q_lc=q_lc, t_lc=t_lc,
        corner_last=corner_last, surf_last=surf_last,
        initialized=jnp.asarray(True))
    return new_state, metrics
