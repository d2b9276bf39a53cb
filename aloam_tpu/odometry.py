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

from typing import NamedTuple

import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import solver
from aloam_tpu.config import AloamConfig
from aloam_tpu.neighbors import dist2_matrix
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


def edge_correspondences(sharp: PointCloud, last: PointCloud,
                         q, t, cfg: AloamConfig) -> solver.EdgeFactors:
    """Corner correspondences (laserOdometry.cpp:299-384): 1-NN gated at
    25 m², plus the closest point on a *different* ring within ±2 rings
    (±NEARBY_SCAN = 2.5 on integer ring IDs), gated at 25 m²."""
    s = _point_s(sharp, cfg) if cfg.distortion else None
    sel = _transform_to_start(q, t, sharp.xyz, s)
    d2 = dist2_matrix(sel, last.xyz, last.mask)
    d2 = jnp.where(sharp.mask[:, None], d2, _INF)
    nn = jnp.argmin(d2, axis=1)
    gate1 = jnp.min(d2, axis=1) < cfg.dist_sq_threshold

    ring = last.ring()
    ring_nn = ring[nn]
    diff = ring[None, :] - ring_nn[:, None]
    adiff = jnp.abs(diff)
    cand = (adiff >= 1) & (adiff <= jnp.int32(cfg.nearby_scan))
    d2_c = jnp.where(cand, d2, _INF)
    idx2 = jnp.argmin(d2_c, axis=1)
    gate2 = jnp.min(d2_c, axis=1) < cfg.dist_sq_threshold

    valid = sharp.mask & gate1 & gate2
    return solver.EdgeFactors(p=sharp.xyz, a=last.xyz[nn],
                              b=last.xyz[idx2], mask=valid, s=s)


def plane_correspondences(flat: PointCloud, last: PointCloud,
                          q, t, cfg: AloamConfig) -> solver.PlaneFactors:
    """Surf correspondences (laserOdometry.cpp:387-483): 1-NN gated at 25 m²,
    closest *same-ring* point (minPointInd2) and closest point within ±2
    *other* rings (minPointInd3), both gated at 25 m²; the plane normal is
    (j−l)×(j−m) normalized (lidarFactor.hpp:64-65)."""
    s = _point_s(flat, cfg) if cfg.distortion else None
    sel = _transform_to_start(q, t, flat.xyz, s)
    d2 = dist2_matrix(sel, last.xyz, last.mask)
    d2 = jnp.where(flat.mask[:, None], d2, _INF)
    nn = jnp.argmin(d2, axis=1)
    gate1 = jnp.min(d2, axis=1) < cfg.dist_sq_threshold

    ring = last.ring()
    ring_nn = ring[nn]
    diff = ring[None, :] - ring_nn[:, None]
    adiff = jnp.abs(diff)
    m = last.xyz.shape[0]
    not_nn = jnp.arange(m, dtype=jnp.int32)[None, :] != nn[:, None]

    cand2 = (adiff == 0) & not_nn
    d2_2 = jnp.where(cand2, d2, _INF)
    idx2 = jnp.argmin(d2_2, axis=1)
    val2 = jnp.min(d2_2, axis=1)

    cand3 = (adiff >= 1) & (adiff <= jnp.int32(cfg.nearby_scan))
    d2_3 = jnp.where(cand3, d2, _INF)
    idx3 = jnp.argmin(d2_3, axis=1)
    val3 = jnp.min(d2_3, axis=1)

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


def odometry_step(state: OdomState, feats: ScanFeatures,
                  cfg: AloamConfig):
    """One odometry frame. Returns (new_state, metrics).

    The new world pose/clouds in the returned state are what the reference
    publishes to mapping (laserOdometry.cpp:510-591).
    """
    q, t = state.q_lc, state.t_lc  # warm start (constant-velocity prior)
    metrics = None
    for _ in range(cfg.odom_outer_rounds):
        edges = edge_correspondences(feats.sharp, state.corner_last,
                                     q, t, cfg)
        planes = plane_correspondences(feats.flat, state.surf_last,
                                       q, t, cfg)
        q, t, stats = solver.lm_solve((edges, planes), q, t,
                                      cfg.odom_lm_iters, cfg.huber_delta)
        metrics = OdomMetrics(
            corner_corr=jnp.sum(edges.mask), plane_corr=jnp.sum(planes.mask),
            cost0=stats.cost0, cost=stats.cost)

    # first frame: initialization only (laserOdometry.cpp:267-271)
    inited = state.initialized
    q_lc = jnp.where(inited, q, geo.qidentity())
    t_lc = jnp.where(inited, t, jnp.zeros(3, jnp.float32))

    q_w, t_w = geo.compose(state.q_w, state.t_w, q_lc, t_lc)

    new_state = OdomState(
        q_w=q_w, t_w=t_w, q_lc=q_lc, t_lc=t_lc,
        corner_last=feats.less_sharp, surf_last=feats.less_flat,
        initialized=jnp.asarray(True))
    return new_state, metrics
