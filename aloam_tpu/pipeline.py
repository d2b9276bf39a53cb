"""The fused SLAM pipeline: one pure jitted step, scanned over a stream.

The reference runs registration → odometry → mapping as three OS processes
chained by ROS topics with queue/drop backpressure (SURVEY.md §1). Here the
whole per-scan pipeline is a single pure function

    step(state, (xyz, mask)) -> (state, outputs)

driven by ``lax.scan`` with zero host round-trips per scan — the
TPU-idiomatic answer to ROS pipelining (SURVEY.md §2.4). All inter-stage
"topics" are just arrays passed by value.

Rate decoupling: ``mapping_skip_frame`` gates the mapping stage with a
modulo condition (laserOdometry.cpp:570, default 1 in the HDL-64 launch =
map every frame); the reference's real-time frame dropping
(laserMapping.cpp:299-303) has no equivalent need here because the step is
synchronous.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import mapping as mp
from aloam_tpu import odometry as od
from aloam_tpu.config import AloamConfig
from aloam_tpu.frontend import register_scan, extract_features


METRIC_NAMES = (
    "corner_corr", "plane_corr", "odom_cost", "map_corner_factors",
    "map_surf_factors", "map_solved", "frontend_overflow", "map_overflow",
    "map_evicted", "n_sharp", "n_flat", "n_less_sharp", "n_less_flat",
    "odom_degenerate", "map_degenerate", "map_cache_crossed",
)


def metrics_dict(metrics) -> dict:
    """Unpack the step's packed metrics vector (host-side)."""
    import numpy as np
    vals = np.asarray(metrics)
    return dict(zip(METRIC_NAMES, vals.tolist()))


class SlamState(NamedTuple):
    odom: od.OdomState
    map: mp.MapState
    frame: jnp.ndarray


class SlamOutputs(NamedTuple):
    # /laser_odom_to_init (laserOdometry.cpp:510-522)
    q_odom: jnp.ndarray
    t_odom: jnp.ndarray
    # /aft_mapped_to_init (laserMapping.cpp:854-865)
    q_map: jnp.ndarray
    t_map: jnp.ndarray
    # /aft_mapped_to_init_high_frec (laserMapping.cpp:197-229): odometry-rate
    # pose with the *previous* frame's map correction — the async semantics
    q_hf: jnp.ndarray
    t_hf: jnp.ndarray
    metrics: jnp.ndarray  # packed vector, see METRIC_NAMES / metrics_dict
    # /velodyne_cloud_registered: full-res cloud in the map frame
    # (laserMapping.cpp:838-848); None unless cfg.emit_registered
    registered: jnp.ndarray | None = None
    registered_mask: jnp.ndarray | None = None


def init_state(cfg: AloamConfig) -> SlamState:
    return SlamState(odom=od.init_state(cfg), map=mp.init_state(cfg),
                     frame=jnp.int32(0))


def _gated_mapping(run_mapping, state: SlamState, cfg: AloamConfig):
    """Run the mapping stage, modulo-gated by ``mapping_skip_frame``
    (laserOdometry.cpp:570-591: odometry publishes to mapping every
    skipFrameNum frames). The skip branch returns the map state unchanged
    and all-zero metrics of exactly the run branch's shapes/dtypes
    (derived via eval_shape, so single and batched paths share this)."""
    if cfg.mapping_skip_frame <= 1:
        return run_mapping(state.map)

    def skip(map_state):
        _, mm_shape = jax.eval_shape(run_mapping, map_state)
        return map_state, jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), mm_shape)

    # batched states carry a (B,) frame counter, but all streams advance
    # in lock-step (step_b bumps every entry together), so stream 0's
    # frame gates the whole batch; reshape(-1)[0] also passes a scalar
    # frame through unchanged
    frame = jnp.reshape(state.frame, (-1,))[0]
    return jax.lax.cond(frame % cfg.mapping_skip_frame == 0,
                        run_mapping, skip, state.map)


def step(state: SlamState, xyz: jnp.ndarray, mask: jnp.ndarray,
         cfg: AloamConfig):
    """Process one scan end-to-end."""
    rc, curv, ovf = register_scan(xyz, mask, cfg)
    feats = extract_features(rc, curv, cfg)

    odom, om = od.odometry_step(state.odom, feats, cfg)

    # high-frequency fused pose uses the correction available *before* this
    # frame's mapping solve (laserMapping.cpp:197-229)
    q_hf = geo.qmul(state.map.q_wmap_wodom, odom.q_w)
    t_hf = geo.qrot(state.map.q_wmap_wodom, odom.t_w) + state.map.t_wmap_wodom

    def run_mapping(map_state):
        # the handoff clouds (== feats.less_sharp/less_flat undistorted;
        # TransformToEnd-reprojected when cfg.distortion) — the
        # /laser_cloud_corner_last topic contents (laserOdometry.cpp:570-585)
        return mp.mapping_step(map_state, odom.corner_last, odom.surf_last,
                               odom.q_w, odom.t_w, cfg)

    map_state, mm = _gated_mapping(run_mapping, state, cfg)

    # one packed vector (a dict of scalars costs one host transfer *per
    # entry* — ~80 ms each through the TPU tunnel)
    metrics = jnp.stack([
        om.corner_corr.astype(jnp.float32),
        om.plane_corr.astype(jnp.float32),
        om.cost,
        mm.corner_factors.astype(jnp.float32),
        mm.surf_factors.astype(jnp.float32),
        mm.solved.astype(jnp.float32),
        (ovf + feats.overflow).astype(jnp.float32),
        mm.overflow.astype(jnp.float32),
        mm.evicted.astype(jnp.float32),
        feats.sharp.count().astype(jnp.float32),
        feats.flat.count().astype(jnp.float32),
        feats.less_sharp.count().astype(jnp.float32),
        feats.less_flat.count().astype(jnp.float32),
        om.degenerate.astype(jnp.float32),
        mm.degenerate.astype(jnp.float32),
        jnp.asarray(mm.cache_crossed, jnp.float32),
    ])
    # /velodyne_cloud_registered (laserMapping.cpp:838-848): the full-res
    # ring cloud re-registered into the map frame by the refined pose.
    # Static-shaped and optional (cfg.emit_registered) — ~2 MB/frame.
    registered = registered_mask = None
    if cfg.emit_registered:
        full = rc.xyz.reshape(-1, 3)
        registered = geo.qrot(map_state.q_w, full) + map_state.t_w
        registered_mask = rc.slot_mask().reshape(-1)
    outputs = SlamOutputs(q_odom=odom.q_w, t_odom=odom.t_w,
                          q_map=map_state.q_w, t_map=map_state.t_w,
                          q_hf=q_hf, t_hf=t_hf, metrics=metrics,
                          registered=registered,
                          registered_mask=registered_mask)
    new_state = SlamState(odom=odom, map=map_state,
                          frame=state.frame + 1)
    return new_state, outputs


def step_b(state: SlamState, xyz: jnp.ndarray, mask: jnp.ndarray,
           cfg: AloamConfig):
    """Explicitly batched step: state leaves (B, ·), xyz (B, n_raw, 3).

    NOT jax.vmap(step): vmapped gathers/scatters lower ~100x slower on this
    backend (utils/batch.py), so every gather/scatter-bearing kernel has a
    flat-op ``*_b`` twin and this mirrors step() on top of them. Metrics
    come out as (B, n_metrics). ``mapping_skip_frame > 1`` gates mapping
    with the same modulo condition as step() — all streams advance in
    lock-step, so the VLP-16 launch's skip=2 applies batch-wide."""
    from aloam_tpu.frontend import extract_features_b, register_scan_b

    rc, curv, ovf = register_scan_b(xyz, mask, cfg)
    feats = extract_features_b(rc, curv, cfg)

    odom, om = od.odometry_step_b(state.odom, feats, cfg)

    q_hf = geo.qmul(state.map.q_wmap_wodom, odom.q_w)
    t_hf = geo.qrot(state.map.q_wmap_wodom, odom.t_w) + state.map.t_wmap_wodom

    def run_mapping(map_state):
        return mp.mapping_step_b(map_state, odom.corner_last,
                                 odom.surf_last, odom.q_w, odom.t_w, cfg)

    # all streams advance in lock-step (state.frame is one scalar), so one
    # modulo gate covers the whole batch — same decoupling as the single
    # path (laserOdometry.cpp:570-591)
    map_state, mm = _gated_mapping(run_mapping, state, cfg)

    bsz = xyz.shape[0]
    f32 = jnp.float32

    def vec(x):
        return jnp.broadcast_to(jnp.asarray(x, f32), (bsz,))

    metrics = jnp.stack([
        vec(om.corner_corr), vec(om.plane_corr), vec(om.cost),
        vec(mm.corner_factors), vec(mm.surf_factors), vec(mm.solved),
        vec(ovf + feats.overflow), vec(mm.overflow), vec(mm.evicted),
        vec(feats.sharp.count()), vec(feats.flat.count()),
        vec(feats.less_sharp.count()), vec(feats.less_flat.count()),
        vec(om.degenerate), vec(mm.degenerate),
        vec(mm.cache_crossed),
    ], axis=-1)

    registered = registered_mask = None
    if cfg.emit_registered:
        full = rc.xyz.reshape(bsz, -1, 3)
        registered = geo.qrot(map_state.q_w[:, None, :], full) \
            + map_state.t_w[:, None, :]
        slot = jnp.arange(rc.xyz.shape[2], dtype=jnp.int32)[None, None, :]
        registered_mask = (slot < rc.cnt[:, :, None]).reshape(bsz, -1)

    outputs = SlamOutputs(q_odom=odom.q_w, t_odom=odom.t_w,
                          q_map=map_state.q_w, t_map=map_state.t_w,
                          q_hf=q_hf, t_hf=t_hf, metrics=metrics,
                          registered=registered,
                          registered_mask=registered_mask)
    new_state = SlamState(odom=odom, map=map_state, frame=state.frame + 1)
    return new_state, outputs


def run_sequence(state: SlamState, xyz_seq: jnp.ndarray,
                 mask_seq: jnp.ndarray, cfg: AloamConfig,
                 scan: bool = False):
    """Stream a device-resident (F, n_raw, ·) scan stack through the fused
    step; returns (final state, stacked outputs).

    Default (``scan=False``): a host loop over the donated jitted step —
    the map-table buffers alias in place via jit donation, so per-frame
    cost matches the bench's steady state. The input ``state`` is consumed
    (donated); outputs are stacked on host with a leading frame axis.

    ``scan=True`` compiles the whole sequence as one ``lax.scan`` — a
    single XLA program with zero host round-trips, kept for determinism
    tests and export. On the current TPU runtime the scan carry does NOT
    alias the big map tables in place (each iteration pays a full state
    copy, measured round 2), so it is strictly slower for streaming; the
    host loop is the supported throughput path."""
    if scan:
        def body(st, inp):
            x, m = inp
            return step(st, x, m, cfg)
        return jax.lax.scan(body, state, (xyz_seq, mask_seq))
    import numpy as np
    step_fn = make_step_fn(cfg, donate=True)
    outs = []
    for f in range(xyz_seq.shape[0]):
        state, out = step_fn(state, xyz_seq[f], mask_seq[f])
        outs.append(out)
    stacked = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])),
        *outs)
    return state, stacked


def make_step_fn(cfg: AloamConfig, donate: bool = True):
    """Jitted single-step closure (config baked in).

    With ``donate=True`` (default) the state argument is donated so the
    ~0.5 GB of map-cube buffers update in place instead of being copied
    every frame; callers must not reuse a state they passed in.
    """
    return jax.jit(lambda s, x, m: step(s, x, m, cfg),
                   donate_argnums=(0,) if donate else ())
