"""Long-horizon drift gate (VERDICT r4 #4): a >=500-frame synthetic drive
with the KITTI-convention translational drift gated in CI.

The reference's validation is a long KITTI replay with GT overlay
(/root/reference/src/kittiHelper.cpp:59-66, README.md:44-51); no KITTI
data exists on this machine, so this is the long-horizon analog on the
synthetic raytracer: ~400 m of street-canyon driving, drift measured over
the standard 100-400 m segments (Geiger et al. CVPR 2012 convention,
eval/ate.kitti_drift). The short oracle pins catch semantic breaks; only
a long run catches compounding drift, gate-flip sensitivity and
map-eviction effects.

Scaled to CI: VLP-16 at 256 azimuth steps with proportionally shrunk
capacities (the caps only change padding, not semantics; overflow stays
counted). Runs in ~3-4 min on the 1-core CPU host.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aloam_tpu import pipeline
from aloam_tpu.config import PRESETS
from aloam_tpu.eval import ate_rmse, kitti_drift
from aloam_tpu.io import synthetic as syn

N_FRAMES = 500
SPEED = 8.0          # 0.8 m/frame: inside the 1.0 m map NN gate

# capacities for the drift scene, shared with the oracle-relative gate
# and tools/oracle_drift.py
DRIFT_CFG = PRESETS["VLP-16"].replace(
    n_raw=8192, ring_cap=512, less_flat_cap=8192,
    corner_stack_cap=1024, surf_stack_cap=2048,
    map_cell_cap=512, map_insert_cell_cap=512)


def _s_curve_trajectory(n: int, speed: float, period: float = 0.1):
    """Slalom down the canyon: sinusoidal yaw (±0.05 rad, 20 s period)
    keeps rotation persistently excited while the lateral excursion stays
    ~±1.3 m — mid-canyon for the whole run. ``drive_trajectory``'s linear
    yaw drift exits through the canyon wall (y ≈ ±7-12 m) after ~100
    frames at this speed, after which the scene is featureless and any
    engine diverges — a scene artifact, not a SLAM regression."""
    ts = np.arange(n) * period
    yaw = 0.05 * np.sin(2 * np.pi * ts / 20.0)
    x = np.concatenate([[0.0], np.cumsum(speed * period * np.cos(yaw[:-1]))])
    y = np.concatenate([[0.0], np.cumsum(speed * period * np.sin(yaw[:-1]))])
    z = np.full(n, 1.8)
    quats = np.stack([np.cos(yaw / 2), 0 * yaw, 0 * yaw, np.sin(yaw / 2)],
                     axis=-1)
    return syn.Trajectory(quats=quats, trans=np.stack([x, y, z], axis=-1))


def _render_scene(n: int):
    """First ``n`` frames of the drift scene — the world and trajectory
    are always built at the full N_FRAMES extent so frame i is identical
    no matter how many frames a caller consumes."""
    world = syn.street_canyon(seed=11, length=SPEED * 0.1 * N_FRAMES + 60)
    traj = _s_curve_trajectory(N_FRAMES, SPEED)
    scans = [syn.render_scan(world, traj.quats[i], traj.trans[i],
                             scan_lines=16, n_azimuth=256,
                             seed=11 * 10007 + i, noise=0.01, dropout=0.05)
             for i in range(n)]
    return traj, scans


def _oracle_trajectory(scans, use_cache: bool = True):
    """f64 oracle (t_map, q_map) over the drift scene, host-cached under
    tests/_cache (tests/oracle/cache.py: keyed by the oracle sources'
    md5 + the scene tag, so the cache self-invalidates whenever the
    oracle implementation or the scene changes; the oracle costs minutes
    per 100 frames)."""
    from tests.oracle.cache import oracle_trajectory

    _, t_map, q_map = oracle_trajectory(
        f"drift-scene-v1:{len(scans)}:{SPEED}", scans,
        dict(scan_lines=16, line_res=DRIFT_CFG.line_resolution,
             plane_res=DRIFT_CFG.plane_resolution,
             min_range=DRIFT_CFG.minimum_range),
        use_cache=use_cache)
    return t_map, q_map


@pytest.mark.slow
def test_500_frame_drift_gate():
    cfg = DRIFT_CFG
    traj, scans = _render_scene(N_FRAMES)
    step = pipeline.make_step_fn(cfg)
    state = pipeline.init_state(cfg)
    est_t, est_q, solved = [], [], 0
    for s in scans:
        xyz, mask = syn.pad_scan(s, cfg.n_raw)
        state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
        est_t.append(np.asarray(out.t_map))
        est_q.append(np.asarray(out.q_map))
        m = pipeline.metrics_dict(out.metrics)
        solved += int(m["map_solved"])
    est_t, est_q = np.stack(est_t), np.stack(est_q)
    gt_t = (traj.trans - traj.trans[0]).astype(np.float64)
    gt_q = traj.quats

    # the mapping stage must actually engage for ~the whole run
    assert solved >= N_FRAMES - 5

    ate = ate_rmse(est_t, gt_t, align=False)
    drift, n_seg = kitti_drift(est_t, gt_t, est_q=est_q, gt_q=gt_q)

    # enough trajectory for the 100-300 m segment lengths
    assert n_seg > 200, (n_seg, "trajectory too short for the drift gate")
    # Measured at these settings: drift 1.55 %, ATE 4.1 m, error growing
    # LINEARLY (0.5 / 2.1 / 4.0 / 5.6 / 8.2 m at frames 100..500) — a
    # sparse 4096-ray VLP-16 scene drifts more than real HDL-64 KITTI
    # (the reference's seq-00 is ~0.8-1.1 %). The gates sit ~2x above
    # the measured values: they are regression tripwires for
    # divergence-class failures (a wall-exit trajectory measured 22 % /
    # 38 m here), not absolute-accuracy claims — those live in the
    # 20-frame f64 oracle pin (test_pipeline_oracle) and the bench ATE.
    assert drift < 3.0, f"translational drift {drift:.3f}% over {n_seg} segs"
    assert ate < 10.0, f"ATE RMSE {ate:.3f} m over {N_FRAMES} frames"
    assert np.isfinite(est_t).all()


# ---------------------------------------------------------------------------
# Oracle-relative accuracy gate (VERDICT r4 #3)
# ---------------------------------------------------------------------------

# Frames for the oracle-relative run: long enough for the KITTI 100-m
# segment convention (160 m of trajectory) while keeping the one-time
# oracle cost (~10 s/frame f64 NumPy) regenerable in ~35 min.
N_ORACLE = 200

# Measured by tools/oracle_drift.py (committed run, see BASELINE.md):
# the gate asserts the engine's drift RELATIVE to the oracle's on the
# SAME scene — the faithful stand-in for "seq-00 ATE within 5% of the
# reference" (BASELINE.md), since the C++ reference cannot run here and
# the oracle is its literal f64 reimplementation (tests/oracle/).
ENGINE_OVER_ORACLE_GATE = 1.25


@pytest.mark.slow
def test_oracle_relative_drift():
    """Engine drift must stay within ENGINE_OVER_ORACLE_GATE of the f64
    oracle's drift on the same 200-frame scene (KITTI-convention
    translational drift vs ground truth for both)."""
    traj, scans = _render_scene(N_ORACLE)
    t_map_o, q_map_o = _oracle_trajectory(scans)

    cfg = DRIFT_CFG
    step = pipeline.make_step_fn(cfg)
    state = pipeline.init_state(cfg)
    est_t, est_q = [], []
    for s in scans:
        xyz, mask = syn.pad_scan(s, cfg.n_raw)
        state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
        est_t.append(np.asarray(out.t_map))
        est_q.append(np.asarray(out.q_map))
    est_t, est_q = np.stack(est_t), np.stack(est_q)

    gt_t = (traj.trans[:N_ORACLE] - traj.trans[0]).astype(np.float64)
    gt_q = traj.quats[:N_ORACLE]
    drift_e, nseg = kitti_drift(est_t, gt_t, est_q=est_q, gt_q=gt_q)
    drift_o, _ = kitti_drift(t_map_o, gt_t, est_q=q_map_o, gt_q=gt_q)
    assert nseg > 50, (nseg, "trajectory too short for the drift gate")
    assert np.isfinite(drift_e) and drift_o > 0
    ratio = drift_e / drift_o
    assert ratio <= ENGINE_OVER_ORACLE_GATE, (
        f"engine drift {drift_e:.3f}% vs oracle {drift_o:.3f}% "
        f"(ratio {ratio:.3f} > {ENGINE_OVER_ORACLE_GATE})")
