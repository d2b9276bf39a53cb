"""End-to-end pipeline test: full SLAM over a synthetic sequence + ATE."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aloam_tpu.config import AloamConfig
from aloam_tpu import pipeline
from aloam_tpu.eval import ate_rmse
from aloam_tpu.io import synthetic as syn


# note: plane_resolution must stay below the 1.0 m NN-gate radius or surf
# factors can never find 5 gated neighbors
CFG = AloamConfig(
    scan_lines=64, minimum_range=5.0,
    line_resolution=0.4, plane_resolution=0.8,
    n_raw=57344, ring_cap=1152, less_flat_cap=24576,
    map_table_corner=8192, map_table_surf=16384,
    corner_stack_cap=2048, surf_stack_cap=8192,
)
N_FRAMES = 8


@pytest.fixture(scope="module")
def seq():
    return syn.make_sequence(N_FRAMES, scan_lines=64, n_azimuth=900,
                             seed=5, speed=2.0)


def test_full_pipeline_ate(seq):
    scans, traj = seq
    state = pipeline.init_state(CFG)
    step = pipeline.make_step_fn(CFG)
    t_odom, t_map = [], []
    for i in range(N_FRAMES):
        xyz, mask = syn.pad_scan(scans[i], CFG.n_raw)
        state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
        t_odom.append(np.asarray(out.t_odom))
        t_map.append(np.asarray(out.t_map))
        m = pipeline.metrics_dict(out.metrics)
        if i > 0:
            assert int(m["corner_corr"]) > 20
            assert int(m["plane_corr"]) > 100
        if i > 1:
            assert bool(m["map_solved"])

    gt = traj.trans - traj.trans[0]
    ate_o = ate_rmse(np.stack(t_odom), gt, align=False)
    ate_m = ate_rmse(np.stack(t_map), gt, align=False)
    # scan-to-scan odometry carries an inherent forward bias from
    # viewpoint-dependent silhouette corners (the reference algorithm
    # behaves identically — its mapping stage exists to fix this); assert
    # loose odometry tracking and tight mapped tracking
    assert ate_o < 0.2, f"odometry ATE {ate_o}"
    assert ate_m < 0.06, f"mapped ATE {ate_m}"
    assert ate_m < ate_o, "mapping must improve on raw odometry"


def test_scan_driver_matches_step_loop(seq):
    """Both run_sequence drivers (host loop over the donated step, and the
    single-program lax.scan export path) == python step loop."""
    scans, _ = seq
    xs, ms = zip(*(syn.pad_scan(s, CFG.n_raw) for s in scans[:3]))
    xyz_seq = jnp.asarray(np.stack(xs))
    mask_seq = jnp.asarray(np.stack(ms))

    state = pipeline.init_state(CFG)
    step = pipeline.make_step_fn(CFG)
    ts = []
    for i in range(3):
        state, out = step(state, xyz_seq[i], mask_seq[i])
        ts.append(np.asarray(out.t_map))

    _, outs_loop = pipeline.run_sequence(
        pipeline.init_state(CFG), xyz_seq, mask_seq, CFG)
    np.testing.assert_allclose(np.asarray(outs_loop.t_map), np.stack(ts),
                               atol=1e-4)

    _, outs_scan = jax.jit(
        lambda s, x, m: pipeline.run_sequence(s, x, m, CFG, scan=True))(
        pipeline.init_state(CFG), xyz_seq, mask_seq)
    np.testing.assert_allclose(np.asarray(outs_scan.t_map), np.stack(ts),
                               atol=1e-4)


def test_checkpoint_resume_continues_identically(seq, tmp_path):
    """Saving the SLAM state and resuming must reproduce the uninterrupted
    trajectory (the reference has no persistence at all — SURVEY.md §5)."""
    from aloam_tpu.utils import checkpoint as ckpt

    scans, _ = seq
    step = pipeline.make_step_fn(CFG, donate=False)

    state = pipeline.init_state(CFG)
    maps = []
    for i in range(4):
        xyz, mask = syn.pad_scan(scans[i], CFG.n_raw)
        state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
        maps.append(np.asarray(out.t_map))
        if i == 1:
            path = str(tmp_path / "state.npz")
            ckpt.save(path, state)

    resumed = ckpt.load(path, pipeline.init_state(CFG))
    for i in range(2, 4):
        xyz, mask = syn.pad_scan(scans[i], CFG.n_raw)
        resumed, out = step(resumed, jnp.asarray(xyz), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out.t_map), maps[i], atol=1e-5)


N_DIST = 7


@pytest.fixture(scope="module")
def distorted_seq():
    """Motion-distorted scans under *acceleration* (6 m/s + 12 m/s²) + yaw.

    Acceleration is load-bearing: at constant velocity the sweep warp is
    common-mode between consecutive frames, so rigid frame-to-frame
    registration is nearly unbiased and the distortion model has no
    structural advantage (measured: 12% improvement at constant 10 m/s vs
    45% with this ramp). The reference's DISTORTION=1 path faces the same
    physics."""
    return syn.make_distorted_sequence(N_DIST, scan_lines=64, n_azimuth=900,
                                       seed=11, speed=6.0, yaw_rate=0.3,
                                       accel=12.0)


def _run_odometry(scans, cfg):
    step = pipeline.make_step_fn(cfg, donate=False)
    state = pipeline.init_state(cfg)
    t_odom = []
    for s in scans:
        xyz, mask = syn.pad_scan(s, cfg.n_raw)
        state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
        t_odom.append(np.asarray(out.t_odom))
    return np.stack(t_odom), state


def test_distortion_improves_on_distorted_data(distorted_seq):
    """The DISTORTION path (per-point slerp + TransformToEnd handoff,
    laserOdometry.cpp:59,111-148) must beat the rigid s=1 model on
    motion-distorted input. Frame-to-frame deltas are compared (RPE style)
    so the cold-start anchor ambiguity of frame 0's raw distorted cloud
    cancels; note distortion=True expects distorted input — applying it to
    pre-undistorted scans is a model mismatch (see ADVICE r1)."""
    scans, traj = distorted_seq
    est_plain, _ = _run_odometry(scans, CFG)
    est_dist, _ = _run_odometry(scans, CFG.replace(distortion=True))

    # GT deltas between consecutive sweep ends = trans[i+1] -> trans[i+2]
    gt_d = np.diff(traj.trans[1:1 + N_DIST], axis=0)
    d_plain = np.diff(est_plain, axis=0)
    d_dist = np.diff(est_dist, axis=0)
    # skip the cold-start frames (frame 0 holds, frame 1 sees frame 0's
    # raw distorted cloud — the reference behaves identically)
    e_plain = np.linalg.norm(d_plain[2:] - gt_d[2:], axis=1).mean()
    e_dist = np.linalg.norm(d_dist[2:] - gt_d[2:], axis=1).mean()
    # measured 0.110 vs 0.201 (ratio 0.55); margins leave headroom for
    # rounding-level flakiness. The residual e_dist floor is the unmodeled
    # within-sweep acceleration (0.5·a·T² = 0.06 m) + feature noise.
    assert e_dist < 0.75 * e_plain, (e_dist, e_plain)
    assert e_dist < 0.15, e_dist


def test_distorted_sequence_mapped_ate(distorted_seq):
    """Full pipeline (odometry + mapping) on distorted data with the
    DISTORTION path: aligned mapped ATE stays small."""
    from aloam_tpu.eval import ate_rmse
    scans, traj = distorted_seq
    cfg = CFG.replace(distortion=True)
    step = pipeline.make_step_fn(cfg, donate=False)
    state = pipeline.init_state(cfg)
    t_map = []
    for s in scans:
        xyz, mask = syn.pad_scan(s, cfg.n_raw)
        state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
        t_map.append(np.asarray(out.t_map))
    # sweep-end chain: estimated frame i ~ GT pose i+1 (aligned: the frame-0
    # anchor is fuzzy by < one sweep's motion)
    ate = ate_rmse(np.stack(t_map)[1:], traj.trans[2:1 + N_DIST],
                   align=True)
    assert ate < 0.12, ate
