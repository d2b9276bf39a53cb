"""Odometry tests: correspondence rules vs the literal walk oracle, and
two-frame pose recovery on synthetic scans."""

import numpy as np
import jax
import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import odometry
from aloam_tpu import odometry as od
from aloam_tpu.config import PRESETS
from aloam_tpu.frontend import register_scan, extract_features
from aloam_tpu.io import synthetic as syn
from aloam_tpu.types import PointCloud
from tests.oracle import odometry as orc


def _ring_sorted_cloud(rng, n=400, rings=16):
    """Random cloud, ring-major sorted, with intensity = ring + frac."""
    ring = np.sort(rng.integers(0, rings, size=n))
    xyz = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    inten = ring + rng.uniform(0, 0.1, size=n)
    return xyz, inten.astype(np.float32), ring


def test_edge_correspondences_match_walk_oracle(rng):
    last_xyz, last_int, _ = _ring_sorted_cloud(rng)
    q_xyz = rng.uniform(-20, 20, size=(50, 3)).astype(np.float32)
    cfg = PRESETS["VLP-16"]
    sharp = PointCloud(xyz=jnp.asarray(q_xyz),
                       intensity=jnp.zeros(50, jnp.float32),
                       mask=jnp.ones(50, bool))
    last = PointCloud(xyz=jnp.asarray(last_xyz),
                      intensity=jnp.asarray(last_int),
                      mask=jnp.ones(last_xyz.shape[0], bool))
    f = odometry.edge_correspondences(sharp, last, geo.qidentity(),
                                      jnp.zeros(3), cfg)
    a, b, m = np.asarray(f.a), np.asarray(f.b), np.asarray(f.mask)
    for i in range(50):
        nn, ind2 = orc.edge_corr(q_xyz[i], last_xyz, last_int)
        assert m[i] == (ind2 >= 0), f"query {i}"
        if ind2 >= 0:
            np.testing.assert_allclose(a[i], last_xyz[nn], atol=1e-6)
            np.testing.assert_allclose(b[i], last_xyz[ind2], atol=1e-6)


def test_plane_correspondences_match_walk_oracle(rng):
    last_xyz, last_int, _ = _ring_sorted_cloud(rng, n=600)
    q_xyz = rng.uniform(-20, 20, size=(50, 3)).astype(np.float32)
    cfg = PRESETS["VLP-16"]
    flat = PointCloud(xyz=jnp.asarray(q_xyz),
                      intensity=jnp.zeros(50, jnp.float32),
                      mask=jnp.ones(50, bool))
    last = PointCloud(xyz=jnp.asarray(last_xyz),
                      intensity=jnp.asarray(last_int),
                      mask=jnp.ones(last_xyz.shape[0], bool))
    f = odometry.plane_correspondences(flat, last, geo.qidentity(),
                                       jnp.zeros(3), cfg)
    n_ours, d_ours, m = np.asarray(f.n), np.asarray(f.d), np.asarray(f.mask)
    for i in range(50):
        nn, ind2, ind3 = orc.plane_corr(q_xyz[i], last_xyz, last_int)
        found = (ind2 >= 0) and (ind3 >= 0)
        if not found:
            assert not m[i], f"query {i}: oracle no, ours yes"
            continue
        # ours may additionally drop degenerate normals; if kept, compare
        if m[i]:
            a, l, mm = last_xyz[nn], last_xyz[ind2], last_xyz[ind3]
            n_ref = np.cross(a - l, a - mm)
            n_ref /= np.linalg.norm(n_ref)
            dot = abs(float(np.dot(n_ref, n_ours[i])))
            assert dot > 1 - 1e-4, f"query {i}: normals differ ({dot})"


def _run_frontend(scan, cfg):
    xyz, mask = syn.pad_scan(scan, cfg.n_raw)
    rc, curv, _ = register_scan(jnp.asarray(xyz), jnp.asarray(mask), cfg)
    return extract_features(rc, curv, cfg)


def test_two_frame_pose_recovery():
    """Drive two synthetic frames; the recovered frame-to-frame transform
    must match the ground-truth motion."""
    # slow motion (0.2 m/frame) puts the cold start inside the Huber(0.1)
    # basin — the regime the reference's warm start provides in steady state
    cfg = PRESETS["HDL-64"].replace(n_raw=65536)
    scans, traj = syn.make_sequence(2, scan_lines=64, n_azimuth=900, seed=11,
                                    speed=2.0)

    step = jax.jit(lambda s, f: odometry.odometry_step(s, f, cfg))
    state = odometry.init_state(cfg)
    for i in range(2):
        feats = jax.jit(
            lambda x, m: extract_features(
                *register_scan(x, m, cfg)[:2], cfg))(
            *map(jnp.asarray, syn.pad_scan(scans[i], cfg.n_raw)))
        state, metrics = step(state, feats)

    # ground-truth relative motion frame1 -> frame0 (curr -> last), in the
    # sensor frame: T_rel = T0^{-1} T1
    q0, t0 = jnp.asarray(traj.quats[0], jnp.float32), \
        jnp.asarray(traj.trans[0], jnp.float32)
    q1, t1 = jnp.asarray(traj.quats[1], jnp.float32), \
        jnp.asarray(traj.trans[1], jnp.float32)
    qi, ti = geo.inverse_pose(q0, t0)
    q_rel, t_rel = geo.compose(qi, ti, q1, t1)

    assert int(metrics.corner_corr) > 50
    assert int(metrics.plane_corr) > 200
    t_err = np.linalg.norm(np.asarray(state.t_lc) - np.asarray(t_rel))
    assert t_err < 0.05, f"translation error {t_err}"
    dq = geo.qmul(geo.qconj(q_rel), state.q_lc)
    ang_err = 2 * np.degrees(np.arccos(min(1.0, abs(float(dq[0])))))
    assert ang_err < 0.5, f"rotation error {ang_err} deg"
    # world pose after 2 frames equals the relative motion
    np.testing.assert_allclose(np.asarray(state.t_w), np.asarray(t_rel),
                               atol=0.05)


def test_transform_to_end_matches_physical_model(rng):
    """Pin TransformToStart/TransformToEnd semantics (laserOdometry.cpp:
    111-148) against the physical constant-velocity model: a point fired at
    sweep fraction s from the interpolated sensor pose must map back to its
    fixed location in the start frame (s-interp) and the end frame (full
    inverse)."""
    from aloam_tpu import solver
    from aloam_tpu.config import AloamConfig
    from aloam_tpu.types import PointCloud

    cfg = AloamConfig(distortion=True)
    q_m = geo.exp_so3(jnp.asarray([0.02, -0.03, 0.1]))  # sweep motion
    t_m = jnp.asarray([1.0, 0.2, -0.05])
    n = 64
    x_start = jnp.asarray(rng.uniform(-20, 20, size=(n, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(0, 1, size=n), jnp.float32)

    # fire-time coords: p = R(s)^T (X - s*t_m)
    qs, ts = solver._interp_pose(q_m, t_m, s)
    p_fire = geo.qrot_inv(qs, x_start - ts)

    # TransformToStart recovers X
    back = od._transform_to_start(q_m, t_m, p_fire, s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x_start),
                               atol=1e-4)

    # TransformToEnd gives X in the end frame: R_m^T (X - t_m)
    ring = jnp.asarray(rng.integers(0, 64, size=n), jnp.float32)
    pc = PointCloud(xyz=p_fire, intensity=ring + cfg.scan_period * s,
                    mask=jnp.ones(n, bool))
    out = od.transform_to_end(pc, q_m, t_m, cfg)
    want = geo.qrot_inv(q_m, x_start - t_m)
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(want),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.intensity), np.asarray(ring),
                               atol=1e-6)
