"""IO tests: KITTI loader semantics (synthetic files), checkpoint roundtrip,
ATE evaluation."""

import os

import numpy as np
import jax.numpy as jnp

from aloam_tpu.io import kitti
from aloam_tpu.utils import checkpoint as ckpt
from aloam_tpu.eval import ate_rmse, umeyama_align


def _write_fake_kitti(root, seq="04", n_frames=3, n_pts=100, rng=None):
    velo = os.path.join(root, "velodyne", "sequences", seq, "velodyne")
    seqd = os.path.join(root, "sequences", seq)
    resd = os.path.join(root, "results")
    os.makedirs(velo)
    os.makedirs(seqd)
    os.makedirs(resd)
    times = np.arange(n_frames) * 0.1
    np.savetxt(os.path.join(seqd, "times.txt"), times)
    clouds = []
    poses = []
    for i in range(n_frames):
        pts = rng.normal(size=(n_pts, 4)).astype(np.float32)
        pts.tofile(os.path.join(velo, f"{i:06d}.bin"))
        clouds.append(pts)
        # camera-frame pose: translate along camera z (= lidar x)
        m = np.hstack([np.eye(3), [[0.0], [0.0], [float(i)]]])
        poses.append(m.reshape(-1))
    np.savetxt(os.path.join(resd, f"{seq}.txt"), np.asarray(poses))
    return clouds, times


def test_kitti_loader_roundtrip(tmp_path, rng):
    clouds, times = _write_fake_kitti(str(tmp_path), rng=rng)
    frames = list(kitti.iter_sequence(str(tmp_path), "04", n_pad=128))
    assert len(frames) == 3
    for f, cloud, t in zip(frames, clouds, times):
        n = cloud.shape[0]
        assert f.mask.sum() == n
        np.testing.assert_allclose(f.xyz[:n], cloud[:, :3], atol=1e-6)
        np.testing.assert_allclose(f.reflectance[:n], cloud[:, 3], atol=1e-6)
        assert abs(f.timestamp - t) < 1e-9
    # GT rotated cam->lidar: camera z becomes lidar x, and the quaternion
    # carries q_transform itself for an identity camera rotation
    # (kittiHelper.cpp:108-111 rotates but never removes the axis change)
    np.testing.assert_allclose(frames[2].gt_t, [2.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(abs(frames[2].gt_q[0]), 0.5, atol=1e-6)


def test_kitti_export_npz(tmp_path, rng):
    _write_fake_kitti(str(tmp_path), rng=rng)
    out = str(tmp_path / "seq.npz")
    kitti.export_npz(str(tmp_path), "04", out, n_pad=128)
    data = np.load(out)
    assert data["xyz"].shape == (3, 128, 3)
    assert data["gt_t"].shape == (3, 3)


def test_checkpoint_roundtrip(tmp_path):
    state = {"a": jnp.arange(10, dtype=jnp.float32),
             "b": (jnp.zeros((3, 3)), jnp.asarray(True))}
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, state)
    zero = {"a": jnp.zeros(10, jnp.float32),
            "b": (jnp.ones((3, 3)), jnp.asarray(False))}
    back = ckpt.load(path, zero)
    np.testing.assert_allclose(np.asarray(back["a"]), np.arange(10))
    np.testing.assert_allclose(np.asarray(back["b"][0]), 0.0)
    assert bool(back["b"][1])


def test_umeyama_recovers_rigid_transform(rng):
    pts = rng.normal(size=(50, 3))
    ang = 0.7
    r_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0],
                       [0, 0, 1.0]])
    t_true = np.array([1.0, -2.0, 0.5])
    moved = pts @ r_true.T + t_true
    rot, t, s = umeyama_align(pts, moved)
    np.testing.assert_allclose(rot, r_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    assert ate_rmse(pts, moved, align=True) < 1e-8


def test_rpe_drift_kitti_convention_sees_yaw_drift():
    """Geiger et al. anchor each segment in its start pose's frame: an
    estimate with perfect positions but yawed orientations must show a
    non-zero KITTI RPE/drift (world-frame increments are blind to it).
    Hand-built case: straight-line GT along x, est positions identical,
    est yaw = 30 deg -> per-step body-frame error = 2 sin(15 deg) * step."""
    from aloam_tpu.eval import kitti_drift, rpe

    n, step = 220, 1.0
    gt_t = np.stack([np.arange(n) * step, np.zeros(n), np.zeros(n)], -1)
    est_t = gt_t.copy()
    gt_q = np.tile([1.0, 0, 0, 0], (n, 1))
    yaw = np.radians(30.0)
    est_q = np.tile([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)], (n, 1))

    # rotation-blind form: zero error
    assert rpe(est_t, gt_t)[0] < 1e-12
    # KITTI convention: the yaw shows up, with the closed-form magnitude
    r, per = rpe(est_t, gt_t, est_q=est_q, gt_q=gt_q)
    expect = 2.0 * np.sin(yaw / 2) * step
    np.testing.assert_allclose(r, expect, rtol=1e-9)

    d_blind, _ = kitti_drift(est_t, gt_t, lengths=(100,))
    d_kitti, n_seg = kitti_drift(est_t, gt_t, lengths=(100,),
                                 est_q=est_q, gt_q=gt_q)
    assert n_seg > 0 and d_blind < 1e-12
    np.testing.assert_allclose(d_kitti, 2.0 * np.sin(yaw / 2) * 100.0, rtol=1e-6)
