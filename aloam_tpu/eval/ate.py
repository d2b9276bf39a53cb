"""Trajectory evaluation: ATE (Umeyama-aligned RMSE) and RPE.

The reference offers only a visual rviz overlay against the KITTI GT path
(SURVEY.md §4); this module provides the quantitative equivalent used by the
integration tests and benchmarks (host-side NumPy — evaluation is not on the
hot path)."""

from __future__ import annotations

import numpy as np


def umeyama_align(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """Least-squares similarity/rigid alignment est -> gt (Umeyama 1991).

    est, gt: (N, 3). Returns (R (3,3), t (3,), s scalar).
    """
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    e = est - mu_e
    g = gt - mu_g
    cov = g.T @ e / est.shape[0]
    u, d, vt = np.linalg.svd(cov)
    s_mat = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_mat[2, 2] = -1
    rot = u @ s_mat @ vt
    if with_scale:
        var_e = (e ** 2).sum() / est.shape[0]
        scale = float(np.trace(np.diag(d) @ s_mat) / var_e)
    else:
        scale = 1.0
    t = mu_g - scale * rot @ mu_e
    return rot, t, scale


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE of aligned positions), meters."""
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    if align:
        rot, t, s = umeyama_align(est, gt)
        est = (s * (rot @ est.T)).T + t
    return float(np.sqrt(((est - gt) ** 2).sum(axis=1).mean()))


def rpe(est: np.ndarray, gt: np.ndarray, delta: int = 1):
    """Relative pose error over position increments at frame spacing delta.
    Returns (rmse_trans, per-step errors)."""
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    d_e = est[delta:] - est[:-delta]
    d_g = gt[delta:] - gt[:-delta]
    err = np.linalg.norm(d_e - d_g, axis=1)
    return float(np.sqrt((err ** 2).mean())), err
