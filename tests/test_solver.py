"""Solver tests: analytic Jacobians vs autodiff, pose recovery, robustness."""

import numpy as np
import jax
import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import solver


def _rand_pose(rng, scale_r=0.5, scale_t=1.0):
    q = geo.exp_so3(jnp.asarray(rng.normal(size=3) * scale_r))
    t = jnp.asarray(rng.normal(size=3) * scale_t, jnp.float32)
    return q, t


def _tangent_jacfwd(res_fn, q, t):
    """Autodiff Jacobian of res through the retraction, at delta = 0."""
    def at(delta):
        dq = delta[:3]
        dt = delta[3:]
        return res_fn(geo.retract(q, dq), t + dt)
    return jax.jacfwd(at)(jnp.zeros(6))


def test_edge_jacobian_matches_autodiff(rng):
    q, t = _rand_pose(rng)
    f = solver.EdgeFactors(
        p=jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        a=jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        b=jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        mask=jnp.ones(5, bool))
    r, jac = solver.edge_residuals(f, q, t)
    jac_ad = _tangent_jacfwd(lambda qq, tt: solver.edge_residuals(
        f, qq, tt)[0], q, t)
    np.testing.assert_allclose(np.asarray(jac),
                               np.asarray(jac_ad), atol=1e-4)


def test_plane_jacobian_matches_autodiff(rng):
    q, t = _rand_pose(rng)
    n = rng.normal(size=(5, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    f = solver.PlaneFactors(
        p=jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        n=jnp.asarray(n, jnp.float32),
        d=jnp.asarray(rng.normal(size=5), jnp.float32),
        mask=jnp.ones(5, bool))
    _, jac = solver.plane_residuals(f, q, t)
    jac_ad = _tangent_jacfwd(lambda qq, tt: solver.plane_residuals(
        f, qq, tt)[0], q, t)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                               atol=1e-4)


def test_point_jacobian_matches_autodiff(rng):
    q, t = _rand_pose(rng)
    f = solver.PointFactors(
        p=jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        target=jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
        mask=jnp.ones(5, bool))
    _, jac = solver.point_residuals(f, q, t)
    jac_ad = _tangent_jacfwd(lambda qq, tt: solver.point_residuals(
        f, qq, tt)[0], q, t)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                               atol=1e-4)


def _make_world_factors(rng, q_gt, t_gt, n_edge=60, n_plane=120,
                        noise=0.0):
    """Factors whose residuals vanish at (q_gt, t_gt)."""
    # edges: vertical-ish lines; sample p so that q_gt p + t_gt lies on line
    a = rng.normal(size=(n_edge, 3)) * 5
    dirs = rng.normal(size=(n_edge, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    b = a + dirs
    lam = rng.uniform(-1, 1, size=(n_edge, 1))
    on_line = a + lam * dirs + rng.normal(size=(n_edge, 3)) * noise
    p_edge = geo.qrot_inv(q_gt, jnp.asarray(on_line, jnp.float32)
                          - t_gt)
    edges = solver.EdgeFactors(p=p_edge, a=jnp.asarray(a, jnp.float32),
                               b=jnp.asarray(b, jnp.float32),
                               mask=jnp.ones(n_edge, bool))
    # planes
    n = rng.normal(size=(n_plane, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    d = rng.uniform(-5, 5, size=n_plane)
    # point on plane: x with n·x + d = 0
    x0 = -d[:, None] * n
    tang = np.cross(n, rng.normal(size=(n_plane, 3)))
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    on_plane = x0 + tang * rng.uniform(-3, 3, size=(n_plane, 1)) \
        + n * rng.normal(size=(n_plane, 1)) * noise
    p_plane = geo.qrot_inv(q_gt, jnp.asarray(on_plane, jnp.float32) - t_gt)
    planes = solver.PlaneFactors(p=p_plane, n=jnp.asarray(n, jnp.float32),
                                 d=jnp.asarray(d, jnp.float32),
                                 mask=jnp.ones(n_plane, bool))
    return edges, planes


def test_lm_recovers_pose(rng):
    q_gt, t_gt = _rand_pose(rng, scale_r=0.2, scale_t=0.5)
    edges, planes = _make_world_factors(rng, q_gt, t_gt)
    q0 = geo.qidentity()
    t0 = jnp.zeros(3)
    q, t, stats = jax.jit(solver.lm_solve, static_argnums=(3,))(
        (edges, planes), q0, t0, 12)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=2e-3)
    dq = geo.qmul(geo.qconj(q_gt), q)
    assert abs(float(dq[0])) > 1 - 1e-5
    assert float(stats.cost) < float(stats.cost0) * 1e-3


def test_lm_robust_to_outliers(rng):
    q_gt, t_gt = _rand_pose(rng, scale_r=0.1, scale_t=0.3)
    edges, planes = _make_world_factors(rng, q_gt, t_gt, noise=0.005)
    # corrupt 15% of plane offsets heavily
    d = np.asarray(planes.d).copy()
    n_bad = int(0.15 * d.size)
    d[:n_bad] += rng.uniform(2, 5, size=n_bad)
    planes = planes._replace(d=jnp.asarray(d))
    q, t, _ = solver.lm_solve((edges, planes), geo.qidentity(),
                              jnp.zeros(3), 12)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=3e-2)


def test_lm_empty_problem_is_identity(rng):
    edges = solver.EdgeFactors(p=jnp.zeros((8, 3)), a=jnp.zeros((8, 3)),
                               b=jnp.ones((8, 3)), mask=jnp.zeros(8, bool))
    q0, t0 = _rand_pose(rng)
    q, t, stats = solver.lm_solve((edges,), q0, t0, 4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=1e-6)
    assert int(stats.n_factors) == 0


def test_huber_matches_ceres_convention():
    delta = 0.1
    s = jnp.asarray([0.0, 0.005, 0.01, 0.04, 1.0])
    c = np.asarray(solver.huber_cost(s, delta))
    w = np.asarray(solver.huber_weight(s, delta))
    # inside: rho(s) = s ; outside: 2 delta sqrt(s) - delta^2
    np.testing.assert_allclose(c[:3], [0.0, 0.005, 0.01], atol=1e-8)
    np.testing.assert_allclose(c[3], 2 * 0.1 * 0.2 - 0.01, atol=1e-7)
    np.testing.assert_allclose(w[3], 0.1 / 0.2, atol=1e-7)
    np.testing.assert_allclose(w[4], 0.1, atol=1e-7)


def test_masked_factors_do_not_contribute(rng):
    q_gt, t_gt = _rand_pose(rng, 0.1, 0.3)
    edges, planes = _make_world_factors(rng, q_gt, t_gt)
    # append garbage factors with mask off
    bad = solver.PlaneFactors(p=jnp.asarray(rng.normal(size=(30, 3)) * 50,
                                            jnp.float32),
                              n=planes.n[:30], d=planes.d[:30] + 100.0,
                              mask=jnp.zeros(30, bool))
    q1, t1, _ = solver.lm_solve((edges, planes), geo.qidentity(),
                                jnp.zeros(3), 8)
    q2, t2, _ = solver.lm_solve((edges, planes, bad), geo.qidentity(),
                                jnp.zeros(3), 8)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)


def test_distortion_residual_and_jacobian(rng):
    """With per-point time fractions the residual must equal the exact
    slerp-interpolated transform (lidarFactor.hpp:26-33), and the scaled
    Jacobian must match autodiff to first order."""
    from aloam_tpu import geometry as geo2

    q, t = _rand_pose(rng, scale_r=0.05, scale_t=0.3)  # realistic 10 Hz rates
    s = jnp.asarray(rng.uniform(0, 1, size=6), jnp.float32)
    f = solver.EdgeFactors(
        p=jnp.asarray(rng.normal(size=(6, 3)), jnp.float32),
        a=jnp.asarray(rng.normal(size=(6, 3)), jnp.float32),
        b=jnp.asarray(rng.normal(size=(6, 3)), jnp.float32),
        mask=jnp.ones(6, bool), s=s)
    r, jac = solver.edge_residuals(f, q, t)

    # manual exact slerp transform
    qs = geo2.slerp(jnp.broadcast_to(geo2.qidentity(), (6, 4)),
                    jnp.broadcast_to(q, (6, 4)), s)
    u = geo2.qrot(qs, f.p) + s[:, None] * t
    dv = np.asarray(f.a - f.b)
    nu = np.cross(np.asarray(u - f.a), np.asarray(u - f.b))
    ref = nu / np.linalg.norm(dv, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(r), ref, atol=1e-5)

    jac_ad = _tangent_jacfwd(lambda qq, tt: solver.edge_residuals(
        f, qq, tt)[0], q, t)
    # translation block of the Jacobian is exact (d u / d t = s I);
    # the rotation block uses the first-order s-scaling, accurate to
    # O(s(1-s)|theta|) relative — ~6% at 0.09 rad, irrelevant for the
    # solver's fixed point (residuals are exact)
    np.testing.assert_allclose(np.asarray(jac)[:, :, 3:],
                               np.asarray(jac_ad)[:, :, 3:], atol=1e-4)
    np.testing.assert_allclose(np.asarray(jac)[:, :, :3],
                               np.asarray(jac_ad)[:, :, :3], atol=3e-2)


def test_distortion_s_one_matches_undistorted(rng):
    q, t = _rand_pose(rng, 0.2, 0.5)
    p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    f0 = solver.EdgeFactors(p=p, a=a, b=b, mask=jnp.ones(5, bool))
    f1 = solver.EdgeFactors(p=p, a=a, b=b, mask=jnp.ones(5, bool),
                            s=jnp.ones(5, jnp.float32))
    r0, j0 = solver.edge_residuals(f0, q, t)
    r1, j1 = solver.edge_residuals(f1, q, t)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j0), np.asarray(j1), atol=1e-4)


def test_lm_degenerate_factors_stay_finite(rng):
    """Failure-detection hardening (SURVEY.md §5): a rank-1, wildly
    inconsistent problem must keep the pose finite, clamp the oversized
    update, and surface the event in SolveStats."""
    # one active plane factor at the origin with an absurd offset: H is
    # rank one, the unclamped Newton step would be ~1e8 m
    planes = solver.PlaneFactors(
        p=jnp.zeros((4, 3)), n=jnp.asarray([[1.0, 0, 0]] * 4, jnp.float32),
        d=jnp.asarray([1e8, 0, 0, 0], jnp.float32),
        mask=jnp.asarray([True, False, False, False]))
    q0, t0 = geo.qidentity(), jnp.zeros(3)
    q, t, stats = solver.lm_solve((planes,), q0, t0, 4)
    assert np.all(np.isfinite(np.asarray(q)))
    assert np.all(np.isfinite(np.asarray(t)))
    assert int(stats.clamped) >= 1
    # each clamped step moves at most the clamp distance
    assert np.linalg.norm(np.asarray(t)) <= 4 * 5.0 + 1e-3


def test_lm_nonfinite_residuals_fall_back_to_prior(rng):
    """NaN inputs on an *active* factor must be rejected explicitly: the
    pose keeps its prior value and the event is counted."""
    planes = solver.PlaneFactors(
        p=jnp.asarray([[np.nan, 0, 0]] * 2, jnp.float32),
        n=jnp.asarray([[1.0, 0, 0]] * 2, jnp.float32),
        d=jnp.zeros(2, jnp.float32), mask=jnp.ones(2, bool))
    q0, t0 = _rand_pose(rng)
    q, t, stats = solver.lm_solve((planes,), q0, t0, 4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=1e-6)
    assert int(stats.nonfinite) == 4


def test_lm_masked_nonfinite_padding_is_harmless(rng):
    """Masked-out rows carrying inf/NaN padding must not poison H
    (0 * inf = nan hazard)."""
    q_gt, t_gt = _rand_pose(rng, scale_r=0.2, scale_t=0.5)
    edges, planes = _make_world_factors(rng, q_gt, t_gt)
    p = np.asarray(planes.p).copy()
    m = np.asarray(planes.mask).copy()
    p[-3:] = np.inf
    m[-3:] = False
    planes = planes._replace(p=jnp.asarray(p), mask=jnp.asarray(m))
    q, t, stats = solver.lm_solve((edges, planes), geo.qidentity(),
                                  jnp.zeros(3), 12)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=2e-3)
    assert int(stats.nonfinite) == 0
