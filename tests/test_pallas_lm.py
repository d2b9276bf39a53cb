"""pallas_lm.lm_fused (interpret mode) vs the vmapped solver.lm_solve.

The fused kernel reimplements the ENTIRE fixed-iteration LM solve in one
dispatch (ops/pallas_lm.py). Its contract is pose agreement within f32
tolerance, not bit-exactness: reductions sum in a different order than
XLA's HIGHEST einsums and the 6x6 solve is unpivoted elimination instead
of pivoted LU, so an accept/reject could in principle flip on an exact
cost tie — the cases here are constructed with clear margins.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aloam_tpu import geometry as geo
from aloam_tpu import solver
from aloam_tpu.ops import pallas_lm


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _factors(rng, b, ne, npl, frac_valid=0.7, offset=0.0, poison=False,
             aligned_normals=False):
    """Well-conditioned synthetic edge+plane factor batches: points on
    known lines/planes near a recoverable pose."""
    e_p = rng.normal(scale=8.0, size=(b, ne, 3)).astype(np.float32)
    e_a = e_p + rng.normal(scale=0.05, size=(b, ne, 3)).astype(np.float32)
    dirs = rng.normal(size=(b, ne, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    e_b = e_a + 0.4 * dirs
    e_m = rng.random((b, ne)) < frac_valid
    p_p = rng.normal(scale=8.0, size=(b, npl, 3)).astype(np.float32)
    if aligned_normals:
        # identical normals: the per-factor offsets add instead of
        # cancelling, so `offset` drives a full-size translation update
        n = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (b, npl, 1))
        n = n + rng.normal(scale=0.02, size=(b, npl, 3)).astype(np.float32)
    else:
        n = rng.normal(size=(b, npl, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = (-np.sum(n * p_p, axis=-1) + offset
         + rng.normal(scale=0.02, size=(b, npl))).astype(np.float32)
    p_m = rng.random((b, npl)) < frac_valid
    if poison:
        # masked rows carry non-finite padding — must not leak (the
        # where-zeroing guard of solver._accumulate)
        e_p[~e_m] = np.inf
        p_p[~p_m] = np.nan
    edges = solver.EdgeFactors(p=jnp.asarray(e_p), a=jnp.asarray(e_a),
                               b=jnp.asarray(e_b), mask=jnp.asarray(e_m))
    planes = solver.PlaneFactors(p=jnp.asarray(p_p), n=jnp.asarray(n),
                                 d=jnp.asarray(d), mask=jnp.asarray(p_m))
    return edges, planes


def _run_both(edges, planes, q0, t0, iters=4, delta=0.1):
    ef = pallas_lm.pack_edge_channels(edges)
    pf = pallas_lm.pack_plane_channels(planes)
    pose = jnp.concatenate([q0, t0, jnp.zeros_like(t0[:, :1])], axis=1)
    out = pallas_lm.lm_fused(ef, pf, pose, iters, delta, interpret=True)
    ref = jax.vmap(lambda e, p, qq, tt: solver.lm_solve(
        (e, p), qq, tt, iters, delta))(edges, planes, q0, t0)
    return out, ref


def test_lm_fused_matches_solver(rng):
    b, ne, npl = 3, 256, 384
    edges, planes = _factors(rng, b, ne, npl, poison=True)
    q0 = jnp.asarray(np.tile(
        np.array([[0.999, 0.02, -0.03, 0.01]], np.float32), (b, 1)))
    q0 = geo.qnormalize(q0)
    t0 = jnp.asarray(rng.normal(scale=0.1, size=(b, 3)).astype(np.float32))
    out, (q_r, t_r, st_r) = _run_both(edges, planes, q0, t0)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, 0:4], np.asarray(q_r),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(out[:, 4:7], np.asarray(t_r),
                               atol=2e-4, rtol=0)
    np.testing.assert_allclose(out[:, 7], np.asarray(st_r.cost0),
                               rtol=2e-4)
    np.testing.assert_allclose(out[:, 8], np.asarray(st_r.cost), rtol=2e-3)
    np.testing.assert_array_equal(out[:, 9].astype(np.int32),
                                  np.asarray(st_r.n_factors))
    np.testing.assert_array_equal(out[:, 10].astype(np.int32),
                                  np.asarray(st_r.clamped))
    np.testing.assert_array_equal(out[:, 11].astype(np.int32),
                                  np.asarray(st_r.nonfinite))


def test_lm_fused_clamps_oversized_updates(rng):
    # aligned planes all offset by 20 m and no edges -> the first
    # translation update exceeds the 5 m clamp in both implementations
    b = 2
    edges, planes = _factors(rng, b, 128, 256, offset=20.0,
                             aligned_normals=True)
    edges = edges._replace(mask=jnp.zeros_like(edges.mask))
    q0 = jnp.broadcast_to(geo.qidentity(), (b, 4))
    t0 = jnp.zeros((b, 3), jnp.float32)
    out, (q_r, t_r, st_r) = _run_both(edges, planes, q0, t0)
    out = np.asarray(out)
    assert (out[:, 10] >= 1).all()
    np.testing.assert_array_equal(out[:, 10].astype(np.int32),
                                  np.asarray(st_r.clamped))
    np.testing.assert_allclose(out[:, 4:7], np.asarray(t_r), atol=2e-3)


def test_lm_fused_empty_problem_is_identity(rng):
    b = 2
    edges, planes = _factors(rng, b, 128, 128, frac_valid=0.0)
    q0 = geo.qnormalize(jnp.asarray(
        rng.normal(size=(b, 4)).astype(np.float32)))
    t0 = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
    out, (q_r, t_r, st_r) = _run_both(edges, planes, q0, t0)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, 0:4], np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(out[:, 4:7], np.asarray(t0), atol=1e-6)
    assert (out[:, 9] == 0).all()


def test_lm_solve_b_dispatches_xla_off_tpu(rng):
    # on CPU the gate returns False -> lm_solve_b must equal the vmapped
    # solver exactly (it IS the vmapped solver)
    b = 2
    edges, planes = _factors(rng, b, 128, 128)
    q0 = jnp.broadcast_to(geo.qidentity(), (b, 4))
    t0 = jnp.zeros((b, 3), jnp.float32)
    q, t, st = solver.lm_solve_b(edges, planes, q0, t0, 4, 0.1)
    q_r, t_r, st_r = jax.vmap(lambda e, p, qq, tt: solver.lm_solve(
        (e, p), qq, tt, 4, 0.1))(edges, planes, q0, t0)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_r))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t_r))
    np.testing.assert_array_equal(np.asarray(st.n_factors),
                                  np.asarray(st_r.n_factors))
