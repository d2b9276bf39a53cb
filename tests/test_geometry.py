"""Geometry unit tests: quaternion ops vs closed-form / scipy-free oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from aloam_tpu import geometry as geo


def _rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_qmul_matches_matrix_product(rng):
    qa = _rand_quats(rng, 32)
    qb = _rand_quats(rng, 32)
    q_ab = geo.qmul(jnp.asarray(qa), jnp.asarray(qb))
    m_ab = geo.q_to_mat(q_ab)
    m_ref = np.array(geo.q_to_mat(jnp.asarray(qa))) @ np.array(
        geo.q_to_mat(jnp.asarray(qb)))
    np.testing.assert_allclose(np.array(m_ab), m_ref, atol=1e-5)


def test_qrot_matches_matrix(rng):
    q = _rand_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    out = geo.qrot(jnp.asarray(q), jnp.asarray(v))
    ref = np.einsum("nij,nj->ni", np.array(geo.q_to_mat(jnp.asarray(q))), v)
    np.testing.assert_allclose(np.array(out), ref, atol=1e-5)


def test_qinv_roundtrip(rng):
    q = _rand_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    out = geo.qrot(jnp.asarray(q), geo.qrot_inv(jnp.asarray(q),
                                                jnp.asarray(v)))
    np.testing.assert_allclose(np.array(out), v, atol=1e-5)


def test_mat_to_q_roundtrip(rng):
    q = _rand_quats(rng, 64)
    q = np.where(q[:, :1] < 0, -q, q)  # unique representative
    q2 = geo.mat_to_q(geo.q_to_mat(jnp.asarray(q)))
    q2 = np.array(q2)
    q2 = np.where(q2[:, :1] < 0, -q2, q2)
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_exp_log_roundtrip(rng):
    # stay inside the injectivity radius (|phi| < pi) so log(exp(.)) = id
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    phi = d * rng.uniform(0.0, 3.0, size=(64, 1))
    phi2 = np.array(geo.log_so3(geo.exp_so3(jnp.asarray(phi))))
    np.testing.assert_allclose(phi2, phi, atol=1e-5)


def test_exp_so3_small_angle(rng):
    phi = rng.normal(size=(8, 3)) * 1e-6
    q = np.array(geo.exp_so3(jnp.asarray(phi)))
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-8)
    np.testing.assert_allclose(q[:, 1:], phi / 2, atol=1e-9)


def test_retract_matches_left_multiply(rng):
    q = _rand_quats(rng, 8)
    d = rng.normal(size=(8, 3)) * 0.1
    out = np.array(geo.retract(jnp.asarray(q), jnp.asarray(d)))
    ref = np.array(geo.qmul(geo.exp_so3(jnp.asarray(d)), jnp.asarray(q)))
    ref /= np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_slerp_endpoints_and_midpoint(rng):
    q0 = _rand_quats(rng, 8)
    q1 = _rand_quats(rng, 8)
    s0 = np.array(geo.slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0))
    s1 = np.array(geo.slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0))
    np.testing.assert_allclose(np.abs(np.sum(s0 * q0, axis=-1)), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(s1 * q1, axis=-1)), 1.0,
                               atol=1e-5)
    # slerp from identity by s equals exp(s * log(q)) for the w>=0 rep
    q = _rand_quats(rng, 8)
    q = np.where(q[:, :1] < 0, -q, q)
    ident = np.tile(np.array([1.0, 0, 0, 0]), (8, 1))
    mid = np.array(geo.slerp(jnp.asarray(ident), jnp.asarray(q), 0.37))
    ref = np.array(geo.exp_so3(0.37 * geo.log_so3(jnp.asarray(q))))
    assert (np.abs(np.sum(mid * ref, axis=-1)) > 1 - 1e-5).all()


def test_compose_inverse(rng):
    qa, ta = _rand_quats(rng, 8), rng.normal(size=(8, 3))
    qi, ti = geo.inverse_pose(jnp.asarray(qa), jnp.asarray(ta))
    qc, tc = geo.compose(jnp.asarray(qa), jnp.asarray(ta), qi, ti)
    np.testing.assert_allclose(np.array(tc), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.array(qc)[:, 0]), 1.0, atol=1e-5)


def test_skew_cross(rng):
    v = rng.normal(size=(8, 3))
    u = rng.normal(size=(8, 3))
    out = np.einsum("nij,nj->ni", np.array(geo.skew(jnp.asarray(v))), u)
    np.testing.assert_allclose(out, np.cross(v, u), atol=1e-6)


def test_all_ops_jit_and_vmap(rng):
    q = jnp.asarray(_rand_quats(rng, 8))
    v = jnp.asarray(rng.normal(size=(8, 3)))
    f = jax.jit(jax.vmap(lambda qq, vv: geo.qrot(geo.retract(qq, vv * 0.01),
                                                 vv)))
    assert f(q, v).shape == (8, 3)
