"""Neighbor search tests vs NumPy brute force."""

import numpy as np
import jax.numpy as jnp

from aloam_tpu import neighbors


def test_nn1_matches_brute_force(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    r = rng.normal(size=(300, 3)).astype(np.float32)
    m = rng.uniform(size=300) > 0.3
    d2, idx = neighbors.nn1(jnp.asarray(q), jnp.asarray(r), jnp.asarray(m))
    ref_d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    ref_d2[:, ~m] = np.inf
    np.testing.assert_allclose(np.asarray(d2), ref_d2.min(1), rtol=1e-4,
                               atol=1e-5)
    # indices must achieve the min distance (ties allowed)
    np.testing.assert_allclose(
        ref_d2[np.arange(100), np.asarray(idx)], ref_d2.min(1),
        rtol=1e-4, atol=1e-5)


def test_knn_matches_brute_force(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    r = rng.normal(size=(500, 3)).astype(np.float32)
    m = rng.uniform(size=500) > 0.2
    d2, idx = neighbors.knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(m),
                            k=5)
    ref_d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    ref_d2[:, ~m] = np.inf
    ref_top = np.sort(ref_d2, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(d2), ref_top, rtol=1e-4, atol=1e-5)


def test_streamed_equals_dense(rng):
    q = rng.normal(size=(32, 3)).astype(np.float32) * 10
    r = rng.normal(size=(1000, 3)).astype(np.float32) * 10
    m = rng.uniform(size=1000) > 0.1
    d_a, i_a = neighbors.knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(m),
                             k=5)
    d_b, i_b = neighbors.knn_streamed(jnp.asarray(q), jnp.asarray(r),
                                      jnp.asarray(m), k=5, chunk=128)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=1e-4,
                               atol=1e-5)


def test_all_masked_gives_inf(rng):
    q = rng.normal(size=(8, 3)).astype(np.float32)
    r = rng.normal(size=(16, 3)).astype(np.float32)
    d2, _ = neighbors.nn1(jnp.asarray(q), jnp.asarray(r),
                          jnp.zeros(16, bool))
    assert np.all(np.isinf(np.asarray(d2)))


def test_odom_window_mins_matches_dense(rng):
    """The streamed two-pass correspondence minima must equal the dense
    (Q, M) distance-matrix formulation, including first-index tie-breaks."""
    import numpy as np
    q = rng.uniform(-10, 10, size=(37, 3)).astype(np.float32)
    r = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    ring = np.sort(rng.integers(0, 16, size=500)).astype(np.int32)
    m = rng.uniform(size=500) > 0.1

    out = neighbors.odom_window_mins(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(m), jnp.asarray(ring),
        nearby_scan=2, want_same_ring=True, chunk=128)
    d2_nn, nn, d2_diff, idx_diff, d2_same, idx_same = map(np.asarray, out)

    d2 = ((q[:, None] - r[None]) ** 2).sum(-1)
    d2[:, ~m] = np.inf
    nn_ref = d2.argmin(1)
    np.testing.assert_array_equal(nn, nn_ref)
    np.testing.assert_allclose(d2_nn, d2.min(1), rtol=1e-4, atol=1e-5)

    adiff = np.abs(ring[None, :] - ring[nn_ref][:, None])
    dd = np.where((adiff >= 1) & (adiff <= 2), d2, np.inf)
    np.testing.assert_array_equal(idx_diff, dd.argmin(1))
    ds = np.where((adiff == 0)
                  & (np.arange(500)[None, :] != nn_ref[:, None]), d2, np.inf)
    np.testing.assert_array_equal(idx_same, ds.argmin(1))
    np.testing.assert_allclose(d2_same, ds.min(1), rtol=1e-4, atol=1e-5)
