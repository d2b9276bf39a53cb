"""Tests for the closed-form 3x3 linalg and the persistent map grid."""

import numpy as np
import jax.numpy as jnp

from aloam_tpu.ops import gridmap
from aloam_tpu.ops.linalg3 import eigh3, solve3


def test_solve3_matches_numpy(rng):
    a = rng.normal(size=(200, 3, 3))
    a = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(3)
    b = rng.normal(size=(200, 3))
    x = np.asarray(solve3(jnp.asarray(a, jnp.float32),
                          jnp.asarray(b, jnp.float32)))
    ref = np.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-4)


def test_eigh3_matches_numpy(rng):
    a = rng.normal(size=(500, 3, 3))
    a = a @ a.transpose(0, 2, 1)
    vals, vmax = eigh3(jnp.asarray(a, jnp.float32))
    ref_vals, ref_vecs = np.linalg.eigh(a)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=5e-3,
                               atol=5e-3)
    # principal eigenvector alignment for well-separated spectra
    sep = (ref_vals[:, 2] - ref_vals[:, 1]) > 0.1 * np.abs(ref_vals[:, 2])
    dots = np.abs(np.sum(np.asarray(vmax) * ref_vecs[:, :, 2], axis=-1))
    assert (dots[sep] > 0.999).all()


def test_eigh3_degenerate_is_finite():
    a = jnp.broadcast_to(2.0 * jnp.eye(3), (4, 3, 3))
    vals, v = eigh3(a)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(v)).all()
    np.testing.assert_allclose(np.asarray(vals), 2.0, atol=1e-5)


def _grid_from_points(pts, table=16384, bucket=48, leaf=1e-3):
    """Insert raw points with a tiny leaf so nothing merges."""
    g = gridmap.empty(table, bucket)
    pts_j = jnp.asarray(pts, jnp.float32)
    g, merged, appended, evicted, dropped = gridmap.insert(
        g, pts_j, jnp.zeros(pts.shape[0], jnp.float32),
        jnp.ones(pts.shape[0], bool), leaf, 2.0,
        jnp.zeros(3, jnp.int32), jnp.asarray([500, 500, 500], jnp.int32))
    assert int(dropped) == 0 and int(merged) == 0
    return g


def _dense_gated_knn(q, pts, k):
    d2 = ((q[:, None] - pts[None]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_grid_knn_matches_dense_when_gated(rng):
    pts = rng.uniform(-30, 30, size=(4000, 3)).astype(np.float32)
    q = (pts[rng.integers(0, 4000, size=300)]
         + rng.normal(scale=0.3, size=(300, 3))).astype(np.float32)

    grid = _grid_from_points(pts)
    d2, nbrs = gridmap.knn(grid, jnp.asarray(q), 5, 2.0, 1.0)
    d2 = np.asarray(d2)
    nbrs = np.asarray(nbrs)

    ref_d2, ref_idx = _dense_gated_knn(q, pts, 5)
    for i in range(300):
        if ref_d2[i, 4] < 1.0:  # the gate the mapping stage applies
            np.testing.assert_allclose(d2[i], ref_d2[i], rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_allclose(nbrs[i], pts[ref_idx[i]], atol=1e-5)
        else:
            assert not (d2[i, 4] < 1.0)


def test_grid_insert_merges_voxel_centroids(rng):
    """Two same-voxel inserts across frames must produce the iterated
    centroid the reference's re-voxelization computes."""
    g = gridmap.empty(1024, 16)
    p1 = np.array([[1.05, 2.05, 0.55]], np.float32)
    p2 = np.array([[1.15, 2.1, 0.5]], np.float32)  # same 0.8 voxel
    center = jnp.zeros(3, jnp.int32)
    win = jnp.asarray([500, 500, 500], jnp.int32)
    one = jnp.ones(1, bool)
    g, m1, a1, _, _ = gridmap.insert(g, jnp.asarray(p1), jnp.ones(1), one,
                                     0.8, 2.0, center, win)
    assert int(m1) == 0 and int(a1) == 1
    g, m2, a2, _, _ = gridmap.insert(g, jnp.asarray(p2), jnp.zeros(1), one,
                                     0.8, 2.0, center, win)
    assert int(m2) == 1 and int(a2) == 0
    pts, inten = gridmap.extract(g)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], 0.5 * (p1[0] + p2[0]), atol=1e-6)
    np.testing.assert_allclose(inten[0], 0.5, atol=1e-6)


def test_grid_eviction_prefers_out_of_window(rng):
    """With a full bucket, far out-of-window entries are evicted first."""
    g = gridmap.empty(1, 4)  # single bucket: everything collides
    center = jnp.zeros(3, jnp.int32)
    win = jnp.asarray([5, 5, 5], jnp.int32)  # +-5 cells of 2 m
    one = jnp.ones(1, bool)

    def put(g, p):
        return gridmap.insert(g, jnp.asarray([p], jnp.float32),
                              jnp.zeros(1), one, 0.1, 2.0, center, win)

    g, *_ = put(g, [100.0, 0, 0])     # far outside the window
    g, *_ = put(g, [1.0, 0, 0])
    g, *_ = put(g, [2.0, 1, 0])
    g, *_ = put(g, [3.0, 0, 1])
    g, _, _, ev, _ = put(g, [4.0, 1, 1])  # bucket full -> evict the far one
    assert int(ev) == 1
    pts, _ = gridmap.extract(g)
    assert pts.shape[0] == 4
    assert pts[:, 0].max() < 50.0  # the out-of-window entry is gone


def test_grid_no_duplicate_candidates(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    grid = _grid_from_points(pts, table=256, bucket=96)
    q = pts[:100] + 0.01
    d2, nbrs = gridmap.knn(grid, jnp.asarray(q), 5, 2.0, 1.0)
    nbrs = np.asarray(nbrs)
    d2 = np.asarray(d2)
    for i in range(100):
        got = nbrs[i][d2[i] < 1.0]  # the gated set must be duplicate-free
        uniq = np.unique(np.round(got, 5), axis=0)
        assert uniq.shape[0] == got.shape[0], f"duplicates at query {i}"
