"""Tests for the closed-form 3x3 linalg and the spatial-hash gated k-NN."""

import numpy as np
import jax.numpy as jnp

from aloam_tpu.ops import hashgrid
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


def _dense_gated_knn(q, pts, mask, k, gate):
    d2 = ((q[:, None] - pts[None]) ** 2).sum(-1)
    d2[:, ~mask] = np.inf
    idx = np.argsort(d2, axis=1)[:, :k]
    top = np.take_along_axis(d2, idx, axis=1)
    return top, idx


def test_hash_knn_matches_dense_when_gated(rng):
    pts = rng.uniform(-30, 30, size=(4000, 3)).astype(np.float32)
    mask = rng.uniform(size=4000) > 0.1
    q = (pts[rng.integers(0, 4000, size=300)]
         + rng.normal(scale=0.3, size=(300, 3))).astype(np.float32)

    grid = hashgrid.build(jnp.asarray(pts), jnp.asarray(mask), 2.0,
                          16384, 48)
    assert int(grid.overflow) == 0
    d2, nbrs = hashgrid.knn(grid, jnp.asarray(q), 5, 2.0, 16384, 1.0)
    d2 = np.asarray(d2)
    nbrs = np.asarray(nbrs)

    ref_d2, ref_idx = _dense_gated_knn(q, pts, mask, 5, 1.0)
    for i in range(300):
        if ref_d2[i, 4] < 1.0:  # the gate the mapping stage applies
            np.testing.assert_allclose(d2[i], ref_d2[i], rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_allclose(
                nbrs[i], pts[ref_idx[i]], atol=1e-5)
        else:
            # gate must fail identically (5th neighbor beyond the cell
            # neighborhood reach or absent)
            assert not (d2[i, 4] < 1.0)


def test_hash_knn_no_duplicate_candidates(rng):
    # densely repeated structure stressing bucket sharing
    base = rng.uniform(-5, 5, size=(50, 3)).astype(np.float32)
    pts = np.concatenate([base + np.array([dx, 0, 0], np.float32)
                          for dx in range(0, 40, 2)])
    mask = np.ones(pts.shape[0], bool)
    grid = hashgrid.build(jnp.asarray(pts), jnp.asarray(mask), 2.0, 1024, 96)
    q = pts[:100] + 0.01
    d2, nbrs = hashgrid.knn(grid, jnp.asarray(q), 5, 2.0, 1024, 1.0)
    nbrs = np.asarray(nbrs)
    d2 = np.asarray(d2)
    for i in range(100):
        got = nbrs[i][np.isfinite(d2[i])]
        uniq = np.unique(np.round(got, 5), axis=0)
        assert uniq.shape[0] == got.shape[0], f"duplicates at query {i}"
