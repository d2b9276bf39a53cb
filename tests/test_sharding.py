"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aloam_tpu.config import AloamConfig
from aloam_tpu import pipeline
from aloam_tpu.io import synthetic as syn
from aloam_tpu.parallel import (batched_init, batched_step_fn, make_mesh,
                                sharded_knn)

CFG = AloamConfig(
    scan_lines=16, minimum_range=0.3,
    line_resolution=0.2, plane_resolution=0.4,
    n_raw=4096, ring_cap=256, less_flat_cap=2048,
    map_table_corner=1024, map_table_surf=2048,
    corner_stack_cap=256, surf_stack_cap=1024,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(4, 2)


def test_batched_streams_match_single(mesh):
    """4 identical streams sharded over the mesh must each reproduce the
    single-stream result."""
    scans, _ = syn.make_sequence(2, scan_lines=16, n_azimuth=256, seed=3,
                                 speed=1.0)
    xyz1, mask1 = syn.pad_scan(scans[0], CFG.n_raw)
    xyz2, mask2 = syn.pad_scan(scans[1], CFG.n_raw)

    # single stream
    step = pipeline.make_step_fn(CFG, donate=False)
    st = pipeline.init_state(CFG)
    st, _ = step(st, jnp.asarray(xyz1), jnp.asarray(mask1))
    st, out1 = step(st, jnp.asarray(xyz2), jnp.asarray(mask2))

    # batched
    batch = 4
    bstep = batched_step_fn(CFG, mesh)
    bst = batched_init(CFG, batch)
    bx1 = jnp.asarray(np.broadcast_to(xyz1, (batch,) + xyz1.shape))
    bm1 = jnp.asarray(np.broadcast_to(mask1, (batch,) + mask1.shape))
    bx2 = jnp.asarray(np.broadcast_to(xyz2, (batch,) + xyz2.shape))
    bm2 = jnp.asarray(np.broadcast_to(mask2, (batch,) + mask2.shape))
    bst, _ = bstep(bst, bx1, bm1)
    bst, bout = bstep(bst, bx2, bm2)

    ref = np.asarray(out1.t_map)
    got = np.asarray(bout.t_map)
    for b in range(batch):
        np.testing.assert_allclose(got[b], ref, atol=1e-4)


def test_sharded_knn_matches_dense(mesh, rng):
    q = rng.normal(size=(64, 3)).astype(np.float32) * 5
    ref = rng.normal(size=(1024, 3)).astype(np.float32) * 5
    m = np.ones(1024, bool)
    d2, idx = sharded_knn(mesh, k=5)(jnp.asarray(q), jnp.asarray(ref),
                                     jnp.asarray(m))
    dd = ((q[:, None] - ref[None]) ** 2).sum(-1)
    top = np.sort(dd, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(d2), top, rtol=1e-4, atol=1e-5)
