"""Mapping-stage unit tests: persistent-grid map maintenance, PCA line fit,
LSQ plane fit, map-minimum guard."""

import numpy as np
import jax.numpy as jnp

from aloam_tpu import geometry as geo
from aloam_tpu import mapping, solver
from aloam_tpu.config import AloamConfig
from aloam_tpu.ops import gridmap
from aloam_tpu.types import PointCloud


CFG = AloamConfig(n_raw=1024, ring_cap=256, less_flat_cap=1024,
                  map_table_corner=2048, map_table_surf=4096,
                  corner_stack_cap=256, surf_stack_cap=256)


def _pc(xyz, cap):
    n = xyz.shape[0]
    out = np.zeros((cap, 3), np.float32)
    out[:n] = xyz
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return PointCloud(xyz=jnp.asarray(out),
                      intensity=jnp.zeros(cap, jnp.float32),
                      mask=jnp.asarray(mask))


def test_insert_gather_roundtrip(rng):
    state = mapping.init_state(CFG)
    pts = rng.uniform(-40, 40, size=(100, 3)).astype(np.float32)
    corner = _pc(pts, CFG.corner_stack_cap)
    surf = _pc(pts + 0.05, CFG.surf_stack_cap)
    state2, metrics = mapping.mapping_step(
        state, corner, surf, geo.qidentity(), jnp.zeros(3), CFG)
    got, _ = gridmap.extract(state2.corner)
    # identity pose, voxel downsample(0.4) of 100 well-separated points
    assert got.shape[0] > 90
    d = np.abs(got[:, None] - pts[None]).sum(-1).min(1)
    assert d.max() < 0.4  # voxel centroids stay within a leaf


def test_window_eviction_discards_far_map(rng):
    """Entries far outside the rolling window are evicted under bucket
    pressure (the reference's recenter-discard, laserMapping.cpp:345-346)."""
    cfg = CFG.replace(map_table_surf=8, map_bucket_surf=4)
    state = mapping.init_state(cfg)
    pts_a = rng.uniform(-10, 10, size=(40, 3)).astype(np.float32)
    corner = _pc(pts_a, cfg.corner_stack_cap)
    surf = _pc(pts_a, cfg.surf_stack_cap)
    state, _ = mapping.mapping_step(state, corner, surf, geo.qidentity(),
                                    jnp.zeros(3), cfg)
    n_before = int(gridmap.n_valid(state.surf))
    assert n_before > 0

    # sensor leaps far beyond the window; new inserts collide in the tiny
    # table and must evict stale entries rather than drop new ones
    t_far = jnp.asarray([5000.0, 0.0, 0.0], jnp.float32)
    state, m = mapping.mapping_step(state, corner, surf, geo.qidentity(),
                                    t_far, cfg)
    pts_now, _ = gridmap.extract(state.surf)
    assert (pts_now[:, 0] > 4000).sum() > 0  # new region present
    assert int(m.evicted) > 0


def test_invalidate_outside_clears_exactly(rng):
    """gridmap.invalidate_outside clears exactly the out-of-window live
    entries (single and batched shapes) and leaves in-window ones intact."""
    pts = np.concatenate([
        rng.uniform(-5, 5, size=(30, 3)),       # in-window (|cell| <= 3)
        rng.uniform(30, 40, size=(20, 3)),      # out-of-window
    ]).astype(np.float32)
    g = _grid(pts)
    n0 = int(gridmap.n_valid(g))
    assert n0 == 50
    half = jnp.asarray([3, 3, 3], jnp.int32)    # cells of 2 m -> +/- 8 m

    g2, n_cleared = gridmap.invalidate_outside(
        g, jnp.zeros(3, jnp.int32), half)
    assert int(n_cleared) == 20
    assert int(gridmap.n_valid(g2)) == 30
    kept, _ = gridmap.extract(g2)
    assert kept.shape[0] == 30 and np.all(np.abs(kept) < 8.0)

    # batched: stream 0 centered at origin, stream 1 at the far cluster
    gb = gridmap.GridMap(*(jnp.stack([a, a]) for a in g))
    centers = jnp.asarray([[0, 0, 0], [17, 17, 17]], jnp.int32)
    gb2, nc = gridmap.invalidate_outside(gb, centers, half)
    assert nc.shape == (2,)
    assert int(nc[0]) == 20 and int(nc[1]) == 30


def test_evict_and_count_matches_separate_passes(rng):
    """The fused single-pass gridmap.evict_and_count ==
    invalidate_outside + count_near run separately (single and batched,
    eager and lazy)."""
    pts = np.concatenate([
        rng.uniform(-5, 5, size=(30, 3)),
        rng.uniform(30, 40, size=(20, 3)),
    ]).astype(np.float32)
    g = _grid(pts)
    window = jnp.asarray([4, 4, 4], jnp.int32)   # out-of-window exists
    local = jnp.asarray([2, 2, 2], jnp.int32)    # local strictly inside
    center = jnp.zeros(3, jnp.int32)

    ref_g, ref_cleared = gridmap.invalidate_outside(g, center, window)
    ref_near = gridmap.count_near(g, center, local)
    for evict in (True, False):
        g2, cleared, near = gridmap.evict_and_count(
            g, center, window, local, evict)
        assert int(near) == int(ref_near)
        if evict:
            assert int(cleared) == int(ref_cleared)
            for a, b in zip(g2, ref_g):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            assert int(cleared) == 0
            for a, b in zip(g2, g):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    gb = gridmap.GridMap(*(jnp.stack([a, a]) for a in g))
    centers = jnp.asarray([[0, 0, 0], [17, 17, 17]], jnp.int32)
    gb2, cl_b, near_b = gridmap.evict_and_count(gb, centers, window, local)
    rb, cl_ref = gridmap.invalidate_outside(gb, centers, window)
    assert near_b.shape == (2,) and cl_b.shape == (2,)
    np.testing.assert_array_equal(np.asarray(cl_b), np.asarray(cl_ref))
    assert int(near_b[0]) == int(gridmap.count_near_b(
        gb, centers, local)[0])
    for a, b in zip(gb2, rb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eager_evict_discards_left_region_lazy_keeps_it(rng):
    """Leave-and-return semantics (VERDICT r4 #5): with
    ``eager_window_evict`` (the reference's rolling-window discard,
    laserMapping.cpp:323-507) the region left behind is CLEARED the moment
    the pose's window no longer covers it, so a return finds no local map
    support (solve gated off — identical to the reference driving back
    into freed cubes). Lazy mode keeps the stale points and would
    re-associate against them."""
    # shrink the window to 3x3x3 cubes x 4 m -> +/- 6 m (3 cells of 2 m)
    small = CFG.replace(cube_width=3, cube_height=3, cube_depth=3,
                        cube_size=4.0)
    pts = rng.uniform(-4, 4, size=(200, 3)).astype(np.float32)
    corner = _pc(pts, small.corner_stack_cap)
    surf = _pc(pts, small.surf_stack_cap)

    for eager in (True, False):
        cfg = small.replace(eager_window_evict=eager)
        state = mapping.init_state(cfg)
        state, _ = mapping.mapping_step(state, corner, surf,
                                        geo.qidentity(), jnp.zeros(3), cfg)
        assert int(gridmap.n_valid(state.surf)) > 0
        # drive 30 m away: origin leaves the +/-6 m window
        t_far = jnp.asarray([30.0, 0.0, 0.0], jnp.float32)
        state, _ = mapping.mapping_step(state, corner, surf,
                                        geo.qidentity(), t_far, cfg)
        surf_pts, _ = gridmap.extract(state.surf)
        near_origin = int(np.sum(np.abs(surf_pts).max(axis=1) < 5.0))
        if eager:
            assert near_origin == 0, "eager evict left stale origin points"
            # returning finds no local support -> prior held (ref behavior)
            state, m = mapping.mapping_step(
                state, corner, surf, geo.qidentity(), jnp.zeros(3), cfg)
            assert int(m.from_map_surf) == 0
            assert not bool(m.solved)
        else:
            assert near_origin > 0, "lazy mode should keep stale points"


def test_eager_evict_is_transparent_inside_window(rng):
    """While the trajectory never leaves the rolling window (the common
    case), eager and lazy modes are bit-identical — the discard only ever
    touches entries associations can no longer legally see."""
    pts = rng.uniform(-20, 20, size=(200, 3)).astype(np.float32)
    corner = _pc(pts, CFG.corner_stack_cap)
    surf = _pc(pts + 0.05, CFG.surf_stack_cap)
    results = []
    for eager in (True, False):
        cfg = CFG.replace(eager_window_evict=eager)
        state = mapping.init_state(cfg)
        traj = []
        for f in range(3):
            t = jnp.asarray([2.0 * f, 0.0, 0.0], jnp.float32)
            state, m = mapping.mapping_step(state, corner, surf,
                                            geo.qidentity(), t, cfg)
            traj.append(np.asarray(state.t_w))
        results.append((np.stack(traj), np.asarray(state.q_w),
                        gridmap.extract(state.surf)[0]))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])
    np.testing.assert_array_equal(np.sort(results[0][2], axis=0),
                                  np.sort(results[1][2], axis=0))


def _grid(map_pts):
    g = gridmap.empty(4096, 64)
    n = map_pts.shape[0]
    g, _, _, _, dropped = gridmap.insert(
        g, jnp.asarray(map_pts, jnp.float32), jnp.zeros(n, jnp.float32),
        jnp.ones(n, bool), 1e-3, CFG.knn_cell,
        jnp.zeros(3, jnp.int32), jnp.asarray([500] * 3, jnp.int32))
    assert int(dropped) == 0
    return g


def test_corner_association_finds_line(rng):
    # map: a dense vertical line at (1, 2); query point near it
    zline = np.linspace(0, 3, 40).astype(np.float32)
    map_pts = np.stack([np.full(40, 1.0), np.full(40, 2.0), zline], -1)
    map_pts += rng.normal(scale=0.01, size=map_pts.shape).astype(np.float32)
    q_pts = np.array([[1.02, 2.01, 1.5]], np.float32)
    f = mapping.corner_associations(
        jnp.asarray(q_pts), jnp.ones(1, bool), _grid(map_pts),
        geo.qidentity(), jnp.zeros(3), CFG)
    assert bool(f.mask[0])
    direction = np.asarray(f.a[0] - f.b[0])
    direction = direction / np.linalg.norm(direction)
    assert abs(direction[2]) > 0.99  # vertical


def test_surf_association_finds_plane(rng):
    # map: the plane z = 0.5 sampled densely
    g = np.stack(np.meshgrid(np.linspace(-1, 1, 10), np.linspace(-1, 1, 10),
                             indexing="ij"), -1).reshape(-1, 2)
    map_pts = np.concatenate([g, np.full((100, 1), 0.5)],
                             -1).astype(np.float32)
    q_pts = np.array([[0.1, -0.2, 0.52]], np.float32)
    f = mapping.surf_associations(
        jnp.asarray(q_pts), jnp.ones(1, bool), _grid(map_pts),
        geo.qidentity(), jnp.zeros(3), CFG)
    assert bool(f.mask[0])
    n = np.asarray(f.n[0])
    assert abs(n[2]) > 0.999
    # residual at the query = distance to plane = 0.02
    r, _ = solver.plane_residuals(f, geo.qidentity(), jnp.zeros(3))
    np.testing.assert_allclose(abs(float(r[0, 0])), 0.02, atol=2e-3)


def test_plane_fit_matches_lstsq(rng):
    """The 3x3 normal-equation plane fit equals colPivHouseholderQr-style
    least squares (laserMapping.cpp:663)."""
    for _ in range(20):
        # tight cluster so the gated 5-NN (1.0 m2) finds all five points
        near = rng.uniform(-0.3, 0.3, size=(5, 3))
        near[:, 2] = 0.3 * near[:, 0] - 0.2 * near[:, 1] + 1.0 \
            + rng.normal(scale=0.02, size=5)
        n_ref, *_ = np.linalg.lstsq(near, -np.ones(5), rcond=None)
        f = mapping.surf_associations(
            jnp.asarray(near[:1], jnp.float32), jnp.ones(1, bool),
            _grid(near.astype(np.float32)),
            geo.qidentity(), jnp.zeros(3), CFG)
        n_hat_ref = n_ref / np.linalg.norm(n_ref)
        dot = abs(float(np.dot(np.asarray(f.n[0]), n_hat_ref)))
        assert dot > 1 - 1e-4


def test_no_solve_below_map_minimums(rng):
    """With a nearly-empty map the pose must remain the initial guess
    (laserMapping.cpp:554,730-733)."""
    state = mapping.init_state(CFG)
    pts = rng.uniform(-5, 5, size=(8, 3)).astype(np.float32)
    corner = _pc(pts, CFG.corner_stack_cap)
    surf = _pc(pts, CFG.surf_stack_cap)
    q_odom = geo.exp_so3(jnp.asarray([0.0, 0.0, 0.3]))
    t_odom = jnp.asarray([1.0, 2.0, 0.1])
    state2, metrics = mapping.mapping_step(state, corner, surf, q_odom,
                                           t_odom, CFG)
    assert not bool(metrics.solved)
    np.testing.assert_allclose(np.asarray(state2.t_w), np.asarray(t_odom),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.q_w), np.asarray(q_odom),
                               atol=1e-6)


def test_teleport_holds_odometry_prior(rng):
    """Local map-support gate parity (laserMapping.cpp:554,730-733): after a
    teleport far from all map mass the solve must be skipped — the local
    5x5x3-cube neighborhood is empty even though the global map is big."""
    state = mapping.init_state(CFG)
    pts = rng.uniform(-20, 20, size=(200, 3)).astype(np.float32)
    corner = _pc(pts, CFG.corner_stack_cap)
    surf = _pc(pts, CFG.surf_stack_cap)
    state, m0 = mapping.mapping_step(state, corner, surf, geo.qidentity(),
                                     jnp.zeros(3), CFG)
    state, m1 = mapping.mapping_step(state, corner, surf, geo.qidentity(),
                                     jnp.zeros(3), CFG)
    assert bool(m1.solved)  # plenty of local support at the origin

    # teleport beyond the local 5x5x3-cube window (2.5 cubes x 50 m = 125 m
    # half-extent): global map is unchanged but local support is zero
    q_odom = geo.exp_so3(jnp.asarray([0.0, 0.0, 0.2]))
    t_odom = jnp.asarray([1000.0, -500.0, 0.0])
    state2, m2 = mapping.mapping_step(state, corner, surf, q_odom,
                                      t_odom, CFG)
    assert not bool(m2.solved)
    assert int(m2.from_map_corner) == 0 and int(m2.from_map_surf) == 0
    # the pose holds the odometry prior exactly (correction was identity)
    np.testing.assert_allclose(np.asarray(state2.t_w), np.asarray(t_odom),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.q_w), np.asarray(q_odom),
                               atol=1e-6)
