"""Batched (``*_b``) kernels vs their single-stream twins.

Every gather/scatter-bearing kernel carries an explicitly batched twin
(``aloam_tpu/utils/batch.py`` explains why ``jax.vmap`` is not used). This
file proves each twin reproduces the single-stream kernel per stream.

Equivalence is asserted *per kernel* (under jit), never as a jitted
full-trajectory comparison: XLA fuses the single and batched programs
differently, and the resulting f32 rounding flips threshold gates
(corr-distance / plane-inlier / eigen-ratio). Measured on the tiny test
scene, the SAME single-stream step jitted vs eager already drifts up to
21 mm and ±11 factor counts after two frames — so a tight jitted
batched-vs-single trajectory assert would test XLA's rounding, not our
batching. An eager op-by-op audit of the full ``pipeline.step_b`` matched
``pipeline.step`` exactly (diff 0 everywhere) but takes minutes, so the
trajectory-level guard here is GT-tracking (test_pipeline_step_b_tracks_gt)
plus these kernel equivalences.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aloam_tpu.config import AloamConfig
from aloam_tpu import odometry as od
from aloam_tpu import mapping as mp
from aloam_tpu import pipeline
from aloam_tpu.frontend import (extract_features, extract_features_b,
                                register_scan, register_scan_b,
                                voxel_downsample_masked,
                                voxel_downsample_masked_b)
from aloam_tpu.io import synthetic as syn
from aloam_tpu.ops import gridmap

CFG = AloamConfig(
    scan_lines=16, minimum_range=0.3,
    line_resolution=0.2, plane_resolution=0.4,
    n_raw=4096, ring_cap=256, less_flat_cap=2048,
    map_table_corner=1024, map_table_surf=2048,
    corner_stack_cap=256, surf_stack_cap=1024,
)
B = 3


def _tree_rows(tree, b):
    return jax.tree.map(lambda x: x[b], tree)


def _assert_rows_match(single_list, batched, atol=1e-6, count_atol=0.0):
    """Each stream's slice of the batched output must match its
    single-stream twin. Bool/int leaves are counts/masks (count_atol);
    float leaves get atol."""
    for b in range(B):
        sl = jax.tree.leaves(single_list[b])
        bl = jax.tree.leaves(_tree_rows(batched, b))
        assert len(sl) == len(bl)
        for s, bb in zip(sl, bl):
            s, bb = np.asarray(s), np.asarray(bb)
            assert s.shape == bb.shape, (s.shape, bb.shape)
            if s.dtype == bool or np.issubdtype(s.dtype, np.integer):
                diff = np.abs(s.astype(np.float64) - bb.astype(np.float64))
                assert diff.max(initial=0.0) <= count_atol, diff.max()
            else:
                np.testing.assert_allclose(s, bb, atol=atol, rtol=0)


@pytest.fixture(scope="module")
def frames():
    out = []
    for b in range(B):
        scans, _ = syn.make_sequence(2, scan_lines=16, n_azimuth=256,
                                     seed=30 + b, speed=1.0 + 0.5 * b)
        out.append([syn.pad_scan(s, CFG.n_raw) for s in scans])
    return out


@pytest.fixture(scope="module")
def stacked(frames):
    xyz = jnp.asarray(np.stack([frames[b][0][0] for b in range(B)]))
    mask = jnp.asarray(np.stack([frames[b][0][1] for b in range(B)]))
    return xyz, mask


@pytest.fixture(scope="module")
def singles(frames):
    f = jax.jit(lambda x, m: register_scan(x, m, CFG))
    return [f(jnp.asarray(frames[b][0][0]), jnp.asarray(frames[b][0][1]))
            for b in range(B)]


def test_register_scan_b_matches(frames, stacked, singles):
    rc_b, curv_b, ovf_b = jax.jit(
        lambda x, m: register_scan_b(x, m, CFG))(*stacked)
    _assert_rows_match([(s[0], s[1]) for s in singles], (rc_b, curv_b))
    assert int(ovf_b) == sum(int(s[2]) for s in singles)


def test_extract_features_b_matches(stacked, singles):
    f1 = jax.jit(lambda rc, cv: extract_features(rc, cv, CFG))
    feats_s = [f1(s[0], s[1]) for s in singles]
    rc_b, curv_b, _ = jax.jit(
        lambda x, m: register_scan_b(x, m, CFG))(*stacked)
    feats_b = jax.jit(
        lambda rc, cv: extract_features_b(rc, cv, CFG))(rc_b, curv_b)
    for fld in ["sharp", "less_sharp", "flat", "less_flat", "full"]:
        _assert_rows_match([getattr(f, fld) for f in feats_s],
                           getattr(feats_b, fld))


def test_voxel_downsample_b_matches(rng):
    vals = rng.uniform(-5, 5, size=(B, 500, 4)).astype(np.float32)
    m = rng.uniform(size=(B, 500)) > 0.2
    f1 = jax.jit(lambda v, mm: voxel_downsample_masked(v, mm, 0.4, 256))
    vs = [f1(jnp.asarray(vals[b]), jnp.asarray(m[b])) for b in range(B)]
    vb = jax.jit(lambda v, mm: voxel_downsample_masked_b(v, mm, 0.4, 256))(
        jnp.asarray(vals), jnp.asarray(m))
    _assert_rows_match([(v[0], v[1]) for v in vs], (vb[0], vb[1]))
    assert np.array_equal(np.asarray(vb[2]),
                          np.asarray([int(v[2]) for v in vs]))


@pytest.fixture(scope="module")
def grids(rng_mod):
    rng = rng_mod
    gs = [gridmap.empty(CFG.map_table_surf, CFG.map_bucket_surf)
          for _ in range(B)]
    pts = rng.uniform(-30, 30, size=(B, 400, 3)).astype(np.float32)
    ints = rng.uniform(size=(B, 400)).astype(np.float32)
    msk = rng.uniform(size=(B, 400)) > 0.1
    center = rng.integers(-2, 2, size=(B, 3)).astype(np.int32)
    window = jnp.asarray([50, 50, 30], jnp.int32)
    f1 = jax.jit(lambda g, p, i, m, c: gridmap.insert(
        g, p, i, m, 0.4, 2.0, c, window))
    outs = [f1(gs[b], jnp.asarray(pts[b]), jnp.asarray(ints[b]),
               jnp.asarray(msk[b]), jnp.asarray(center[b]))
            for b in range(B)]
    gb = jax.tree.map(lambda *xs: jnp.stack(xs), *gs)
    fb = jax.jit(lambda g, p, i, m, c: gridmap.insert_b(
        g, p, i, m, 0.4, 2.0, c, window))
    outb = fb(gb, jnp.asarray(pts), jnp.asarray(ints), jnp.asarray(msk),
              jnp.asarray(center))
    return outs, outb, rng


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(7)


def test_gridmap_insert_b_matches(grids):
    outs, outb, _ = grids
    _assert_rows_match([o[0] for o in outs], outb[0])
    _assert_rows_match([tuple(o[1:]) for o in outs], tuple(outb[1:]))


def test_insert_vds_b_bitexact(grids):
    """The fused voxel-downsample+insert (gridmap.insert_vds_b) must be
    BIT-exact vs voxel_downsample_masked_b followed by insert_b: the
    stable bucket sort preserves the compaction's (k, ji) voxel order, so
    every bucket sees the same points in the same order (mapping_step's
    hot path relies on this equivalence; ALOAM_FUSED_INSERT=0 switches
    the engine back to the two-call form)."""
    outs, outb, rng = grids
    gb = outb[0]
    bsz = gb.pts.shape[0]
    leaf, cell = 0.4, 2.0
    pts = rng.uniform(-30, 30, size=(bsz, 400, 3)).astype(np.float32)
    ints = rng.uniform(size=(bsz, 400)).astype(np.float32)
    msk = rng.uniform(size=(bsz, 400)) > 0.2
    center = jnp.zeros((bsz, 3), jnp.int32)
    window = jnp.asarray([50, 50, 30], jnp.int32)
    args = (gb, jnp.asarray(pts), jnp.asarray(ints), jnp.asarray(msk))

    def two_call(g, p, i, m):
        vals = jnp.concatenate([p, i[..., None]], -1)
        out, om, _ = voxel_downsample_masked_b(vals, m, leaf, p.shape[1])
        return gridmap.insert_b(g, out[..., :3], out[..., 3], om, leaf,
                                cell, center, window, 8, 256)

    fused_j = jax.jit(lambda g, p, i, m: gridmap.insert_vds_b(
        g, p, i, m, leaf, cell, center, window, 8, 256))
    ref = jax.jit(two_call)(*args)
    fus = fused_j(*args)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(fus)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # a second round with jittered points exercises the MERGE path
    # (same voxels, midpoint updates) on the updated grids
    pts2 = jnp.asarray(pts + rng.uniform(
        -0.05, 0.05, size=pts.shape).astype(np.float32))
    ref2 = jax.jit(two_call)(ref[0], pts2, args[2], args[3])
    fus2 = fused_j(fus[0], pts2, args[2], args[3])
    assert int(np.asarray(ref2[1]).sum()) > 0          # merges happened
    for a, b in zip(jax.tree.leaves(ref2), jax.tree.leaves(fus2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # the kernel branch's plumbing under the fused front-end
    kf = gridmap.insert_vds_b(ref[0], pts2, args[2], args[3], leaf=leaf,
                              cell_size=cell, center=center, window=window,
                              point_cap=8, touched_cap=256,
                              force_kernel_interpret=True)
    for a, b in zip(jax.tree.leaves(ref2), jax.tree.leaves(kf)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_gridmap_knn_b_matches(grids):
    outs, outb, rng = grids
    g2 = [o[0] for o in outs]
    g2b = outb[0]
    q = rng.uniform(-30, 30, size=(B, 100, 3)).astype(np.float32)
    f1 = jax.jit(lambda g, qq: gridmap.knn(g, qq, 5, 2.0, 1.0))
    ks = [f1(g2[b], jnp.asarray(q[b])) for b in range(B)]
    kb = jax.jit(lambda g, qq: gridmap.knn_b(g, qq, 5, 2.0, 1.0))(
        g2b, jnp.asarray(q))
    assert int(kb[2]) == 0  # 100 queries fit in the default cell cap
    _assert_rows_match(ks, (kb[0], kb[1]), atol=1e-5)
    # query chunking changes fusion, not candidates: d2 rounding may move a
    # near-tie, so compare distances loosely and skip neighbor coordinates
    kb2 = jax.jit(lambda g, qq: gridmap.knn_b(
        g, qq, 5, 2.0, 1.0, query_chunk=32))(g2b, jnp.asarray(q))
    _assert_rows_match([k[0] for k in ks], kb2[0], atol=2e-3)


def test_pallas_knn_select_matches_xla(rng):
    """The Pallas fused select kernel (interpret mode on CPU) must
    reproduce the XLA k-pass selection bit-for-bit (same arithmetic
    order, same lowest-index tie-break)."""
    from aloam_tpu.ops.pallas_knn import knn_select

    n, w = 128, 384
    crow = rng.uniform(-5, 5, size=(n, 3 * w)).astype(np.float32)
    q = rng.uniform(-5, 5, size=(n, 4)).astype(np.float32)
    q[:, 3] = 0.0
    q[::17, 3] = 1.0  # poisoned rows

    d2_p, nb_p = knn_select(jnp.asarray(crow), jnp.asarray(q), k=5,
                            tq=64, interpret=True)

    xs, ys, zs = crow[:, :w], crow[:, w:2 * w], crow[:, 2 * w:]
    d2 = ((xs - q[:, 0:1]) ** 2 + (ys - q[:, 1:2]) ** 2
          + (zs - q[:, 2:3]) ** 2)
    d2[q[:, 3] > 0] = np.inf
    ds, nb = [], []
    for _ in range(5):
        am = np.argmin(d2, axis=1)
        ds.append(d2[np.arange(n), am])
        nb.append(np.stack([xs[np.arange(n), am], ys[np.arange(n), am],
                            zs[np.arange(n), am]], -1))
        d2[np.arange(n), am] = np.inf
    d2_ref = np.stack(ds, -1)
    nb_ref = np.stack(nb, -2)
    # poisoned rows: reference keeps coords of argmin-of-inf (index 0);
    # kernel extracts via masked sum the same way -> still index 0.
    # Tolerance: FMA contraction differs sub-ulp between the kernel and
    # the numpy reference; selection indices are what the test pins.
    np.testing.assert_allclose(np.asarray(d2_p), d2_ref, rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(nb_p), nb_ref, atol=1e-5)


def test_pallas_window_mins_matches_xla(rng):
    """The Pallas odometry-search kernel (interpret mode) must agree with
    the XLA scan path on every output (indices included — same chunk-order
    strict-< merge and lowest-index argmin)."""
    from aloam_tpu.neighbors import odom_window_mins_b
    from aloam_tpu.ops.pallas_odom import window_mins

    bsz, q, m = 2, 96, 700
    sel = rng.uniform(-10, 10, size=(bsz, q, 3)).astype(np.float32)
    ref = rng.uniform(-10, 10, size=(bsz, m, 3)).astype(np.float32)
    ring = np.sort(rng.integers(0, 16, size=(bsz, m)), axis=1)
    mask = rng.uniform(size=(bsz, m)) > 0.1

    xla = odom_window_mins_b(jnp.asarray(sel), jnp.asarray(ref),
                             jnp.asarray(mask),
                             jnp.asarray(ring, np.int32), 2,
                             want_same_ring=True, chunk=256)

    big = np.float32(1e9)
    ref_p = np.concatenate(
        [np.where(mask[:, None, :], np.moveaxis(ref, 1, 2), big),
         np.where(mask[:, :, None], ring[..., None].astype(np.float32),
                  big).reshape(bsz, 1, m)], axis=1)
    pal = window_mins(jnp.asarray(sel), jnp.asarray(ref_p), 2.0,
                      tq=32, m_chunk=256, interpret=True)

    for j, (a, b) in enumerate(zip(xla, pal)):
        a, b = np.asarray(a), np.asarray(b)
        if j % 2 == 0:  # d2 columns: masked-out rows are inf vs ~1e18.
            # the kernel computes (q-r)^2 directly while the XLA path uses
            # the recentered matmul expansion -> ~1e-5-relative rounding
            both_far = (a > 1e17) & (b > 1e17)
            np.testing.assert_allclose(np.where(both_far, 0, a),
                                       np.where(both_far, 0, b),
                                       rtol=1e-4, atol=1e-4)
        else:           # index columns: exact where a candidate existed
            d_prev = np.asarray(xla[j - 1])
            has = d_prev < 1e17
            np.testing.assert_array_equal(a[has], b[has])


def test_pallas_window_mins_ring_seg_skip_is_exact(rng):
    """ring_seg > 0 (the pass-2 chunk skip for ring_heads-segmented
    reference clouds) must be output-identical to the exhaustive scan on a
    correctly-segmented cloud, including per-ring tail padding.

    Geometry is deliberately RING-CORRELATED (ring r lives near z = 3r,
    queries sorted by z) so each 32-query tile's pass-1 NN-ring span is
    narrow and the skip branch genuinely engages — with ring-uncorrelated
    random clouds every tile spans all rings and `overlap` is always true,
    so an off-by-one in the lo/hi window would pass unexercised (advisor
    round 3). The test replicates the kernel's skip predicate in NumPy and
    asserts skippable chunks exist before comparing outputs."""
    from aloam_tpu.ops.pallas_odom import window_mins

    bsz, n_rings, seg = 2, 16, 64
    m = n_rings * seg
    q, tq, m_chunk, nearby = 96, 32, 128, 2.0
    ring = np.repeat(np.arange(n_rings), seg)[None].repeat(bsz, 0)
    # ring r's points near the z = 3r plane; x/y spread keeps NNs honest
    ref = np.stack([rng.uniform(-10, 10, size=(bsz, m)),
                    rng.uniform(-10, 10, size=(bsz, m)),
                    3.0 * ring + rng.uniform(-0.5, 0.5, size=(bsz, m))],
                   axis=-1).astype(np.float32)
    # queries z-sorted -> each tq-tile covers ~2 adjacent rings
    qz = np.sort(rng.uniform(0, 3.0 * (n_rings - 1), size=(bsz, q)), axis=1)
    sel = np.stack([rng.uniform(-10, 10, size=(bsz, q)),
                    rng.uniform(-10, 10, size=(bsz, q)), qz],
                   axis=-1).astype(np.float32)
    # head-packed segments: the tail ~30% of each ring is padding
    fill = rng.integers(seg // 2, seg, size=(bsz, n_rings))
    mask = (np.arange(seg)[None, None, :]
            < fill[:, :, None]).reshape(bsz, m)

    big = np.float32(1e9)
    ref_p = np.concatenate(
        [np.where(mask[:, None, :], np.moveaxis(ref, 1, 2), big),
         np.where(mask[:, :, None], ring[..., None].astype(np.float32),
                  big).reshape(bsz, 1, m)], axis=1)
    full = window_mins(jnp.asarray(sel), jnp.asarray(ref_p), nearby,
                       tq=tq, m_chunk=m_chunk, interpret=True)
    skip = window_mins(jnp.asarray(sel), jnp.asarray(ref_p), nearby,
                       tq=tq, m_chunk=m_chunk, interpret=True, ring_seg=seg)
    for a, b in zip(full, skip):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # replicate the kernel's skip predicate: chunk c covers rings
    # [c*m_chunk//seg, ((c+1)*m_chunk-1)//seg]; a tile skips it when that
    # range misses [min(br), max(br)] +/- nearby. Assert skips engage.
    br = np.take_along_axis(ring, np.asarray(full[1]), axis=1).astype(float)
    n_chunks = m // m_chunk
    skipped = 0
    for b in range(bsz):
        for t in range(q // tq):
            tile_br = br[b, t * tq:(t + 1) * tq]
            lo, hi = tile_br.min() - nearby, tile_br.max() + nearby
            for c in range(n_chunks):
                c_rlo = (c * m_chunk) // seg
                c_rhi = ((c + 1) * m_chunk - 1) // seg
                if not (c_rhi >= lo and c_rlo <= hi):
                    skipped += 1
    assert skipped > 0, "constructed data exercised no skip branch"


def test_knn_b_cell_spill_is_counted(grids):
    """Queries past cell_cap distinct cells come back gated (+inf d2) and
    counted — capacity losses are never silent."""
    outs, outb, rng = grids
    g2b = outb[0]
    q = rng.uniform(-30, 30, size=(B, 64, 3)).astype(np.float32)
    d2, _, spilled = jax.jit(lambda g, qq: gridmap.knn_b(
        g, qq, 5, 2.0, 1.0, cell_cap=8))(g2b, jnp.asarray(q))
    assert int(spilled) > 0
    # spilled queries (and only they) come back with an all-inf d2 row:
    # empty buckets sit at the finite _FAR sentinel, never +inf
    d2 = np.asarray(d2)
    assert int(np.sum(np.all(np.isinf(d2), axis=-1))) == int(spilled)


def test_count_near_b_matches(grids):
    outs, outb, _ = grids
    center = jnp.asarray(np.stack([[0, 0, 0], [1, 1, 0], [-2, 0, 1]]),
                         jnp.int32)
    half = jnp.asarray([3, 3, 2], jnp.int32)
    singles = [gridmap.count_near(outs[b][0], center[b], half)
               for b in range(B)]
    batched = gridmap.count_near_b(outb[0], center, half)
    assert np.array_equal(np.asarray(batched),
                          np.asarray([int(s) for s in singles]))


@pytest.fixture(scope="module")
def populated(frames):
    """Single-stream states after frame 0 + frame-1 features, both per
    stream and stacked — the common starting point for the step-level
    equivalence tests."""
    ff = jax.jit(lambda x, m: extract_features(
        *register_scan(x, m, CFG)[:2], CFG))
    feats0 = [ff(jnp.asarray(frames[b][0][0]), jnp.asarray(frames[b][0][1]))
              for b in range(B)]
    feats1 = [ff(jnp.asarray(frames[b][1][0]), jnp.asarray(frames[b][1][1]))
              for b in range(B)]
    ostep = jax.jit(lambda s, f: od.odometry_step(s, f, CFG))
    ost1 = [ostep(od.init_state(CFG), feats0[b])[0] for b in range(B)]
    q0, t0 = jnp.asarray([1., 0, 0, 0]), jnp.zeros(3)
    mstep0 = jax.jit(lambda s, c, f: mp.mapping_step(s, c, f, q0, t0, CFG))
    mst1 = [mstep0(mp.init_state(CFG), feats0[b].less_sharp,
                   feats0[b].less_flat)[0] for b in range(B)]
    stack = lambda trees: jax.tree.map(  # noqa: E731
        lambda *xs: jnp.stack(xs), *trees)
    return feats1, ost1, mst1, stack(feats1), stack(ost1), stack(mst1)


def test_odometry_step_b_matches(populated):
    feats1, ost1, _, feats1_b, ost1_b, _ = populated
    f1 = jax.jit(lambda s, f: od.odometry_step(s, f, CFG))
    singles = [f1(ost1[b], feats1[b]) for b in range(B)]
    fb = jax.jit(lambda s, f: od.odometry_step_b(s, f, CFG))
    st_b, m_b = fb(ost1_b, feats1_b)
    # pose: solver rounding differs (batched LU); counts: a rounding flip
    # of a 25 m^2 corr gate may move a couple of correspondences
    _assert_rows_match([(s[0].q_w, s[0].t_w, s[0].q_lc, s[0].t_lc)
                        for s in singles],
                       (st_b.q_w, st_b.t_w, st_b.q_lc, st_b.t_lc),
                       atol=5e-4)
    _assert_rows_match([s[1] for s in singles], m_b,
                       atol=5e-2, count_atol=3)


def test_mapping_step_b_matches(populated):
    feats1, ost1, mst1, feats1_b, ost1_b, mst1_b = populated
    f1 = jax.jit(lambda s, c, f, q, t: mp.mapping_step(s, c, f, q, t, CFG))
    singles = [f1(mst1[b], feats1[b].less_sharp, feats1[b].less_flat,
                  ost1[b].q_w, ost1[b].t_w) for b in range(B)]
    fb = jax.jit(lambda s, c, f, q, t: mp.mapping_step_b(s, c, f, q, t, CFG))
    st_b, m_b = fb(mst1_b, feats1_b.less_sharp, feats1_b.less_flat,
                   ost1_b.q_w, ost1_b.t_w)
    # pose atol = the jit noise floor: the mapping solve sits behind three
    # rounding-sensitive gates (map-knn 1 m², eigen ratio, 0.2 m plane
    # inlier), and the single-stream step jitted-vs-eager already moves
    # up to 21 mm on this scene (module docstring); measured jitted
    # batched-vs-single deltas here are ~7 mm with identical eager math.
    _assert_rows_match([(s[0].q_w, s[0].t_w, s[0].q_wmap_wodom,
                         s[0].t_wmap_wodom) for s in singles],
                       (st_b.q_w, st_b.t_w, st_b.q_wmap_wodom,
                        st_b.t_wmap_wodom), atol=2.5e-2)
    _assert_rows_match([s[1] for s in singles], m_b,
                       atol=5e-2, count_atol=8)
    # the inserted surf map can't be compared element-wise: the pose delta
    # moves world points across voxel boundaries, changing voxel ids and
    # hash slots. insert_b exactness on identical inputs is pinned by
    # test_gridmap_insert_b_matches; here assert the maps agree in mass.
    bk = st_b.surf.bucket_cap
    for b in range(B):
        live_s = int(np.sum(np.asarray(
            singles[b][0].surf.cell[..., :bk]) != gridmap._EMPTY))
        live_b = int(np.sum(np.asarray(
            st_b.surf.cell[b][..., :bk]) != gridmap._EMPTY))
        assert abs(live_s - live_b) <= 8, (b, live_s, live_b)


def test_pallas_select_rings_matches_xla(rng):
    """The Pallas fused greedy-selection kernel (interpret mode on CPU)
    must reproduce _select_rings' label grid exactly — same masked-extremum
    walk, same lowest-index tie-break, same gap-stopped NMS."""
    from aloam_tpu.frontend import features as feat
    from aloam_tpu.ops.pallas_select import select_rings

    cfg = CFG
    r, c = 24, 160
    # ring-like geometry: points along arcs with occasional range jumps so
    # the bad-gap prefix actually stops some NMS windows
    th = np.cumsum(rng.uniform(0.001, 0.01, size=(r, c)), axis=1)
    rad = 5.0 + np.where(rng.uniform(size=(r, c)) < 0.07,
                         rng.uniform(1, 4, size=(r, c)), 0.0)
    pts = np.stack([rad * np.cos(th), rad * np.sin(th),
                    0.05 * rng.standard_normal((r, c))], -1).astype(np.float32)
    curv = rng.uniform(0, 0.4, size=(r, c)).astype(np.float32)
    cnt = rng.integers(0, c, size=(r,)).astype(np.int32)
    cnt[:4] = [0, 5, 11, c]  # degenerate rings: empty, too small, minimal

    label_x, _, _ = feat._select_rings(jnp.asarray(pts), jnp.asarray(curv),
                                       jnp.asarray(cnt), cfg)

    sp, ep, size, ring_ok = jax.vmap(
        lambda n: feat._region_bounds(n, cfg.n_regions))(jnp.asarray(cnt))
    ep_eff = jnp.where((size > 0) & ring_ok[:, None], ep, -1)
    spep = jnp.concatenate([sp, ep_eff], axis=1).astype(jnp.float32)
    d = pts[:, 1:] - pts[:, :-1]
    bad = (np.sum(d * d, axis=-1) > cfg.nms_gap_sq).astype(np.float32)
    bcum = np.concatenate([np.zeros((r, 1), np.float32),
                           np.cumsum(bad, axis=1)], axis=1)
    label_p = select_rings(jnp.asarray(curv), jnp.asarray(bcum), spep,
                           cfg.n_regions, cfg.max_sharp, cfg.max_less_sharp,
                           cfg.max_flat, cfg.nms_window,
                           cfg.curvature_threshold, tr=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(label_x, np.int32),
                                  np.asarray(label_p))


def test_pallas_assoc_cell_matches_xla(rng):
    """The fused association kernel (interpret mode on CPU) must reproduce
    the XLA path — per-query crow gather + 5-pass select + assoc_xla fit —
    on cell-sorted queries: identical ok flags, matching factor columns.
    Pins the cell-window DMA + one-hot broadcast trick (any off-by-one in
    the window or the local index shows up as a wrong neighborhood)."""
    from aloam_tpu.ops.pallas_assoc import assoc_cell, assoc_xla

    tq, bw = 64, 16
    w = 8 * bw
    n_cells, n = 40, 4 * tq
    pad_rows = n_cells + tq + 8      # gridmap.ASSOC_PAD contract: +8 for
    cand = rng.uniform(-1.0, 1.0,    # the kernel's align8 window start
                       size=(pad_rows, 8, 3, bw)).astype(np.float32)
    far = rng.uniform(size=(pad_rows, 8, 1, bw)) < 0.1
    cand = np.where(far, 1e9, cand).astype(np.float32)
    cand_flat = cand.reshape(pad_rows, 3 * w)

    cid = np.sort(rng.integers(0, n_cells, size=n)).astype(np.int32)
    q = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    poison = (rng.uniform(size=n) < 0.1).astype(np.float32)
    cid0 = cid[::tq].copy()
    local = cid - np.repeat(cid0, tq)
    q8 = np.zeros((n, 8), np.float32)
    q8[:, :3], q8[:, 3], q8[:, 4] = q, poison, local

    # XLA reference: per-query gather + the same 5-pass argmin select
    crow = cand_flat[cid]
    blk = crow.reshape(n, 8, 3, bw)
    xs = blk[:, :, 0, :].reshape(n, w)
    ys = blk[:, :, 1, :].reshape(n, w)
    zs = blk[:, :, 2, :].reshape(n, w)
    d2 = ((xs - q[:, 0:1]) ** 2 + (ys - q[:, 1:2]) ** 2
          + (zs - q[:, 2:3]) ** 2)
    d2[poison > 0] = np.inf
    ds, nb = [], []
    for _ in range(5):
        am = np.argmin(d2, axis=1)
        ds.append(d2[np.arange(n), am].copy())
        nb.append(np.stack([xs[np.arange(n), am], ys[np.arange(n), am],
                            zs[np.arange(n), am]], -1))
        d2[np.arange(n), am] = np.inf
    d2k = np.stack(ds, -1)
    near = np.stack(nb, -2)

    for kind, okc, ncol in (("surf", 4, 4), ("corner", 6, 6)):
        ref = np.asarray(assoc_xla(jnp.asarray(d2k), jnp.asarray(near),
                                   1.0, kind))
        out = np.asarray(assoc_cell(
            jnp.asarray(cand_flat), jnp.asarray(cid0), jnp.asarray(q8),
            kind, 1.0, tq=tq, bw=bw, interpret=True))
        np.testing.assert_array_equal(ref[:, okc], out[:, okc])
        live = ref[:, okc] > 0
        assert live.sum() > 20  # the fit paths are actually exercised
        # factor columns: scalar-expanded vs einsum fit, sub-ulp FMA
        # ordering amplified through the normalizations
        np.testing.assert_allclose(out[live][:, :ncol], ref[live][:, :ncol],
                                   atol=5e-4)


def test_pallas_assoc_cell_cspan_window(rng):
    """CSPAN < TQ clips the kernel's cell-window: queries inside the
    clipped window must be bit-identical to the full-window run, and
    queries beyond it must come back gated (poisoned in-kernel, counted
    by the caller) — never silently matched against a zeroed window."""
    from aloam_tpu.ops.pallas_assoc import assoc_cell

    tq, bw, cspan = 64, 16, 16
    w = 8 * bw
    n_cells, n = 200, 4 * tq   # ~50 cells/tile >> cspan: spills guaranteed
    pad_rows = n_cells + tq + 8
    cand = rng.uniform(-1.0, 1.0,
                       size=(pad_rows, 8, 3, bw)).astype(np.float32)
    cand_flat = cand.reshape(pad_rows, 3 * w)

    # spans wider than cspan: cells advance ~1 per query so tile spans
    # are ~tq >> cspan
    cid = np.sort(rng.integers(0, n_cells, size=n)).astype(np.int32)
    q = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    cid0 = cid[::tq].copy()
    local = cid - np.repeat(cid0, tq)
    q8 = np.zeros((n, 8), np.float32)
    q8[:, :3], q8[:, 4] = q, local

    full = np.asarray(assoc_cell(
        jnp.asarray(cand_flat), jnp.asarray(cid0), jnp.asarray(q8),
        "surf", 1.0, tq=tq, bw=bw, interpret=True))
    clip = np.asarray(assoc_cell(
        jnp.asarray(cand_flat), jnp.asarray(cid0), jnp.asarray(q8),
        "surf", 1.0, tq=tq, bw=bw, cspan=cspan, interpret=True))
    rem = cid0 - 8 * (cid0 // 8)
    spilled = (local + np.repeat(rem, tq)) >= cspan + 8
    assert spilled.any() and (~spilled).any()
    # in-window queries: identical outputs; spilled: gated
    np.testing.assert_array_equal(clip[~spilled], full[~spilled])
    assert not clip[spilled][:, 4].any(), "cspan spill leaked factors"


def test_assoc_out8_b_cspan_counts_spills(populated, monkeypatch):
    """The caller-side CSPAN accounting: with a tiny forced span cap, the
    kernel and XLA branches agree (both poison the same spilled queries)
    and n_spilled matches an independent NumPy recount."""
    from aloam_tpu import geometry as geo

    feats1, _, mst1, feats1_b, ost1_b, mst1_b = populated
    cfg = CFG
    monkeypatch.setattr(gridmap, "ASSOC_CSPAN", 8)
    q_w = geo.qmul(mst1_b.q_wmap_wodom, ost1_b.q_w)
    t_w = geo.qrot(mst1_b.q_wmap_wodom, ost1_b.t_w) + mst1_b.t_wmap_wodom

    from aloam_tpu.frontend.voxel import voxel_downsample_masked_b
    surf_in = feats1_b.less_flat
    s_vals = jnp.concatenate(
        [surf_in.xyz, surf_in.intensity[..., None]], axis=-1)
    s_ds, s_m, _ = voxel_downsample_masked_b(
        s_vals, surf_in.mask, cfg.plane_resolution, cfg.surf_stack_cap)
    stack = s_ds[..., :3]
    sel0 = geo.qrot(q_w[:, None, :], stack) + t_w[:, None, :]
    cache, (sx, sy, sz, it, mi) = gridmap.knn_cache_b(
        mst1_b.surf, sel0, cfg.knn_cell, cfg.knn_radius, cfg.map_cell_cap,
        payloads=(stack[..., 0], stack[..., 1], stack[..., 2],
                  s_ds[..., 3], s_m.astype(jnp.int32)))
    sel = geo.qrot(q_w[:, None, :],
                   jnp.stack([sx, sy, sz], -1)) + t_w[:, None, :]
    poison = ~(mi > 0)

    xla, n_x = mp._assoc_out8_b(sel, poison, cache, cfg, "surf")
    ker, n_k = mp._assoc_out8_b(sel, poison, cache, cfg, "surf",
                                force_kernel_interpret=True)
    assert int(n_x) == int(n_k) > 0

    # independent recount of the kernel's spill rule
    bsz, q_n = sel.shape[:2]
    tq = gridmap.ASSOC_TQ
    crows = cache.cand_flat.shape[1]
    cid = np.asarray(cache.cid_sorted)
    dead = np.asarray(poison) | (cid >= cache.cell_cap)
    q_pad = (-q_n) % tq
    cid_p = np.concatenate(
        [cid, np.repeat(cid[:, -1:], q_pad, axis=1)], axis=1)
    dead_p = np.concatenate(
        [dead, np.ones((bsz, q_pad), bool)], axis=1)
    cid_f = (cid_p + np.arange(bsz)[:, None] * crows).reshape(-1)
    cid0 = cid_f[::tq]
    rem = cid0 - 8 * (cid0 // 8)
    loc = cid_f - np.repeat(cid0, tq) + np.repeat(rem, tq)
    expect = int(((loc >= 8 + 8) & ~dead_p.reshape(-1)).sum())
    assert int(n_k) == expect

    # spilled queries are gated in BOTH branches; the rest agree
    spill = ((loc >= 16) & ~dead_p.reshape(-1)).reshape(bsz, -1)[:, :q_n]
    xla, ker = np.asarray(xla), np.asarray(ker)
    assert not xla[spill][:, 4].any() and not ker[spill][:, 4].any()
    agree = np.mean(xla[..., 4] == ker[..., 4])
    assert agree >= 0.98, f"ok flags agree {agree}"


def test_pallas_insert_merge_matches_xla(rng):
    """The fused insert merge/append kernel (interpret mode on CPU) must
    reproduce gridmap._merge_dense_xla bit-for-bit: same last-match-wins
    midpoints, same eviction-priority slot choices (incl. ties), same
    merged/appended/evicted counters."""
    from aloam_tpu.ops.pallas_insert import merge_tiles

    bsz, cap_c, cap_p, bk = 2, 40, 16, 48
    cell_size, leaf = 2.0, 0.4

    # occupied slots with realistic cells; ~40% empty
    pts = rng.uniform(-20, 20, size=(bsz, cap_c, 3, bk)).astype(np.float32)
    occ = rng.uniform(size=(bsz, cap_c, bk)) > 0.4
    cell = np.floor(pts / cell_size).astype(np.int32)
    cell = np.where(occ[:, :, None, :], cell, gridmap._EMPTY)
    vox = np.floor(pts / leaf).astype(np.int32)
    vox = ((vox[:, :, 0] * 73856093) ^ (vox[:, :, 1] * 19349663)
           ^ (vox[:, :, 2] * 83492791))
    pts = np.where(occ[:, :, None, :], pts, 1e9).astype(np.float32)
    inten = rng.uniform(0, 1, size=(bsz, cap_c, bk)).astype(np.float32)

    # per-bucket point lists: some points share a slot's voxel id
    # (merges), some are fresh (appends); high cnt forces eviction
    ppx = rng.uniform(-20, 20, size=(bsz, cap_c, cap_p)).astype(np.float32)
    ppy = rng.uniform(-20, 20, size=(bsz, cap_c, cap_p)).astype(np.float32)
    ppz = rng.uniform(-20, 20, size=(bsz, cap_c, cap_p)).astype(np.float32)
    ppi = rng.uniform(0, 1, size=(bsz, cap_c, cap_p)).astype(np.float32)
    pvox = ((np.floor(ppx / leaf).astype(np.int32) * 73856093)
            ^ (np.floor(ppy / leaf).astype(np.int32) * 19349663)
            ^ (np.floor(ppz / leaf).astype(np.int32) * 83492791))
    # force merges: ~30% of points copy a random slot's voxel id
    copy = rng.uniform(size=(bsz, cap_c, cap_p)) < 0.3
    which = rng.integers(0, bk, size=(bsz, cap_c, cap_p))
    pvox = np.where(copy, np.take_along_axis(vox, which, axis=2), pvox)
    cnt = rng.integers(0, cap_p + 4, size=(bsz, cap_c)).astype(np.int32)
    center = rng.integers(-4, 4, size=(bsz, 3)).astype(np.int32)
    window = np.array([5, 5, 3], np.int32)

    args = [jnp.asarray(a) for a in (
        pts.transpose(0, 1, 2, 3).reshape(bsz, cap_c, 3 * bk),
        inten, cell.reshape(bsz, cap_c, 3 * bk), vox,
        ppx, ppy, ppz, ppi, pvox, cnt, center, window)]
    ref = gridmap._merge_dense_xla(*args, cell_size, leaf)
    out = merge_tiles(*args, cell_size, leaf, interpret=True)
    names = ["px", "py", "pz", "int", "cx", "cy", "cz", "vox",
             "merged", "appended", "evicted"]
    for nm, a, b in zip(names, ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_mapping_step_b_exact_research_matches_reuse(populated):
    """map_cache_reuse=False (exact per-round re-search, the reference's
    semantics) must run the rewired sorted path end-to-end and land within
    solver-rounding distance of the cache-reuse default — on this scene
    the round-2 pose delta is sub-cell, so the candidate sets coincide."""
    feats1, _, _, feats1_b, ost1_b, mst1_b = populated
    f_reuse = jax.jit(lambda s, c, f, q, t: mp.mapping_step_b(
        s, c, f, q, t, CFG))
    f_exact = jax.jit(lambda s, c, f, q, t: mp.mapping_step_b(
        s, c, f, q, t, CFG.replace(map_cache_reuse=False)))
    args = (mst1_b, feats1_b.less_sharp, feats1_b.less_flat,
            ost1_b.q_w, ost1_b.t_w)
    st_r, m_r = f_reuse(*args)
    st_e, m_e = f_exact(*args)
    np.testing.assert_allclose(np.asarray(st_e.t_w), np.asarray(st_r.t_w),
                               atol=2.5e-2)
    np.testing.assert_allclose(np.asarray(st_e.q_w), np.asarray(st_r.q_w),
                               atol=2.5e-2)
    # the exact path reports no reuse deviation by construction
    assert np.all(np.asarray(m_e.cache_crossed) == 0)


def test_assoc_kernel_branch_matches_xla_on_pipeline_data(populated):
    """The FULL kernel-branch plumbing of mapping._assoc_out8_b — cell
    sort payloads, tile padding, per-stream cid0 windows, local indices,
    spill + mask poison routing — must reproduce the XLA branch on real
    pipeline data, including forced cell-cap spills (the round-3 review
    caught a spill-poisoning divergence exactly here).

    Flag equality is asserted at >= 98%: on voxel-gridded map points many
    candidate pairs sit within ~1e-4 of a distance tie, and the two
    branches' differently-fused d2 arithmetic legitimately picks either
    side (the same class as the documented chunked-vs-unchunked rounding).
    The spill/mask invariant — every poisoned or spilled query comes back
    gated — is exact and is what the bug class violates."""
    from aloam_tpu import geometry as geo

    feats1, _, mst1, feats1_b, ost1_b, mst1_b = populated
    # tiny cell cap FORCES spills; q from the odometry pose
    cfg = CFG.replace(map_cell_cap=192)
    q_w = geo.qmul(mst1_b.q_wmap_wodom, ost1_b.q_w)
    t_w = geo.qrot(mst1_b.q_wmap_wodom, ost1_b.t_w) + mst1_b.t_wmap_wodom

    from aloam_tpu.frontend.voxel import voxel_downsample_masked_b
    surf_in = feats1_b.less_flat
    s_vals = jnp.concatenate(
        [surf_in.xyz, surf_in.intensity[..., None]], axis=-1)
    s_ds, s_m, _ = voxel_downsample_masked_b(
        s_vals, surf_in.mask, cfg.plane_resolution, cfg.surf_stack_cap)
    stack = s_ds[..., :3]

    sel0 = geo.qrot(q_w[:, None, :], stack) + t_w[:, None, :]
    cache, (sx, sy, sz, it, mi) = gridmap.knn_cache_b(
        mst1_b.surf, sel0, cfg.knn_cell, cfg.knn_radius, cfg.map_cell_cap,
        payloads=(stack[..., 0], stack[..., 1], stack[..., 2],
                  s_ds[..., 3], s_m.astype(jnp.int32)))
    assert int(cache.n_spilled) > 0  # the spill path is actually exercised
    stack_s = jnp.stack([sx, sy, sz], -1)
    sel = geo.qrot(q_w[:, None, :], stack_s) + t_w[:, None, :]
    poison = ~(mi > 0)
    dead = np.asarray(poison) | (np.asarray(cache.cid_sorted)
                                 >= cache.cell_cap)

    for kind in ("surf", "corner"):
        xla, _ = mp._assoc_out8_b(sel, poison, cache, cfg, kind)
        ker, _ = mp._assoc_out8_b(sel, poison, cache, cfg, kind,
                                  force_kernel_interpret=True)
        xla, ker = np.asarray(xla), np.asarray(ker)
        okc = 4 if kind == "surf" else 6
        # exact invariant: poisoned/spilled queries are gated in BOTH paths
        assert not xla[dead][:, okc].any(), f"{kind}: xla spill leak"
        assert not ker[dead][:, okc].any(), f"{kind}: kernel spill leak"
        agree = np.mean(xla[..., okc] == ker[..., okc])
        assert agree >= 0.98, f"{kind} ok flags agree {agree}"
        both = (xla[..., okc] > 0) & (ker[..., okc] > 0)
        assert both.sum() > 0
        # the synthetic map is lattice-like, so rank-5/rank-6 candidates
        # often sit within f32 rounding of each other and the two paths
        # pick different (equally valid) 5-sets — coordinates then differ
        # legitimately (exact per-set equality is pinned by
        # test_pallas_assoc_cell_matches_xla on tie-free data). The
        # 5th-NN gating DISTANCE is stable regardless of which side of a
        # near-tie was taken:
        d5x, d5k = xla[..., 5], ker[..., 5]
        fin = np.isfinite(d5x) & np.isfinite(d5k)
        np.testing.assert_allclose(d5k[fin], d5x[fin], atol=2e-3,
                                   err_msg=f"{kind} gate distances")


def test_insert_kernel_branch_matches_xla_on_pipeline_data(populated):
    """insert_b's kernel-branch plumbing (tile flatten, meta rows, window
    broadcast, unflatten) must be BIT-EXACT against the XLA merge on real
    pipeline data — unlike the association select, the merge/append has no
    tie-sensitive arithmetic (prio tie-breaks coincide by construction)."""
    _, _, mst1, feats1_b, _, mst1_b = populated
    pts = feats1_b.less_flat.xyz
    inten = feats1_b.less_flat.intensity
    mask = feats1_b.less_flat.mask
    center = jnp.zeros((B, 3), jnp.int32)
    window = jnp.asarray([50, 50, 50], jnp.int32)
    args = (mst1_b.surf, pts, inten, mask, CFG.plane_resolution,
            CFG.knn_cell, center, window, 16, 512)
    ref = gridmap.insert_b(*args)
    out = gridmap.insert_b(*args, force_kernel_interpret=True)
    for nm, a, b in zip(("grid", "merged", "appended", "evicted", "drop"),
                        ref, out):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=nm)


def test_odom_kernel_branch_matches_xla_on_pipeline_data(populated):
    """odom_window_mins_b's kernel-branch plumbing (recentering, planar
    ref build, poison rows) vs the XLA scan on real feature clouds:
    distances close everywhere, index agreement > 97% (the remainder are
    lattice near-ties where either index yields the same distance)."""
    from aloam_tpu.neighbors import odom_window_mins_b

    feats1, ost1, _, feats1_b, ost1_b, _ = populated
    sel = feats1_b.flat.xyz
    last = ost1_b.surf_last
    outs_x = odom_window_mins_b(sel, last.xyz, last.mask, last.ring(),
                                2, want_same_ring=True, chunk=2048)
    outs_k = odom_window_mins_b(sel, last.xyz, last.mask, last.ring(),
                                2, want_same_ring=True, chunk=2048,
                                force_kernel_interpret=True)
    for j in range(0, 6, 2):
        dx = np.asarray(outs_x[j])
        dk = np.asarray(outs_k[j])
        both_far = ~np.isfinite(dx) & (dk > 1e17)
        np.testing.assert_allclose(np.where(both_far, 0, dk),
                                   np.where(both_far, 0, np.nan_to_num(
                                       dx, posinf=1e18)),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"d2 col {j}")
    # index agreement off rounding-ties: compare via distances — where the
    # two paths report the same (finite) min distance to 1e-4, any index
    # disagreement must still yield that distance (equally-near tie)
    ix, ik = np.asarray(outs_x[1]), np.asarray(outs_k[1])
    agree = np.mean(ix == ik)
    assert agree > 0.97, f"nn index agreement {agree}"


def test_voxel_scan_kernel_matches_xla(rng):
    """The VMEM segmented-scan kernel (interpret mode) must reproduce
    _voxel_core's XLA associative-scan path: same segments, same mask and
    drop counts, means equal to scan-order rounding."""
    from aloam_tpu.frontend.voxel import _voxel_core

    from aloam_tpu.ops.pallas_voxel import segmented_prefix_sums

    r, n, k = 12, 640, 4
    vals = rng.uniform(-20, 20, size=(r, n, k)).astype(np.float32)
    mask = rng.uniform(size=(r, n)) > 0.15
    ref = _voxel_core(jnp.asarray(vals), jnp.asarray(mask), 0.7, 256)
    out = _voxel_core(jnp.asarray(vals), jnp.asarray(mask), 0.7, 256,
                      force_kernel_interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))

    # cross-chunk carry: the scan axis is tiled at the biggest call sites
    # (mapping input downsample, N = 40960 > any VMEM row budget)
    heads = np.asarray(rng.uniform(size=(4, 700)) < 0.1)
    heads[:, 0] = True
    chan = rng.uniform(-10, 10, size=(4, 700)).astype(np.float32)
    got = np.asarray(segmented_prefix_sums(
        (jnp.asarray(chan),), jnp.asarray(heads), chunk=128,
        interpret=True)[0])
    refc = np.zeros_like(chan)
    for rr in range(4):
        acc = 0.0
        for j in range(700):
            acc = chan[rr, j] if heads[rr, j] else acc + chan[rr, j]
            refc[rr, j] = acc
    np.testing.assert_allclose(got, refc, atol=2e-3)
