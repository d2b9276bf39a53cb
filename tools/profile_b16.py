#!/usr/bin/env python
"""Per-sub-stage device timings of the batched SLAM step on the real TPU.

Times each kernel of pipeline.step_b at BENCH_BATCH streams with distinct
per-iteration inputs (the runtime memoizes identical executions) and a tiny
host transfer as the fence (block_until_ready can return early here).
Prints one JSON object of milliseconds per call.

Usage: python tools/profile_b16.py [substage ...]
"""

import os
import sys

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _here)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aloam_tpu import solver  # noqa: E402
from aloam_tpu import odometry as od  # noqa: E402
from aloam_tpu import mapping as mp  # noqa: E402
from aloam_tpu.frontend import registration as reg  # noqa: E402
from aloam_tpu.frontend import features as feat  # noqa: E402
from aloam_tpu.frontend.voxel import voxel_downsample_masked_b  # noqa: E402
from aloam_tpu.ops import gridmap  # noqa: E402
from aloam_tpu.parallel import batched_init, batched_step_jit  # noqa: E402

sys.path.insert(0, _here)
import bench  # noqa: E402


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, inputs):
    out = fn(*inputs[0])
    sync(out)
    t0 = time.perf_counter()
    for inp in inputs[1:]:
        out = fn(*inp)
    sync(out)
    return 1e3 * (time.perf_counter() - t0) / (len(inputs) - 1)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    n_frames = int(os.environ.get("PROF_FRAMES", "6"))
    # the headline batched config (sensor-spec ring_cap/n_raw sizing)
    cfg = bench.batched_bench_cfg()
    xyz, mask, _ = bench.load_streams(cfg, batch, n_frames + 2)

    # run the real pipeline, recording the state before each frame
    step = batched_step_jit(cfg, donate=False)
    state = batched_init(cfg, batch)
    states = []
    for f in range(2):
        state, _ = step(state, jnp.asarray(xyz[f]), jnp.asarray(mask[f]))
    frames = [(jnp.asarray(xyz[2 + f]), jnp.asarray(mask[2 + f]))
              for f in range(n_frames)]
    for x, m in frames:
        states.append(state)
        state, out = step(state, x, m)
    sync(out)

    res = {}

    # ---- full step --------------------------------------------------------
    res["step_b"] = timeit(step, [(s, x, m)
                                  for s, (x, m) in zip(states, frames)])

    # ---- frontend ---------------------------------------------------------
    reg_j = jax.jit(lambda x, m: reg.register_scan_b(x, m, cfg))
    res["register_b"] = timeit(reg_j, frames)
    rcs = [jax.block_until_ready(reg_j(x, m)) for x, m in frames]

    feat_j = jax.jit(lambda rc, cv: feat.extract_features_b(rc, cv, cfg))
    res["features_b"] = timeit(feat_j, [(rc, cv) for rc, cv, _ in rcs])
    feats = [jax.block_until_ready(feat_j(rc, cv)) for rc, cv, _ in rcs]

    def sel_only(rc, curv):
        bsz, r, c = curv.shape
        return feat._select_rings(rc.xyz.reshape(bsz * r, c, 3),
                                  curv.reshape(bsz * r, c),
                                  rc.cnt.reshape(bsz * r), cfg)
    res["features_select"] = timeit(jax.jit(sel_only),
                                    [(rc, cv) for rc, cv, _ in rcs])

    # ---- odometry ---------------------------------------------------------
    odom_j = jax.jit(lambda s, f: od.odometry_step_b(s, f, cfg))
    res["odometry_b"] = timeit(odom_j,
                               [(s.odom, f) for s, f in zip(states, feats)])
    odoms = [jax.block_until_ready(odom_j(s.odom, f))[0]
             for s, f in zip(states, feats)]

    # ---- mapping sub-stages ----------------------------------------------
    map_j = jax.jit(lambda ms, c, s, q, t: mp.mapping_step_b(
        ms, c, s, q, t, cfg))
    m_in = [(s.map, o.corner_last, o.surf_last, o.q_w, o.t_w)
            for s, o in zip(states, odoms)]
    res["mapping_b"] = timeit(map_j, m_in)

    def stacks(ms, corner_in, surf_in, q_wodom, t_wodom):
        q_w = ms.q_wmap_wodom  # close enough for timing purposes
        c_vals = jnp.concatenate(
            [corner_in.xyz, corner_in.intensity[..., None]], axis=-1)
        c_ds, c_m, _ = voxel_downsample_masked_b(
            c_vals, corner_in.mask, cfg.line_resolution, cfg.corner_stack_cap)
        s_vals = jnp.concatenate(
            [surf_in.xyz, surf_in.intensity[..., None]], axis=-1)
        s_ds, s_m, _ = voxel_downsample_masked_b(
            s_vals, surf_in.mask, cfg.plane_resolution, cfg.surf_stack_cap)
        return c_ds, c_m, s_ds, s_m

    stacks_j = jax.jit(stacks)
    res["map_vox_in"] = timeit(stacks_j, m_in)
    stk = [jax.block_until_ready(stacks_j(*i)) for i in m_in]

    # world-frame queries for the knn stages
    def sel_of(ms, o, c_ds, s_ds):
        import aloam_tpu.geometry as geo
        q_w = geo.qmul(ms.q_wmap_wodom, o.q_w)
        t_w = geo.qrot(ms.q_wmap_wodom, o.t_w) + ms.t_wmap_wodom
        selc = geo.qrot(q_w[:, None, :], c_ds[..., :3]) + t_w[:, None, :]
        sels = geo.qrot(q_w[:, None, :], s_ds[..., :3]) + t_w[:, None, :]
        return selc, sels
    sel_j = jax.jit(sel_of)
    sels = [jax.block_until_ready(
        sel_j(s.map, o, st[0], st[2]))
        for s, o, st in zip(states, odoms, stk)]

    cache_j = jax.jit(lambda g, q: gridmap.knn_cache_b(
        g, q, cfg.knn_cell, cfg.knn_radius, cfg.map_cell_cap))
    res["map_knn_cache_surf"] = timeit(
        cache_j, [(s.map.surf, sl[1]) for s, sl in zip(states, sels)])
    res["map_knn_cache_corner"] = timeit(
        cache_j, [(s.map.corner, sl[0]) for s, sl in zip(states, sels)])
    caches_s = [jax.block_until_ready(cache_j(s.map.surf, sl[1]))
                for s, sl in zip(states, sels)]
    caches_c = [jax.block_until_ready(cache_j(s.map.corner, sl[0]))
                for s, sl in zip(states, sels)]

    from_j = jax.jit(lambda c, q: gridmap.knn_from_cache_b(
        c, q, 5, cfg.map_query_chunk))
    res["map_knn_from_cache_surf"] = timeit(
        from_j, [(c, sl[1]) for c, sl in zip(caches_s, sels)])
    res["map_knn_from_cache_corner"] = timeit(
        from_j, [(c, sl[0]) for c, sl in zip(caches_c, sels)])

    # full associations (x1 round)
    def assoc(ms, o, c_ds, c_m, s_ds, s_m):
        import aloam_tpu.geometry as geo
        q_w = geo.qmul(ms.q_wmap_wodom, o.q_w)
        t_w = geo.qrot(ms.q_wmap_wodom, o.t_w) + ms.t_wmap_wodom
        e, sp1, _ = mp.corner_associations_b(
            c_ds[..., :3], c_m, ms.corner, q_w, t_w, cfg)
        p, sp2, _ = mp.surf_associations_b(
            s_ds[..., :3], s_m, ms.surf, q_w, t_w, cfg)
        return e, p, q_w, t_w
    assoc_j = jax.jit(assoc)
    a_in = [(s.map, o, st[0], st[1], st[2], st[3])
            for s, o, st in zip(states, odoms, stk)]
    res["map_assoc_round"] = timeit(assoc_j, a_in)
    assocs = [jax.block_until_ready(assoc_j(*i)) for i in a_in]

    lm_b = jax.jit(jax.vmap(lambda e, p, qq, tt: solver.lm_solve(
        (e, p), qq, tt, cfg.map_lm_iters, cfg.huber_delta)))
    res["map_lm"] = timeit(lm_b, [(e, p, q, t) for e, p, q, t in assocs])

    # fused sorted association (round-3 kernel path): cache build w/ payload
    # sort + one assoc round per class
    import aloam_tpu.geometry as geo

    def build_fused(ms, o, c_ds, c_m, s_ds, s_m):
        q_w = geo.qmul(ms.q_wmap_wodom, o.q_w)
        t_w = geo.qrot(ms.q_wmap_wodom, o.t_w) + ms.t_wmap_wodom

        def build(grid_s, stack, inten, m):
            sel0 = geo.qrot(q_w[:, None, :], stack) + t_w[:, None, :]
            cache, (sx, sy, sz, it, mi) = gridmap.knn_cache_b(
                grid_s, sel0, cfg.knn_cell, cfg.knn_radius,
                cfg.map_cell_cap,
                payloads=(stack[..., 0], stack[..., 1], stack[..., 2],
                          inten, m.astype(jnp.int32)))
            return cache, jnp.stack([sx, sy, sz], -1), mi > 0

        cc, cst, cm = build(ms.corner, c_ds[..., :3], c_ds[..., 3], c_m)
        sc_, sst, sm = build(ms.surf, s_ds[..., :3], s_ds[..., 3], s_m)
        return cc, cst, cm, sc_, sst, sm, q_w, t_w

    build_j = jax.jit(build_fused)
    b_in = [(s.map, o, st[0], st[1], st[2], st[3])
            for s, o, st in zip(states, odoms, stk)]
    res["map_cache_fused_both"] = timeit(build_j, b_in)
    built = [jax.block_until_ready(build_j(*i)) for i in b_in]

    def assoc_fused(cc, cst, cm, sc_, sst, sm, q_w, t_w):
        import aloam_tpu.geometry as geo
        sel_c = geo.qrot(q_w[:, None, :], cst) + t_w[:, None, :]
        sel_s = geo.qrot(q_w[:, None, :], sst) + t_w[:, None, :]
        c8, _ = mp._assoc_out8_b(sel_c, ~cm, cc, cfg, "corner")
        s8, _ = mp._assoc_out8_b(sel_s, ~sm, sc_, cfg, "surf")
        return c8, s8
    res["map_assoc_fused_round"] = timeit(jax.jit(assoc_fused), built)

    # insert path: prep voxel + insert_b
    def ins(ms, c_ds, c_m, s_ds, s_m, q_w, t_w):
        import aloam_tpu.geometry as geo
        window = mp._window_cells(cfg)
        center = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)

        def prep(stack, inten, m, leaf, cap):
            pts_w = geo.qrot(q_w[:, None, :], stack) + t_w[:, None, :]
            vals = jnp.concatenate([pts_w, inten[..., None]], axis=-1)
            out, om, dropped = voxel_downsample_masked_b(vals, m, leaf, cap)
            return out[..., :3], out[..., 3], om

        c_pts, c_int, c_mm = prep(c_ds[..., :3], c_ds[..., 3], c_m,
                                  cfg.line_resolution, cfg.corner_stack_cap)
        s_pts, s_int, s_mm = prep(s_ds[..., :3], s_ds[..., 3], s_m,
                                  cfg.plane_resolution, cfg.surf_stack_cap)
        corner = gridmap.insert_b(
            ms.corner, c_pts, c_int, c_mm, cfg.line_resolution, cfg.knn_cell,
            center, window, cfg.map_insert_point_cap, cfg.map_insert_cell_cap)
        surf = gridmap.insert_b(
            ms.surf, s_pts, s_int, s_mm, cfg.plane_resolution, cfg.knn_cell,
            center, window, cfg.map_insert_point_cap, cfg.map_insert_cell_cap)
        return corner[0], surf[0]

    ins_j = jax.jit(ins)
    i_in = [(s.map, st[0], st[1], st[2], st[3], a[2], a[3])
            for s, st, a in zip(states, stk, assocs)]
    res["map_prep_insert"] = timeit(ins_j, i_in)

    # the hot path since round 5: fused re-voxelize+insert (insert_vds_b)
    def ins_vds(ms, c_ds, c_m, s_ds, s_m, q_w, t_w):
        import aloam_tpu.geometry as geo
        window = mp._window_cells(cfg)
        center = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)

        def one(grid_s, stack, inten, m, leaf):
            pts_w = geo.qrot(q_w[:, None, :], stack) + t_w[:, None, :]
            return gridmap.insert_vds_b(
                grid_s, pts_w, inten, m, leaf, cfg.knn_cell, center,
                window, cfg.map_insert_point_cap,
                cfg.map_insert_cell_cap)[0]

        return (one(ms.corner, c_ds[..., :3], c_ds[..., 3], c_m,
                    cfg.line_resolution),
                one(ms.surf, s_ds[..., :3], s_ds[..., 3], s_m,
                    cfg.plane_resolution))
    res["map_insert_vds"] = timeit(jax.jit(ins_vds), i_in)

    def ins_only(ms, s_pts, s_int, s_mm, t_w):
        window = mp._window_cells(cfg)
        center = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)
        return gridmap.insert_b(
            ms.surf, s_pts, s_int, s_mm, cfg.plane_resolution, cfg.knn_cell,
            center, window, cfg.map_insert_point_cap,
            cfg.map_insert_cell_cap)[0]
    # reuse the pre-insert surf stacks as stand-ins (right shapes/masks)
    ins2_j = jax.jit(ins_only)
    res["map_insert_surf_only"] = timeit(
        ins2_j, [(s.map, st[2][..., :3], st[2][..., 3], st[3], a[3])
                 for s, st, a in zip(states, stk, assocs)])

    # count_near gate (two full-table masked passes per frame)
    def count_gate(ms, t_w):
        local = mp._local_cells(cfg)
        pose_cell = jnp.floor(t_w / cfg.knn_cell).astype(jnp.int32)
        return (gridmap.count_near_b(ms.corner, pose_cell, local),
                gridmap.count_near_b(ms.surf, pose_cell, local))
    res["map_count_near"] = timeit(
        jax.jit(count_gate), [(s.map, a[3]) for s, a in zip(states, assocs)])

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
