#!/usr/bin/env python
"""Measure actual buffer occupancies of the bench scenes at B=16 so the
static caps (which every kernel's cost scales with) can be sized to the
scene with honest margins. Prints one JSON object of maxima over frames."""

import os
import sys

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _here)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aloam_tpu.config import PRESETS  # noqa: E402
from aloam_tpu import odometry as od  # noqa: E402
from aloam_tpu.frontend import registration as reg  # noqa: E402
from aloam_tpu.frontend import features as feat  # noqa: E402
from aloam_tpu.frontend.voxel import voxel_downsample_masked_b  # noqa: E402
from aloam_tpu.ops import gridmap  # noqa: E402
from aloam_tpu import geometry as geo  # noqa: E402
from aloam_tpu.parallel import batched_init, batched_step_jit  # noqa: E402

import bench  # noqa: E402


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    n_frames = int(os.environ.get("PROF_FRAMES", "6"))
    cfg = PRESETS["HDL-64"].replace(map_query_chunk=2048)

    streams = [bench._cached_sequence(n_frames + 2, 100 + b, 8.0 + 0.5 * b)
               for b in range(batch)]
    xyz = np.stack([s[0] for s in streams], axis=1)
    mask = np.stack([s[1] for s in streams], axis=1)

    step = batched_step_jit(cfg, donate=False)
    state = batched_init(cfg, batch)
    for f in range(2):
        state, _ = step(state, jnp.asarray(xyz[f]), jnp.asarray(mask[f]))

    stats = {}

    def upd(key, val):
        stats[key] = max(stats.get(key, 0), int(val))

    @jax.jit
    def frame_stats(state, x, m):
        rc, curv, _ = reg.register_scan_b(x, m, cfg)
        feats = feat.extract_features_b(rc, curv, cfg)
        odom, _ = od.odometry_step_b(state.odom, feats, cfg)
        out = {}
        out["n_raw_valid"] = jnp.max(jnp.sum(m, axis=1))
        out["ring_cnt"] = jnp.max(rc.cnt)
        out["n_sharp"] = jnp.max(jnp.sum(feats.sharp.mask, axis=1))
        out["n_less_sharp"] = jnp.max(jnp.sum(feats.less_sharp.mask, axis=1))
        out["n_flat"] = jnp.max(jnp.sum(feats.flat.mask, axis=1))
        out["n_less_flat"] = jnp.max(jnp.sum(feats.less_flat.mask, axis=1))

        corner_in, surf_in = odom.corner_last, odom.surf_last
        c_vals = jnp.concatenate(
            [corner_in.xyz, corner_in.intensity[..., None]], axis=-1)
        c_ds, c_m, _ = voxel_downsample_masked_b(
            c_vals, corner_in.mask, cfg.line_resolution, cfg.corner_stack_cap)
        s_vals = jnp.concatenate(
            [surf_in.xyz, surf_in.intensity[..., None]], axis=-1)
        s_ds, s_m, _ = voxel_downsample_masked_b(
            s_vals, surf_in.mask, cfg.plane_resolution, cfg.surf_stack_cap)
        out["n_corner_stack"] = jnp.max(jnp.sum(c_m, axis=1))
        out["n_surf_stack"] = jnp.max(jnp.sum(s_m, axis=1))

        # distinct query cells + insert bucket stats (surf, the big class)
        ms = state.map
        q_w = geo.qmul(ms.q_wmap_wodom, odom.q_w)
        t_w = geo.qrot(ms.q_wmap_wodom, odom.t_w) + ms.t_wmap_wodom
        sel = geo.qrot(q_w[:, None, :], s_ds[..., :3]) + t_w[:, None, :]
        qcell = gridmap._cells_of(sel - cfg.knn_radius, cfg.knn_cell)
        rel = jnp.clip(qcell - jnp.min(qcell, axis=1, keepdims=True),
                       0, 1023)
        key = (rel[..., 0] << 20) | (rel[..., 1] << 10) | rel[..., 2]
        key = jnp.where(s_m, key, -1)
        key_s = jnp.sort(key, axis=1)
        newseg = (key_s[:, 1:] != key_s[:, :-1]) & (key_s[:, 1:] >= 0)
        out["n_query_cells_surf"] = jnp.max(
            jnp.sum(newseg, axis=1) + (key_s[:, :1] >= 0).squeeze(1))

        selc = geo.qrot(q_w[:, None, :], c_ds[..., :3]) + t_w[:, None, :]
        qcellc = gridmap._cells_of(selc - cfg.knn_radius, cfg.knn_cell)
        relc = jnp.clip(qcellc - jnp.min(qcellc, axis=1, keepdims=True),
                        0, 1023)
        keyc = (relc[..., 0] << 20) | (relc[..., 1] << 10) | relc[..., 2]
        keyc = jnp.where(c_m, keyc, -1)
        keyc_s = jnp.sort(keyc, axis=1)
        newsegc = (keyc_s[:, 1:] != keyc_s[:, :-1]) & (keyc_s[:, 1:] >= 0)
        out["n_query_cells_corner"] = jnp.max(
            jnp.sum(newsegc, axis=1) + (keyc_s[:, :1] >= 0).squeeze(1))

        # touched insert buckets + per-bucket point counts (surf)
        cell = gridmap._cells_of(sel, cfg.knn_cell)
        h = gridmap._hash(cell, cfg.map_table_surf)
        h = jnp.where(s_m, h, -1)
        h_s = jnp.sort(h, axis=1)
        seg = (h_s[:, 1:] != h_s[:, :-1]) & (h_s[:, 1:] >= 0)
        out["n_touched_buckets_surf"] = jnp.max(
            jnp.sum(seg, axis=1) + (h_s[:, :1] >= 0).squeeze(1))
        segf = jnp.concatenate([(h_s[:, :1] >= 0), seg], axis=1)
        cid = jnp.cumsum(segf.astype(jnp.int32), axis=1) - 1
        iota = jax.lax.broadcasted_iota(jnp.int32, cid.shape, 1)
        head = jax.lax.cummax(jnp.where(segf, iota, -1), axis=1)
        rank = jnp.where(h_s >= 0, iota - head, 0)
        out["max_bucket_rank_surf"] = jnp.max(rank) + 1

        # live bucket fill of the persistent tables
        live_s = gridmap._viewp(ms.surf.cell)[..., 0, :] != gridmap._EMPTY
        out["max_bucket_fill_surf"] = jnp.max(jnp.sum(live_s, axis=-1))
        live_c = gridmap._viewp(ms.corner.cell)[..., 0, :] != gridmap._EMPTY
        out["max_bucket_fill_corner"] = jnp.max(jnp.sum(live_c, axis=-1))
        out["n_map_surf"] = jnp.max(jnp.sum(live_s, axis=(1, 2)))
        out["n_map_corner"] = jnp.max(jnp.sum(live_c, axis=(1, 2)))
        return out

    for f in range(n_frames):
        x, m = jnp.asarray(xyz[2 + f]), jnp.asarray(mask[2 + f])
        fs = frame_stats(state, x, m)
        for k, v in fs.items():
            upd(k, v)
        state, _ = step(state, x, m)

    caps = dict(ring_cap=cfg.ring_cap, sharp_cap=cfg.sharp_cap,
                less_sharp_cap=cfg.less_sharp_cap, flat_cap=cfg.flat_cap,
                less_flat_cap=cfg.less_flat_cap,
                corner_stack_cap=cfg.corner_stack_cap,
                surf_stack_cap=cfg.surf_stack_cap,
                map_cell_cap=cfg.map_cell_cap,
                map_insert_cell_cap=cfg.map_insert_cell_cap,
                map_insert_point_cap=cfg.map_insert_point_cap,
                map_bucket_surf=cfg.map_bucket_surf,
                map_bucket_corner=cfg.map_bucket_corner)
    print(json.dumps({"measured_max": stats, "caps": caps}))


if __name__ == "__main__":
    main()
