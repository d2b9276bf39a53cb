#!/usr/bin/env python
"""Per-tile cell-span histogram of the fused association kernel
(perf_notes round-3 lever #2 / VERDICT r4 #2a).

The kernel DMAs a [align8(cid0), align8(cid0) + TQ + 8) cell window per
TQ-query tile; the actual span used by a tile is
max(local + rem) + 1 <= TQ + 8. If the measured spans are far below TQ,
ALOAM_ASSOC_CSPAN can clip the window (cutting the per-tile DMA and the
one-hot matmul by TQ/CSPAN) at a counted factor-loss rate this tool also
reports per candidate CSPAN.

Usage: python tools/assoc_span.py           (bench scene, B=16)
"""

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

from aloam_tpu import odometry as od  # noqa: E402
from aloam_tpu import geometry as geo  # noqa: E402
from aloam_tpu.frontend import registration as reg  # noqa: E402
from aloam_tpu.frontend import features as feat  # noqa: E402
from aloam_tpu.frontend.voxel import voxel_downsample_masked_b  # noqa: E402
from aloam_tpu.ops import gridmap  # noqa: E402
from aloam_tpu.parallel import batched_init, batched_step_jit  # noqa: E402

import bench  # noqa: E402


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    n_frames = int(os.environ.get("PROF_FRAMES", "8"))
    warmup = 4
    cfg = bench.batched_bench_cfg()
    tq = gridmap.ASSOC_TQ

    xyz, mask, _ = bench.load_streams(cfg, batch, n_frames + warmup)

    step = batched_step_jit(cfg, donate=False)
    state = batched_init(cfg, batch)
    for f in range(warmup):
        state, _ = step(state, jnp.asarray(xyz[f]), jnp.asarray(mask[f]))

    @jax.jit
    def frame_tiles(state, x, m):
        """Per-tile (max local+rem, live-query flags) for both classes —
        the same stack/cache front as mapping_step_b."""
        rc, curv, _ = reg.register_scan_b(x, m, cfg)
        feats = feat.extract_features_b(rc, curv, cfg)
        odom, _ = od.odometry_step_b(state.odom, feats, cfg)
        ms = state.map
        q_w = geo.qmul(ms.q_wmap_wodom, odom.q_w)
        t_w = geo.qrot(ms.q_wmap_wodom, odom.t_w) + ms.t_wmap_wodom
        out = {}
        for name, cloud, res, cap in (
                ("corner", odom.corner_last, cfg.line_resolution,
                 cfg.corner_stack_cap),
                ("surf", odom.surf_last, cfg.plane_resolution,
                 cfg.surf_stack_cap)):
            vals = jnp.concatenate(
                [cloud.xyz, cloud.intensity[..., None]], axis=-1)
            ds, m_ds, _ = voxel_downsample_masked_b(vals, cloud.mask, res,
                                                    cap)
            sel = geo.qrot(q_w[:, None, :], ds[..., :3]) + t_w[:, None, :]
            grid_s = ms.corner if name == "corner" else ms.surf
            cache, (mi,) = gridmap.knn_cache_b(
                grid_s, sel, cfg.knn_cell, cfg.knn_radius, cfg.map_cell_cap,
                payloads=(m_ds.astype(jnp.int32),))
            bsz, q_n = sel.shape[:2]
            crows = cache.cand_flat.shape[1]
            cid_f = (cache.cid_sorted
                     + (jnp.arange(bsz, dtype=jnp.int32) * crows)[:, None]
                     ).reshape(bsz * q_n)
            live = ((mi > 0)
                    & (cache.cid_sorted < cache.cell_cap)).reshape(-1)
            assert (bsz * q_n) % tq == 0
            cid0 = cid_f[::tq]
            rem = cid0 - 8 * jnp.floor_divide(cid0, 8)
            loc = (cid_f - jnp.repeat(cid0, tq)
                   + jnp.repeat(rem, tq)).reshape(-1, tq)
            out[name] = (loc, live.reshape(-1, tq))
        return out

    spans = {"corner": [], "surf": []}
    locs = {"corner": [], "surf": []}
    lives = {"corner": [], "surf": []}
    for f in range(n_frames):
        x, m = jnp.asarray(xyz[warmup + f]), jnp.asarray(mask[warmup + f])
        ft = frame_tiles(state, x, m)
        for k, (loc, live) in ft.items():
            loc, live = np.asarray(loc), np.asarray(live)
            spans[k].append(np.max(np.where(live, loc, 0), axis=1) + 1)
            locs[k].append(loc)
            lives[k].append(live)
        state, _ = step(state, x, m)

    result = {"tq": tq, "frames": n_frames, "batch": batch}
    for k in ("corner", "surf"):
        sp = np.concatenate(spans[k])
        loc = np.concatenate(locs[k])
        live = np.concatenate(lives[k])
        n_live = int(live.sum())
        pct = {p: float(np.percentile(sp, p)) for p in (50, 90, 99, 100)}
        result[k] = {
            "tiles": int(sp.size),
            "span_p50": pct[50], "span_p90": pct[90],
            "span_p99": pct[99], "span_max": pct[100],
            "live_queries": n_live,
            "spill_rate_pct": {
                str(cs): round(100.0 * float(
                    ((loc >= cs + 8) & live).sum()) / max(n_live, 1), 4)
                for cs in (32, 64, 96, 128, 192)},
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
