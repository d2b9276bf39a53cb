#!/usr/bin/env python
"""Break gridmap.insert_b's cost into sections: sort+rank, dense-list
scatters, tile gather, merge kernel, scatter-back.

Each section is timed as a jitted prefix of the real function (XLA may
fuse differently in isolation, but deltas between prefixes bound each
section). Usage: python tools/profile_insert.py
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

from aloam_tpu import mapping as mp  # noqa: E402
from aloam_tpu.ops import gridmap as gm  # noqa: E402
from aloam_tpu.ops.gridmap import _cells_of, _vox_id, _hash  # noqa: E402
from aloam_tpu.utils.batch import bgather  # noqa: E402
from aloam_tpu.parallel import batched_init, batched_step_jit  # noqa: E402

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


def insert_prefix(grid, pts, inten, mask, leaf, cell_size, center, window,
                  point_cap, touched_cap, upto):
    """Replays insert_b up to a section boundary (kept in sync with
    gridmap.insert_b by the shared helpers)."""
    bsz, n = mask.shape
    table_size = grid.aux.shape[1]
    bucket_cap = grid.bucket_cap
    cap_c, cap_p = touched_cap, point_cap

    cell = _cells_of(pts, cell_size)
    vox = _vox_id(pts, leaf)
    h = _hash(cell, table_size)
    key = jnp.where(mask, h, table_size)
    key_s, px_s, py_s, pz_s, pi_s, vox_s = jax.lax.sort(
        (key, pts[..., 0], pts[..., 1], pts[..., 2], inten, vox),
        dimension=1, num_keys=1, is_stable=True)
    valid_s = key_s < table_size
    pay_s = jnp.stack([px_s, py_s, pz_s, pi_s], axis=-1)
    seg = valid_s & jnp.concatenate(
        [jnp.ones((bsz, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=1)
    cid_s = jnp.cumsum(seg.astype(jnp.int32), axis=1) - 1
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (bsz, n), 1)
    head = jax.lax.cummax(jnp.where(seg, iota_n, -1), axis=1)
    rank = iota_n - head
    keep = valid_s & (cid_s >= 0) & (cid_s < cap_c) & (rank < cap_p)
    cid_c = jnp.where(keep, cid_s, cap_c)
    if upto == "sort":
        return cid_c, rank, pay_s

    coff = (jnp.arange(bsz, dtype=jnp.int32) * (cap_c + 1))[:, None]
    brow = cid_c + coff
    flat_np = bsz * (cap_c + 1) * cap_p
    ppos = jnp.where(keep, brow * cap_p + jnp.minimum(rank, cap_p - 1),
                     flat_np).reshape(-1)

    def scat_f32(vals):
        return jnp.zeros((flat_np,), jnp.float32).at[ppos].set(
            vals.reshape(-1), mode="drop").reshape(
                bsz, cap_c + 1, cap_p)[:, :cap_c]

    ppx = scat_f32(jnp.where(keep, pay_s[..., 0], 0.0))
    ppy = scat_f32(jnp.where(keep, pay_s[..., 1], 0.0))
    ppz = scat_f32(jnp.where(keep, pay_s[..., 2], 0.0))
    ppi = scat_f32(jnp.where(keep, pay_s[..., 3], 0.0))
    pvox = jnp.zeros((flat_np,), jnp.int32).at[ppos].set(
        vox_s.reshape(-1), mode="drop").reshape(
            bsz, cap_c + 1, cap_p)[:, :cap_c]
    cnt = jnp.zeros((bsz * (cap_c + 1),), jnp.int32).at[brow.reshape(-1)].add(
        jnp.where(keep, 1, 0).reshape(-1), mode="drop").reshape(
            bsz, cap_c + 1)[:, :cap_c]
    slot_h = jnp.zeros((bsz * (cap_c + 1),), jnp.int32).at[
        brow.reshape(-1)].set(key_s.reshape(-1), mode="drop").reshape(
            bsz, cap_c + 1)[:, :cap_c]
    if upto == "lists":
        return ppx, ppy, ppz, ppi, pvox, cnt, slot_h

    pts_tile = bgather(grid.pts, slot_h)
    aux_tile = bgather(grid.aux, slot_h)
    av = aux_tile.reshape(aux_tile.shape[:2] + (5, bucket_cap))
    s_int = jax.lax.bitcast_convert_type(av[:, :, 0], jnp.float32)
    cell_tile = av[:, :, 1:4].reshape(av.shape[:2] + (3 * bucket_cap,))
    vox_tile = av[:, :, 4]
    if upto == "gather":
        return pts_tile, s_int, cell_tile, vox_tile

    from aloam_tpu.ops.pallas_gate import use_pallas
    if use_pallas("insert"):
        from aloam_tpu.ops.pallas_insert import merge_tiles
        merge_fn = merge_tiles
    else:
        merge_fn = gm._merge_dense_xla
    outs = merge_fn(pts_tile, s_int, cell_tile, vox_tile,
                    ppx, ppy, ppz, ppi, pvox, cnt, center, window,
                    cell_size, leaf)
    if upto == "merge":
        return outs
    raise ValueError(upto)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    n_frames = 6
    cfg = bench.batched_bench_cfg()   # the headline batched config
    xyz, mask, _ = bench.load_streams(cfg, batch, n_frames + 2)

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

    # surf-insert-shaped inputs: reuse the surf stacks as stand-ins (the
    # same trick profile_b16 uses for map_insert_surf_only)
    from aloam_tpu.frontend.voxel import voxel_downsample_masked_b
    import aloam_tpu.geometry as geo

    def stacks(ms, o_q, o_t, surf_xyz, surf_int, surf_mask):
        s_vals = jnp.concatenate([surf_xyz, surf_int[..., None]], axis=-1)
        s_ds, s_m, _ = voxel_downsample_masked_b(
            s_vals, surf_mask, cfg.plane_resolution, cfg.surf_stack_cap)
        return s_ds[..., :3], s_ds[..., 3], s_m

    stacks_j = jax.jit(stacks)
    ins_in = []
    for s in states:
        o = s.odom
        sp, si, sm = jax.block_until_ready(stacks_j(
            s.map, o.q_w, o.t_w, o.surf_last.xyz, o.surf_last.intensity,
            o.surf_last.mask))
        window = mp._window_cells(cfg)
        center = jnp.floor(o.t_w / cfg.knn_cell).astype(jnp.int32)
        ins_in.append((s.map.surf, sp, si, sm, center))

    window = mp._window_cells(cfg)
    res = {}
    occ = np.asarray(ins_in[0][3])
    res["stack_n"] = int(occ.shape[1])
    res["stack_occ"] = round(float(occ.mean()), 3)

    for upto in ("sort", "lists", "gather", "merge"):
        j = jax.jit(lambda g, p, i, m, c, _u=upto: insert_prefix(
            g, p, i, m, cfg.plane_resolution, cfg.knn_cell, c, window,
            cfg.map_insert_point_cap, cfg.map_insert_cell_cap, _u))
        res[f"upto_{upto}"] = round(timeit(j, ins_in), 2)

    full_j = jax.jit(lambda g, p, i, m, c: gm.insert_b(
        g, p, i, m, cfg.plane_resolution, cfg.knn_cell, c, window,
        cfg.map_insert_point_cap, cfg.map_insert_cell_cap))
    res["full_insert"] = round(timeit(full_j, ins_in), 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
