#!/usr/bin/env python
"""Micro-profile of extract_features_b internals at B=16 on the TPU."""

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

from aloam_tpu.frontend import registration as reg  # noqa: E402
from aloam_tpu.frontend import features as feat  # noqa: E402
from aloam_tpu.frontend import voxel as vox  # noqa: E402

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
    n_frames = 6
    cfg = bench.batched_bench_cfg()   # the headline batched config
    xyz, mask, _ = bench.load_streams(cfg, batch, n_frames + 2)
    frames = [(jnp.asarray(xyz[2 + f]), jnp.asarray(mask[2 + f]))
              for f in range(n_frames)]

    reg_j = jax.jit(lambda x, m: reg.register_scan_b(x, m, cfg))
    rcs = [jax.block_until_ready(reg_j(x, m)) for x, m in frames]

    res = {}
    feat_j = jax.jit(lambda rc, cv: feat.extract_features_b(rc, cv, cfg))
    res["features_b"] = timeit(feat_j, [(rc, cv) for rc, cv, _ in rcs])

    bsz, r, c = rcs[0][1].shape

    def sel(rc, curv):
        return feat._select_labels(rc.xyz.reshape(bsz * r, c, 3),
                                   curv.reshape(bsz * r, c),
                                   rc.cnt.reshape(bsz * r), cfg)
    sel_j = jax.jit(sel)
    res["select_labels"] = timeit(sel_j, [(rc, cv) for rc, cv, _ in rcs])
    labels = [jax.block_until_ready(sel_j(rc, cv))[0] for rc, cv, _ in rcs]

    def clssort(rc, label):
        xs = rc.xyz.reshape(bsz * r, c, 3)
        ins = rc.intensity.reshape(bsz * r, c)
        cls = jnp.where(label == 2, 0,
                        jnp.where(label == 1, 1,
                                  jnp.where(label == -1, 2, 3))).astype(
                                      jnp.int32)
        return jax.lax.sort((cls, xs[..., 0], xs[..., 1], xs[..., 2], ins),
                            dimension=1, num_keys=1, is_stable=True)
    res["class_sort"] = timeit(jax.jit(clssort),
                               [(rc, lb) for (rc, _, _), lb
                                in zip(rcs, labels)])

    def voxrings(rc, label):
        xs = rc.xyz.reshape(bsz * r, c, 3)
        ins = rc.intensity.reshape(bsz * r, c)
        return vox.voxel_downsample_rings(xs, ins, label <= 0,
                                          cfg.less_flat_leaf)
    res["voxel_rings"] = timeit(jax.jit(voxrings),
                                [(rc, lb) for (rc, _, _), lb
                                 in zip(rcs, labels)])

    def vox_sort_only(rc):
        xs = rc.xyz.reshape(bsz * r, c, 3)
        ins = rc.intensity.reshape(bsz * r, c)
        vals = jnp.concatenate([xs, ins[..., None]], axis=-1)
        m = jnp.ones((bsz * r, c), bool)
        ijk = jnp.floor(vals[..., :3] * (1.0 / cfg.less_flat_leaf)).astype(
            jnp.int32)
        base = jnp.min(jnp.where(m[..., None], ijk, 2 ** 30), axis=1,
                       keepdims=True)
        rel = jnp.clip(ijk - base, 0, 8191)
        ji = rel[..., 1] * 8192 + rel[..., 0]
        k = jnp.where(m, rel[..., 2], 2 ** 30)
        cols = tuple(vals[..., ch] for ch in range(4))
        return jax.lax.sort((k, ji) + cols, dimension=1, num_keys=2,
                            is_stable=True)
    res["vox_sort_only"] = timeit(jax.jit(vox_sort_only),
                                  [(rc,) for rc, _, _ in rcs])

    # scatter-based segment means alone (the tail of _voxel_core)
    print(json.dumps({kk: round(vv, 2) for kk, vv in res.items()}))


if __name__ == "__main__":
    main()
