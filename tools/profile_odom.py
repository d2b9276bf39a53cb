#!/usr/bin/env python
"""Odometry hotspot measurements: ref-cloud occupancy (per-chunk emptiness
the kernel could skip) + window_mins timings at candidate chunk sizes.

Usage: python tools/profile_odom.py
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

from aloam_tpu import odometry as od  # noqa: E402
from aloam_tpu.frontend import registration as reg  # noqa: E402
from aloam_tpu.frontend import features as feat  # noqa: E402
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

    res = {}

    # occupancy of the odometry reference clouds
    s0 = states[-1].odom
    for name, pc in (("surf_last", s0.surf_last),
                     ("corner_last", s0.corner_last)):
        m = np.asarray(pc.mask)
        cap = m.shape[1]
        res[f"{name}_cap"] = cap
        res[f"{name}_occ_mean"] = round(float(m.mean()), 3)
        for mc in (1024, 2048):
            nch = -(-cap // mc)
            pad = nch * mc - cap
            mp_ = np.pad(m, ((0, 0), (0, pad)))
            any_valid = mp_.reshape(m.shape[0], nch, mc).any(axis=2)
            res[f"{name}_chunks_nonempty_{mc}"] = round(
                float(any_valid.mean()), 3)

    # ring span of query tiles (flat + sharp): how local is pass 2?
    reg_j = jax.jit(lambda x, m: reg.register_scan_b(x, m, cfg))
    feat_j = jax.jit(lambda rc, cv: feat.extract_features_b(rc, cv, cfg))
    rcs = [jax.block_until_ready(reg_j(x, m)) for x, m in frames]
    feats = [jax.block_until_ready(feat_j(rc, cv)) for rc, cv, _ in rcs]

    odom_j = jax.jit(lambda s, f: od.odometry_step_b(s, f, cfg))
    res["odometry_b"] = timeit(odom_j,
                               [(s.odom, f) for s, f in zip(states, feats)])

    # window_mins alone (surf pass), current vs candidate chunk sizes
    from aloam_tpu.neighbors import odom_window_mins_b
    f0 = feats[0]
    st0 = states[0].odom

    def one(fe, st, ch):
        from aloam_tpu.ops.pallas_odom import window_mins
        sel = fe.flat.xyz
        ref, ref_mask = st.surf_last.xyz, st.surf_last.mask
        ring = st.surf_last.ring()
        big = jnp.float32(1e9)
        center = jnp.mean(sel, axis=1, keepdims=True)
        ref_p = jnp.concatenate(
            [jnp.where(ref_mask[:, None, :],
                       jnp.moveaxis(ref - center, 1, 2), big),
             jnp.where(ref_mask[:, :, None],
                       ring.astype(jnp.float32)[:, :, None],
                       big).reshape(ref.shape[0], 1, -1)], axis=1)
        # m_chunk1 capped at 4096: 2*4096 pass-1 temporaries blow the
        # 16 MB scoped-VMEM stack (see window_mins docstring)
        return window_mins(sel - center, ref_p, float(cfg.nearby_scan),
                           m_chunk=ch, m_chunk1=min(2 * ch, 4096))

    for ch in (1024, 2048, 4096):
        j = jax.jit(lambda fe, st, _c=ch: one(fe, st, _c))
        res[f"wm_surf_chunk{ch}"] = round(timeit(
            j, [(f, s.odom) for f, s in zip(feats, states)]), 2)

    # edge pass (corner) for scale
    def edge(fe, st):
        return od.edge_correspondences_b(
            fe.sharp, st.corner_last, st.q_lc, st.t_lc, cfg)
    res["edge_corr"] = round(timeit(
        jax.jit(edge), [(f, s.odom) for f, s in zip(feats, states)]), 2)

    def plane(fe, st):
        return od.plane_correspondences_b(
            fe.flat, st.surf_last, st.q_lc, st.t_lc, cfg)
    res["plane_corr"] = round(timeit(
        jax.jit(plane), [(f, s.odom) for f, s in zip(feats, states)]), 2)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
