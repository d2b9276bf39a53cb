#!/usr/bin/env python
"""Benchmark: full SLAM pipeline (registration + odometry + mapping) on
synthetic HDL-64 scans, one chip. Prints ONE JSON line.

vs_baseline is relative to the reference's real-time design point of
10 scans/sec (scanPeriod = 0.1 s, scanRegistration.cpp:60 — A-LOAM
publishes no throughput numbers beyond "real-time", BASELINE.md)."""

import os

_here = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aloam_tpu.config import PRESETS  # noqa: E402
from aloam_tpu import pipeline  # noqa: E402
from aloam_tpu.eval import ate_rmse  # noqa: E402
from aloam_tpu.io import synthetic as syn  # noqa: E402


def main():
    cfg = PRESETS["HDL-64"]
    n_frames = int(os.environ.get("BENCH_FRAMES", "32"))
    scans, traj = syn.make_sequence(n_frames, scan_lines=64, n_azimuth=1800,
                                    seed=42, speed=10.0)
    xs, ms = zip(*(syn.pad_scan(s, cfg.n_raw) for s in scans))
    xyz = jnp.asarray(np.stack(xs))
    mask = jnp.asarray(np.stack(ms))

    run = jax.jit(lambda s, x, m: pipeline.run_sequence(s, x, m, cfg),
                  donate_argnums=(0,))

    # compile + warm-up pass (fresh state each call — the state is donated)
    _, outs = run(pipeline.init_state(cfg), xyz, mask)
    jax.block_until_ready(outs.t_map)

    state = pipeline.init_state(cfg)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    _, outs = run(state, xyz, mask)
    jax.block_until_ready(outs.t_map)
    dt = time.perf_counter() - t0

    sps = n_frames / dt
    est = np.asarray(outs.t_map)
    gt = traj.trans - traj.trans[0]
    ate = ate_rmse(est, gt, align=False)

    print(json.dumps({
        "metric": "scans_per_sec_hdl64_odom_map",
        "value": round(sps, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(sps / 10.0, 2),
        "ate_rmse_m": round(float(ate), 4),
        "frames": n_frames,
        "ms_per_scan": round(1e3 * dt / n_frames, 2),
    }))


if __name__ == "__main__":
    main()
