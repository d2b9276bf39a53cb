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
    # two distinct sequences: the TPU runtime memoizes identical
    # (computation, inputs) executions, so warm-up and timing must not
    # share data
    warm_scans, _ = syn.make_sequence(4, scan_lines=64, n_azimuth=1800,
                                      seed=7, speed=10.0)
    scans, traj = syn.make_sequence(n_frames, scan_lines=64, n_azimuth=1800,
                                    seed=42, speed=10.0)

    # python step loop with a donated state: in-place map updates (lax.scan
    # carries copy the ~1 GB map state per iteration on this backend)
    step = pipeline.make_step_fn(cfg)
    state = pipeline.init_state(cfg)
    for s in warm_scans:
        xyz, mask = map(jnp.asarray, syn.pad_scan(s, cfg.n_raw))
        state, out = step(state, xyz, mask)
    _ = np.asarray(out.t_map)

    dev = [tuple(map(jnp.asarray, syn.pad_scan(s, cfg.n_raw)))
           for s in scans]
    state = pipeline.init_state(cfg)
    t_maps = []
    t0 = time.perf_counter()
    for xyz, mask in dev:
        state, out = step(state, xyz, mask)
        t_maps.append(out.t_map)
    # force a host transfer: on this runtime block_until_ready can return
    # before the computation has actually finished
    est = np.stack([np.asarray(t) for t in t_maps])
    dt = time.perf_counter() - t0

    sps = n_frames / dt
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
