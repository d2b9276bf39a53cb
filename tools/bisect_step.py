#!/usr/bin/env python
"""Focused step_b timing for regression bisects: loads cached streams,
warms 2 frames, then times the remaining steady-state frames in 3 blocks
and prints per-block scans/s (median + spread). Run under different
ALOAM_* env configs to A/B kernels without touching the full bench.

Usage: [BENCH_BATCH=16] [ALOAM_DISABLE_PALLAS=odom] [ALOAM_ODOM_RING_SEG=0]
       python tools/bisect_step.py
"""
import os
import sys
import time

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _here)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json  # noqa: E402
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from aloam_tpu.parallel import batched_init, batched_step_jit  # noqa: E402


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    n_frames = int(os.environ.get("BENCH_BATCH_FRAMES", "32"))
    n_blocks = int(os.environ.get("BISECT_BLOCKS", "3"))
    # mirror bench.py's batched config exactly (incl. the sensor-spec
    # ring_cap/n_raw sizing) so A/Bs compare against the headline path
    cfg = bench.batched_bench_cfg()
    xyz, mask, _ = bench.load_streams(cfg, batch, n_frames + 2)

    if os.environ.get("ALOAM_PIN_LAYOUT", "0") != "0":
        from aloam_tpu.parallel.sharding import pin_table_layouts
        step = pin_table_layouts(cfg, batch, donate=True)
    else:
        step = batched_step_jit(cfg, donate=True)
    state = batched_init(cfg, batch)
    for f in range(2):
        state, out = step(state, jnp.asarray(xyz[f]), jnp.asarray(mask[f]))
    _ = np.asarray(out.t_map)

    dev = [(jnp.asarray(xyz[2 + f]), jnp.asarray(mask[2 + f]))
           for f in range(n_frames)]
    # fence the staged H2D transfers so they don't drain into block 1
    _ = np.asarray(sum(jnp.sum(m) for _, m in dev))
    per_block = max(1, n_frames // n_blocks)
    rates = []
    for blk in range(n_blocks):
        frames = dev[blk * per_block:(blk + 1) * per_block]
        if not frames:
            break
        t0 = time.perf_counter()
        for x, m in frames:
            state, out = step(state, x, m)
        _ = np.asarray(out.t_map)
        dt = time.perf_counter() - t0
        rates.append(batch * len(frames) / dt)
    rates = sorted(rates)
    print(json.dumps({
        "batch": batch,
        "blocks": [round(r, 2) for r in rates],
        "median_sps": round(float(np.median(rates)), 2),
        "spread_sps": round(rates[-1] - rates[0], 2),
        "env": {k: v for k, v in os.environ.items()
                if k.startswith(("ALOAM_", "BENCH_"))},
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
