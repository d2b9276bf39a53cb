#!/usr/bin/env python
"""Pre-generate the bench/profiler synthetic-stream cache (.bench_cache).

Host raytracing is ~1 s/frame on this 1-core machine; bench.py would
otherwise spend ~20 min generating streams inside its timed run window.
Order matters: bench_single first, then B=16 streams, then 32, then 64,
then the profiler's short streams — so an interrupted run still leaves
the most important files behind.
"""
import os
import sys
import time

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _here)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402


def main():
    n_b = int(os.environ.get("BENCH_BATCH_FRAMES", "32"))
    jobs = [(4, 7, 10.0), (16, 42, 10.0), (10, 3, 10.0)]  # single + stages
    for b in range(64):   # B=16/32 ladder + the B=64 probe
        jobs.append((n_b + 2, 100 + b, bench._stream_speed(b)))
    for b in range(16):   # profiler's short streams (PROF_FRAMES=6 -> f8)
        jobs.append((8, 100 + b, bench._stream_speed(b)))
    t0 = time.time()
    for i, (f, s, v) in enumerate(jobs):
        bench._cached_sequence(f, s, v)
        print(f"[{i + 1}/{len(jobs)}] f={f} seed={s} v={v:g} "
              f"t={time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
