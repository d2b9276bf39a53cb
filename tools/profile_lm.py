"""Time the LM solves in isolation (odometry- and mapping-shaped) to size
the pallas-LM-kernel opportunity (round-5 roofline: solver.py carries 256
program steps; map_lm measured 5.6 ms/round at B=16).

Usage: python tools/profile_lm.py [B]
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
from aloam_tpu import solver, geometry as geo  # noqa: E402


def sync(out):
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[:1])


def timeit(fn, inputs):
    out = fn(*inputs[0])
    sync(out)
    t0 = time.perf_counter()
    for inp in inputs[1:]:
        out = fn(*inp)
    sync(out)
    return round(1e3 * (time.perf_counter() - t0) / (len(inputs) - 1), 2)


def make_factors(rng, b, n_edge, n_plane, frac_valid=0.6):
    """Synthetic-but-realistic factor batches (meters-scale, recentred)."""
    def pts(n):
        return jnp.asarray(
            rng.normal(scale=20.0, size=(b, n, 3)).astype(np.float32))
    e_p = pts(n_edge)
    e_a = e_p + jnp.asarray(
        rng.normal(scale=0.1, size=(b, n_edge, 3)).astype(np.float32))
    e_b = e_a + jnp.asarray(
        rng.normal(scale=0.3, size=(b, n_edge, 3)).astype(np.float32))
    e_m = jnp.asarray(rng.random((b, n_edge)) < frac_valid)
    p_p = pts(n_plane)
    nrm = rng.normal(size=(b, n_plane, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    p_n = jnp.asarray(nrm)
    p_d = -jnp.sum(p_n * p_p, axis=-1) + jnp.asarray(
        rng.normal(scale=0.05, size=(b, n_plane)).astype(np.float32))
    p_m = jnp.asarray(rng.random((b, n_plane)) < frac_valid)
    edges = solver.EdgeFactors(p=e_p, a=e_a, b=e_b, mask=e_m)
    planes = solver.PlaneFactors(p=p_p, n=p_n, d=p_d, mask=p_m)
    return edges, planes


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = bench.batched_bench_cfg()
    rng = np.random.default_rng(0)

    q0 = jnp.broadcast_to(geo.qidentity(), (b, 4))
    t0 = jnp.zeros((b, 3), jnp.float32)

    res = {"batch": b}
    shapes = {
        # odometry: sharp/flat caps
        "odom": (cfg.sharp_cap, cfg.flat_cap, cfg.odom_lm_iters),
        # mapping: downsampled stack caps
        "map": (cfg.corner_stack_cap, cfg.surf_stack_cap, cfg.map_lm_iters),
    }
    print(json.dumps({k: v for k, v in shapes.items()}))
    n_rep = 12
    for name, (ne, np_, iters) in shapes.items():
        lm_b = jax.jit(jax.vmap(lambda e, p, qq, tt: solver.lm_solve(
            (e, p), qq, tt, iters, cfg.huber_delta)))
        inputs = []
        for i in range(n_rep):
            r = np.random.default_rng(i)
            e, p = make_factors(r, b, ne, np_)
            inputs.append((e, p, q0, t0))
        res[f"lm_{name}"] = timeit(lm_b, inputs)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
