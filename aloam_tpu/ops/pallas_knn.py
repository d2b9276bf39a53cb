"""Pallas TPU kernel: fused gated k-NN selection over candidate blocks.

Replaces the XLA tail of ``gridmap.knn_from_cache_b`` — per query-chunk,
the dense distance computation plus k passes of min/argmin/extract read
the (qc, 3W) candidate rows from HBM once and run entirely in VMEM,
instead of XLA's materialize-d2-then-re-read-per-pass schedule (the
select tail measured ~35 ms per mapping kNN call at B=16; the kernel
reads the 1.8 GB of candidate rows exactly once).

Layout contract (see ops/gridmap.py docstring): candidate rows are
coordinate-PLANAR ``[x(W) | y(W) | z(W)]`` — inside the kernel every
intermediate is (TQ, W)-shaped, respecting the (8, 128) VMEM tiling; a
(TQ, W, 3) form would lane-pad 3 -> 128 and overflow VMEM.

Tie-breaking matches ``jnp.argmin`` (lowest index), identical to the XLA
path; the interpret-mode equivalence test pins this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def min_argmin_low(x):
    """(min, lowest-index argmin) along axis 1.

    Mosaic lowers ``jnp.argmin``/``argmax`` with HIGHEST-index tie-breaks
    on TPU (measured on v5e) — the opposite of XLA/NumPy — so every
    in-kernel tie-break goes through this explicit min + first-equal-index
    form instead. Two VPU reductions; the ``jnp.min`` was being computed
    anyway everywhere this is used."""
    mn = jnp.min(x, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    am = jnp.min(jnp.where(x == mn, iota, jnp.int32(2 ** 30)), axis=1)
    return mn[:, 0], am


def select_passes(crow, q, bw: int, k: int):
    """Shared k-pass gated selection over block-planar candidate rows —
    the ONE implementation both this kernel and the fused association
    kernel (ops/pallas_assoc.py) build on. crow (TQ, n_blocks·3·bw) in
    8-sub-block [x(bw)|y(bw)|z(bw)] layout; q (TQ, ≥4) [x, y, z, poison].
    Returns (d2, nx, ny, nz) — k-element lists of (TQ,) vectors; argmin
    ties take the lowest index (jnp.argmin semantics)."""
    n_blocks = crow.shape[1] // (3 * bw)
    xs = jnp.concatenate(
        [crow[:, 3 * j * bw:(3 * j + 1) * bw] for j in range(n_blocks)], 1)
    ys = jnp.concatenate(
        [crow[:, (3 * j + 1) * bw:(3 * j + 2) * bw]
         for j in range(n_blocks)], 1)
    zs = jnp.concatenate(
        [crow[:, (3 * j + 2) * bw:(3 * j + 3) * bw]
         for j in range(n_blocks)], 1)
    width = n_blocks * bw
    d2 = ((xs - q[:, 0:1]) ** 2 + (ys - q[:, 1:2]) ** 2
          + (zs - q[:, 2:3]) ** 2)
    d2 = jnp.where(q[:, 3:4] > 0.0, _INF, d2)

    tq = d2.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, width), 1)
    ds, nxs, nys, nzs = [], [], [], []
    for _ in range(k):
        mn, am = min_argmin_low(d2)
        sel = iota == am[:, None]
        ds.append(mn)
        nxs.append(jnp.sum(jnp.where(sel, xs, 0.0), axis=1))
        nys.append(jnp.sum(jnp.where(sel, ys, 0.0), axis=1))
        nzs.append(jnp.sum(jnp.where(sel, zs, 0.0), axis=1))
        d2 = jnp.where(sel, _INF, d2)
    return ds, nxs, nys, nzs


def _knn_select_kernel(crow_ref, q_ref, dout_ref, nx_ref, ny_ref, nz_ref,
                       *, k: int, bw: int):
    ds, nxs, nys, nzs = select_passes(crow_ref[:], q_ref[:], bw, k)
    for j in range(k):
        dout_ref[:, j] = ds[j]
        nx_ref[:, j] = nxs[j]
        ny_ref[:, j] = nys[j]
        nz_ref[:, j] = nzs[j]


@functools.partial(jax.jit, static_argnames=("k", "tq", "bw", "interpret"))
def knn_select(crow: jnp.ndarray, q: jnp.ndarray, k: int = 5,
               tq: int = 256, bw: int = 0, interpret: bool = False):
    """crow (N, 8·3·bw) block-planar candidate rows (8 sub-blocks of
    [x(bw) | y(bw) | z(bw)] — gridmap.knn_cache_b's gather-native layout;
    bw=0 means one block of 3·(W/3)); q (N, 4) [x, y, z, poison>0].

    Returns (d2 (N, k), nbrs (N, k, 3)). N must be a multiple of tq.
    """
    n, w3 = crow.shape
    if bw == 0:
        bw = w3 // 3
    pad = (-n) % tq
    if pad:
        crow = jnp.pad(crow, ((0, pad), (0, 0)))
        q = jnp.pad(q, ((0, pad), (0, 0)), constant_values=1.0)  # poisoned
    kp = max(8, k)  # pad the select axis to a full sublane
    grid = ((n + pad) // tq,)
    outs = pl.pallas_call(
        functools.partial(_knn_select_kernel, k=k, bw=bw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, w3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[jax.ShapeDtypeStruct((n + pad, kp), jnp.float32)
                   for _ in range(4)],
        interpret=interpret,
    )(crow, q)
    d2, nx, ny, nz = outs
    nbrs = jnp.stack([nx[:n, :k], ny[:n, :k], nz[:n, :k]], axis=-1)
    return d2[:n, :k], nbrs
