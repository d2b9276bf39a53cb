"""Pallas TPU kernel: fused greedy feature selection (component C5).

Replaces the XLA fori_loop in ``frontend/features._select_rings``: the
6 regions × (20 corner + 4 flat) = 144 sequential greedy picks each cost
~10 VPU passes over the full (R', C) grid in HBM — ~50 ms at B=16. Here
each ring-row block lives in VMEM for the whole walk, so the 144
iterations touch HBM exactly once (curvature + gap-prefix in, labels out).

Semantics are identical to ``_select_rings`` (the sort-free masked-extremum
form proven equivalent to the reference's sorted greedy walk,
scanRegistration.cpp:277-408): per (ring, region) window, repeated
masked argmax (corner, curvature > 0.1, 2 sharp + 18 more less-sharp) /
argmin (flat, curvature < 0.1, 4 picks, 4th suppression-free), closed-form
gap-stopped ±5 NMS via the bad-gap prefix count. Tie-breaks: lowest index
(the where-== + min-iota form below ≡ jnp.argmax/argmin).

Layout: everything (TR, C)-blocked, f32/int32 — the (8, 128) VMEM rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")
_BIG = 1e9


def _select_kernel(curv_ref, bcum_ref, spep_ref, label_ref, *,
                   n_regions: int, max_sharp: int, max_less_sharp: int,
                   max_flat: int, nms_window: int, curv_thr: float):
    curv = curv_ref[:]                     # (TR, C)
    bcum = bcum_ref[:]                     # (TR, C) f32 bad-gap prefix
    spep = spep_ref[:]                     # (TR, 2*n_regions) f32; ep=-1 off
    tr, c = curv.shape
    # Mosaic's tpu.iota is integer-only; make the f32 copy by conversion
    iota = jax.lax.broadcasted_iota(jnp.int32, (tr, c), 1).astype(jnp.float32)
    # loop carries must be i32/f32 vectors (an i1 carry fails Mosaic's
    # scf.for legalization); `picked` rides as 0/1 int32
    picked = jnp.zeros((tr, c), jnp.int32)
    label = jnp.zeros((tr, c), jnp.int32)
    corner_ok = curv > curv_thr
    flat_ok = curv < curv_thr
    nmsw = float(nms_window)

    def pick_one(picked, label, window, want_max, thr_mask, lbl, mark_nbrs):
        elig = window & (picked == 0) & thr_mask
        if want_max:
            score = jnp.where(elig, curv, -_INF)
            best = jnp.max(score, axis=1, keepdims=True)
        else:
            score = jnp.where(elig, curv, _INF)
            best = jnp.min(score, axis=1, keepdims=True)
        ok = jnp.abs(best) < _INF                            # (TR, 1)
        # lowest index among the (tied) extrema == jnp.arg{max,min}
        at_best = elig & (score == best)
        cand = jnp.min(jnp.where(at_best, iota, _BIG), axis=1,
                       keepdims=True)                        # (TR, 1)
        at_cand = ok & (iota == cand)
        label = jnp.where(at_cand, lbl, label)

        b_cand = jnp.sum(jnp.where(at_cand, bcum, 0.0), axis=1,
                         keepdims=True)
        mark = (jnp.abs(iota - cand) <= nmsw) & (bcum == b_cand) & ok
        if mark_nbrs is not None:
            mark = mark & mark_nbrs
        return picked | mark.astype(jnp.int32), label

    for j in range(n_regions):
        sp_j = spep[:, j:j + 1]
        ep_j = spep[:, n_regions + j:n_regions + j + 1]
        window = (iota >= sp_j) & (iota <= ep_j)

        def corner_body(t, st):
            picked, label = st
            lbl = jnp.where(t < max_sharp, 2, 1)
            return pick_one(picked, label, window, True, corner_ok,
                            lbl, None)

        picked, label = jax.lax.fori_loop(0, max_less_sharp, corner_body,
                                          (picked, label))

        def flat_body(t, st):
            picked, label = st
            # 4th pick labels but suppresses nothing (:358-362)
            nbrs = jnp.full((tr, 1), t < max_flat - 1)
            return pick_one(picked, label, window, False, flat_ok,
                            -1, nbrs)

        picked, label = jax.lax.fori_loop(0, max_flat, flat_body,
                                          (picked, label))

    label_ref[:] = label


def select_rings(curv: jnp.ndarray, bcum: jnp.ndarray, spep: jnp.ndarray,
                 n_regions: int, max_sharp: int, max_less_sharp: int,
                 max_flat: int, nms_window: int, curv_thr: float,
                 tr: int = 0, interpret: bool = False) -> jnp.ndarray:
    """curv/bcum (R', C) f32; spep (R', 2*n_regions) f32 [sp.. | ep..]
    (ep = -1 disables a region). Returns label (R', C) int32 with
    cloudLabel semantics: 2 sharp, 1 less-sharp, -1 flat, 0 other.

    tr is the ring-row tile height; 0 resolves ``ALOAM_SELECT_TR``
    (default 64) HERE, outside jit, so sweeps re-compile instead of
    reusing a stale trace. The 144 sequential picks are
    dependency-latency-bound on (tr, C) tiles, so a taller tile amortizes
    them across more rings per grid step (v5e B=16 step: tr=8 -> 145.9,
    32 -> 150.5, 64 -> 151.2 scans/s); rows are independent, so any tr is
    output-identical."""
    if tr <= 0:
        import os as _os
        tr = int(_os.environ.get("ALOAM_SELECT_TR", "64"))
    return _select_rings_jit(curv, bcum, spep, n_regions, max_sharp,
                             max_less_sharp, max_flat, nms_window,
                             curv_thr, tr, interpret)


@functools.partial(jax.jit, static_argnames=("n_regions", "max_sharp",
                                             "max_less_sharp", "max_flat",
                                             "nms_window", "curv_thr", "tr",
                                             "interpret"))
def _select_rings_jit(curv: jnp.ndarray, bcum: jnp.ndarray,
                      spep: jnp.ndarray, n_regions: int, max_sharp: int,
                      max_less_sharp: int, max_flat: int, nms_window: int,
                      curv_thr: float, tr: int, interpret: bool):
    assert tr > 0, "resolve ALOAM_SELECT_TR in select_rings, not under jit"
    r, c = curv.shape
    pad = (-r) % tr
    if pad:
        curv = jnp.pad(curv, ((0, pad), (0, 0)))
        bcum = jnp.pad(bcum, ((0, pad), (0, 0)))
        spep = jnp.pad(spep, ((0, pad), (0, 0)),
                       constant_values=-1.0)  # ep=-1: nothing selectable
    grid = ((r + pad) // tr,)
    ncol = spep.shape[1]
    label = pl.pallas_call(
        functools.partial(
            _select_kernel, n_regions=n_regions, max_sharp=max_sharp,
            max_less_sharp=max_less_sharp, max_flat=max_flat,
            nms_window=nms_window, curv_thr=curv_thr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, ncol), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r + pad, c), jnp.int32),
        interpret=interpret,
    )(curv, bcum, spep)
    return label[:r]
