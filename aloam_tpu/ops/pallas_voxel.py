"""Pallas TPU kernel: segmented prefix sums for the voxel downsample.

Replaces the ``jax.lax.associative_scan`` in ``frontend/voxel._voxel_core``:
XLA materializes every one of the ~log2(N) combine steps in HBM (~26
passes over 6 channels — ~1.6 GB of traffic per features-stage call at
B=16 HDL-64 ring shapes), while each ring row is only 10-32 KB and fits
VMEM whole. This kernel runs the same segmented inclusive scan as a
Hillis-Steele ladder on VMEM-resident row tiles: HBM sees the channels
exactly twice (in + out).

Semantics: identical combine to voxel.py's reset-at-head form —
``x_i <- x_i + (head_i ? 0 : x_{i-d})``, ``head_i <- head_i | head_{i-d}``
— so per-segment sums stay within their segment and match direct
summation up to f32 addition order (the XLA scan uses a different
association; the interpret-mode test pins values to ~1e-5).

Lane shifts use ``pltpu.roll`` with rolled-in lanes masked via iota
(wrapped values act as x = 0 / head = 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_scan_kernel(*refs, n_chan: int, n: int):
    in_refs = refs[:n_chan + 1]
    out_refs = refs[n_chan + 1:]
    flags = in_refs[n_chan][:]                    # (TR, N) f32 heads
    vals = [r[:] for r in in_refs[:n_chan]]
    tr = flags.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 1)
    d = 1
    while d < n:
        # x_{i-d}: shift lanes right by d; lanes i < d roll in from the
        # end — mask them to the identity (x = 0, head = 1)
        edge = iota < d
        f_sh = jnp.where(edge, 1.0, pltpu.roll(flags, d, 1))
        stop = flags > 0.0
        vals = [v + jnp.where(stop, 0.0, jnp.where(edge, 0.0,
                                                   pltpu.roll(v, d, 1)))
                for v in vals]
        flags = jnp.maximum(flags, f_sh)
        d *= 2
    for r, v in zip(out_refs, vals):
        r[:] = v


@functools.partial(jax.jit, static_argnames=("tr", "interpret"))
def segmented_prefix_sums(vals: tuple, heads: jnp.ndarray, tr: int = 8,
                          interpret: bool = False):
    """Segmented inclusive prefix sums along the last axis.

    vals: tuple of (R, N) f32 channels; heads (R, N) bool segment heads
    (position 0 must be a head, as in voxel._voxel_core). Returns the
    per-channel inclusive prefix sums with reset-at-head semantics.
    """
    r, n = heads.shape
    n_chan = len(vals)
    pad = (-r) % tr
    if pad:
        vals = tuple(jnp.pad(v, ((0, pad), (0, 0))) for v in vals)
        heads = jnp.pad(heads, ((0, pad), (0, 0)), constant_values=True)
    grid = ((r + pad) // tr,)

    def spec():
        return pl.BlockSpec((tr, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_seg_scan_kernel, n_chan=n_chan, n=n),
        grid=grid,
        in_specs=[spec() for _ in range(n_chan + 1)],
        out_specs=[spec() for _ in range(n_chan)],
        out_shape=[jax.ShapeDtypeStruct((r + pad, n), jnp.float32)
                   for _ in range(n_chan)],
        interpret=interpret,
    )(*vals, heads.astype(jnp.float32))
    return tuple(o[:r] for o in outs)
