"""Pallas TPU kernel: segmented prefix sums for the voxel downsample.

Replaces the ``jax.lax.associative_scan`` in ``frontend/voxel._voxel_core``:
XLA materializes every one of the ~log2(N) combine steps in HBM (~26
passes over 6 channels — ~1.6 GB of traffic per features-stage call at
B=16 HDL-64 ring shapes), while the rows fit VMEM in chunks. This kernel
runs the same segmented inclusive scan as a Hillis-Steele ladder on
VMEM-resident (TR, CHUNK) tiles — the scan axis is CHUNKED (the biggest
call site is the mapping input downsample at N = 40960, whose full rows
would not fit VMEM) with the open-segment carry held in scratch across
the sequentially-iterated chunk grid dimension. HBM sees the channels
exactly twice (in + out).

Semantics: identical combine to voxel.py's reset-at-head form —
``x_i <- x_i + (head_i ? 0 : x_{i-d})``, ``head_i <- head_i | head_{i-d}``
— so per-segment sums stay within their segment and match direct
summation up to f32 addition order (the XLA scan uses a different
association; the interpret-mode test pins values to ~1e-5).

Lane shifts use ``pltpu.roll`` with rolled-in lanes masked via iota
(wrapped values act as the scan identity x = 0 / head = false). A chunk's lanes before its
first head continue the previous chunk's open segment: after the ladder,
``flags`` holds the within-chunk cumulative OR of heads, so the carry
adds exactly where that OR is still 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_scan_kernel(*refs, n_chan: int, chunk: int):
    in_refs = refs[:n_chan + 1]
    out_refs = refs[n_chan + 1:n_chan + 1 + n_chan]
    carry = refs[-1]                              # (8, n_chan) scratch
    c = pl.program_id(1)
    flags = in_refs[n_chan][:]                    # (TR, CHUNK) f32 heads
    vals = [r[:] for r in in_refs[:n_chan]]
    tr = flags.shape[0]

    @pl.when(c == 0)
    def _():
        carry[:, :] = jnp.zeros(carry.shape, carry.dtype)

    iota = jax.lax.broadcasted_iota(jnp.int32, (tr, chunk), 1)
    d = 1
    while d < chunk:
        # x_{i-d}: shift lanes right by d; lanes i < d roll in from the
        # end — mask them to the scan identity (x = 0, head = FALSE; a
        # true head here would pollute the cumulative OR the carry needs)
        edge = iota < d
        f_sh = jnp.where(edge, 0.0, pltpu.roll(flags, d, 1))
        stop = flags > 0.0
        vals = [v + jnp.where(stop, 0.0, jnp.where(edge, 0.0,
                                                   pltpu.roll(v, d, 1)))
                for v in vals]
        flags = jnp.maximum(flags, f_sh)
        d *= 2
    # continue the previous chunk's open segment: lanes with no head seen
    # yet inside this chunk (post-ladder flags == cumulative OR of heads)
    open_seg = flags == 0.0
    vals = [v + jnp.where(open_seg, carry[:tr, j:j + 1], 0.0)
            for j, v in enumerate(vals)]
    for j, (r, v) in enumerate(zip(out_refs, vals)):
        r[:] = v
        carry[:tr, j] = v[:, chunk - 1]


@functools.partial(jax.jit, static_argnames=("tr", "chunk", "interpret"))
def segmented_prefix_sums(vals: tuple, heads: jnp.ndarray, tr: int = 8,
                          chunk: int = 2560, interpret: bool = False):
    """Segmented inclusive prefix sums along the last axis.

    vals: tuple of (R, N) f32 channels; heads (R, N) bool segment heads
    (position 0 must be a head, as in voxel._voxel_core). Returns the
    per-channel inclusive prefix sums with reset-at-head semantics.
    """
    r, n = heads.shape
    n_chan = len(vals)
    chunk = min(chunk, n)
    pad_r = (-r) % tr
    pad_n = (-n) % chunk
    if pad_r or pad_n:
        vals = tuple(jnp.pad(v, ((0, pad_r), (0, pad_n))) for v in vals)
        heads = jnp.pad(heads, ((0, pad_r), (0, pad_n)),
                        constant_values=True)
    grid = ((r + pad_r) // tr, (n + pad_n) // chunk)

    def spec():
        return pl.BlockSpec((tr, chunk), lambda i, c: (i, c),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_seg_scan_kernel, n_chan=n_chan, chunk=chunk),
        grid=grid,
        in_specs=[spec() for _ in range(n_chan + 1)],
        out_specs=[spec() for _ in range(n_chan)],
        out_shape=[jax.ShapeDtypeStruct((r + pad_r, n + pad_n), jnp.float32)
                   for _ in range(n_chan)],
        scratch_shapes=[pltpu.VMEM((tr, n_chan), jnp.float32)],
        interpret=interpret,
    )(*vals, heads.astype(jnp.float32))
    return tuple(o[:r, :n] for o in outs)
