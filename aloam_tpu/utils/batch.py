"""Flat-op helpers for explicitly batched kernels.

Measured on this backend (round 1, see frontend/voxel.py): a vmapped/batched
gather or scatter lowers ~100x slower than the equivalent single flat op, so
every batched kernel flattens its row indices into one global gather/scatter
with per-batch offsets. ``jax.vmap`` of the single-stream kernels cannot do
this (vmap only sees the per-example trace), hence the explicit ``*_b``
variants throughout the package.
"""

from __future__ import annotations

import jax.numpy as jnp


def boffsets(b: int, n: int, idx_ndim: int) -> jnp.ndarray:
    """Per-batch row offsets shaped to broadcast against a (B, ...) index."""
    shape = (b,) + (1,) * (idx_ndim - 1)
    return (jnp.arange(b, dtype=jnp.int32) * n).reshape(shape)


def bgather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather as ONE flat gather.

    x: (B, N, ...); idx: (B, ...) int32 in [0, N). Returns
    (B, *idx.shape[1:], *x.shape[2:]).
    """
    b, n = x.shape[0], x.shape[1]
    flat = x.reshape((b * n,) + x.shape[2:])
    gidx = idx + boffsets(b, n, idx.ndim)
    out = flat[gidx.reshape(-1)]
    return out.reshape(idx.shape + x.shape[2:])


def bcompact(values: jnp.ndarray, mask: jnp.ndarray, cap: int):
    """Batched utils.masked.compact as one flat scatter.

    values (B, N, K), mask (B, N). Returns (out (B, cap, K),
    out_mask (B, cap), n_dropped scalar)."""
    b, n, k = values.shape
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    off = jnp.arange(b, dtype=jnp.int32)[:, None] * cap
    dest = jnp.where(mask & (pos < cap), pos + off, b * cap)
    out = jnp.zeros((b * cap, k), values.dtype).at[dest.reshape(-1)].set(
        values.reshape(-1, k), mode="drop").reshape(b, cap, k)
    total = pos[:, -1] + 1
    kept = jnp.minimum(total, cap)
    out_mask = jnp.arange(cap)[None, :] < kept[:, None]
    return out, out_mask, jnp.sum(total - kept)
