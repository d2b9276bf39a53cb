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


def bcompact2(values: jnp.ndarray, mask_a: jnp.ndarray, cap_a: int,
              mask_b: jnp.ndarray, cap_b: int):
    """Two DISJOINT-mask compactions of the same rows as ONE flat scatter
    (each eliminated scatter pass costs ~N x 20 ns in row units). Returns
    ((out_a, mask_a', dropped_a), (out_b, mask_b', dropped_b))."""
    b, n, k = values.shape
    pos_a = jnp.cumsum(mask_a.astype(jnp.int32), axis=1) - 1
    pos_b = jnp.cumsum(mask_b.astype(jnp.int32), axis=1) - 1
    cap = cap_a + cap_b
    off = jnp.arange(b, dtype=jnp.int32)[:, None] * cap
    dest = jnp.where(mask_a & (pos_a < cap_a), pos_a + off,
                     jnp.where(mask_b & (pos_b < cap_b),
                               cap_a + pos_b + off, b * cap))
    out = jnp.zeros((b * cap, k), values.dtype).at[dest.reshape(-1)].set(
        values.reshape(-1, k), mode="drop").reshape(b, cap, k)
    tot_a = pos_a[:, -1] + 1
    tot_b = pos_b[:, -1] + 1
    kept_a = jnp.minimum(tot_a, cap_a)
    kept_b = jnp.minimum(tot_b, cap_b)
    m_a = jnp.arange(cap_a)[None, :] < kept_a[:, None]
    m_b = jnp.arange(cap_b)[None, :] < kept_b[:, None]
    return ((out[:, :cap_a], m_a, jnp.sum(tot_a - kept_a)),
            (out[:, cap_a:], m_b, jnp.sum(tot_b - kept_b)))


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
