"""Voxel-grid downsampling on fixed-capacity masked arrays.

TPU-native replacement for ``pcl::VoxelGrid`` (used at
``scanRegistration.cpp:401-407`` for the per-ring less-flat clouds and at
``laserMapping.cpp:543-549,787-801`` for input stacks and map cubes):
one centroid per occupied voxel, averaging every field, with voxel
partitions anchored at the origin (``ijk = floor(coord / leaf)``) and output
ordered by flattened voxel index (x fastest, then y, then z) — matching the
PCL leaf layout so oracle comparisons are order-exact.

Implemented as ONE variadic lexicographic ``lax.sort`` that carries the
payload columns alongside the (k, j, i) keys — measured 5.5x faster at
SLAM shapes than the previous 2-3 pass stable-argsort + permutation-gather
form (14.6 vs 80 ms at (1024, 2560) x 4 channels on this TPU: every
eliminated pass was a 2.6M-row gather). Segment means via one flat
scatter-add; everything is shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = 2 ** 30  # plain scalar: jnp constants at import time would init backends


def _segment_means_batch(vals_s: jnp.ndarray, mask_s: jnp.ndarray,
                         new_seg: jnp.ndarray, out_cap: int):
    """Batched per-segment means of segment-sorted rows: one *flat*
    scatter-add over all rows (batched/vmapped scatters measured ~100x
    slower than their flattened single-op equivalents on this backend)."""
    r, n, k_dim = vals_s.shape
    seg = jnp.cumsum(new_seg.astype(jnp.int32), axis=1) - 1
    n_seg = seg[:, -1] + 1

    row = jnp.arange(r, dtype=jnp.int32)[:, None]
    ok = mask_s & (seg >= 0) & (seg < out_cap)
    dest = jnp.where(ok, row * out_cap + seg, r * out_cap).reshape(-1)
    ext = jnp.concatenate(
        [jnp.where(mask_s[..., None], vals_s, 0.0),
         mask_s.astype(vals_s.dtype)[..., None]], axis=-1)
    totals = jnp.zeros((r * out_cap, k_dim + 1), vals_s.dtype).at[dest].add(
        ext.reshape(-1, k_dim + 1), mode="drop")
    totals = totals.reshape(r, out_cap, k_dim + 1)
    cnts = totals[..., k_dim]
    out = totals[..., :k_dim] / jnp.maximum(cnts, 1.0)[..., None]
    out_mask = jnp.arange(out_cap)[None, :] < n_seg[:, None]
    out = jnp.where(out_mask[..., None], out, 0.0)
    return out, out_mask, jnp.maximum(n_seg - out_cap, 0)  # per-row drops


def _voxel_core(values: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                out_cap: int):
    """Shared rows-batched core. values (R, N, K) with xyz leading, mask
    (R, N). One lexicographic sort by (k, ji) — identical order to a
    stable radix sort by i, then j, then k — with the K payload columns
    riding the same sort. (j, i) pack exactly into one key after a
    per-row rebase: a single cloud spans well under 8192 cells per axis
    at any leaf ≥ 0.1 m, and fewer sort keys measured faster. Invalid
    rows sort last via a sentinel k."""
    ijk = jnp.floor(values[..., :3] * (1.0 / leaf)).astype(jnp.int32)
    base = jnp.min(jnp.where(mask[..., None], ijk, 2 ** 30), axis=1,
                   keepdims=True)
    rel = jnp.clip(ijk - base, 0, 8191)
    ji = rel[..., 1] * 8192 + rel[..., 0]
    k = jnp.where(mask, rel[..., 2], _SENTINEL)
    cols = tuple(values[..., c] for c in range(values.shape[-1]))
    out = jax.lax.sort((k, ji) + cols, dimension=1, num_keys=2,
                       is_stable=True)
    k_s, ji_s = out[0], out[1]
    vals_s = jnp.stack(out[2:], axis=-1)
    mask_s = k_s < _SENTINEL

    def diff(a):
        return a != jnp.roll(a, 1, axis=1)

    new_seg = (diff(k_s) | diff(ji_s))
    new_seg = new_seg.at[:, 0].set(True) & mask_s
    return _segment_means_batch(vals_s, mask_s, new_seg, out_cap)


def voxel_downsample_masked(values: jnp.ndarray, mask: jnp.ndarray,
                            leaf: float, out_cap: int):
    """Downsample a masked cloud.

    values: (N, K) with xyz in the first 3 columns (remaining columns are
    averaged too, like PCL's downsample_all_data). mask: (N,) validity.
    Returns (out (out_cap, K), out_mask (out_cap,), n_dropped).
    """
    out, out_mask, dropped = _voxel_core(values[None], mask[None], leaf,
                                         out_cap)
    return out[0], out_mask[0], dropped[0]


def voxel_downsample_masked_b(values: jnp.ndarray, mask: jnp.ndarray,
                              leaf: float, out_cap: int):
    """Batched voxel_downsample_masked: values (B,N,K), mask (B,N).
    Returns (out (B,out_cap,K), out_mask (B,out_cap), n_dropped (B,))."""
    return _voxel_core(values, mask, leaf, out_cap)


def voxel_downsample_rings(xyz: jnp.ndarray, intensity: jnp.ndarray,
                           mask: jnp.ndarray, leaf: float):
    """Per-ring voxel downsample (scanRegistration.cpp:401-407): batched over
    the leading ring axis. xyz (R, C, 3), intensity (R, C), mask (R, C).
    Output capacity per ring = C (downsampling never grows a cloud)."""
    c = xyz.shape[1]
    vals = jnp.concatenate([xyz, intensity[..., None]], axis=-1)
    out, out_mask, dropped = _voxel_core(vals, mask, leaf, c)
    return out[..., :3], out[..., 3], out_mask, jnp.sum(dropped)
