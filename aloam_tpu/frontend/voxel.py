"""Voxel-grid downsampling on fixed-capacity masked arrays.

TPU-native replacement for ``pcl::VoxelGrid`` (used at
``scanRegistration.cpp:401-407`` for the per-ring less-flat clouds and at
``laserMapping.cpp:543-549,787-801`` for input stacks and map cubes):
one centroid per occupied voxel, averaging every field, with voxel
partitions anchored at the origin (``ijk = floor(coord / leaf)``) and output
ordered by flattened voxel index (x fastest, then y, then z) — matching the
PCL leaf layout so oracle comparisons are order-exact.

Implemented as a 3-pass stable radix argsort (i, then j, then k) + segment
means via scatter-add; everything is shape-static and vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp

_SENTINEL = jnp.int32(2 ** 30)


def _lex_order(ijk: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Stable argsort by (k, j, i) with invalid entries last."""
    i = ijk[:, 0]
    j = ijk[:, 1]
    k = jnp.where(mask, ijk[:, 2], _SENTINEL)
    o = jnp.argsort(i, stable=True)
    o = o[jnp.argsort(j[o], stable=True)]
    o = o[jnp.argsort(k[o], stable=True)]
    return o


def voxel_downsample_masked(values: jnp.ndarray, mask: jnp.ndarray,
                            leaf: float, out_cap: int):
    """Downsample a masked cloud.

    values: (N, K) with xyz in the first 3 columns (remaining columns are
    averaged too, like PCL's downsample_all_data). mask: (N,) validity.
    Returns (out (out_cap, K), out_mask (out_cap,), n_dropped).
    """
    n, k_dim = values.shape
    inv_leaf = 1.0 / leaf
    ijk = jnp.floor(values[:, :3] * inv_leaf).astype(jnp.int32)
    order = _lex_order(ijk, mask)

    vals_s = values[order]
    mask_s = mask[order]
    ijk_s = jnp.where(mask_s[:, None], ijk[order], _SENTINEL)

    new_seg = jnp.any(ijk_s != jnp.roll(ijk_s, 1, axis=0), axis=1)
    new_seg = new_seg.at[0].set(True)
    new_seg = new_seg & mask_s
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # -1 before first valid
    n_seg = seg[-1] + 1

    dest = jnp.where(mask_s & (seg >= 0), seg, out_cap)
    sums = jnp.zeros((out_cap, k_dim), values.dtype)
    sums = sums.at[dest].add(vals_s, mode="drop")
    cnts = jnp.zeros((out_cap,), values.dtype)
    cnts = cnts.at[dest].add(1.0, mode="drop")

    out = sums / jnp.maximum(cnts, 1.0)[:, None]
    out_mask = jnp.arange(out_cap) < n_seg
    n_dropped = jnp.maximum(n_seg - out_cap, 0)
    return out, out_mask, n_dropped


def voxel_downsample_rings(xyz: jnp.ndarray, intensity: jnp.ndarray,
                           mask: jnp.ndarray, leaf: float):
    """Per-ring voxel downsample (scanRegistration.cpp:401-407): batched over
    the leading ring axis. xyz (R, C, 3), intensity (R, C), mask (R, C).
    Output capacity per ring = C (downsampling never grows a cloud)."""
    import jax
    r, c, _ = xyz.shape
    vals = jnp.concatenate([xyz, intensity[..., None]], axis=-1)
    f = jax.vmap(lambda v, m: voxel_downsample_masked(v, m, leaf, c))
    out, out_mask, dropped = f(vals, mask)
    return out[..., :3], out[..., 3], out_mask, jnp.sum(dropped)
