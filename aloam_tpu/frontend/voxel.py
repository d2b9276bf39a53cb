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

import jax
import jax.numpy as jnp

_SENTINEL = 2 ** 30  # plain scalar: jnp constants at import time would init backends


def _lex_order(ijk: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Stable argsort by (k, j, i) with invalid entries last."""
    i = ijk[:, 0]
    j = ijk[:, 1]
    k = jnp.where(mask, ijk[:, 2], _SENTINEL)
    o = jnp.argsort(i, stable=True)
    o = o[jnp.argsort(j[o], stable=True)]
    o = o[jnp.argsort(k[o], stable=True)]
    return o


def _segment_means_sorted(vals_s: jnp.ndarray, mask_s: jnp.ndarray,
                          new_seg: jnp.ndarray, out_cap: int):
    """Per-segment means of segment-sorted rows via scatter-add (static-shape
    scatters run at memory speed on this backend; the searchsorted/scan
    alternatives measured 10-100x slower)."""
    k_dim = vals_s.shape[1]
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # -1 before first valid
    n_seg = seg[-1] + 1

    dest = jnp.where(mask_s & (seg >= 0), seg, out_cap)
    ext = jnp.concatenate(
        [jnp.where(mask_s[:, None], vals_s, 0.0),
         mask_s.astype(vals_s.dtype)[:, None]], axis=1)
    totals = jnp.zeros((out_cap, k_dim + 1), vals_s.dtype).at[dest].add(
        ext, mode="drop")
    cnts = totals[:, k_dim]
    out = totals[:, :k_dim] / jnp.maximum(cnts, 1.0)[:, None]
    out_mask = jnp.arange(out_cap) < n_seg
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask, jnp.maximum(n_seg - out_cap, 0)


def voxel_downsample_masked(values: jnp.ndarray, mask: jnp.ndarray,
                            leaf: float, out_cap: int):
    """Downsample a masked cloud.

    values: (N, K) with xyz in the first 3 columns (remaining columns are
    averaged too, like PCL's downsample_all_data). mask: (N,) validity.
    Returns (out (out_cap, K), out_mask (out_cap,), n_dropped).
    """
    inv_leaf = 1.0 / leaf
    ijk = jnp.floor(values[:, :3] * inv_leaf).astype(jnp.int32)
    order = _lex_order(ijk, mask)

    vals_s = values[order]
    mask_s = mask[order]
    ijk_s = jnp.where(mask_s[:, None], ijk[order], _SENTINEL)

    new_seg = jnp.any(ijk_s != jnp.roll(ijk_s, 1, axis=0), axis=1)
    new_seg = new_seg.at[0].set(True)
    new_seg = new_seg & mask_s
    return _segment_means_sorted(vals_s, mask_s, new_seg, out_cap)


def voxel_downsample_masked_b(values: jnp.ndarray, mask: jnp.ndarray,
                              leaf: float, out_cap: int):
    """Batched voxel_downsample_masked: values (B,N,K), mask (B,N).
    Same 3-pass stable radix order and centroid semantics per stream;
    permutations are flat gathers, segment means one flat scatter-add.
    Returns (out (B,out_cap,K), out_mask (B,out_cap), n_dropped (B,))."""
    from aloam_tpu.utils.batch import bgather
    inv_leaf = 1.0 / leaf
    ijk = jnp.floor(values[..., :3] * inv_leaf).astype(jnp.int32)
    i = ijk[..., 0]
    j = ijk[..., 1]
    k = jnp.where(mask, ijk[..., 2], _SENTINEL)
    o = jnp.argsort(i, axis=1, stable=True)
    o = bgather(o, jnp.argsort(bgather(j, o), axis=1, stable=True))
    o = bgather(o, jnp.argsort(bgather(k, o), axis=1, stable=True))

    vals_s = bgather(values, o)
    mask_s = bgather(mask, o)
    ijk_s = jnp.where(mask_s[..., None], bgather(ijk, o), _SENTINEL)
    new_seg = jnp.any(ijk_s != jnp.roll(ijk_s, 1, axis=1), axis=-1)
    new_seg = new_seg.at[:, 0].set(True) & mask_s
    return _segment_means_batch(vals_s, mask_s, new_seg, out_cap)


def _segment_means_batch(vals_s: jnp.ndarray, mask_s: jnp.ndarray,
                         new_seg: jnp.ndarray, out_cap: int):
    """Batched per-segment means: one *flat* scatter-add over all rows
    (batched/vmapped scatters and gathers measured ~100x slower than their
    flattened single-op equivalents on this backend)."""
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


def _gather_sorted_batch(values: jnp.ndarray, order: jnp.ndarray):
    """Batched permutation as one flat gather. values (R,N,K), order (R,N)."""
    r, n, k_dim = values.shape
    flat_idx = (order + jnp.arange(r, dtype=jnp.int32)[:, None] * n)
    return values.reshape(-1, k_dim)[flat_idx.reshape(-1)].reshape(r, n,
                                                                   k_dim)


def _take1(x: jnp.ndarray, order: jnp.ndarray):
    """Batched 1-channel permutation as one flat gather."""
    return _gather_sorted_batch(x[..., None], order)[..., 0]


def voxel_downsample_anchored_batch(values: jnp.ndarray, mask: jnp.ndarray,
                                    leaf: float, anchors: jnp.ndarray,
                                    out_cap: int):
    """Batched single-sort voxel downsample for clouds confined to
    ``anchor + [0, 128*leaf)`` per axis (e.g. 50 m map cubes): voxel coords
    pack into one int32 sort key. values (R,N,K), mask (R,N), anchors (R,3).
    Same centroid semantics and output order as voxel_downsample_masked."""
    rel = values[..., :3] - anchors[:, None, :]
    ijk = jnp.clip(jnp.floor(rel / leaf).astype(jnp.int32), 0, 127)
    key = (ijk[..., 2] * 128 + ijk[..., 1]) * 128 + ijk[..., 0]
    key = jnp.where(mask, key, _SENTINEL)
    order = jnp.argsort(key, axis=1)

    vals_s = _gather_sorted_batch(values, order)
    key_s = _take1(key, order)
    mask_s = key_s < _SENTINEL
    new_seg = (key_s != jnp.roll(key_s, 1, axis=1)).at[:, 0].set(True) \
        & mask_s
    return _segment_means_batch(vals_s, mask_s, new_seg, out_cap)


def voxel_downsample_rings(xyz: jnp.ndarray, intensity: jnp.ndarray,
                           mask: jnp.ndarray, leaf: float):
    """Per-ring voxel downsample (scanRegistration.cpp:401-407): batched over
    the leading ring axis. xyz (R, C, 3), intensity (R, C), mask (R, C).
    Output capacity per ring = C (downsampling never grows a cloud)."""
    r, c, _ = xyz.shape
    vals = jnp.concatenate([xyz, intensity[..., None]], axis=-1)

    ijk = jnp.floor(xyz / leaf).astype(jnp.int32)
    # 2-pass stable radix argsort -> lex order (k, j, i): (j, i) pack into
    # one 22-bit key (sensor range ±120 m / 0.2 m leaf stays within ±1024
    # cells; clipped beyond), then a stable sort by k
    i = jnp.clip(ijk[..., 0] + 1024, 0, 2047)
    j = jnp.clip(ijk[..., 1] + 1024, 0, 2047)
    k = jnp.where(mask, ijk[..., 2], _SENTINEL)
    o = jnp.argsort(j * 2048 + i, axis=1, stable=True)
    o = _take1(o, jnp.argsort(_take1(k, o), axis=1, stable=True))

    vals_s = _gather_sorted_batch(vals, o)
    mask_s = _take1(mask.astype(jnp.int32), o) > 0
    ijk_s = jnp.where(mask_s[..., None],
                      _gather_sorted_batch(ijk, o).astype(jnp.int32),
                      _SENTINEL)
    new_seg = jnp.any(ijk_s != jnp.roll(ijk_s, 1, axis=1), axis=-1)
    new_seg = new_seg.at[:, 0].set(True) & mask_s

    out, out_mask, dropped = _segment_means_batch(vals_s, mask_s, new_seg, c)
    return out[..., :3], out[..., 3], out_mask, jnp.sum(dropped)
