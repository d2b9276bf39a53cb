"""Persistent spatial-hash map grid — the voxel-cube world map, TPU-native.

The reference stores the world map as 21×21×11 cubes of PCL clouds that are
re-gathered, KD-tree'd, appended and re-voxelized *every frame*
(laserMapping.cpp:74-108, 531-559, 736-801). A literal translation pays
per-frame passes over hundreds of thousands of mostly-padding rows. Here the
map IS the neighbor-search structure: one persistent hash table of 2 m cells
whose entries are voxel centroids.

Semantics relative to the reference:

* **Insert + per-cube re-voxelization (C21)** — the inserted stack is
  voxel-downsampled at the map resolution in the *map frame* (same
  origin-anchored grid as PCL's), so at most one new point lands per voxel;
  an insert that matches an existing entry's voxel replaces it with the
  midpoint — exactly the iterated centroid the reference's repeated
  re-voxelization computes (old centroid and new point are each single
  points of the voxel being re-averaged).
* **Rolling window / recentering (C14/C15)** — instead of rolling a cube
  array, entries farther from the pose than the 21×21×11×50 m window are
  *evictable*: bucket overflow overwrites empty slots first, then
  out-of-window entries (farthest first), then in-window entries (farthest
  first). Absolute i16 cell coordinates mean no toroidal aliasing.
* **Per-frame KD-trees (laserMapping.cpp:558-559)** — gone; the table is
  query-ready at all times. Gated 5-NN queries cover the 1.0 m² gate
  exactly via the 2×2×2 block of 2 m cells around each query.

Bucket overflow and evictions are surfaced as metrics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = float("inf")
_P1, _P2, _P3 = 73856093, 19349663, 83492791  # spatial-hash primes
_EMPTY = 32767  # i16 sentinel cell coordinate


class GridMap(NamedTuple):
    pts: jnp.ndarray    # (H, B, 3) voxel-centroid coordinates
    inten: jnp.ndarray  # (H, B) averaged intensity
    cell: jnp.ndarray   # (H, B, 3) i16 absolute cell coords; _EMPTY = free
    vox: jnp.ndarray    # (H, B) i32 hashed voxel id (merge matching)


_FAR = 1e9  # empty-slot position sentinel: fails every distance gate


def empty(table_size: int, bucket_cap: int) -> GridMap:
    # _hash masks with (table_size - 1): anything else would silently
    # produce out-of-range bucket ids (clamped gathers -> corrupted map)
    assert table_size & (table_size - 1) == 0, (
        f"table_size must be a power of two, got {table_size}")
    return GridMap(
        pts=jnp.full((table_size, bucket_cap, 3), _FAR, jnp.float32),
        inten=jnp.zeros((table_size, bucket_cap), jnp.float32),
        cell=jnp.full((table_size, bucket_cap, 3), _EMPTY, jnp.int16),
        vox=jnp.zeros((table_size, bucket_cap), jnp.int32))


def n_valid(grid: GridMap) -> jnp.ndarray:
    return jnp.sum(grid.cell[..., 0] != _EMPTY)


def count_near(grid: GridMap, center: jnp.ndarray,
               half_cells: jnp.ndarray) -> jnp.ndarray:
    """Live entries within center ± half_cells (cell coords) — the analog of
    the reference's local 5×5×3-cube map-point count that gates the mapping
    solve (laserMapping.cpp:531-554). One masked pass over the i16 cell
    table (~a few MB), no gathers."""
    c = grid.cell.astype(jnp.int32)
    live = grid.cell[..., 0] != _EMPTY
    near = jnp.all(jnp.abs(c - center[None, None, :])
                   <= half_cells[None, None, :], axis=-1)
    return jnp.sum(live & near)


def _cells_of(pts: jnp.ndarray, cell_size: float) -> jnp.ndarray:
    return jnp.floor(pts / cell_size).astype(jnp.int32)


def _hash(cells: jnp.ndarray, table_size: int) -> jnp.ndarray:
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return jnp.bitwise_and(h, table_size - 1)


def _vox_id(pts: jnp.ndarray, leaf: float) -> jnp.ndarray:
    """Hashed global voxel identity (32-bit; collisions within one cell are
    negligible and at worst merge two neighbouring voxels once)."""
    v = jnp.floor(pts / leaf).astype(jnp.int32)
    return (v[..., 0] * _P1) ^ (v[..., 1] * _P2) ^ (v[..., 2] * _P3)


def _offsets8():
    import numpy as np
    g = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                             indexing="ij"), -1).reshape(8, 3)
    return jnp.asarray(g, jnp.int32)


def knn(grid: GridMap, query: jnp.ndarray, k: int, cell_size: float,
        radius: float = 1.0, query_chunk: int = 0):
    """Gated exact k-NN against the persistent grid: every map point within
    `radius` of a query is covered by the 2×2×2 cell block at
    floor((q - radius)/cell) (requires cell_size >= 2*radius). Returns
    (d2 (Q,k) ascending with +inf padding, nbrs (Q,k,3)).

    query_chunk > 0 processes queries in chunks of that size (lax.map):
    the (Q, 8, B, 3) candidate gather is the biggest per-frame intermediate
    (~100 MB at HDL-64 stack sizes), which matters when vmapping many
    streams into one chip's HBM."""
    assert cell_size >= 2 * radius, (cell_size, radius)
    if query_chunk and query.shape[0] > query_chunk:
        n = query.shape[0]
        pad = (-n) % query_chunk
        qp = jnp.pad(query, ((0, pad), (0, 0)))
        qs = qp.reshape(-1, query_chunk, 3)
        d2, nbrs = jax.lax.map(
            lambda qq: knn(grid, qq, k, cell_size, radius), qs)
        return (d2.reshape(-1, k)[:n], nbrs.reshape(-1, k, 3)[:n])
    table_size = grid.pts.shape[0]
    qcells = _cells_of(query - radius, cell_size)
    ncells = qcells[:, None, :] + _offsets8()[None]          # (Q, 8, 3)
    hh = _hash(ncells, table_size)
    cand_pts = grid.pts[hh]                                  # (Q, 8, B, 3)

    # No cell verification is needed for *gated* exactness: every point
    # within `radius` of the query lives in the 8 block cells, so
    # hash-colliding entries (which belong to cells outside the block) are
    # farther than `radius` and can neither pass the gate nor displace a
    # true gated neighbor; empty slots sit at the _FAR sentinel. The one
    # duplication hazard — two block cells hashing to the same bucket —
    # is masked by keeping each bucket's first occurrence only.
    same = hh[:, :, None] == hh[:, None, :]                  # (Q, 8, 8)
    tri = jnp.tril(jnp.ones((8, 8), bool), -1)[None]
    dup = jnp.any(same & tri, axis=2)                        # (Q, 8)

    diff = cand_pts - query[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(dup[:, :, None], _INF, d2)

    q, _, b, _ = cand_pts.shape
    d2 = d2.reshape(q, 8 * b)
    neg_top, pos = jax.lax.top_k(-d2, k)
    nbrs = jnp.take_along_axis(cand_pts.reshape(q, 8 * b, 3),
                               pos[..., None], axis=1)
    return -neg_top, nbrs


def insert(grid: GridMap, pts: jnp.ndarray, inten: jnp.ndarray,
           mask: jnp.ndarray, leaf: float, cell_size: float,
           center: jnp.ndarray, window: jnp.ndarray):
    """Insert one frame's voxel-downsampled stack (≤1 point per map voxel).

    center: the pose's cell coords (3,); window: half-extent in cells (3,)
    — entries outside center±window are evictable (the rolling-window
    discard, laserMapping.cpp:345-346 etc.).

    Returns (grid, merged, appended, evicted, dropped).
    """
    table_size, bucket_cap, _ = grid.pts.shape
    n = pts.shape[0]
    cell = _cells_of(pts, cell_size)
    vox = _vox_id(pts, leaf)
    h = _hash(cell, table_size)

    b_cell = grid.cell[h].astype(jnp.int32)                  # (N, B, 3)
    b_vox = grid.vox[h]                                      # (N, B)
    b_pts = grid.pts[h]                                      # (N, B, 3)
    b_int = grid.inten[h]                                    # (N, B)
    occupied = b_cell[..., 0] != _EMPTY
    same = occupied & jnp.all(b_cell == cell[:, None, :], axis=-1) \
        & (b_vox == vox[:, None])
    has_match = jnp.any(same, axis=1) & mask
    match_slot = jnp.argmax(same, axis=1)

    # --- merges: iterated voxel centroid (old entry is itself a centroid,
    # the new point is the frame's sole point in the voxel) ----------------
    old_pt = jnp.take_along_axis(
        b_pts, match_slot[:, None, None].repeat(3, -1), axis=1)[:, 0]
    old_in = jnp.take_along_axis(b_int, match_slot[:, None], axis=1)[:, 0]
    m_dest = jnp.where(has_match, h * bucket_cap + match_slot,
                       table_size * bucket_cap)
    flat_pts = grid.pts.reshape(-1, 3).at[m_dest].set(
        0.5 * (old_pt + pts), mode="drop")
    flat_int = grid.inten.reshape(-1).at[m_dest].set(
        0.5 * (old_in + inten), mode="drop")

    # --- appends: rank within bucket, slots by eviction priority ----------
    app = mask & ~has_match
    key = jnp.where(app, h, table_size)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    counts = jnp.bincount(key_s, length=table_size + 1)[:table_size]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[
        jnp.minimum(key_s, table_size)]

    # slot priority per (point, slot): empty < out-of-window (far first)
    # < in-window (far first); priorities computed in arrival order then
    # permuted alongside the points
    dist = jnp.max(jnp.abs(b_cell - center[None, None, :]), axis=-1)
    in_win = jnp.all(jnp.abs(b_cell - center[None, None, :])
                     <= window[None, None, :], axis=-1)
    far = 4000.0 - jnp.minimum(dist.astype(jnp.float32), 4000.0)
    prio = jnp.where(occupied,
                     jnp.where(in_win, 1e6 + far, 1e3 + far),
                     0.0)                                     # (N, B)
    slot_order = jnp.argsort(prio, axis=1)                    # (N, B)
    # permute per-point rows into bucket-sorted order (flat gathers)
    flat_rows = order
    slot_order_s = slot_order[flat_rows]
    prio_s = prio[flat_rows]
    h_s = h[flat_rows]
    ok = (key_s < table_size) & (rank < bucket_cap)
    slot = jnp.take_along_axis(slot_order_s,
                               jnp.clip(rank, 0, bucket_cap - 1)[:, None],
                               axis=1)[:, 0]
    chosen_prio = jnp.take_along_axis(
        prio_s, jnp.clip(rank, 0, bucket_cap - 1)[:, None], axis=1)[:, 0]
    a_dest = jnp.where(ok, h_s * bucket_cap + slot, table_size * bucket_cap)

    flat_pts = flat_pts.at[a_dest].set(pts[flat_rows], mode="drop")
    flat_int = flat_int.at[a_dest].set(inten[flat_rows], mode="drop")
    flat_cell = grid.cell.reshape(-1, 3).at[a_dest].set(
        cell[flat_rows].astype(jnp.int16), mode="drop")
    flat_vox = grid.vox.reshape(-1).at[a_dest].set(vox[flat_rows],
                                                   mode="drop")

    merged = jnp.sum(has_match)
    appended = jnp.sum(ok & (key_s < table_size))
    evicted = jnp.sum(ok & (chosen_prio >= 1e3))
    dropped = jnp.sum(app) - appended
    new_grid = GridMap(
        pts=flat_pts.reshape(table_size, bucket_cap, 3),
        inten=flat_int.reshape(table_size, bucket_cap),
        cell=flat_cell.reshape(table_size, bucket_cap, 3),
        vox=flat_vox.reshape(table_size, bucket_cap))
    return new_grid, merged, appended, evicted, dropped


def extract(grid: GridMap):
    """Host-side (points, intensity) of all valid entries."""
    import numpy as np
    m = np.asarray(grid.cell[..., 0] != _EMPTY)
    return np.asarray(grid.pts)[m], np.asarray(grid.inten)[m]
