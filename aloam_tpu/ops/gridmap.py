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


def knn_b(grid: GridMap, query: jnp.ndarray, k: int, cell_size: float,
          radius: float = 1.0, query_chunk: int = 0):
    """Batched knn(): grid leaves carry a leading stream axis (B, H, Bk, ·),
    query is (B, Q, 3). All gathers are single flat ops (utils.batch — a
    vmapped gather measured ~100x slower on this backend). Returns
    (d2 (B,Q,k), nbrs (B,Q,k,3))."""
    from aloam_tpu.utils.batch import bgather
    assert cell_size >= 2 * radius, (cell_size, radius)
    bsz, q_n = query.shape[:2]
    if query_chunk and q_n > query_chunk:
        pad = (-q_n) % query_chunk
        qp = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
        qs = jnp.moveaxis(
            qp.reshape(bsz, -1, query_chunk, 3), 1, 0)     # (C, B, qc, 3)
        d2, nbrs = jax.lax.map(
            lambda qq: knn_b(grid, qq, k, cell_size, radius), qs)
        d2 = jnp.moveaxis(d2, 0, 1).reshape(bsz, -1, k)[:, :q_n]
        nbrs = jnp.moveaxis(nbrs, 0, 1).reshape(bsz, -1, k, 3)[:, :q_n]
        return d2, nbrs

    table_size = grid.pts.shape[1]
    bucket_cap = grid.pts.shape[2]
    qcells = _cells_of(query - radius, cell_size)
    ncells = qcells[:, :, None, :] + _offsets8()[None, None]   # (B, Q, 8, 3)
    hh = _hash(ncells, table_size)
    cand_pts = bgather(grid.pts, hh)                  # (B, Q, 8, Bk, 3)

    same = hh[..., :, None] == hh[..., None, :]       # (B, Q, 8, 8)
    tri = jnp.tril(jnp.ones((8, 8), bool), -1)[None, None]
    dup = jnp.any(same & tri, axis=-1)                # (B, Q, 8)

    diff = cand_pts - query[:, :, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(dup[..., None], _INF, d2)

    d2 = d2.reshape(bsz, q_n, 8 * bucket_cap)
    neg_top, pos = jax.lax.top_k(-d2, k)
    flat_cand = cand_pts.reshape(bsz * q_n, 8 * bucket_cap, 3)
    nbrs = bgather(flat_cand, pos.reshape(bsz * q_n, k))
    return -neg_top, nbrs.reshape(bsz, q_n, k, 3)


def count_near_b(grid: GridMap, center: jnp.ndarray,
                 half_cells: jnp.ndarray) -> jnp.ndarray:
    """Batched count_near: center (B, 3) -> counts (B,)."""
    c = grid.cell.astype(jnp.int32)
    live = grid.cell[..., 0] != _EMPTY
    near = jnp.all(jnp.abs(c - center[:, None, None, :])
                   <= half_cells[None, None, None, :], axis=-1)
    return jnp.sum(live & near, axis=(1, 2))


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


def insert_b(grid: GridMap, pts: jnp.ndarray, inten: jnp.ndarray,
             mask: jnp.ndarray, leaf: float, cell_size: float,
             center: jnp.ndarray, window: jnp.ndarray):
    """Batched insert(): grid leaves (B, H, Bk, ·), pts (B, N, 3),
    center (B, 3). Same semantics per stream as insert(); every gather and
    scatter is one flat op, per-slot picks use one-hot multiply-reduces
    instead of take_along_axis (both measured far faster batched).

    Returns (grid, merged (B,), appended (B,), evicted (B,), dropped (B,)).
    """
    from aloam_tpu.utils.batch import bgather
    bsz, table_size, bucket_cap, _ = grid.pts.shape
    n = pts.shape[1]
    cell = _cells_of(pts, cell_size)                        # (B, N, 3)
    vox = _vox_id(pts, leaf)
    h = _hash(cell, table_size)

    b_cell = bgather(grid.cell, h).astype(jnp.int32)        # (B, N, Bk, 3)
    b_vox = bgather(grid.vox, h)
    b_pts = bgather(grid.pts, h)
    b_int = bgather(grid.inten, h)
    occupied = b_cell[..., 0] != _EMPTY
    same = occupied & jnp.all(b_cell == cell[:, :, None, :], axis=-1) \
        & (b_vox == vox[:, :, None])
    has_match = jnp.any(same, axis=-1) & mask               # (B, N)
    match_slot = jnp.argmax(same, axis=-1)                  # (B, N)

    # --- merges (iterated centroid); slot pick via one-hot reduce ---------
    slot_iota = jnp.arange(bucket_cap, dtype=jnp.int32)[None, None, :]
    onehot_m = (slot_iota == match_slot[..., None]).astype(jnp.float32)
    old_pt = jnp.sum(b_pts * onehot_m[..., None], axis=2)   # (B, N, 3)
    old_in = jnp.sum(b_int * onehot_m, axis=2)
    flat_cap = bsz * table_size * bucket_cap
    boff = (jnp.arange(bsz, dtype=jnp.int32)
            * (table_size * bucket_cap))[:, None]
    m_dest = jnp.where(has_match, boff + h * bucket_cap + match_slot,
                       flat_cap)
    flat_pts = grid.pts.reshape(-1, 3).at[m_dest.reshape(-1)].set(
        (0.5 * (old_pt + pts)).reshape(-1, 3), mode="drop")
    flat_int = grid.inten.reshape(-1).at[m_dest.reshape(-1)].set(
        (0.5 * (old_in + inten)).reshape(-1), mode="drop")

    # --- appends: rank within bucket, slots by eviction priority ----------
    app = mask & ~has_match
    key = jnp.where(app, h, table_size)                     # (B, N)
    order = jnp.argsort(key, axis=1, stable=True)
    key_s = bgather(key, order)                             # (B, N)
    koff = (jnp.arange(bsz, dtype=jnp.int32) * (table_size + 1))[:, None]
    counts = jnp.zeros((bsz * (table_size + 1),), jnp.int32).at[
        (key_s + koff).reshape(-1)].add(1).reshape(bsz, table_size + 1)
    starts = jnp.concatenate(
        [jnp.zeros((bsz, 1), jnp.int32),
         jnp.cumsum(counts[:, :table_size], axis=1).astype(jnp.int32)],
        axis=1)                                             # (B, H+1)
    rank = jnp.arange(n, dtype=jnp.int32)[None, :] \
        - bgather(starts, jnp.minimum(key_s, table_size))

    dist = jnp.max(jnp.abs(b_cell - center[:, None, None, :]), axis=-1)
    in_win = jnp.all(jnp.abs(b_cell - center[:, None, None, :])
                     <= window[None, None, None, :], axis=-1)
    far = 4000.0 - jnp.minimum(dist.astype(jnp.float32), 4000.0)
    prio = jnp.where(occupied,
                     jnp.where(in_win, 1e6 + far, 1e3 + far),
                     0.0)                                    # (B, N, Bk)
    slot_order = jnp.argsort(prio, axis=-1)                  # (B, N, Bk)
    slot_order_s = bgather(slot_order, order)
    prio_s = bgather(prio, order)
    h_s = bgather(h, order)
    ok = (key_s < table_size) & (rank < bucket_cap)
    rank_c = jnp.clip(rank, 0, bucket_cap - 1)
    onehot_r = (slot_iota == rank_c[..., None])
    slot = jnp.sum(jnp.where(onehot_r, slot_order_s, 0), axis=-1)
    chosen_prio = jnp.sum(jnp.where(onehot_r, prio_s, 0.0), axis=-1)
    a_dest = jnp.where(ok, boff + h_s * bucket_cap + slot, flat_cap)

    pts_s = bgather(pts, order)
    int_s = bgather(inten, order)
    cell_s = bgather(cell, order)
    vox_s = bgather(vox, order)
    flat_pts = flat_pts.at[a_dest.reshape(-1)].set(
        pts_s.reshape(-1, 3), mode="drop")
    flat_int = flat_int.at[a_dest.reshape(-1)].set(
        int_s.reshape(-1), mode="drop")
    flat_cell = grid.cell.reshape(-1, 3).at[a_dest.reshape(-1)].set(
        cell_s.astype(jnp.int16).reshape(-1, 3), mode="drop")
    flat_vox = grid.vox.reshape(-1).at[a_dest.reshape(-1)].set(
        vox_s.reshape(-1), mode="drop")

    merged = jnp.sum(has_match, axis=1)
    appended = jnp.sum(ok & (key_s < table_size), axis=1)
    evicted = jnp.sum(ok & (chosen_prio >= 1e3), axis=1)
    dropped = jnp.sum(app, axis=1) - appended
    shape4 = (bsz, table_size, bucket_cap)
    new_grid = GridMap(
        pts=flat_pts.reshape(shape4 + (3,)),
        inten=flat_int.reshape(shape4),
        cell=flat_cell.reshape(shape4 + (3,)),
        vox=flat_vox.reshape(shape4))
    return new_grid, merged, appended, evicted, dropped


def extract(grid: GridMap):
    """Host-side (points, intensity) of all valid entries."""
    import numpy as np
    m = np.asarray(grid.cell[..., 0] != _EMPTY)
    return np.asarray(grid.pts)[m], np.asarray(grid.inten)[m]
