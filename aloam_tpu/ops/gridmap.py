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

Bucket overflow, evictions and capacity spills are surfaced as metrics.

**Memory layout (measured on this TPU, round 2).** Coordinate tables are
stored with the bucket and coordinate axes MERGED into one minor dimension
— ``pts: (H, 3*Bk)`` f32, ``cell: (H, 3*Bk)`` i16, packed bucket-PLANAR
[x0..x47 | y0..y47 | z0..z47] so ``reshape(..., 3, Bk)`` is a free view
and ALL compute runs on per-coordinate planes. A table shaped
``(H, Bk, 3)`` makes every bucket-row gather ~7x slower (150 vs
21 ns/row: the gather decomposes into minor-dim runs of 3), and ANY
materialized array with minor dim 3 lane-pads 3 -> 128 — a 42x blowup
that OOM'd at B=16 and silently taxes einsum outputs; planar packing
keeps minor dims wide everywhere, including inside Pallas kernels
(whose VMEM tiling has the same (8, 128) rule). (N, 3)-row scatters
measured 90 ns/update vs ~10 ns scalar updates into flat or (H, Bk)-form
operands.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = float("inf")
_P1, _P2, _P3 = 73856093, 19349663, 83492791  # spatial-hash primes
_EMPTY = 32767  # i16 sentinel cell coordinate


class GridMap(NamedTuple):
    """Two tables per class: positions apart from everything else.

    ``pts`` stays its own table because it feeds the hot row-gathers
    (cache build / knn) at the minimal 3*Bk row width. The three cold
    per-slot attributes — intensity, absolute cell coords, voxel id —
    live in ONE bucket-planar i32 ``aux`` table so insert_b touches them
    with a single row-gather and a single row-scatter: gather/scatter
    cost on this TPU is per ROW (~25/87 ns) regardless of width up to
    ~1 KB, so 4 tables cost 4x what 2 do (measured: insert scatter-back
    5.7 -> ~2.9 ms at B=16). ``inten``/``cell``/``vox`` remain available
    as computed views (XLA fuses the slice into the consumer)."""
    pts: jnp.ndarray    # (H, 3*Bk) f32 — bucket-planar xyz voxel centroids
    aux: jnp.ndarray    # (H, 5*Bk) i32 — planar [inten bits|cx|cy|cz|vox]

    @property
    def bucket_cap(self) -> int:
        return self.aux.shape[-1] // 5

    def _auxv(self) -> jnp.ndarray:
        a = self.aux
        return a.reshape(a.shape[:-1] + (5, a.shape[-1] // 5))

    @property
    def inten(self) -> jnp.ndarray:   # (..., Bk) f32 averaged intensity
        return jax.lax.bitcast_convert_type(self._auxv()[..., 0, :],
                                            jnp.float32)

    @property
    def cell(self) -> jnp.ndarray:    # (..., 3*Bk) i32 abs cell coords
        v = self._auxv()[..., 1:4, :]
        return v.reshape(v.shape[:-2] + (3 * v.shape[-1],))

    @property
    def vox(self) -> jnp.ndarray:     # (..., Bk) i32 hashed voxel id
        return self._auxv()[..., 4, :]


_FAR = 1e9  # empty-slot position sentinel: fails every distance gate

# aux-plane values of a cleared slot: inten 0.0 (bit pattern 0), cell
# coords at the _EMPTY sentinel, vox id 0
_AUX_CLEAR = (0, _EMPTY, _EMPTY, _EMPTY, 0)


def _pack_aux(inten: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
              cz: jnp.ndarray, vox: jnp.ndarray) -> jnp.ndarray:
    """(..., Bk) planes -> (..., 5*Bk) planar aux rows."""
    planes = jnp.stack([jax.lax.bitcast_convert_type(inten, jnp.int32),
                        cx, cy, cz, vox], axis=-2)
    return planes.reshape(planes.shape[:-2] + (5 * planes.shape[-1],))


def empty(table_size: int, bucket_cap: int) -> GridMap:
    # _hash masks with (table_size - 1): anything else would silently
    # produce out-of-range bucket ids (clamped gathers -> corrupted map)
    assert table_size & (table_size - 1) == 0, (
        f"table_size must be a power of two, got {table_size}")
    aux = jnp.tile(jnp.repeat(jnp.asarray(_AUX_CLEAR, jnp.int32),
                              bucket_cap), (table_size, 1))
    return GridMap(
        pts=jnp.full((table_size, 3 * bucket_cap), _FAR, jnp.float32),
        aux=aux)


def _viewp(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 3*Bk) bucket-planar -> (..., 3, Bk) view (row-major
    identity): [..., 0, :] = x-plane, etc."""
    return a.reshape(a.shape[:-1] + (3, a.shape[-1] // 3))


def n_valid(grid: GridMap) -> jnp.ndarray:
    return jnp.sum(_viewp(grid.cell)[..., 0, :] != _EMPTY)


def count_near(grid: GridMap, center: jnp.ndarray,
               half_cells: jnp.ndarray) -> jnp.ndarray:
    """Live entries within center ± half_cells (cell coords) — the analog of
    the reference's local 5×5×3-cube map-point count that gates the mapping
    solve (laserMapping.cpp:531-554). One masked pass over the i16 cell
    table (~a few MB), no gathers."""
    c = grid._auxv()[..., 1:4, :]                 # (H, 3, Bk)
    live = c[:, 0, :] != _EMPTY
    near = jnp.all(jnp.abs(c - center[None, :, None])
                   <= half_cells[None, :, None], axis=-2)
    return jnp.sum(live & near)


def count_near_b(grid: GridMap, center: jnp.ndarray,
                 half_cells: jnp.ndarray) -> jnp.ndarray:
    """Batched count_near: grid leaves (B, H, ·), center (B, 3) -> (B,)."""
    c = grid._auxv()[..., 1:4, :]                 # (B, H, 3, Bk)
    live = c[:, :, 0, :] != _EMPTY
    near = jnp.all(jnp.abs(c - center[:, None, :, None])
                   <= half_cells[None, None, :, None], axis=-2)
    return jnp.sum(live & near, axis=(1, 2))


def invalidate_outside(grid: GridMap, center: jnp.ndarray,
                       half_cells: jnp.ndarray):
    """Eagerly clear every live entry outside center ± half_cells — the
    reference's rolling-window discard (laserMapping.cpp:323-507 frees
    out-of-window cubes the moment the pose nears a boundary). Lazy
    eviction (insert_b's overflow priority) only reclaims these slots
    under bucket pressure, so a leave-and-return trajectory could
    re-associate against points the reference would have dropped.

    One masked compare over the i32 cell planes (aux rows 1:4) followed
    by a full rewrite of the 5·Bk aux + 3·Bk pts tables (no gathers).
    center (3,) pose cell coords (or (B, 3) with batched grid leaves);
    returns (grid, n_cleared)."""
    av = grid._auxv()                                # (..., H, 5, Bk)
    c = av[..., 1:4, :]                              # (..., H, 3, Bk)
    live = c[..., 0, :] != _EMPTY
    ctr = center[..., None, :, None]                 # (..., 1, 3, 1)
    out = live & jnp.any(jnp.abs(c - ctr)
                         > half_cells[None, :, None], axis=-2)
    kill = jnp.repeat(out[..., None, :], 3, axis=-2).reshape(grid.pts.shape)
    clear = jnp.asarray(_AUX_CLEAR, jnp.int32)[:, None]
    new_aux = jnp.where(out[..., None, :], clear, av).reshape(grid.aux.shape)
    n_axes = tuple(range(out.ndim - 2, out.ndim))
    return GridMap(pts=jnp.where(kill, _FAR, grid.pts),
                   aux=new_aux), jnp.sum(out, axis=n_axes)


def evict_and_count(grid: GridMap, center: jnp.ndarray,
                    window_half: jnp.ndarray, local_half: jnp.ndarray,
                    evict: bool = True):
    """Fused rolling-window discard + local-map census: ONE pass over the
    i32 cell planes (aux rows 1:4) computes both ``invalidate_outside``'s
    out-of-window clear and ``count_near``'s in-local live count (each
    alone reads the full multi-MB table; the mapping step needs both
    back-to-back), then rewrites the 5·Bk aux + 3·Bk pts tables.
    The census is taken on the POST-clear mask (near & ~out), matching
    census-after-clear semantics even when a shrunken config's local
    5×5×3-cube box pokes outside the rolling window box (normally local
    is strictly inside the window and ~out is a no-op). With
    ``evict=False`` the table passes through unchanged (lazy mode) and
    the census deliberately counts any stale in-window entries.

    The clear's full-table REWRITE (~35 MB/stream of pts+aux) runs under
    a ``lax.cond`` on "is anything actually out?": points only leave the
    ±525 m window when the pose has travelled that far past them, so on
    the vast majority of frames ``out`` is all-false and the rewrite is
    skipped — the census read pass (which also yields n_cleared) always
    runs, so metrics and semantics are unchanged.

    center (3,) or (B, 3) pose cell coords matching the grid leaves.
    Returns (grid, n_cleared, n_near)."""
    av = grid._auxv()                                # (..., H, 5, Bk)
    c = av[..., 1:4, :]                              # (..., H, 3, Bk)
    live = c[..., 0, :] != _EMPTY
    d = jnp.abs(c - center[..., None, :, None])
    near = live & jnp.all(d <= local_half[None, :, None], axis=-2)
    n_axes = tuple(range(near.ndim - 2, near.ndim))
    if not evict:
        n_near = jnp.sum(near, axis=n_axes)
        zeros = jnp.zeros_like(n_near)
        return grid, zeros, n_near
    out = live & jnp.any(d > window_half[None, :, None], axis=-2)
    n_near = jnp.sum(near & ~out, axis=n_axes)
    n_out = jnp.sum(out, axis=n_axes)

    def do_clear(operands):
        g, out_m = operands
        kill = jnp.repeat(out_m[..., None, :], 3,
                          axis=-2).reshape(g.pts.shape)
        clear = jnp.asarray(_AUX_CLEAR, jnp.int32)[:, None]
        new_aux = jnp.where(out_m[..., None, :], clear,
                            g._auxv()).reshape(g.aux.shape)
        return GridMap(pts=jnp.where(kill, _FAR, g.pts), aux=new_aux)

    import os as _os
    if _os.environ.get("ALOAM_COND_EVICT", "1") != "0":
        grid = jax.lax.cond(jnp.sum(n_out) > 0, do_clear,
                            lambda operands: operands[0], (grid, out))
    else:
        # A/B: unconditional fused where-rewrite (pre-round-5 form). The
        # cond skips the rewrite on no-evict frames but costs XLA's
        # conditional buffer materialization (round-5 copy audit: the
        # pass-through branch COPIES the full tables both ways).
        grid = do_clear((grid, out))
    return grid, n_out, n_near


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
    the (Q, 8, Bk, 3) candidate gather is the biggest per-frame
    intermediate, which matters when batching many streams into one chip's
    HBM."""
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
    bucket_cap = grid.bucket_cap
    qcells = _cells_of(query - radius, cell_size)
    ncells = qcells[:, None, :] + _offsets8()[None]          # (Q, 8, 3)
    hh = _hash(ncells, table_size)
    cand = _viewp(grid.pts[hh])                              # (Q, 8, 3, Bk)

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

    q_n = query.shape[0]
    n_cand = 8 * bucket_cap
    cx = cand[:, :, 0, :].reshape(q_n, n_cand)
    cy = cand[:, :, 1, :].reshape(q_n, n_cand)
    cz = cand[:, :, 2, :].reshape(q_n, n_cand)
    d2 = ((cx - query[:, 0:1]) ** 2 + (cy - query[:, 1:2]) ** 2
          + (cz - query[:, 2:3]) ** 2)
    d2 = jnp.where(jnp.repeat(dup, bucket_cap, axis=1), _INF, d2)

    neg_top, pos = jax.lax.top_k(-d2, k)
    nbrs = jnp.stack([jnp.take_along_axis(c, pos, axis=1)
                      for c in (cx, cy, cz)], axis=-1)
    return -neg_top, nbrs


# Tile height of the fused association kernel (ops/pallas_assoc.py).
# ASSOC_PAD rows are appended to cand_flat so every tile's contiguous
# cell window [align8(cid0), align8(cid0) + TQ + 8) stays in-bounds
# (spilled queries sit at slot cell_cap, so the last window reaches
# cell_cap + TQ + 7; the +8 covers the kernel's align8 window start).
ASSOC_TQ = int(_os.environ.get("ALOAM_ASSOC_TQ", "256"))
if ASSOC_TQ <= 0 or ASSOC_TQ % 8:
    raise ValueError(
        f"ALOAM_ASSOC_TQ={ASSOC_TQ}: must be a positive multiple of 8 "
        "(the fused association kernel's align8 cell-window contract); "
        "it must also divide the per-stream query count")
ASSOC_PAD = ASSOC_TQ + 8

# Cell-window span cap of the fused association kernel (0 = full TQ
# window). A TQ-query tile references at most TQ distinct cells, but the
# MEASURED span is far smaller (queries share cells ~8:1 on SLAM stacks;
# tools/assoc_span.py prints the histogram), so a CSPAN < TQ window cuts
# both the per-tile DMA and the one-hot select matmul by TQ/CSPAN.
# Queries beyond the window get no factors — counted in the overflow
# metric (mapping._assoc_out8_b), never silent.
ASSOC_CSPAN = int(_os.environ.get("ALOAM_ASSOC_CSPAN", "0"))
if ASSOC_CSPAN and (ASSOC_CSPAN % 8 or not 0 < ASSOC_CSPAN <= ASSOC_TQ):
    raise ValueError(
        f"ALOAM_ASSOC_CSPAN={ASSOC_CSPAN}: must be a multiple of 8 in "
        f"(0, ASSOC_TQ={ASSOC_TQ}]")


class KnnCache(NamedTuple):
    """Per-cell candidate blocks + per-query cell slots (see knn_cache_b).

    Reusable across nearby query poses: the blocks cover each query's
    full 2x2x2 gate neighborhood as of the CACHED positions; re-querying
    after a sub-cell pose refinement (the mapping round-2 case,
    laserMapping.cpp:562-727 re-searches ~identically) sees the same
    candidate set except for the few queries whose shifted base cell
    crossed a 2 m boundary."""
    cand_flat: jnp.ndarray   # (B, C + ASSOC_PAD, 8*3*Bk) candidate xyz
    cid: jnp.ndarray         # (B, Q) per-query cell slot (== C -> spilled)
    # per-SORTED-query cell slot: non-decreasing along Q, the contiguity
    # the fused association kernel's cell-window DMA relies on
    cid_sorted: jnp.ndarray  # (B, Q)
    n_spilled: jnp.ndarray   # scalar
    cell_cap: int


def knn_cache_b(grid: GridMap, query: jnp.ndarray, cell_size: float,
                radius: float = 1.0, cell_cap: int = 4096,
                payloads: tuple = ()):
    """Build the shared-cell candidate structure for knn_from_cache_b /
    the fused association kernel.

    payloads: optional (B, Q) arrays carried through the cell sort
    (stack coordinates, intensity, masks, ...). Returns the cache alone
    when empty, else ``(cache, sorted_payloads)`` — callers that keep all
    downstream work in sorted order (mapping's batched path) avoid any
    per-query unsort gathers: the LM solver and every metric reduce over
    factors order-independently."""
    from aloam_tpu.utils.batch import bgather
    assert cell_size >= 2 * radius, (cell_size, radius)
    bsz, q_n = query.shape[:2]
    table_size = grid.pts.shape[1]
    bucket_cap = grid.bucket_cap
    n_cand = 8 * bucket_cap

    # --- group queries by base cell (one payload-carrying sort) -----------
    qcell = _cells_of(query - radius, cell_size)            # (B, Q, 3)
    rel = jnp.clip(qcell - jnp.min(qcell, axis=1, keepdims=True), 0, 1023)
    key = (rel[..., 0] << 20) | (rel[..., 1] << 10) | rel[..., 2]
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (bsz, q_n), 1)
    key_s, cx_s, cy_s, cz_s, order, *pay_s = jax.lax.sort(
        (key, qcell[..., 0], qcell[..., 1], qcell[..., 2], iota_q)
        + tuple(payloads),
        dimension=1, num_keys=1, is_stable=True)
    seg = jnp.concatenate(
        [jnp.ones((bsz, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=1)
    cid_s = jnp.cumsum(seg.astype(jnp.int32), axis=1) - 1   # (B, Q)
    n_spilled = jnp.sum(cid_s >= cell_cap)
    cid_sc = jnp.minimum(cid_s, cell_cap)                   # spill slot

    # cell coords per slot (one flat scatter; all writes per slot agree);
    # ASSOC_PAD zero pad rows keep the fused kernel's cell-window DMA
    # in-bounds — they hash to cell (0,0,0)'s real bucket block, and only
    # poisoned (spilled) queries can map onto them
    coff = (jnp.arange(bsz, dtype=jnp.int32) * (cell_cap + 1))[:, None]
    qcell_s = jnp.stack([cx_s, cy_s, cz_s], axis=-1)
    slot_cell = jnp.zeros((bsz * (cell_cap + 1), 3), jnp.int32).at[
        (cid_sc + coff).reshape(-1)].set(qcell_s.reshape(-1, 3)).reshape(
            bsz, cell_cap + 1, 3)[:, :cell_cap]
    slot_cell = jnp.concatenate(
        [slot_cell, jnp.zeros((bsz, ASSOC_PAD, 3), jnp.int32)], axis=1)

    # --- per-cell candidate blocks (the deduped gather) -------------------
    ncells = slot_cell[:, :, None, :] + _offsets8()[None, None]
    hh = _hash(ncells, table_size)                          # (B, C+TQ, 8)
    cand = bgather(grid.pts, hh)                            # (B,C+TQ,8,3Bk)
    same = hh[..., :, None] == hh[..., None, :]
    tri = jnp.tril(jnp.ones((8, 8), bool), -1)[None, None]
    dup = jnp.any(same & tri, axis=-1)                      # (B, C+TQ, 8)
    # poison duplicate buckets via the _FAR sentinel (fails every gate)
    cand = jnp.where(dup[..., None], _FAR, cand)
    # candidate rows stay in the GATHER-NATIVE block-planar layout —
    # 8 sub-blocks of [x(Bk) | y(Bk) | z(Bk)] — so the build is just
    # gather + poison; the distance pass / Pallas kernel do the per-
    # sub-block coordinate slicing (a full-row [x|y|z] relayout measured
    # ~300 MB of pure transpose traffic per frame at B=16)
    cand_flat = cand.reshape(bsz, cell_cap + ASSOC_PAD, 3 * n_cand)

    # per-query cell slot, back in input order (flat scatter)
    qoff = (jnp.arange(bsz, dtype=jnp.int32) * q_n)[:, None]
    cid = jnp.zeros((bsz * q_n,), jnp.int32).at[
        (order + qoff).reshape(-1)].set(cid_sc.reshape(-1)).reshape(
            bsz, q_n)
    cache = KnnCache(cand_flat=cand_flat, cid=cid, cid_sorted=cid_sc,
                     n_spilled=n_spilled, cell_cap=cell_cap)
    if payloads:
        return cache, tuple(pay_s)
    return cache


def knn_from_cache_b(cache: KnnCache, query: jnp.ndarray, k: int,
                     query_chunk: int = 0):
    """Gated k-NN of (possibly pose-refined) queries against a KnnCache.
    Returns (d2 (B,Q,k), nbrs (B,Q,k,3), n_spilled)."""
    from aloam_tpu.utils.batch import bgather
    bsz, q_n = query.shape[:2]
    cand_flat, cid, cell_cap = cache.cand_flat, cache.cid, cache.cell_cap
    n_cand = cand_flat.shape[-1] // 3

    # --- chunked dense distance + k-pass selection ------------------------
    from aloam_tpu.ops.pallas_gate import use_pallas as _up
    use_pallas = _up("knn")

    def chunk_knn(q_chunk, cid_chunk):
        # one wide gather per query: its cell's full candidate block
        crow = bgather(cand_flat, jnp.minimum(cid_chunk, cell_cap - 1))
        bs, qc = q_chunk.shape[:2]
        poison = (cid_chunk >= cell_cap)
        if use_pallas:
            # fused VMEM-resident distance + k-pass select: candidate
            # rows are read from HBM exactly once (ops/pallas_knn.py)
            from aloam_tpu.ops.pallas_knn import knn_select
            q4 = jnp.concatenate(
                [q_chunk, poison[..., None].astype(jnp.float32)], axis=-1)
            d2f, nbf = knn_select(crow.reshape(bs * qc, 3 * n_cand),
                                  q4.reshape(bs * qc, 4), k,
                                  bw=n_cand // 8)
            return (d2f.reshape(bs, qc, k), nbf.reshape(bs, qc, k, 3))
        # block-planar rows: 8 sub-blocks of [x(Bk) | y(Bk) | z(Bk)]
        crow = crow.reshape(q_chunk.shape[:2] + (8, 3, n_cand // 8))
        cx = crow[..., 0, :].reshape(q_chunk.shape[:2] + (n_cand,))
        cy = crow[..., 1, :].reshape(q_chunk.shape[:2] + (n_cand,))
        cz = crow[..., 2, :].reshape(q_chunk.shape[:2] + (n_cand,))
        d2 = ((cx - q_chunk[..., 0:1]) ** 2
              + (cy - q_chunk[..., 1:2]) ** 2
              + (cz - q_chunk[..., 2:3]) ** 2)              # (B, qc, n)
        d2 = jnp.where(poison[..., None], _INF, d2)
        iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        ds, nb = [], []
        cur = d2
        for _ in range(k):
            am = jnp.argmin(cur, axis=-1)                   # (B, qc)
            ds.append(jnp.min(cur, axis=-1))
            sel = iota == am[..., None]
            nb.append(jnp.stack(
                [jnp.sum(jnp.where(sel, c, 0.0), axis=2)
                 for c in (cx, cy, cz)], axis=-1))
            cur = jnp.where(sel, _INF, cur)
        return jnp.stack(ds, -1), jnp.stack(nb, -2)

    qc = query_chunk if query_chunk else min(q_n, 2048)
    if q_n > qc:
        pad = (-q_n) % qc
        qp = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
        cp = jnp.pad(cid, ((0, 0), (0, pad)))
        qs = jnp.moveaxis(qp.reshape(bsz, -1, qc, 3), 1, 0)
        cs = jnp.moveaxis(cp.reshape(bsz, -1, qc), 1, 0)
        d2, nbrs = jax.lax.map(lambda a: chunk_knn(*a), (qs, cs))
        d2 = jnp.moveaxis(d2, 0, 1).reshape(bsz, -1, k)[:, :q_n]
        nbrs = jnp.moveaxis(nbrs, 0, 1).reshape(bsz, -1, k, 3)[:, :q_n]
    else:
        d2, nbrs = chunk_knn(query, cid)
    return d2, nbrs, cache.n_spilled


def knn_b(grid: GridMap, query: jnp.ndarray, k: int, cell_size: float,
          radius: float = 1.0, query_chunk: int = 0, cell_cap: int = 4096):
    """Batched knn() via shared-cell candidate dedup.

    grid leaves carry a leading stream axis (B, H, ·); query is (B, Q, 3).
    Returns (d2 (B,Q,k), nbrs (B,Q,k,3), n_spilled).

    All queries whose shifted base cell floor((q-radius)/cell) coincides
    see the SAME 2x2x2 bucket block, so the 8-bucket rows are gathered once
    per *occupied cell* (~Q/8 of them for SLAM stacks), not once per query
    — the per-query form measured 3.1M gather rows at B=16; this form
    gathers 8*cell_cap rows plus one *wide* row per query. Selection is k
    passes of min/argmin + masked-sum coordinate extraction (measured
    faster than lax.top_k, and it skips the final 12-byte-row gather).
    Queries beyond `cell_cap` distinct cells are spilled: their d2 comes
    back +inf (factors gated out) and they are counted in n_spilled —
    never silent.
    """
    cache = knn_cache_b(grid, query, cell_size, radius, cell_cap)
    return knn_from_cache_b(cache, query, k, query_chunk)


def _merge_dense_xla(pts_tile, s_int, cell_tile, vox_tile,
                     ppx, ppy, ppz, ppi, pvox, cnt, center, window,
                     cell_size: float, leaf: float):
    """Dense one-hot merge/append over gathered bucket tiles — the XLA
    implementation of insert_b's per-bucket semantics (see insert_b's
    docstring; the fused TPU twin is ops/pallas_insert.merge_tiles, pinned
    to this by an interpret-mode equivalence test).

    pts_tile (B, C, 3Bk) planar [x|y|z]; cell_tile (B, C, 3Bk) i32;
    s_int / vox_tile (B, C, Bk); pp* / pvox (B, C, P); cnt (B, C);
    center (B, 3); window (3,). Returns the updated planes + per-bucket
    (merged, appended, evicted) counts (B, C)."""
    bsz, cap_c, cap_p = ppx.shape
    bucket_cap = vox_tile.shape[-1]
    s_p = _viewp(pts_tile)                                  # (B, C, 3, Bk)
    s_px, s_py, s_pz = s_p[..., 0, :], s_p[..., 1, :], s_p[..., 2, :]
    s_c = _viewp(cell_tile)
    s_cx, s_cy, s_cz = s_c[..., 0, :], s_c[..., 1, :], s_c[..., 2, :]
    s_vox = vox_tile
    occ = s_cx != _EMPTY

    # --- dense merge (all algebra per coordinate plane: a materialized
    # minor-dim-3 array lane-pads 42x on this TPU) -------------------------
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (bsz, cap_c, cap_p), 2)
    pvalid = iota_p < jnp.minimum(cnt, cap_p)[..., None]    # (B, C, P)
    inv_cell = 1.0 / cell_size
    # matching on the hashed voxel id alone: equal vox ids imply the same
    # leaf voxel (⊂ same cell) up to the 32-bit hash collisions the
    # _vox_id docstring already accepts — the former cell-coordinate
    # comparisons only re-guarded those and cost 4 more (B, C, P, Bk)
    # passes
    match = (pvalid[..., None] & occ[:, :, None, :]
             & (pvox[..., None] == s_vox[:, :, None, :]))   # (B, C, P, Bk)
    has_match = jnp.any(match, axis=-1)                     # (B, C, P)
    m_any = jnp.any(match, axis=2)                          # (B, C, Bk)
    # voxel-downsampled stacks give ≤1 match per slot, but raw inputs can
    # produce several (shared voxel / vox-hash collision): keep the
    # highest-index match — scatter updates apply in order, so the old
    # per-point form's last write won, and the stable bucket sort
    # preserves original order
    best = jnp.max(jnp.where(match, iota_p[..., None], -1), axis=2)
    m_sel = match & (iota_p[..., None] == best[:, :, None, :])
    mf = m_sel.astype(jnp.float32)

    def red_f(vals_p):                                      # (B,C,P)->(B,C,Bk)
        return jnp.einsum("bcpk,bcp->bck", mf, vals_p)

    s_px = jnp.where(m_any, 0.5 * (s_px + red_f(ppx)), s_px)
    s_py = jnp.where(m_any, 0.5 * (s_py + red_f(ppy)), s_py)
    s_pz = jnp.where(m_any, 0.5 * (s_pz + red_f(ppz)), s_pz)
    s_int = jnp.where(m_any, 0.5 * (s_int + red_f(ppi)), s_int)

    # --- dense appends (slots by eviction priority) -----------------------
    app = pvalid & ~has_match                               # (B, C, P)
    arank = jnp.cumsum(app.astype(jnp.int32), axis=2) - 1
    adx = jnp.abs(s_cx - center[:, None, 0, None])
    ady = jnp.abs(s_cy - center[:, None, 1, None])
    adz = jnp.abs(s_cz - center[:, None, 2, None])
    dist = jnp.maximum(adx, jnp.maximum(ady, adz))
    in_win = ((adx <= window[0]) & (ady <= window[1]) & (adz <= window[2]))
    far = 4000.0 - jnp.minimum(dist.astype(jnp.float32), 4000.0)
    prio = jnp.where(occ, jnp.where(in_win, 1e6 + far, 1e3 + far), 0.0)
    slot_order = jnp.argsort(prio, axis=-1)                 # (B, C, Bk)
    prio_sorted = jnp.sort(prio, axis=-1)

    can_app = app & (arank < bucket_cap)
    iota_k = jax.lax.broadcasted_iota(
        jnp.int32, (bsz, cap_c, cap_p, bucket_cap), 3)
    oh_rank = can_app[..., None] & (arank[..., None] == iota_k)
    ohf = oh_rank.astype(jnp.float32)
    slot_p = jnp.einsum("bcpk,bck->bcp", ohf,
                        slot_order.astype(jnp.float32)).astype(jnp.int32)
    chosen_prio = jnp.einsum("bcpk,bck->bcp", ohf, prio_sorted)

    # one-hot write of appended points into their chosen slots
    oh_slot = can_app[..., None] & (slot_p[..., None] == iota_k)
    ohsf = oh_slot.astype(jnp.float32)
    wr_any = jnp.any(oh_slot, axis=2)                       # (B, C, Bk)

    def wr_f(vals_p):
        return jnp.einsum("bcpk,bcp->bck", ohsf, vals_p)

    s_px = jnp.where(wr_any, wr_f(ppx), s_px)
    s_py = jnp.where(wr_any, wr_f(ppy), s_py)
    s_pz = jnp.where(wr_any, wr_f(ppz), s_pz)
    s_int = jnp.where(wr_any, wr_f(ppi), s_int)
    # cell coords / vox id of an appended slot are pure functions of the
    # written (exactly copied) point coordinates — recompute them
    # elementwise instead of four more (B, C, P, Bk) one-hot reductions.
    # Merged slots keep their cell/vox: the midpoint of two points of one
    # voxel stays inside that (convex) voxel.
    a_cx = jnp.floor(s_px * inv_cell).astype(jnp.int32)
    a_cy = jnp.floor(s_py * inv_cell).astype(jnp.int32)
    a_cz = jnp.floor(s_pz * inv_cell).astype(jnp.int32)
    inv_leaf = 1.0 / leaf
    a_vox = ((jnp.floor(s_px * inv_leaf).astype(jnp.int32) * _P1)
             ^ (jnp.floor(s_py * inv_leaf).astype(jnp.int32) * _P2)
             ^ (jnp.floor(s_pz * inv_leaf).astype(jnp.int32) * _P3))
    s_cx = jnp.where(wr_any, a_cx, s_cx)
    s_cy = jnp.where(wr_any, a_cy, s_cy)
    s_cz = jnp.where(wr_any, a_cz, s_cz)
    s_vox = jnp.where(wr_any, a_vox, s_vox)

    merged_pb = jnp.sum(has_match & pvalid, axis=2)
    appended_pb = jnp.sum(can_app, axis=2)
    evicted_pb = jnp.sum(can_app & (chosen_prio >= 1e3), axis=2)
    return (s_px, s_py, s_pz, s_int, s_cx, s_cy, s_cz, s_vox,
            merged_pb, appended_pb, evicted_pb)


def insert_b(grid: GridMap, pts: jnp.ndarray, inten: jnp.ndarray,
             mask: jnp.ndarray, leaf: float, cell_size: float,
             center: jnp.ndarray, window: jnp.ndarray,
             point_cap: int = 16, touched_cap: int = 4096,
             force_kernel_interpret: bool = False):
    """Batched insert of one frame's voxel-downsampled stack per stream.

    grid leaves (B, H, ·); pts (B, N, 3); center (B, 3) pose cell coords;
    window (3,) half-extent in cells — entries outside center±window are
    evictable first (the rolling-window discard, laserMapping.cpp:345-346).

    Bucket-dedup dense design: points are sorted by bucket hash, every
    *touched* bucket's tile is gathered ONCE, all its new points (≤
    point_cap, voxel-downsample-bounded per cell) are merged/appended
    against the 48 slots with dense one-hot algebra, and the finished tile
    rows are scattered back — ~8x fewer gather/scatter rows than the
    per-point form, and every row is wide (the layout rule in the module
    docstring). Matching = same cell AND same voxel id; merge = midpoint
    (iterated centroid). Appends fill slots in eviction-priority order:
    empty < out-of-window (farthest first) < in-window (farthest first).

    Returns (grid, merged (B,), appended (B,), evicted (B,), dropped (B,));
    dropped counts every valid input point that neither merged nor
    appended (bucket-slot pressure, point_cap or touched_cap spills).
    """
    bsz = mask.shape[0]
    table_size = grid.aux.shape[1]

    cell = _cells_of(pts, cell_size)                        # (B, N, 3)
    vox = _vox_id(pts, leaf)
    h = _hash(cell, table_size)
    key = jnp.where(mask, h, table_size)

    # one payload-carrying sort (no argsort + permutation gathers)
    key_s, px_s, py_s, pz_s, pi_s, vox_s = jax.lax.sort(
        (key, pts[..., 0], pts[..., 1], pts[..., 2], inten, vox),
        dimension=1, num_keys=1, is_stable=True)
    return _insert_sorted(grid, key_s, px_s, py_s, pz_s, pi_s, vox_s,
                          jnp.sum(mask, axis=1), leaf, cell_size, center,
                          window, point_cap, touched_cap,
                          force_kernel_interpret)


def _insert_sorted(grid: GridMap, key_s, px_s, py_s, pz_s, pi_s, vox_s,
                   total_valid, leaf: float, cell_size: float,
                   center: jnp.ndarray, window: jnp.ndarray,
                   point_cap: int, touched_cap: int,
                   force_kernel_interpret: bool = False):
    """insert_b's tail after the bucket sort: inputs are the sorted key
    column (invalid rows at the ``table_size`` sentinel) plus the sorted
    payload planes. Shared by insert_b and insert_vds_b (whose bucket
    sort doubles as the voxel-downsample compaction)."""
    from aloam_tpu.utils.batch import bgather
    bsz, n = key_s.shape
    table_size = grid.aux.shape[1]
    bucket_cap = grid.bucket_cap
    cap_c, cap_p = touched_cap, point_cap
    valid_s = key_s < table_size
    pay_s = jnp.stack([px_s, py_s, pz_s, pi_s], axis=-1)    # (B, N, 4)

    seg = valid_s & jnp.concatenate(
        [jnp.ones((bsz, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=1)
    cid_s = jnp.cumsum(seg.astype(jnp.int32), axis=1) - 1   # (B, N)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (bsz, n), 1)
    head = jax.lax.cummax(jnp.where(seg, iota_n, -1), axis=1)
    rank = iota_n - head                                    # (B, N)
    keep = valid_s & (cid_s >= 0) & (cid_s < cap_c) & (rank < cap_p)
    cid_c = jnp.where(keep, cid_s, cap_c)

    # --- dense per-bucket point lists (flat scalar scatters) --------------
    coff = (jnp.arange(bsz, dtype=jnp.int32) * (cap_c + 1))[:, None]
    brow = cid_c + coff                                     # (B, N)
    flat_np = bsz * (cap_c + 1) * cap_p
    # clamp rank inside the position formula: an unclamped dropped row's
    # rank (up to N) would index into ANOTHER stream's bucket region
    ppos = jnp.where(keep, brow * cap_p + jnp.minimum(rank, cap_p - 1),
                     flat_np).reshape(-1)

    def scat_f32(vals):
        return jnp.zeros((flat_np,), jnp.float32).at[ppos].set(
            vals.reshape(-1), mode="drop").reshape(
                bsz, cap_c + 1, cap_p)[:, :cap_c]

    ppx = scat_f32(jnp.where(keep, pay_s[..., 0], 0.0))
    ppy = scat_f32(jnp.where(keep, pay_s[..., 1], 0.0))
    ppz = scat_f32(jnp.where(keep, pay_s[..., 2], 0.0))
    ppi = scat_f32(jnp.where(keep, pay_s[..., 3], 0.0))
    pvox = jnp.zeros((flat_np,), jnp.int32).at[ppos].set(
        vox_s.reshape(-1), mode="drop").reshape(
            bsz, cap_c + 1, cap_p)[:, :cap_c]
    cnt = jnp.zeros((bsz * (cap_c + 1),), jnp.int32).at[brow.reshape(-1)].add(
        jnp.where(keep, 1, 0).reshape(-1), mode="drop").reshape(
            bsz, cap_c + 1)[:, :cap_c]
    slot_h = jnp.zeros((bsz * (cap_c + 1),), jnp.int32).at[
        brow.reshape(-1)].set(key_s.reshape(-1), mode="drop").reshape(
            bsz, cap_c + 1)[:, :cap_c]
    used = cnt > 0                                          # (B, C)

    # --- gather touched-bucket tiles (coordinate planes) ------------------
    # exactly TWO row-gathers (pts + aux): gather cost is per row, not
    # per byte, so the fused aux table reads inten/cell/vox in one pass
    pts_tile = bgather(grid.pts, slot_h)                    # (B, C, 3Bk)
    aux_tile = bgather(grid.aux, slot_h)                    # (B, C, 5Bk)
    av = aux_tile.reshape(bsz, cap_c, 5, bucket_cap)
    s_int = jax.lax.bitcast_convert_type(av[:, :, 0], jnp.float32)
    cell_tile = av[:, :, 1:4].reshape(bsz, cap_c, 3 * bucket_cap)
    vox_tile = av[:, :, 4]                                  # (B, C, Bk)

    # --- dense merge + eviction-priority appends ---------------------------
    # one shared contract, two implementations: the fused Pallas kernel on
    # TPU (ops/pallas_insert.py — no (B,C,P,Bk) intermediates at all) and
    # the one-hot einsum form elsewhere; interpret-mode tests pin them
    # together bit-for-bit
    from aloam_tpu.ops.pallas_gate import use_pallas
    if use_pallas("insert") or force_kernel_interpret:
        # force_kernel_interpret: tests run the kernel branch's full
        # plumbing on CPU via the interpret-mode kernel
        from aloam_tpu.ops.pallas_insert import merge_tiles
        import functools as _ft
        merge_fn = _ft.partial(merge_tiles,
                               interpret=force_kernel_interpret)
    else:
        merge_fn = _merge_dense_xla
    (s_px, s_py, s_pz, s_int, s_cx, s_cy, s_cz, s_vox,
     merged_pb, appended_pb, evicted_pb) = merge_fn(
        pts_tile, s_int, cell_tile, vox_tile,
        ppx, ppy, ppz, ppi, pvox, cnt, center, window, cell_size, leaf)

    # --- scatter finished tiles back (wide rows, used buckets only) -------
    # exactly TWO row-scatters (pts + packed aux) — see GridMap docstring
    hoff = (jnp.arange(bsz, dtype=jnp.int32) * table_size)[:, None]
    dest = jnp.where(used, slot_h + hoff, bsz * table_size)  # (B, C)
    flat = dest.reshape(-1)
    pts_tile = jnp.stack([s_px, s_py, s_pz], axis=2)        # (B, C, 3, Bk)
    aux_tile = _pack_aux(s_int, s_cx, s_cy, s_cz, s_vox)    # (B, C, 5Bk)
    new_pts = grid.pts.reshape(-1, 3 * bucket_cap).at[flat].set(
        pts_tile.reshape(bsz * cap_c, 3 * bucket_cap), mode="drop")
    new_aux = grid.aux.reshape(-1, 5 * bucket_cap).at[flat].set(
        aux_tile.reshape(bsz * cap_c, 5 * bucket_cap), mode="drop")

    merged = jnp.sum(merged_pb, axis=1)
    appended = jnp.sum(appended_pb, axis=1)
    evicted = jnp.sum(evicted_pb, axis=1)
    dropped = total_valid - merged - appended

    new_grid = GridMap(
        pts=new_pts.reshape(bsz, table_size, 3 * bucket_cap),
        aux=new_aux.reshape(bsz, table_size, 5 * bucket_cap))
    return new_grid, merged, appended, evicted, dropped


def insert_vds_b(grid: GridMap, pts: jnp.ndarray, inten: jnp.ndarray,
                 mask: jnp.ndarray, leaf: float, cell_size: float,
                 center: jnp.ndarray, window: jnp.ndarray,
                 point_cap: int = 16, touched_cap: int = 4096,
                 force_kernel_interpret: bool = False):
    """Fused map-frame voxel downsample + insert — semantically identical
    to ``voxel_downsample_masked_b(vals, mask, leaf, out_cap=N)`` followed
    by ``insert_b`` (pinned by a bit-exactness test), one sort cheaper.

    The two-call form runs THREE payload sorts per class: the voxel sort,
    the downsample's tail-compaction sort, and insert_b's bucket sort.
    Here the bucket sort IS the compaction: each voxel's mean is computed
    at its segment-tail slot (frontend.voxel.voxel_segment_tails), keyed
    by the bucket hash of the mean (non-tails ride the ``table_size``
    sentinel like masked-out points), and one stable sort delivers the
    bucket grouping directly. Order within a bucket is unchanged — the
    stable compaction kept voxels in (k, ji) order and the stable bucket
    sort preserved it, exactly as this fused sort does. The old path's
    intermediate ``out_cap`` compaction never drops when out_cap == N
    (a downsample cannot grow a cloud), so no capacity semantics change;
    the voxel-id payload channel is recomputed elementwise from the
    sorted means instead of riding the sort.

    pts (B, N, 3) map-frame points; inten (B, N); mask (B, N).
    Returns (grid, merged, appended, evicted, dropped) with dropped
    counted against the number of occupied voxels (the old path's
    total_valid after its downsample)."""
    bsz, n = mask.shape
    table_size = grid.aux.shape[1]
    from aloam_tpu.frontend.voxel import voxel_segment_tails
    vals = jnp.concatenate([pts, inten[..., None]], axis=-1)
    sums, cnts, is_tail = voxel_segment_tails(vals, mask, leaf,
                                              force_kernel_interpret)
    den = jnp.maximum(cnts, 1.0)   # divide (not *reciprocal): bit-parity
    mx, my, mz, mi = (s / den for s in sums)                # (B, N) planes

    # bucket hash of the voxel MEAN — per-plane forms of _cells_of/_hash
    # (floor(x / cell_size): keep the division, floor(x * (1/cs)) can
    # round differently at cell boundaries)
    hx = jnp.floor(mx / cell_size).astype(jnp.int32)
    hy = jnp.floor(my / cell_size).astype(jnp.int32)
    hz = jnp.floor(mz / cell_size).astype(jnp.int32)
    h = jnp.bitwise_and((hx * _P1) ^ (hy * _P2) ^ (hz * _P3),
                        table_size - 1)
    key = jnp.where(is_tail, h, table_size)

    key_s, px_s, py_s, pz_s, pi_s = jax.lax.sort(
        (key, mx, my, mz, mi), dimension=1, num_keys=1, is_stable=True)
    # per-plane _vox_id of the sorted means (elementwise, not a payload)
    vox_s = ((jnp.floor(px_s / leaf).astype(jnp.int32) * _P1)
             ^ (jnp.floor(py_s / leaf).astype(jnp.int32) * _P2)
             ^ (jnp.floor(pz_s / leaf).astype(jnp.int32) * _P3))
    return _insert_sorted(grid, key_s, px_s, py_s, pz_s, pi_s, vox_s,
                          jnp.sum(is_tail, axis=1), leaf, cell_size,
                          center, window, point_cap, touched_cap,
                          force_kernel_interpret)


def insert(grid: GridMap, pts: jnp.ndarray, inten: jnp.ndarray,
           mask: jnp.ndarray, leaf: float, cell_size: float,
           center: jnp.ndarray, window: jnp.ndarray,
           point_cap: int | None = None, touched_cap: int | None = None):
    """Single-stream insert — delegates to the batched kernel (B=1), so
    there is exactly one insert semantics to test and maintain. Default
    dense-list caps are generous (point_cap covers a full bucket: anything
    beyond bucket_cap appends would be slot-dropped regardless); callers
    that need single/batched drop-count parity (mapping) pass explicit
    caps to both paths."""
    g1 = jax.tree.map(lambda x: x[None], grid)
    n = pts.shape[0]
    if point_cap is None:
        point_cap = max(grid.bucket_cap, 32)
    if touched_cap is None:
        touched_cap = min(n, 8192)
    out, merged, appended, evicted, dropped = insert_b(
        g1, pts[None], inten[None], mask[None], leaf, cell_size,
        center[None], window, point_cap=point_cap,
        touched_cap=touched_cap)
    return (jax.tree.map(lambda x: x[0], out), merged[0], appended[0],
            evicted[0], dropped[0])


def extract(grid: GridMap):
    """Host-side (points, intensity) of all valid entries."""
    import numpy as np
    cell = np.asarray(grid.cell)
    cell = cell.reshape(cell.shape[:-1] + (3, grid.bucket_cap))
    m = cell[..., 0, :] != _EMPTY
    pts = np.moveaxis(np.asarray(grid.pts).reshape(
        grid.pts.shape[:-1] + (3, grid.bucket_cap)), -2, -1)
    return pts[m], np.asarray(grid.inten)[m]
