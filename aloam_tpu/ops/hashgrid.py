"""Spatial-hash k-NN for gated neighbor queries (the KD-tree killer).

The mapping associations need the 5 nearest map points *only when the 5th
is within 1.0 m* (gate at laserMapping.cpp:584,652). All such neighbors of
a query live in the 3×3×3 neighborhood of its 1 m grid cell, so an exact
gated 5-NN needs only those 27 cells — O(27·B) candidates per query instead
of O(M) distances.

Open hashing: each bucket holds points of every cell that hashes to it;
candidates are verified against their *stored packed cell* so (a) hash
collisions only waste bucket capacity, never inject wrong candidates, and
(b) a bucket shared by two of a query's 27 cells cannot produce duplicate
candidates. Bucket overflow (dropped points) is counted and surfaced; with
default sizing it is zero on realistic maps.

Exactness contract: whenever the reference's dense 5-NN passes its 1.0 m²
gate, this returns the identical 5 neighbors (and when it fails, the padded
+inf distances fail the gate here too) — assuming no bucket overflow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = float("inf")  # plain scalar: jnp constants at import time would init backends
_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


class HashGrid(NamedTuple):
    pts: jnp.ndarray      # (H, B, 3) point coordinates
    cell: jnp.ndarray     # (H, B) packed relative cell key, -1 = empty
    origin: jnp.ndarray   # (3,) min cell coord (packing origin)
    overflow: jnp.ndarray  # () dropped points


def _cells_of(pts: jnp.ndarray, cell_size: float) -> jnp.ndarray:
    return jnp.floor(pts / cell_size).astype(jnp.int32)


def _hash(cells: jnp.ndarray, table_size: int) -> jnp.ndarray:
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return jnp.bitwise_and(h, table_size - 1)


def _pack(cells: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """Pack cell coords relative to origin into one int32 (10 bits/axis);
    out-of-range cells (span > 1023 — impossible for a 21x21x11 50 m cube
    window at 1 m cells) pack to -2 and never match."""
    rel = cells - origin
    ok = jnp.all((rel >= 0) & (rel < 1024), axis=-1)
    key = (rel[..., 2] * 1024 + rel[..., 1]) * 1024 + rel[..., 0]
    return jnp.where(ok, key, -2)


def build(pts: jnp.ndarray, mask: jnp.ndarray, cell_size: float,
          table_size: int, bucket_cap: int) -> HashGrid:
    """Scatter masked points into the hash table (one argsort + scatters)."""
    m = pts.shape[0]
    cells = _cells_of(pts, cell_size)
    big = jnp.int32(2 ** 20)
    origin = jnp.min(jnp.where(mask[:, None], cells, big), axis=0)
    h = jnp.where(mask, _hash(cells, table_size), table_size)

    # stable sort by bucket (a composite h*m+i key would overflow int32 at
    # m ~ 150k); stability keeps arrival order within each bucket
    order = jnp.argsort(h, stable=True)
    h_s = h[order]
    counts = jnp.bincount(h_s, length=table_size + 1)[:table_size]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])

    # table fill by *gather inversion*: slot (h, r) reads sorted row
    # starts[h] + r when r < counts[h] — no scatter (TPU scatters are
    # row-serialized; a (H*B)-row gather is far cheaper)
    key = _pack(cells, origin)[order]
    pts_s = pts[order]
    rr = jnp.arange(bucket_cap, dtype=jnp.int32)[None, :]
    occupied = rr < counts[:, None]
    src = jnp.clip(starts[:table_size][:, None] + rr, 0, m - 1)
    tbl_pts = pts_s[src.reshape(-1)]
    tbl_cell = jnp.where(occupied.reshape(-1), key[src.reshape(-1)], -1)
    overflow = jnp.sum(jnp.maximum(counts - bucket_cap, 0))
    return HashGrid(pts=tbl_pts.reshape(table_size, bucket_cap, 3),
                    cell=tbl_cell.reshape(table_size, bucket_cap),
                    origin=origin, overflow=overflow)


def _offsets8():
    import numpy as np
    g = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                             indexing="ij"), -1).reshape(8, 3)
    return jnp.asarray(g, jnp.int32)  # NumPy-derived: safe to rebuild per trace


def knn(grid: HashGrid, query: jnp.ndarray, k: int, cell_size: float,
        table_size: int, radius: float = 1.0):
    """Gated exact k-NN: (d2 (Q, k) ascending with +inf padding,
    nbrs (Q, k, 3)).

    Covers every point within `radius` of the query with the 2×2×2 block of
    cells starting at floor((q - radius)/cell); exactness requires
    cell_size >= 2*radius (the block spans 2*cell >= 2*radius past the block
    base per axis). 8 gathered bucket rows per query instead of 27 (TPU
    gathers are row-latency-bound, so fewer/wider rows win).
    """
    assert cell_size >= 2 * radius, (cell_size, radius)
    qcells = _cells_of(query - radius, cell_size)            # (Q, 3) block base
    ncells = qcells[:, None, :] + _offsets8()[None]          # (Q, 8, 3)
    hh = _hash(ncells, table_size)                           # (Q, 8)
    cand_pts = grid.pts[hh]                                  # (Q, 8, B, 3)
    cand_cell = grid.cell[hh]                                # (Q, 8, B)
    want = _pack(ncells, grid.origin)                        # (Q, 8)
    valid = (cand_cell == want[:, :, None]) & (want[:, :, None] >= 0)

    diff = cand_pts - query[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(valid, d2, _INF)

    q, _, b, _ = cand_pts.shape
    d2 = d2.reshape(q, 8 * b)
    neg_top, pos = jax.lax.top_k(-d2, k)
    nbrs = jnp.take_along_axis(cand_pts.reshape(q, 8 * b, 3),
                               pos[..., None], axis=1)
    return -neg_top, nbrs
