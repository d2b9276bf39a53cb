"""Nearest-neighbor search as blocked distance matmuls.

TPU-native replacement for ``pcl::KdTreeFLANN`` (SURVEY.md §2.3): the
reference rebuilds KD-trees every frame (``laserOdometry.cpp:567-568``,
``laserMapping.cpp:558-559``) and runs 1-NN / 5-NN queries per point
(``laserOdometry.cpp:302,390``, ``laserMapping.cpp:582,648``). Here there is
no tree: squared distances ‖q‖² − 2·q·rᵀ + ‖r‖² ride the MXU as one (Q, M)
matmul (or a streamed `lax.scan` over M-chunks with a running top-k merge
when the full matrix would not fit), which is *exact*, like the KD-tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = float("inf")  # plain scalar: jnp constants at import time would init backends


def dist2_matrix(query: jnp.ndarray, ref: jnp.ndarray,
                 ref_mask: jnp.ndarray | None = None,
                 center: jnp.ndarray | None = None) -> jnp.ndarray:
    """Squared euclidean distances (Q, M); masked refs get +inf.

    Distances are translation-invariant, so both sets are recentered on the
    query mean before the matmul — together with full-f32 MXU precision this
    keeps errors ~1e-4 m² even at 100 m coordinates (the TPU default bf16
    matmul pass would otherwise corrupt the 1.0/25.0 m² gates of
    laserOdometry.cpp:65 / laserMapping.cpp:584).
    """
    if center is None:
        center = jnp.mean(query, axis=0)
    q = query - center
    r = ref - center
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    r2 = jnp.sum(r * r, axis=-1)
    cross = jnp.matmul(q, r.T, precision=jax.lax.Precision.HIGHEST)
    d2 = q2 - 2.0 * cross + r2[None, :]
    d2 = jnp.maximum(d2, 0.0)
    if ref_mask is not None:
        d2 = jnp.where(ref_mask[None, :], d2, _INF)
    return d2


def nn1(query: jnp.ndarray, ref: jnp.ndarray, ref_mask: jnp.ndarray):
    """1-NN: returns (d2 (Q,), idx (Q,))."""
    d2 = dist2_matrix(query, ref, ref_mask)
    return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32)


def knn_streamed(query: jnp.ndarray, ref: jnp.ndarray,
                 ref_mask: jnp.ndarray, k: int, chunk: int = 8192):
    """Exact k-NN with bounded memory: scan over M-chunks of the reference,
    merging a running top-k. Returns (d2 (Q,k), idx (Q,k)), ascending.

    Memory high-water: Q*(chunk+k) f32 — independent of M.
    """
    m = ref.shape[0]
    if m % chunk != 0:
        pad = chunk - m % chunk
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
        ref_mask = jnp.pad(ref_mask, (0, pad))
        m += pad
    n_chunks = m // chunk
    q = query.shape[0]

    def body(carry, i):
        best_d, best_i = carry
        r = jax.lax.dynamic_slice(ref, (i * chunk, 0), (chunk, 3))
        rm = jax.lax.dynamic_slice(ref_mask, (i * chunk,), (chunk,))
        d2 = dist2_matrix(query, r, rm)
        cand_d = jnp.concatenate([best_d, d2], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(
                (i * chunk + jnp.arange(chunk, dtype=jnp.int32))[None, :],
                (q, chunk))], axis=1)
        neg_top, pos = jax.lax.top_k(-cand_d, k)
        return (-neg_top, jnp.take_along_axis(cand_i, pos, axis=1)), None

    init = (jnp.full((q, k), _INF), jnp.zeros((q, k), jnp.int32))
    (d2, idx), _ = jax.lax.scan(body, init,
                                jnp.arange(n_chunks, dtype=jnp.int32))
    return d2, idx


def odom_window_mins(sel: jnp.ndarray, ref: jnp.ndarray,
                     ref_mask: jnp.ndarray, ref_ring: jnp.ndarray,
                     nearby_scan: int, want_same_ring: bool,
                     chunk: int = 8192):
    """The odometry correspondence minima (laserOdometry.cpp:299-483) in two
    streamed passes with O(Q·chunk) memory — the dense (Q, M) distance
    matrix at HDL-64 sizes is ~250 MB, which forbids stream batching.

    Pass 1: global 1-NN (the KD-tree query, :302/:390). Pass 2 (given the
    1-NN's ring): minima over the ring windows of the reference's up/down
    walks — the different-ring window 1 ≤ |Δring| ≤ nearby_scan (:312-361)
    and, when ``want_same_ring``, the same-ring-excluding-the-NN window
    (minPointInd2, :402-428).

    Tie-breaking matches a dense argmin: earliest index wins (strict-less
    chunk merges). Returns (d2_nn, nn, d2_diff, idx_diff[, d2_same,
    idx_same]).
    """
    q_n, m = sel.shape[0], ref.shape[0]
    pad = (-m) % chunk
    if pad:
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
        ref_mask = jnp.pad(ref_mask, (0, pad))
        ref_ring = jnp.pad(ref_ring, (0, pad))
    n_chunks = ref.shape[0] // chunk

    center = jnp.mean(sel, axis=0)
    qc = sel - center
    rc = ref - center
    q2 = jnp.sum(qc * qc, axis=-1, keepdims=True)

    def d2_of(i):
        r = jax.lax.dynamic_slice(rc, (i * chunk, 0), (chunk, 3))
        rm = jax.lax.dynamic_slice(ref_mask, (i * chunk,), (chunk,))
        r2 = jnp.sum(r * r, axis=-1)
        cross = jnp.matmul(qc, r.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(q2 - 2.0 * cross + r2[None, :], 0.0)
        return jnp.where(rm[None, :], d2, _INF)

    def merge(best, d2, i):
        best_d, best_i = best
        loc = jnp.min(d2, axis=1)
        loci = jnp.argmin(d2, axis=1).astype(jnp.int32) + i * chunk
        better = loc < best_d
        return (jnp.where(better, loc, best_d),
                jnp.where(better, loci, best_i))

    init = (jnp.full((q_n,), _INF), jnp.zeros((q_n,), jnp.int32))

    def body1(carry, i):
        return merge(carry, d2_of(i), i), None

    (d2_nn, nn), _ = jax.lax.scan(body1, init,
                                  jnp.arange(n_chunks, dtype=jnp.int32))
    ring_nn = ref_ring[nn]

    def body2(carry, i):
        d2 = d2_of(i)
        ring = jax.lax.dynamic_slice(ref_ring, (i * chunk,), (chunk,))
        adiff = jnp.abs(ring[None, :] - ring_nn[:, None])
        diff_w = (adiff >= 1) & (adiff <= nearby_scan)
        out_diff = merge(carry[0], jnp.where(diff_w, d2, _INF), i)
        if not want_same_ring:
            return (out_diff,), None
        gidx = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        same_w = (adiff == 0) & (gidx[None, :] != nn[:, None])
        out_same = merge(carry[1], jnp.where(same_w, d2, _INF), i)
        return (out_diff, out_same), None

    init2 = (init,) if not want_same_ring else (init, init)
    out, _ = jax.lax.scan(body2, init2,
                          jnp.arange(n_chunks, dtype=jnp.int32))
    if not want_same_ring:
        (d2_diff, idx_diff), = out
        return d2_nn, nn, d2_diff, idx_diff
    (d2_diff, idx_diff), (d2_same, idx_same) = out
    return d2_nn, nn, d2_diff, idx_diff, d2_same, idx_same


def odom_window_mins_b(sel: jnp.ndarray, ref: jnp.ndarray,
                       ref_mask: jnp.ndarray, ref_ring: jnp.ndarray,
                       nearby_scan: int, want_same_ring: bool,
                       chunk: int = 8192,
                       force_kernel_interpret: bool = False,
                       ring_seg: int = 0):
    """Batched odom_window_mins: sel (B,Q,3), ref (B,M,3). Identical
    per-stream semantics; on TPU the whole search runs as one fused Pallas
    kernel with the reference cloud resident in VMEM (ops/pallas_odom.py —
    the XLA form materializes (B,Q,chunk) distance blocks in HBM twice);
    elsewhere the chunk matmul is a batched MXU contraction and the ring
    gather is one flat op."""
    from aloam_tpu.utils.batch import bgather
    from aloam_tpu.ops.pallas_gate import use_pallas
    if use_pallas("odom") or force_kernel_interpret:
        from aloam_tpu.ops.pallas_odom import window_mins
        big = jnp.float32(1e9)
        # recenter before the kernel's q² − 2q·r + r² MXU expansion — the
        # same centering the XLA branch applies below: at raw scene-scale
        # coordinates (~1e2 m) the expansion cancels ~1e4-magnitude terms
        # and loses ~1e-3 m² of f32 accuracy, enough to flip near-tie
        # argmins vs the XLA path. Poison is applied AFTER centering so
        # invalid rows sit at exactly 1e9 (d2 ≈ 3e18, fails every merge).
        center = jnp.mean(sel, axis=1, keepdims=True)
        ref_p = jnp.concatenate(
            [jnp.where(ref_mask[:, None, :],
                       jnp.moveaxis(ref - center, 1, 2), big),
             jnp.where(ref_mask[:, :, None],
                       ref_ring.astype(jnp.float32)[:, :, None],
                       big).reshape(ref.shape[0], 1, -1)], axis=1)
        outs = window_mins(sel - center, ref_p, float(nearby_scan),
                           interpret=force_kernel_interpret,
                           ring_seg=ring_seg)
        if not want_same_ring:
            return outs[0], outs[1], outs[2], outs[3]
        return outs
    bsz, q_n = sel.shape[:2]
    m = ref.shape[1]
    pad = (-m) % chunk
    if pad:
        ref = jnp.pad(ref, ((0, 0), (0, pad), (0, 0)))
        ref_mask = jnp.pad(ref_mask, ((0, 0), (0, pad)))
        ref_ring = jnp.pad(ref_ring, ((0, 0), (0, pad)))
    n_chunks = ref.shape[1] // chunk

    center = jnp.mean(sel, axis=1, keepdims=True)            # (B, 1, 3)
    qc = sel - center
    rc = ref - center
    q2 = jnp.sum(qc * qc, axis=-1, keepdims=True)            # (B, Q, 1)

    def d2_of(i):
        r = jax.lax.dynamic_slice(rc, (0, i * chunk, 0),
                                  (bsz, chunk, 3))
        rm = jax.lax.dynamic_slice(ref_mask, (0, i * chunk), (bsz, chunk))
        r2 = jnp.sum(r * r, axis=-1)
        cross = jnp.einsum("bqc,bkc->bqk", qc, r,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(q2 - 2.0 * cross + r2[:, None, :], 0.0)
        return jnp.where(rm[:, None, :], d2, _INF)

    def merge(best, d2, i):
        best_d, best_i = best
        loc = jnp.min(d2, axis=-1)
        loci = jnp.argmin(d2, axis=-1).astype(jnp.int32) + i * chunk
        better = loc < best_d
        return (jnp.where(better, loc, best_d),
                jnp.where(better, loci, best_i))

    init = (jnp.full((bsz, q_n), _INF), jnp.zeros((bsz, q_n), jnp.int32))

    def body1(carry, i):
        return merge(carry, d2_of(i), i), None

    (d2_nn, nn), _ = jax.lax.scan(body1, init,
                                  jnp.arange(n_chunks, dtype=jnp.int32))
    ring_nn = bgather(ref_ring, nn)                          # (B, Q)

    def body2(carry, i):
        d2 = d2_of(i)
        ring = jax.lax.dynamic_slice(ref_ring, (0, i * chunk), (bsz, chunk))
        adiff = jnp.abs(ring[:, None, :] - ring_nn[:, :, None])
        diff_w = (adiff >= 1) & (adiff <= nearby_scan)
        out_diff = merge(carry[0], jnp.where(diff_w, d2, _INF), i)
        if not want_same_ring:
            return (out_diff,), None
        gidx = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        same_w = (adiff == 0) & (gidx[None, None, :] != nn[:, :, None])
        out_same = merge(carry[1], jnp.where(same_w, d2, _INF), i)
        return (out_diff, out_same), None

    init2 = (init,) if not want_same_ring else (init, init)
    out, _ = jax.lax.scan(body2, init2,
                          jnp.arange(n_chunks, dtype=jnp.int32))
    if not want_same_ring:
        (d2_diff, idx_diff), = out
        return d2_nn, nn, d2_diff, idx_diff
    (d2_diff, idx_diff), (d2_same, idx_same) = out
    return d2_nn, nn, d2_diff, idx_diff, d2_same, idx_same


def knn(query: jnp.ndarray, ref: jnp.ndarray, ref_mask: jnp.ndarray,
        k: int, chunk: int = 8192):
    """k-NN dispatcher: single matmul when (Q, M) fits comfortably,
    streamed otherwise."""
    q, m = query.shape[0], ref.shape[0]
    if q * m <= 32 * 1024 * 1024:  # 128 MB of f32 scores
        d2 = dist2_matrix(query, ref, ref_mask)
        neg_top, idx = jax.lax.top_k(-d2, k)
        return -neg_top, idx.astype(jnp.int32)
    return knn_streamed(query, ref, ref_mask, k, chunk)
