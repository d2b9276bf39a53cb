"""Feature selection: sharp/flat picking with greedy NMS (component C5).

Re-design of ``scanRegistration.cpp:277-408``. The reference's semantics are
inherently sequential *within* a (ring, region): candidates are visited in
curvature order and each pick suppresses up to ±5 ring neighbours, stopping
the suppression at a >0.05 m² point gap; suppression marks also leak ±5 slots
across region boundaries, and the flat pass of a region sees the marks of its
own sharp pass. We keep exactly those semantics:

* rings are fully parallel (`vmap` over the ring axis),
* the 6 regions of a ring run sequentially (statically unrolled),
* each region runs a bounded `fori_loop` over its curvature-sorted
  candidates — descending for corners (≤2 sharp + ≤20 less-sharp picks,
  :291-344), ascending for flats (≤4 picks, :346-390).

The loop bounds (`cfg.sharp_iters` / `cfg.flat_iters`) truncate only the
number of *visited* candidates per region; the reference visits every region
point but, outside adversarial inputs, terminates via its pick-count breaks
long before that. Truncation is surfaced in the returned diagnostics.

Quirks preserved: the 21st corner candidate stops the pass without labeling
(:313-315); the 4th flat pick is labeled and emitted but marks neither itself
nor its neighbours (:358-362 — `break` precedes the suppression block).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aloam_tpu.config import AloamConfig
from aloam_tpu.types import PointCloud, RingCloud, ScanFeatures
from aloam_tpu.frontend.voxel import voxel_downsample_rings
from aloam_tpu.utils.masked import compact_cloud

_INF = jnp.float32(jnp.inf)


def _region_bounds(cnt: jnp.ndarray, n_regions: int):
    """Per-ring region windows (rel. indices), scanRegistration.cpp:284-285:
    sp_j = 5 + (cnt-11)*j//6, ep_j = 5 + (cnt-11)*(j+1)//6 - 1. Regions are
    contiguous. A ring with cnt-11 < 6 is skipped entirely (:279-280)."""
    base = cnt - 11
    j = jnp.arange(n_regions, dtype=jnp.int32)
    sp = 5 + base * j // n_regions
    ep = 5 + base * (j + 1) // n_regions - 1
    ok = base >= n_regions
    size = jnp.where(ok, ep - sp + 1, 0)
    return sp, ep, size, ok


def _nms_window(pts: jnp.ndarray, picked: jnp.ndarray, cand: jnp.ndarray,
                do: jnp.ndarray, gap_sq: float):
    """Gap-stopped ±5 suppression around `cand` (scanRegistration.cpp:319-342).

    Returns updated `picked`. All effects are no-ops when `do` is False.
    """
    start = cand - 5
    win = jax.lax.dynamic_slice(pts, (start, jnp.int32(0)), (11, 3))
    d = win[1:] - win[:-1]
    gaps_ok = jnp.sum(d * d, axis=-1) <= gap_sq  # (10,) gap g: slot g->g+1
    # upward l=1..5: all gaps (5..5+l-1) ok  -> cumulative AND of gaps[5:]
    up = jnp.cumprod(gaps_ok[5:].astype(jnp.int32)) > 0
    # downward l=-1..-5: all gaps (4, 3, ..) ok -> cum AND of reversed gaps[:5]
    down = jnp.cumprod(gaps_ok[:5][::-1].astype(jnp.int32)) > 0
    mark = jnp.concatenate([down[::-1], jnp.ones((1,), bool), up]) & do
    pick_win = jax.lax.dynamic_slice(picked, (start,), (11,))
    return jax.lax.dynamic_update_slice(picked, pick_win | mark, (start,))


def _select_ring(pts, curv, cnt, cfg: AloamConfig):
    """Greedy selection for one ring. Returns (label, picked, truncated).

    label: 2 sharp, 1 less-sharp, -1 flat, 0 other (cloudLabel semantics).
    """
    c = pts.shape[0]
    sp, ep, size, ring_ok = _region_bounds(cnt, cfg.n_regions)

    # region id per slot (7 = not in any region); regions are contiguous
    idx = jnp.arange(c, dtype=jnp.int32)
    in_any = ring_ok & (idx >= 5) & (idx <= ep[-1]) & (idx < cnt)
    region = jnp.sum(idx[:, None] > ep[None, :], axis=1).astype(jnp.int32)
    region = jnp.where(in_any, region, 7)

    # stable two-pass sort: ascending curvature, ties by index, grouped by
    # region (mirrors the oracle's (curv, index) key; the reference's
    # std::sort is unstable on ties — scanRegistration.cpp:288)
    o1 = jnp.argsort(jnp.where(in_any, curv, _INF), stable=True)
    order = o1[jnp.argsort(region[o1], stable=True)]
    run_start = sp - 5  # in-region slots before region j (contiguity)

    picked = jnp.zeros((c,), bool)
    label = jnp.zeros((c,), jnp.int8)
    truncated = jnp.int32(0)

    # per-region candidate counts, for truncation detection: the corner pass
    # is exact iff every curv>thr candidate is visited; the flat pass iff it
    # either stops at 4 picks or visits every curv<thr candidate
    onehot = region[:, None] == jnp.arange(cfg.n_regions)[None, :]
    n_above = jnp.sum(onehot & (curv > cfg.curvature_threshold)[:, None],
                      axis=0)
    n_below = jnp.sum(onehot & (curv < cfg.curvature_threshold)[:, None],
                      axis=0)

    for j in range(cfg.n_regions):
        rs, sz = run_start[j], size[j]

        # --- descending pass: corners (scanRegistration.cpp:291-344) ----
        def corner_body(t, st):
            picked, label, largest, stopped = st
            ok_t = t < sz
            pos = jnp.clip(rs + sz - 1 - t, 0, c - 1)
            cand = order[pos]
            is_cand = (ok_t & ~stopped & ~picked[cand]
                       & (curv[cand] > cfg.curvature_threshold))
            largest_new = largest + is_cand.astype(jnp.int32)
            do = is_cand & (largest_new <= cfg.max_less_sharp)
            stopped = stopped | (is_cand & ~do)
            lbl = jnp.where(largest_new <= cfg.max_sharp, 2, 1).astype(
                jnp.int8)
            label = label.at[cand].set(jnp.where(do, lbl, label[cand]))
            picked = _nms_window(pts, picked, cand, do, cfg.nms_gap_sq)
            return picked, label, jnp.where(is_cand, largest_new, largest), \
                stopped

        picked, label, n_corner, c_stop = jax.lax.fori_loop(
            0, cfg.sharp_iters, corner_body,
            (picked, label, jnp.int32(0), jnp.asarray(False)))
        # truncation: some curv>thr candidate was never visited
        truncated += ((~c_stop)
                      & (n_above[j] > cfg.sharp_iters)).astype(jnp.int32)

        # --- ascending pass: flats (scanRegistration.cpp:346-390) -------
        def flat_body(t, st):
            picked, label, smallest, stopped = st
            ok_t = t < sz
            pos = jnp.clip(rs + t, 0, c - 1)
            cand = order[pos]
            is_cand = (ok_t & ~stopped & ~picked[cand]
                       & (curv[cand] < cfg.curvature_threshold))
            smallest_new = smallest + is_cand.astype(jnp.int32)
            label = label.at[cand].set(
                jnp.where(is_cand, jnp.int8(-1), label[cand]))
            is_break = is_cand & (smallest_new >= cfg.max_flat)
            do = is_cand & ~is_break  # 4th pick: label only, no suppression
            picked = _nms_window(pts, picked, cand, do, cfg.nms_gap_sq)
            return picked, label, \
                jnp.where(is_cand, smallest_new, smallest), \
                stopped | is_break

        picked, label, n_flat, f_stop = jax.lax.fori_loop(
            0, cfg.flat_iters, flat_body,
            (picked, label, jnp.int32(0), jnp.asarray(False)))
        truncated += ((~f_stop) & (sz > cfg.flat_iters)
                      & (n_below[j] > cfg.flat_iters)).astype(jnp.int32)

    in_region = in_any  # slots harvested for less-flat (:392-398)
    return label, picked, in_region, truncated


def extract_features(rc: RingCloud, curv: jnp.ndarray,
                     cfg: AloamConfig) -> ScanFeatures:
    """C5 + C6: run selection on every ring, voxel-downsample the less-flat
    candidates per ring (0.2 m leaf, :401-407), and pack the five clouds."""
    label, picked, in_region, truncated = jax.vmap(
        lambda p, cv, n: _select_ring(p, cv, n, cfg)
    )(rc.xyz, curv, rc.cnt)

    overflow = jnp.sum(truncated)

    def cloud(mask, cap):
        xyz, inten, m, dropped = compact_cloud(
            rc.xyz.reshape(-1, 3), rc.intensity.reshape(-1),
            mask.reshape(-1), cap)
        return PointCloud(xyz=xyz, intensity=inten, mask=m), dropped

    sharp, d1 = cloud(label == 2, cfg.sharp_cap)
    less_sharp, d2 = cloud(label >= 1, cfg.less_sharp_cap)
    flat, d3 = cloud(label == -1, cfg.flat_cap)

    lf_xyz, lf_int, lf_mask, d4 = voxel_downsample_rings(
        rc.xyz, rc.intensity, (label <= 0) & in_region, cfg.less_flat_leaf)
    lf_xyz2, lf_int2, lf_m2, d5 = compact_cloud(
        lf_xyz.reshape(-1, 3), lf_int.reshape(-1), lf_mask.reshape(-1),
        cfg.less_flat_cap)
    less_flat = PointCloud(xyz=lf_xyz2, intensity=lf_int2, mask=lf_m2)

    full_xyz, full_int, full_m, d6 = compact_cloud(
        rc.xyz.reshape(-1, 3), rc.intensity.reshape(-1),
        rc.slot_mask().reshape(-1), rc.xyz.shape[0] * rc.xyz.shape[1])

    overflow = overflow + d1 + d2 + d3 + d4 + d5 + d6
    full = PointCloud(xyz=full_xyz, intensity=full_int, mask=full_m)
    return ScanFeatures(sharp=sharp, less_sharp=less_sharp, flat=flat,
                        less_flat=less_flat, full=full, overflow=overflow)
