"""Feature selection: sharp/flat picking with greedy NMS (component C5).

Re-design of ``scanRegistration.cpp:277-408``. The reference sorts each
(ring, region) window by curvature, then walks the sorted list, picking
unsuppressed candidates and NMS-marking ±5 ring neighbours per pick
(gap-stopped at >0.05 m², :319-342). Since suppression only ever grows,
walking the sorted order while skipping suppressed points is *exactly*
equivalent to repeatedly selecting the extremum of the still-eligible
curvature — so this implementation needs no sort at all: each pick is one
masked argmax/argmin over the ring (VPU-friendly), for at most 20 corner +
4 flat picks per region (:301,:307,:359).

Parallel structure: rings vmap; the 6 regions of a ring run sequentially
because suppression marks leak up to 5 slots across region boundaries and
the flat pass must see its own region's corner marks.

Quirks preserved: pick counts/labels (2 sharp / 20 less-sharp / 4 flat);
the 4th flat pick is labeled and emitted but marks neither itself nor its
neighbours (:358-362 — `break` precedes the suppression block).

Tie-breaking (unspecified in the reference — std::sort is unstable): corner
picks take the lowest index among equal curvatures, flat picks likewise.
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
    """Gap-stopped ±5 suppression around `cand` (scanRegistration.cpp:319-342)
    including the self-mark. All effects are no-ops when `do` is False."""
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
    """Greedy selection for one ring. Returns (label, picked, in_region).

    label: 2 sharp, 1 less-sharp, -1 flat, 0 other (cloudLabel semantics).
    """
    c = pts.shape[0]
    sp, ep, size, ring_ok = _region_bounds(cnt, cfg.n_regions)

    idx = jnp.arange(c, dtype=jnp.int32)
    in_any = ring_ok & (idx >= 5) & (idx <= ep[-1]) & (idx < cnt)

    picked = jnp.zeros((c,), bool)
    label = jnp.zeros((c,), jnp.int8)

    def region_body(j, st):
        picked, label = st
        window = (idx >= sp[j]) & (idx <= ep[j]) & (size[j] > 0)

        # --- corner picks: descending curvature (:291-344) --------------
        def corner_body(t, cst):
            picked, label = cst
            score = jnp.where(window & ~picked
                              & (curv > cfg.curvature_threshold), curv, -_INF)
            cand = jnp.argmax(score).astype(jnp.int32)
            ok = score[cand] > -_INF
            lbl = jnp.where(t < cfg.max_sharp, 2, 1).astype(jnp.int8)
            label = label.at[cand].set(jnp.where(ok, lbl, label[cand]))
            picked = _nms_window(pts, picked, cand, ok, cfg.nms_gap_sq)
            return picked, label

        picked, label = jax.lax.fori_loop(0, cfg.max_less_sharp,
                                          corner_body, (picked, label))

        # --- flat picks: ascending curvature (:346-390) ------------------
        def flat_body(t, cst):
            picked, label = cst
            score = jnp.where(window & ~picked
                              & (curv < cfg.curvature_threshold), curv, _INF)
            cand = jnp.argmin(score).astype(jnp.int32)
            ok = score[cand] < _INF
            label = label.at[cand].set(
                jnp.where(ok, jnp.int8(-1), label[cand]))
            # 4th pick: label only, no suppression (:358-362)
            do_mark = ok & (t < cfg.max_flat - 1)
            picked = _nms_window(pts, picked, cand, do_mark, cfg.nms_gap_sq)
            return picked, label

        picked, label = jax.lax.fori_loop(0, cfg.max_flat,
                                          flat_body, (picked, label))
        return picked, label

    picked, label = jax.lax.fori_loop(0, cfg.n_regions, region_body,
                                      (picked, label))
    return label, picked, in_any


def extract_features(rc: RingCloud, curv: jnp.ndarray,
                     cfg: AloamConfig) -> ScanFeatures:
    """C5 + C6: run selection on every ring, voxel-downsample the less-flat
    candidates per ring (0.2 m leaf, :401-407), and pack the five clouds."""
    label, picked, in_region = jax.vmap(
        lambda p, cv, n: _select_ring(p, cv, n, cfg)
    )(rc.xyz, curv, rc.cnt)

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

    overflow = d1 + d2 + d3 + d4 + d5 + d6
    full = PointCloud(xyz=full_xyz, intensity=full_int, mask=full_m)
    return ScanFeatures(sharp=sharp, less_sharp=less_sharp, flat=flat,
                        less_flat=less_flat, full=full, overflow=overflow)
