"""Scan registration: range filter, ring split, per-point time, curvature.

Vectorized re-design of the per-point loops in
``/root/reference/src/scanRegistration.cpp:114-266`` (components C2-C4 of
SURVEY.md §2): the sequential ``halfPassed`` azimuth state machine becomes a
cumulative-OR unwrap, ring bucketing becomes one argsort + scatter, and the
11-point curvature stencil becomes a difference-stencil sum (better f32
conditioning than the reference's neighbor-sum-minus-10p, same value).
Everything is jit/vmap-friendly with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aloam_tpu.config import AloamConfig
from aloam_tpu.types import RingCloud

_TWO_PI = 2.0 * 3.141592653589793


def ring_ids(xyz: jnp.ndarray, scan_lines: int):
    """Elevation-angle ring assignment (scanRegistration.cpp:166-205).

    Uses C-style int() truncation toward zero, like the reference.
    Returns (ring i32, keep bool).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    angle = jnp.degrees(jnp.arctan(z / jnp.sqrt(x * x + y * y)))
    if scan_lines == 16:
        sid = jnp.trunc((angle + 15.0) / 2.0 + 0.5).astype(jnp.int32)
        keep = (sid >= 0) & (sid <= scan_lines - 1)
    elif scan_lines == 32:
        sid = jnp.trunc((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(jnp.int32)
        keep = (sid >= 0) & (sid <= scan_lines - 1)
    elif scan_lines == 64:
        upper = jnp.trunc((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32)
        lower = scan_lines // 2 + jnp.trunc(
            (-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32)
        sid = jnp.where(angle >= -8.83, upper, lower)
        keep = ~((angle > 2) | (angle < -24.33) | (sid > 50) | (sid < 0))
    else:
        raise ValueError(f"unsupported scan_lines={scan_lines}")
    return sid, keep


def rel_times(xyz: jnp.ndarray, valid: jnp.ndarray, kept: jnp.ndarray):
    """Azimuth-derived intra-scan relative time (scanRegistration.cpp:141-238).

    ``valid`` marks points surviving the NaN/range filter (these define
    startOri/endOri via the first/last cloud points, :141-144); ``kept``
    additionally requires a legal ring ID (ring-dropped points skip the state
    machine via `continue`, :175/:184/:198).

    The sequential halfPassed flag flips exactly once, after the first kept
    point whose (branch-false-adjusted) azimuth passes startOri + pi; so
    halfPassed(i) = OR over kept j<i of trigger(j) — an exclusive cumulative
    OR, fully parallel.
    """
    n = xyz.shape[0]
    ori = -jnp.arctan2(xyz[:, 1], xyz[:, 0])

    first = jnp.argmax(valid)
    last = n - 1 - jnp.argmax(valid[::-1])
    start_ori = ori[first]
    end_ori = ori[last] + _TWO_PI
    span = end_ori - start_ori
    end_ori = jnp.where(span > 3 * jnp.pi, end_ori - _TWO_PI,
                        jnp.where(span < jnp.pi, end_ori + _TWO_PI, end_ori))

    # branch-false (first half) adjustment
    ori_f = jnp.where(ori < start_ori - jnp.pi / 2, ori + _TWO_PI,
                      jnp.where(ori > start_ori + 3 * jnp.pi / 2,
                                ori - _TWO_PI, ori))
    trigger = kept & (ori_f - start_ori > jnp.pi)
    cum = jnp.cumsum(trigger.astype(jnp.int32))
    half_passed = (cum - trigger.astype(jnp.int32)) >= 1  # exclusive

    # branch-true (second half) adjustment
    ori_t = ori + _TWO_PI
    ori_t = jnp.where(ori_t < end_ori - 3 * jnp.pi / 2, ori_t + _TWO_PI,
                      jnp.where(ori_t > end_ori + jnp.pi / 2,
                                ori_t - _TWO_PI, ori_t))

    ori_out = jnp.where(half_passed, ori_t, ori_f)
    return (ori_out - start_ori) / (end_ori - start_ori)


def bucket_rings(xyz: jnp.ndarray, intensity: jnp.ndarray,
                 ring: jnp.ndarray, valid: jnp.ndarray,
                 scan_lines: int, ring_cap: int):
    """Ring-major repack (scanRegistration.cpp:240-252): one argsort by
    (ring, arrival index) + scatter into a (R, C) grid. Points past a ring's
    capacity are dropped and counted in `overflow`."""
    n = xyz.shape[0]
    big = jnp.int32(scan_lines)
    ring_v = jnp.where(valid, ring, big)
    order = jnp.argsort(ring_v, stable=True)  # arrival order within ring

    ring_s = ring_v[order]
    cnt = jnp.bincount(ring_s, length=scan_lines + 1)[:scan_lines]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(cnt).astype(jnp.int32)])

    # fill the (R, C) grid by gather inversion: slot (r, j) reads sorted row
    # starts[r] + j when j < cnt[r] (scatter-free gather inversion); xyz and
    # intensity travel fused so each permutation is one wide gather
    jj = jnp.arange(ring_cap, dtype=jnp.int32)[None, :]
    src = jnp.clip(starts[:scan_lines][:, None] + jj, 0, n - 1).reshape(-1)
    occupied = (jj < cnt[:, None]).reshape(-1)
    fused = jnp.concatenate([xyz, intensity[:, None]], axis=1)
    fused_s = fused[order][src]
    flat_xyz = jnp.where(occupied[:, None], fused_s[:, :3], 0.0)
    flat_int = jnp.where(occupied, fused_s[:, 3], 0.0)

    cnt_clamped = jnp.minimum(cnt, ring_cap).astype(jnp.int32)
    overflow = jnp.sum(cnt - cnt_clamped)
    return RingCloud(xyz=flat_xyz.reshape(scan_lines, ring_cap, 3),
                     intensity=flat_int.reshape(scan_lines, ring_cap),
                     cnt=cnt_clamped), overflow


def bucket_rings_b(xyz: jnp.ndarray, intensity: jnp.ndarray,
                   ring: jnp.ndarray, valid: jnp.ndarray,
                   scan_lines: int, ring_cap: int):
    """Batched bucket_rings: xyz (B,N,3), intensity/ring/valid (B,N).

    One payload-carrying sort by ring (the xyz/intensity columns ride the
    sort — no argsort + permutation gathers), then each ring row of the
    grid is ONE contiguous (ring_cap, 5)-slice of the sorted array, fetched
    by a slice-gather at the ring's start offset (found by vmapped binary
    search). Replaces a 2.6M-row per-slot gather (~50 ms at B=16) with
    B·R wide slices (~3 ms)."""
    bsz, n = ring.shape
    big = jnp.int32(scan_lines)
    ring_v = jnp.where(valid, ring, big)
    rv_s, x_s, y_s, z_s, i_s = jax.lax.sort(
        (ring_v, xyz[..., 0], xyz[..., 1], xyz[..., 2], intensity),
        dimension=1, num_keys=1, is_stable=True)

    # per-ring start offsets in the sorted order (empty rings collapse)
    starts = jax.vmap(lambda rv: jnp.searchsorted(
        rv, jnp.arange(scan_lines, dtype=jnp.int32)))(rv_s)  # (B, R)

    # pad so every slice is in-range, then fetch each ring row as one
    # contiguous (ring_cap, 5) slice
    fused = jnp.stack([x_s, y_s, z_s, i_s,
                       rv_s.astype(jnp.float32)], axis=-1)   # (B, N, 5)
    fused = jnp.pad(fused, ((0, 0), (0, ring_cap), (0, 0)),
                    constant_values=float(scan_lines))
    flat = fused.reshape(bsz * (n + ring_cap), 5)
    roff = (jnp.arange(bsz, dtype=jnp.int32) * (n + ring_cap))[:, None]
    sl = jax.lax.gather(
        flat, (starts + roff).reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(ring_cap, 5),
        mode=jax.lax.GatherScatterMode.CLIP)                 # (B*R, C, 5)
    sl = sl.reshape(bsz, scan_lines, ring_cap, 5)

    ring_ids = jnp.arange(scan_lines, dtype=jnp.float32)[None, :, None]
    occupied = sl[..., 4] == ring_ids                        # (B, R, C)
    flat_xyz = jnp.where(occupied[..., None], sl[..., :3], 0.0)
    flat_int = jnp.where(occupied, sl[..., 3], 0.0)
    cnt = jnp.sum(occupied, axis=-1).astype(jnp.int32)       # (B, R)
    overflow = jnp.sum(valid) - jnp.sum(cnt)
    return RingCloud(xyz=flat_xyz, intensity=flat_int, cnt=cnt), overflow


def curvature(rc: RingCloud, edge_margin: int = 5):
    """11-point curvature stencil (scanRegistration.cpp:256-266) on the
    ring-major grid: c_i = || sum_{k=-5..5, k!=0} (p_{i+k} - p_i) ||^2.

    Computed as a sum of neighbor differences (numerically friendlier in f32
    than the reference's raw-coordinate sum; identical value in exact math).
    Returns (R, C) curvature; only slots with margin <= j <= cnt-margin-2
    are meaningful — mask is the caller's job (selection windows).
    """
    pts = rc.xyz  # (R, C, 3)
    c = pts.shape[1]
    pad = jnp.pad(pts, ((0, 0), (edge_margin, edge_margin), (0, 0)))
    acc = -2.0 * edge_margin * pts
    for k in range(2 * edge_margin + 1):
        if k == edge_margin:
            continue
        acc = acc + pad[:, k:k + c]
    return jnp.sum(acc * acc, axis=-1)


def register_scan(xyz: jnp.ndarray, mask: jnp.ndarray, cfg: AloamConfig):
    """C2-C4: filter + ring split + time + bucketing + curvature.

    xyz: (n_raw, 3) f32 in firing order; mask: (n_raw,) validity.
    Returns (RingCloud, curvature (R,C), overflow).
    """
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    d2 = jnp.sum(xyz * xyz, axis=-1)
    valid = mask & finite & (d2 >= cfg.minimum_range ** 2)

    ring, keep = ring_ids(xyz, cfg.scan_lines)
    rel = rel_times(xyz, valid, valid & keep)
    intensity = ring.astype(xyz.dtype) + cfg.scan_period * rel

    rc, overflow = bucket_rings(xyz, intensity, ring, valid & keep,
                                cfg.scan_lines, cfg.ring_cap)
    curv = curvature(rc, cfg.edge_margin)
    return rc, curv, overflow


def register_scan_b(xyz: jnp.ndarray, mask: jnp.ndarray, cfg: AloamConfig):
    """Batched register_scan: xyz (B, n_raw, 3), mask (B, n_raw). Filtering,
    ring IDs and relTime are row-parallel (vmapped arithmetic); bucketing
    uses the flat-op batched path; the curvature stencil runs with the
    stream axis folded into the ring axis. Returns a RingCloud with
    (B, R, C) leaves + curvature (B, R, C) + overflow."""
    import jax

    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    d2 = jnp.sum(xyz * xyz, axis=-1)
    valid = mask & finite & (d2 >= cfg.minimum_range ** 2)

    ring, keep = ring_ids(xyz, cfg.scan_lines)
    rel = jax.vmap(rel_times)(xyz, valid, valid & keep)
    intensity = ring.astype(xyz.dtype) + cfg.scan_period * rel

    rc, overflow = bucket_rings_b(xyz, intensity, ring, valid & keep,
                                  cfg.scan_lines, cfg.ring_cap)
    bsz, r, c = rc.intensity.shape
    flat = RingCloud(xyz=rc.xyz.reshape(bsz * r, c, 3),
                     intensity=rc.intensity.reshape(bsz * r, c),
                     cnt=rc.cnt.reshape(bsz * r))
    curv = curvature(flat, cfg.edge_margin).reshape(bsz, r, c)
    return rc, curv, overflow
