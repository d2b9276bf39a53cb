"""NumPy oracle of A-LOAM's scanRegistration node.

A deliberately literal, loop-based reimplementation of the semantics of
``/root/reference/src/scanRegistration.cpp`` (laserCloudHandler, lines
114-459), used as ground truth for the vectorized JAX frontend. Sequential
control flow (halfPassed state machine, greedy NMS feature picking) is kept
exactly as the reference specifies it.

Tie-breaking deviation: where the reference uses ``std::sort`` (unstable) on
curvature, this oracle sorts by (curvature, index) so results are
deterministic; the JAX frontend uses the same composite key.
"""

from __future__ import annotations

import numpy as np


def remove_close(points: np.ndarray, min_range: float) -> np.ndarray:
    """scanRegistration.cpp:85-112 (removeClosedPointCloud)."""
    d2 = np.sum(points[:, :3] ** 2, axis=1)
    return points[d2 >= min_range * min_range]


def ring_ids(points: np.ndarray, scan_lines: int):
    """Ring assignment per scanRegistration.cpp:166-205.

    Returns (ring int array, keep mask). int() truncation toward zero as in C.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    angle = np.degrees(np.arctan(z / np.sqrt(x * x + y * y)))
    if scan_lines == 16:
        sid = np.trunc((angle + 15.0) / 2.0 + 0.5).astype(np.int64)
        keep = (sid >= 0) & (sid <= scan_lines - 1)
    elif scan_lines == 32:
        sid = np.trunc((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(np.int64)
        keep = (sid >= 0) & (sid <= scan_lines - 1)
    elif scan_lines == 64:
        upper = np.trunc((2.0 - angle) * 3.0 + 0.5).astype(np.int64)
        lower = scan_lines // 2 + np.trunc((-8.83 - angle) * 2.0
                                           + 0.5).astype(np.int64)
        sid = np.where(angle >= -8.83, upper, lower)
        keep = ~((angle > 2) | (angle < -24.33) | (sid > 50) | (sid < 0))
    else:
        raise ValueError(scan_lines)
    return sid, keep


def rel_times(points: np.ndarray, keep: np.ndarray):
    """Intra-scan relative time per scanRegistration.cpp:141-238
    (startOri/endOri wraparound + the halfPassed state machine).

    Only kept points advance the state machine, mirroring the `continue`
    at :175/:184/:198. Returns relTime array (undefined where ~keep).
    """
    n = points.shape[0]
    start_ori = -np.arctan2(points[0, 1], points[0, 0])
    end_ori = -np.arctan2(points[n - 1, 1], points[n - 1, 0]) + 2 * np.pi
    if end_ori - start_ori > 3 * np.pi:
        end_ori -= 2 * np.pi
    elif end_ori - start_ori < np.pi:
        end_ori += 2 * np.pi

    half_passed = False
    rel = np.zeros(n)
    for i in range(n):
        if not keep[i]:
            continue
        ori = -np.arctan2(points[i, 1], points[i, 0])
        if not half_passed:
            if ori < start_ori - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start_ori + np.pi * 3 / 2:
                ori -= 2 * np.pi
            if ori - start_ori > np.pi:
                half_passed = True
        else:
            ori += 2 * np.pi
            if ori < end_ori - np.pi * 3 / 2:
                ori += 2 * np.pi
            elif ori > end_ori + np.pi / 2:
                ori -= 2 * np.pi
        rel[i] = (ori - start_ori) / (end_ori - start_ori)
    return rel


def register_scan(points: np.ndarray, scan_lines: int,
                  min_range: float = 0.1, scan_period: float = 0.1,
                  curvature_threshold: float = 0.1,
                  less_flat_leaf: float = 0.2):
    """Full laserCloudHandler oracle (scanRegistration.cpp:114-459).

    points: (N, >=3) float array, firing order.
    Returns dict with the five published clouds, each (M, 4) [x, y, z,
    intensity=ring + scan_period*relTime], plus per-ring metadata.
    """
    pts = remove_close(np.asarray(points, np.float64)[:, :3], min_range)
    sid, keep = ring_ids(pts, scan_lines)
    rel = rel_times(pts, keep)

    # bucket by ring, preserving arrival order (scanRegistration.cpp:240)
    rings = [[] for _ in range(scan_lines)]
    for i in range(pts.shape[0]):
        if keep[i]:
            intensity = sid[i] + scan_period * rel[i]
            rings[sid[i]].append((pts[i, 0], pts[i, 1], pts[i, 2], intensity))

    # concatenate + window indices (scanRegistration.cpp:246-252)
    cloud = []
    start_ind = np.zeros(scan_lines, np.int64)
    end_ind = np.zeros(scan_lines, np.int64)
    for r in range(scan_lines):
        start_ind[r] = len(cloud) + 5
        cloud.extend(rings[r])
        end_ind[r] = len(cloud) - 6
    cloud = np.asarray(cloud, np.float64).reshape(-1, 4)
    n = cloud.shape[0]

    # curvature (scanRegistration.cpp:256-266)
    curv = np.zeros(n)
    for i in range(5, n - 5):
        # 10-neighbor sum minus 10*p (scanRegistration.cpp:258-262)
        d = cloud[i - 5:i + 6, :3].sum(axis=0) - 11.0 * cloud[i, :3]
        curv[i] = float(d @ d)
    picked = np.zeros(n, np.int64)
    label = np.zeros(n, np.int64)

    sharp, less_sharp, flat, less_flat = [], [], [], []

    def mark_neighbors(ind):
        # scanRegistration.cpp:319-342 (gap-stopped ±5 suppression)
        for ell in range(1, 6):
            d = cloud[ind + ell, :3] - cloud[ind + ell - 1, :3]
            if d @ d > 0.05:
                break
            picked[ind + ell] = 1
        for ell in range(-1, -6, -1):
            d = cloud[ind + ell, :3] - cloud[ind + ell + 1, :3]
            if d @ d > 0.05:
                break
            picked[ind + ell] = 1

    for r in range(scan_lines):
        if end_ind[r] - start_ind[r] < 6:
            continue
        less_flat_scan = []
        for j in range(6):
            sp = start_ind[r] + (end_ind[r] - start_ind[r]) * j // 6
            ep = start_ind[r] + (end_ind[r] - start_ind[r]) * (j + 1) // 6 - 1
            # deterministic tie-breaks matching the JAX argmax/argmin
            # semantics (lowest index among equal curvatures in both passes;
            # the reference's std::sort is unstable here)
            order_desc = sorted(range(sp, ep + 1),
                                key=lambda i: (-curv[i], i))
            order_asc = sorted(range(sp, ep + 1),
                               key=lambda i: (curv[i], i))

            # descending pass: corners (scanRegistration.cpp:291-344)
            largest = 0
            for ind in order_desc:
                if picked[ind] == 0 and curv[ind] > curvature_threshold:
                    largest += 1
                    if largest <= 2:
                        label[ind] = 2
                        sharp.append(cloud[ind])
                        less_sharp.append(cloud[ind])
                    elif largest <= 20:
                        label[ind] = 1
                        less_sharp.append(cloud[ind])
                    else:
                        break
                    picked[ind] = 1
                    mark_neighbors(ind)

            # ascending pass: flats (scanRegistration.cpp:346-390)
            smallest = 0
            for ind in order_asc:
                if picked[ind] == 0 and curv[ind] < curvature_threshold:
                    label[ind] = -1
                    flat.append(cloud[ind])
                    smallest += 1
                    if smallest >= 4:
                        break  # 4th pick: no self/neighbor marking (:359-362)
                    picked[ind] = 1
                    mark_neighbors(ind)

            # less-flat candidates (scanRegistration.cpp:392-398)
            for k in range(sp, ep + 1):
                if label[k] <= 0:
                    less_flat_scan.append(cloud[k])

        less_flat.extend(voxel_downsample(np.asarray(less_flat_scan)
                                          .reshape(-1, 4), less_flat_leaf))

    def arr(lst):
        return np.asarray(lst, np.float64).reshape(-1, 4)

    return {
        "full": cloud,
        "sharp": arr(sharp),
        "less_sharp": arr(less_sharp),
        "flat": arr(flat),
        "less_flat": arr(less_flat),
        "curvature": curv,
        "label": label,
        "picked": picked,
        "start_ind": start_ind,
        "end_ind": end_ind,
    }


def voxel_downsample(cloud: np.ndarray, leaf: float) -> np.ndarray:
    """PCL VoxelGrid semantics: one centroid (all 4 fields averaged) per
    occupied voxel; voxel partitions anchored at the origin
    (ijk = floor(coord/leaf)); output ordered by flattened voxel index,
    x fastest then y then z (pcl/filters/voxel_grid.h layout)."""
    if cloud.shape[0] == 0:
        return cloud.reshape(0, 4)
    ijk = np.floor(cloud[:, :3] / leaf).astype(np.int64)
    order = np.lexsort((ijk[:, 0], ijk[:, 1], ijk[:, 2]))
    ijk_s = ijk[order]
    cloud_s = cloud[order]
    boundary = np.any(np.diff(ijk_s, axis=0) != 0, axis=1)
    seg = np.concatenate([[0], np.cumsum(boundary)])
    n_seg = seg[-1] + 1
    out = np.zeros((n_seg, 4))
    cnt = np.zeros(n_seg)
    np.add.at(out, seg, cloud_s)
    np.add.at(cnt, seg, 1.0)
    return out / cnt[:, None]
