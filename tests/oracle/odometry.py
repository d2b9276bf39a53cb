"""NumPy oracle of laserOdometry's correspondence walks.

Literal reimplementation of the ring-ordered linear searches at
``/root/reference/src/laserOdometry.cpp:299-483`` (KD-tree 1-NN replaced by
exact brute force, which is what KdTreeFLANN computes)."""

from __future__ import annotations

import numpy as np

DIST_SQ = 25.0
NEARBY = 2.5


def edge_corr(sel: np.ndarray, last_xyz: np.ndarray, last_int: np.ndarray):
    """For one query point `sel` (3,), return (nn, ind2) or (-1, -1)."""
    d2 = ((last_xyz - sel) ** 2).sum(1)
    nn = int(np.argmin(d2))
    if d2[nn] >= DIST_SQ:
        return -1, -1
    c = int(last_int[nn])
    min2, ind2 = DIST_SQ, -1
    for j in range(nn + 1, last_xyz.shape[0]):       # increasing scan line
        if int(last_int[j]) <= c:
            continue
        if int(last_int[j]) > c + NEARBY:
            break
        if d2[j] < min2:
            min2, ind2 = d2[j], j
    for j in range(nn - 1, -1, -1):                  # decreasing scan line
        if int(last_int[j]) >= c:
            continue
        if int(last_int[j]) < c - NEARBY:
            break
        if d2[j] < min2:
            min2, ind2 = d2[j], j
    return nn, ind2


def plane_corr(sel: np.ndarray, last_xyz: np.ndarray, last_int: np.ndarray):
    """Return (nn, ind2, ind3) or -1s (laserOdometry.cpp:387-455)."""
    d2 = ((last_xyz - sel) ** 2).sum(1)
    nn = int(np.argmin(d2))
    if d2[nn] >= DIST_SQ:
        return -1, -1, -1
    c = int(last_int[nn])
    min2, ind2 = DIST_SQ, -1
    min3, ind3 = DIST_SQ, -1
    for j in range(nn + 1, last_xyz.shape[0]):
        if int(last_int[j]) > c + NEARBY:
            break
        if int(last_int[j]) <= c and d2[j] < min2:
            min2, ind2 = d2[j], j
        elif int(last_int[j]) > c and d2[j] < min3:
            min3, ind3 = d2[j], j
    for j in range(nn - 1, -1, -1):
        if int(last_int[j]) < c - NEARBY:
            break
        if int(last_int[j]) >= c and d2[j] < min2:
            min2, ind2 = d2[j], j
        elif int(last_int[j]) < c and d2[j] < min3:
            min3, ind3 = d2[j], j
    return nn, ind2, ind3
