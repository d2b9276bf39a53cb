"""Core array containers.

The reference passes ``pcl::PointCloud`` (dynamic vectors) between stages;
here every cloud is a fixed-capacity struct-of-arrays with a validity mask,
so the whole pipeline stays shape-static under jit (SURVEY.md §7 design
stance)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PointCloud(NamedTuple):
    """Padded point cloud: xyz (N,3) f32, intensity (N,) f32, mask (N,) bool.

    ``intensity`` carries the reference's ring + scan_period*relTime encoding
    (scanRegistration.cpp:239); ``int(intensity)`` is the ring ID used by the
    correspondence ring-window rules (laserOdometry.cpp:308,315).
    """
    xyz: jnp.ndarray
    intensity: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=-1)

    def ring(self) -> jnp.ndarray:
        return self.intensity.astype(jnp.int32)


class RingCloud(NamedTuple):
    """Ring-major packed scan: (R, C, 3) xyz, (R, C) intensity, (R,) counts.

    Equivalent of the reference's per-ring bucketing + concatenation
    (scanRegistration.cpp:240-252); slot j of ring r corresponds to
    concatenated index start_r + j."""
    xyz: jnp.ndarray
    intensity: jnp.ndarray
    cnt: jnp.ndarray

    def slot_mask(self) -> jnp.ndarray:
        c = self.xyz.shape[-2]
        return (jnp.arange(c)[None, :] < self.cnt[:, None])


class ScanFeatures(NamedTuple):
    """Output of the frontend — the five published clouds of the reference
    (scanRegistration.cpp:413-441)."""
    sharp: PointCloud
    less_sharp: PointCloud
    flat: PointCloud
    less_flat: PointCloud
    full: PointCloud
    # diagnostics: points dropped by capacity limits (0 = exact)
    overflow: jnp.ndarray
