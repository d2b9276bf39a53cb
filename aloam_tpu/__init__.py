"""aloam_tpu — a TPU-native LiDAR odometry and mapping (LOAM) engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of A-LOAM
(HKUST-Aerial-Robotics/A-LOAM, reference at /root/reference): curvature-based
edge/planar feature extraction from ring-ordered Velodyne scans, scan-to-scan
odometry and scan-to-map refinement via point-to-line / point-to-plane least
squares, and a rolling voxel-cube world map.

The reference's four ROS processes become one pure, jit-compiled
``step(state, scan) -> (state, outputs)`` driven by ``lax.scan`` with
fixed-size padded buffers, masked semantics, brute-force top-k neighbor
search on the MXU, and a batched Levenberg-Marquardt solver on SE(3) with
analytic Jacobians.
"""

from aloam_tpu.config import AloamConfig, PRESETS  # noqa: F401

__version__ = "0.1.0"
