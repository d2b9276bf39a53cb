"""Full-pipeline trajectory pin against the f64 NumPy oracle.

The reference's accuracy story is KITTI replay with GT overlay
(kittiHelper.cpp:59-66); with no KITTI data on this machine, the
strongest available anchor is this clean-room double-precision oracle of
the complete odometry+mapping chain (tests/oracle/pipeline.py). The
engine (f32, grid-hashed searches, batched solver) must land within the
measured jit-noise floor of the oracle trajectory — a gross semantic
regression in any stage (features, correspondences, solver, map) moves
the trajectory by centimeters-to-meters and fails this pin.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from aloam_tpu.config import AloamConfig
from aloam_tpu import pipeline
from aloam_tpu.io import synthetic as syn
from tests.oracle import pipeline as opipe

# capacities sized generously for the 16x512 scene: truncation (counted
# in the overflow metric) otherwise starves the mapping solve and the
# engine diverges from the oracle for capacity reasons, not semantics
CFG = AloamConfig(
    scan_lines=16, minimum_range=0.3,
    line_resolution=0.2, plane_resolution=0.4,
    n_raw=16384, ring_cap=640, less_flat_cap=8192,
    map_table_corner=2048, map_table_surf=4096,
    corner_stack_cap=1024, surf_stack_cap=4096,
)
# 20 frames (VERDICT r3 #4): long enough to expose compounding drift,
# gate-flip sensitivity, and map-growth effects — the 2-4 frame pins of
# rounds 1-3 only caught gross semantic breaks. Feasible since the
# oracle's mapping association was vectorized (mapping_frame_vec).
N_FRAMES = 20


@pytest.fixture(scope="module")
def seq():
    # denser azimuth sampling than the sharding micro-scenes: the mapping
    # solve needs well-conditioned plane/edge support for the engine and
    # the oracle to converge to the same optimum (sparse silhouette-only
    # scenes leave the solve ill-conditioned and gate-flip noise dominates)
    return syn.make_sequence(N_FRAMES, scan_lines=16, n_azimuth=512,
                             seed=3, speed=0.5)


def test_trajectory_matches_full_oracle(seq):
    scans, _ = seq

    t_odom_o, t_map_o, _ = opipe.run_pipeline(
        [s for s in scans], scan_lines=16,
        line_res=CFG.line_resolution, plane_res=CFG.plane_resolution,
        min_range=CFG.minimum_range)

    step = pipeline.make_step_fn(CFG, donate=False)
    st = pipeline.init_state(CFG)
    t_odom_e, t_map_e = [], []
    for s in scans:
        xyz, mask = syn.pad_scan(s, CFG.n_raw)
        st, out = step(st, jnp.asarray(xyz), jnp.asarray(mask))
        t_odom_e.append(np.asarray(out.t_odom))
        t_map_e.append(np.asarray(out.t_map))
    t_odom_e = np.stack(t_odom_e)
    t_map_e = np.stack(t_map_e)

    # tolerance = the engine's own measured f32/jit noise floor on this
    # scene class (~21 mm after two frames; threshold-gate flips compound)
    # plus margin; the oracle is exact f64
    d_odom = np.linalg.norm(t_odom_e - t_odom_o, axis=1)
    d_map = np.linalg.norm(t_map_e - t_map_o, axis=1)
    assert d_odom.max() < 0.06, (d_odom, t_odom_e, t_odom_o)
    assert d_map.max() < 0.06, (d_map, t_map_e, t_map_o)


# HDL-64-geometry pin (VERDICT r2 weak #7): the 16-line case cannot catch
# a 64-beam-only regression — the upper/lower-bank ring formulas
# (scanRegistration.cpp:186-205), per-ring capacities, and the 6-region
# windows at real ring widths only exercise with 64 lines. Capacities are
# again sized to the scene so divergence means semantics, not truncation.
CFG64 = AloamConfig(
    scan_lines=64, minimum_range=0.3,
    line_resolution=0.2, plane_resolution=0.4,
    n_raw=65536, ring_cap=1024, less_flat_cap=16384,
    map_table_corner=4096, map_table_surf=8192,
    corner_stack_cap=2048, surf_stack_cap=8192,
)


def _run_engine_hdl64(scans):
    step = pipeline.make_step_fn(CFG64, donate=False)
    st = pipeline.init_state(CFG64)
    t_odom_e, t_map_e = [], []
    for s in scans:
        xyz, mask = syn.pad_scan(s, CFG64.n_raw)
        st, out = step(st, jnp.asarray(xyz), jnp.asarray(mask))
        t_odom_e.append(np.asarray(out.t_odom))
        t_map_e.append(np.asarray(out.t_map))
    return np.stack(t_odom_e), np.stack(t_map_e)


def test_trajectory_matches_full_oracle_hdl64():
    scans, _ = syn.make_sequence(2, scan_lines=64, n_azimuth=900,
                                 seed=5, speed=0.5)

    t_odom_o, t_map_o, _ = opipe.run_pipeline(
        [s for s in scans], scan_lines=64,
        line_res=CFG64.line_resolution, plane_res=CFG64.plane_resolution,
        min_range=CFG64.minimum_range)

    t_odom_e, t_map_e = _run_engine_hdl64(scans)
    d_odom = np.linalg.norm(t_odom_e - t_odom_o, axis=1)
    d_map = np.linalg.norm(t_map_e - t_map_o, axis=1)
    assert d_odom.max() < 0.06, (d_odom, t_odom_e, t_odom_o)
    assert d_map.max() < 0.06, (d_map, t_map_e, t_map_o)


# 10-frame HDL-64 pin (VERDICT r4 #4): the headline config's anchor at the
# depth the VLP-16 path already has. The 64-beam oracle costs minutes per
# frame, so the trajectory is host-cached (tests/oracle/cache.py) and the
# test is marked slow; the cache key covers the oracle sources, so an
# oracle change regenerates it.
N_FRAMES64 = 10


@pytest.mark.slow
def test_trajectory_matches_full_oracle_hdl64_long():
    from tests.oracle.cache import oracle_trajectory

    scans, _ = syn.make_sequence(N_FRAMES64, scan_lines=64, n_azimuth=900,
                                 seed=5, speed=0.5)
    t_odom_o, t_map_o, _ = oracle_trajectory(
        f"hdl64-pin-v1:{N_FRAMES64}", scans,
        dict(scan_lines=64, line_res=CFG64.line_resolution,
             plane_res=CFG64.plane_resolution,
             min_range=CFG64.minimum_range))

    t_odom_e, t_map_e = _run_engine_hdl64(scans)
    d_odom = np.linalg.norm(t_odom_e - t_odom_o, axis=1)
    d_map = np.linalg.norm(t_map_e - t_map_o, axis=1)
    # same tolerance class as the 20-frame VLP-16 pin (f32/jit noise floor
    # + threshold-gate flips compounding over frames)
    assert d_odom.max() < 0.06, (d_odom, t_odom_e, t_odom_o)
    assert d_map.max() < 0.06, (d_map, t_map_e, t_map_o)
