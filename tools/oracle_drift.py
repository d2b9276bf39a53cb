"""Measure engine-vs-oracle relative drift on the long-drift scene.

Operationalizes BASELINE.md's "seq-00 ATE within 5% of the reference"
criterion (VERDICT r4 #3): with no KITTI data or runnable reference on
this machine, the faithful stand-in for the reference is the f64 NumPy
oracle (tests/oracle/pipeline.py — a clean-room literal reimplementation
of the C++ semantics, cited per file:line). This tool runs BOTH the
engine and the oracle over the same ≥100-frame drift-test scene and
reports each one's KITTI-convention translational drift vs ground truth,
plus the engine/oracle ratio. The numbers it prints anchor the gate in
tests/test_long_drift.py::test_oracle_relative_drift and the BASELINE.md
accuracy row.

Usage:  JAX_PLATFORMS=cpu python tools/oracle_drift.py [n_frames]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from tests.test_long_drift import (  # noqa: E402
    SPEED, _render_scene, _oracle_trajectory, DRIFT_CFG)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    import jax.numpy as jnp
    from aloam_tpu import pipeline
    from aloam_tpu.eval import ate_rmse, kitti_drift

    t0 = time.time()
    traj, scans = _render_scene(n)
    print(f"rendered {n} frames in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    t_map_o, q_map_o = _oracle_trajectory(scans, use_cache=True)
    print(f"oracle trajectory in {time.time() - t0:.1f}s", flush=True)

    cfg = DRIFT_CFG
    step = pipeline.make_step_fn(cfg)
    state = pipeline.init_state(cfg)
    est_t, est_q = [], []
    t0 = time.time()
    for s in scans:
        from aloam_tpu.io import synthetic as syn
        xyz, mask = syn.pad_scan(s, cfg.n_raw)
        state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
        est_t.append(np.asarray(out.t_map))
        est_q.append(np.asarray(out.q_map))
    est_t, est_q = np.stack(est_t), np.stack(est_q)
    print(f"engine trajectory in {time.time() - t0:.1f}s", flush=True)

    gt_t = (traj.trans[:n] - traj.trans[0]).astype(np.float64)
    gt_q = traj.quats[:n]

    drift_e, nseg_e = kitti_drift(est_t, gt_t, est_q=est_q, gt_q=gt_q)
    drift_o, nseg_o = kitti_drift(t_map_o, gt_t, est_q=q_map_o, gt_q=gt_q)
    out = {
        "n_frames": n,
        "oracle_drift_pct": round(drift_o, 4),
        "engine_drift_pct": round(drift_e, 4),
        "engine_over_oracle": round(drift_e / drift_o, 4),
        "oracle_ate_m": round(ate_rmse(t_map_o, gt_t, align=False), 4),
        "engine_ate_m": round(ate_rmse(est_t, gt_t, align=False), 4),
        "n_segments": int(nseg_e),
        "max_engine_oracle_gap_m": round(
            float(np.linalg.norm(est_t - t_map_o, axis=1).max()), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
