"""Command-line pipeline runner — the launch-file equivalent (C28).

The reference is driven by three roslaunch presets
(launch/aloam_velodyne_{VLP_16,HDL_32,HDL_64}.launch) plus the kittiHelper
node. This runner plays a KITTI sequence or a synthetic sequence through the
fused pipeline, logging structured per-frame metrics (JSONL), writing the
trajectory (TUM format + npz), optional checkpoints, and rviz-stand-in PNGs.

Examples:
    python -m aloam_tpu.cli --preset HDL-64 --synthetic --frames 100 \
        --out /tmp/run1
    python -m aloam_tpu.cli --preset HDL-64 --kitti /data/kitti \
        --sequence 00 --out /tmp/kitti00
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="HDL-64",
                   choices=["VLP-16", "HDL-32", "HDL-64"])
    p.add_argument("--kitti", help="KITTI dataset folder (kittiHelper layout)")
    p.add_argument("--sequence", default="00")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic street-canyon sequence instead of KITTI")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--speed", type=float, default=10.0,
                   help="synthetic vehicle speed [m/s]")
    p.add_argument("--out", default="out_run", help="output directory")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="save the SLAM state pytree every K frames")
    p.add_argument("--resume", help="checkpoint .npz to resume from")
    p.add_argument("--plots", action="store_true",
                   help="write trajectory/map PNGs at the end")
    p.add_argument("--mapping-skip-frame", type=int, default=None)
    p.add_argument("--skip-first", type=int, default=0,
                   help="discard the first N scans (the reference's "
                        "systemDelay, scanRegistration.cpp:62)")
    p.add_argument("--surround-every", type=int, default=0, metavar="K",
                   help="write the local-neighborhood map cloud every K "
                        "frames (the /laser_cloud_surround 5-frame cadence, "
                        "laserMapping.cpp:806-821)")
    p.add_argument("--map-every", type=int, default=0, metavar="K",
                   help="write the full map cloud every K frames (the "
                        "/laser_cloud_map 20-frame cadence, "
                        "laserMapping.cpp:823-836)")
    p.add_argument("--dump-rings", type=int, default=None, metavar="FRAME",
                   help="write per-ring debug clouds of the given frame to "
                        "rings_FRAME.npz (the PUB_EACH_LINE channel, "
                        "scanRegistration.cpp:444-454)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))

    import numpy as np
    import jax
    import jax.numpy as jnp

    from aloam_tpu.config import PRESETS
    from aloam_tpu import pipeline
    from aloam_tpu.eval import ate_rmse, kitti_drift, rpe, rpe_rot
    from aloam_tpu.io import synthetic as syn
    from aloam_tpu.utils import checkpoint as ckpt
    from aloam_tpu.utils.tictoc import TicToc

    cfg = PRESETS[args.preset]
    if args.mapping_skip_frame is not None:
        cfg = cfg.replace(mapping_skip_frame=args.mapping_skip_frame)

    # ---- data source (C1) ------------------------------------------------
    gt_t = gt_q = None
    if args.synthetic or not args.kitti:
        scans, traj = syn.make_sequence(
            args.frames, scan_lines=cfg.scan_lines, seed=7, speed=args.speed)
        frames = ((syn.pad_scan(s, cfg.n_raw) + (float(i) * 0.1,))
                  for i, s in enumerate(scans))
        # --skip-first drops leading scans: drop the matching GT rows so
        # estimated frame i compares against gt frame i+skip, re-anchored
        gt_t = traj.trans[args.skip_first:] - traj.trans[args.skip_first]
        gt_q = traj.quats[args.skip_first:]
    else:
        from aloam_tpu.io import kitti, native_loader
        times_path, gt_path, velo_dir = kitti.sequence_paths(args.kitti,
                                                             args.sequence)
        if gt_path and os.path.exists(gt_path):
            gt_q, gt_t = kitti.load_gt_poses(gt_path)
            gt_q = gt_q[args.skip_first:]
            gt_t = gt_t[args.skip_first:] - gt_t[args.skip_first]
        if native_loader.available():
            times = np.atleast_1d(np.loadtxt(times_path))
            paths = [os.path.join(velo_dir, f"{i:06d}.bin")
                     for i in range(len(times))]
            pf = native_loader.Prefetcher(paths, cfg.n_raw, depth=4,
                                          n_threads=2)
            frames = ((xyz, mask, float(times[i]))
                      for i, (xyz, mask, _refl) in enumerate(pf))
            print("using native C++ prefetcher")
        else:
            frames = ((f.xyz, f.mask, f.timestamp) for f in
                      kitti.iter_sequence(args.kitti, args.sequence,
                                          cfg.n_raw))

    # ---- pipeline --------------------------------------------------------
    step = pipeline.make_step_fn(cfg)
    state = pipeline.init_state(cfg)
    if args.resume:
        state = ckpt.load(args.resume, state)
        print(f"resumed from {args.resume}")

    metrics_path = os.path.join(args.out, "metrics.jsonl")
    traj_odom, traj_map, traj_hf, stamps = [], [], [], []
    t_all = TicToc()
    import itertools
    frames = itertools.islice(frames, args.skip_first, None)
    with open(metrics_path, "w") as mf:
        for i, (xyz, mask, ts) in enumerate(frames):
            if i >= args.frames:
                break
            t_frame = TicToc()
            if args.dump_rings == i:
                from aloam_tpu.frontend import register_scan
                rc, curv, _ = jax.jit(
                    lambda x, m: register_scan(x, m, cfg))(
                    jnp.asarray(xyz), jnp.asarray(mask))
                rpath = os.path.join(args.out, f"rings_{i:06d}.npz")
                np.savez(rpath, xyz=np.asarray(rc.xyz),
                         intensity=np.asarray(rc.intensity),
                         cnt=np.asarray(rc.cnt),
                         curvature=np.asarray(curv))
                print(f"per-ring debug clouds -> {rpath} "
                      f"({int(np.asarray(rc.cnt).sum())} points, "
                      f"{rc.xyz.shape[0]} rings)")
            state, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
            # one fused transfer per frame (device->host round-trips through
            # the TPU tunnel cost ~0.1 s each)
            packed = np.asarray(jnp.concatenate(
                [out.t_odom, out.t_map, out.q_map, out.t_hf, out.metrics]))
            wall = t_frame.toc()
            traj_odom.append(packed[0:3])
            traj_map.append(packed[3:10])
            traj_hf.append(packed[10:13])
            m = dict(zip(pipeline.METRIC_NAMES, packed[13:].tolist()))
            stamps.append(ts)
            rec = {"frame": i, "t": ts, "wall_ms": round(wall, 2)}
            rec.update(m)
            mf.write(json.dumps(rec) + "\n")
            if (m["corner_corr"] + m["plane_corr"]) < 10 and i > 0:
                print(f"frame {i}: less correspondence! "
                      f"({int(m['corner_corr'])}+{int(m['plane_corr'])})")
            if args.surround_every and (i + 1) % args.surround_every == 0:
                from aloam_tpu import mapping as mp
                c_sur, s_sur = mp.extract_surround(state.map, cfg)
                spath = os.path.join(args.out, f"surround_{i + 1:06d}.npz")
                np.savez(spath, corner=c_sur, surf=s_sur)
                print(f"surround ({len(c_sur)}+{len(s_sur)} pts) -> {spath}")
            if args.map_every and (i + 1) % args.map_every == 0:
                from aloam_tpu import mapping as mp
                c_map, s_map = mp.extract_map_cloud(state.map, cfg)
                mpath = os.path.join(args.out, f"map_{i + 1:06d}.npz")
                np.savez(mpath, corner=c_map, surf=s_map)
                print(f"map ({len(c_map)}+{len(s_map)} pts) -> {mpath}")
            if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
                path = os.path.join(args.out, f"state_{i + 1:06d}.npz")
                ckpt.save(path, state)
                print(f"checkpoint -> {path}")

    n = len(traj_map)
    total_ms = t_all.toc()
    walls = []
    with open(metrics_path) as mf2:
        for line in mf2:
            walls.append(json.loads(line)["wall_ms"])
    steady = float(np.median(walls)) if walls else 0.0
    print(f"{n} frames in {total_ms / 1e3:.1f}s "
          f"(median {steady:.0f} ms/scan = {1e3 / max(steady, 1e-9):.1f} "
          f"scans/s; first frame includes compilation)")

    # ---- outputs ---------------------------------------------------------
    tm = np.stack(traj_map)
    np.savez(os.path.join(args.out, "trajectory.npz"),
             t_map=tm[:, :3], q_map=tm[:, 3:],
             t_odom=np.stack(traj_odom), t_hf=np.stack(traj_hf),
             stamps=np.asarray(stamps))
    # TUM format: t x y z qx qy qz qw
    with open(os.path.join(args.out, "trajectory_tum.txt"), "w") as f:
        for ts, row in zip(stamps, tm):
            t, q = row[:3], row[3:]
            f.write(f"{ts} {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]}\n")

    if gt_t is not None and n > 1:
        summary = {
            "frames": n,
            "median_wall_ms": steady,
            "ate_rmse_m": ate_rmse(tm[:, :3], gt_t[:n], align=False),
        }
        # KITTI-convention RPE/drift (start-pose-anchored relative motion)
        # when GT orientations exist; world increments otherwise
        have_q = gt_q is not None and len(gt_q) >= n
        eq, gq = (tm[:, 3:7], gt_q[:n]) if have_q else (None, None)
        summary["rpe_trans_m"] = rpe(tm[:, :3], gt_t[:n],
                                     est_q=eq, gt_q=gq)[0]
        if have_q:
            summary["rpe_rot_deg"] = rpe_rot(tm[:, 3:7], gt_q[:n])[0]
        drift, n_seg = kitti_drift(tm[:, :3], gt_t[:n], est_q=eq, gt_q=gq)
        if n_seg:
            # KITTI convention: mean translational drift over 100-800 m
            # segments (needs a few hundred meters of trajectory)
            summary["kitti_drift_pct"] = drift
            summary["kitti_drift_segments"] = n_seg
        with open(os.path.join(args.out, "eval.json"), "w") as f:
            json.dump(summary, f, indent=1)
        msg = (f"ATE RMSE {summary['ate_rmse_m']:.4f} m   "
               f"RPE {summary['rpe_trans_m']:.4f} m")
        if "rpe_rot_deg" in summary:
            msg += f"   RPEr {summary['rpe_rot_deg']:.3f} deg"
        if "kitti_drift_pct" in summary:
            msg += (f"   drift {summary['kitti_drift_pct']:.3f}% "
                    f"({summary['kitti_drift_segments']} segs)")
        print(msg)

    if args.plots:
        from aloam_tpu.eval import viz
        from aloam_tpu import mapping as mp
        paths = {"mapped": tm[:, :3], "odometry": np.stack(traj_odom)}
        if gt_t is not None:
            paths["ground truth"] = gt_t[:n]
        viz.plot_trajectories(paths, os.path.join(args.out, "trajectory.png"))
        corner, surf = mp.extract_map_cloud(state.map, cfg)
        if surf.shape[0]:
            viz.plot_map_cloud(np.concatenate([corner, surf]),
                               os.path.join(args.out, "map.png"))
        print(f"plots -> {args.out}")


if __name__ == "__main__":
    main()
