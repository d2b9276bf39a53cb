#!/usr/bin/env python
"""Benchmark: full SLAM pipeline (registration + odometry + mapping) on
synthetic HDL-64 scans, one chip. Prints ONE JSON line.

Headline metric = aggregate scans/sec/chip over BENCH_BATCH independent
LiDAR streams stepped by the explicitly-batched ``pipeline.step_b``
(one SLAM step is latency-bound — ~30 µs/op dispatch tail + row-latency
gathers — so B streams amortize it; BASELINE config 5 / VERDICT r1 task 1).
Also reports the single-stream ms/scan and, with BENCH_STAGES=1, a fenced
per-stage breakdown.

vs_baseline is relative to the reference's real-time design point of
10 scans/sec (scanPeriod = 0.1 s, scanRegistration.cpp:60 — A-LOAM
publishes no throughput numbers beyond "real-time", BASELINE.md);
vs_target is relative to BASELINE.md's 500 scans/sec/chip goal.

Env knobs: BENCH_BATCH (streams, default 32 w/ fallback to 16; 0 = single-stream only),
BENCH_FRAMES (timed frames per stream, default 16 single / 8 batched),
BENCH_STAGES=1 (per-stage timings), BENCH_AZIMUTH (default 1800).
"""

import os

_here = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aloam_tpu.config import PRESETS  # noqa: E402
from aloam_tpu import pipeline  # noqa: E402
from aloam_tpu.eval import ate_rmse  # noqa: E402
from aloam_tpu.io import synthetic as syn  # noqa: E402

_AZ = int(os.environ.get("BENCH_AZIMUTH", "1800"))


def _cached_sequence(n_frames, seed, speed):
    """Synthetic scans are host-raytraced (1 CPU core, ~1 s/frame): cache
    padded sequences on disk keyed by shape+seed."""
    cfg = PRESETS["HDL-64"]
    cache = os.path.join(_here, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache,
                        f"hdl64_a{_AZ}_f{n_frames}_s{seed}_v{speed:g}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["xyz"], z["mask"], z["gt"]
    scans, traj = syn.make_sequence(n_frames, scan_lines=64, n_azimuth=_AZ,
                                    seed=seed, speed=speed)
    xyz = np.zeros((n_frames, cfg.n_raw, 3), np.float32)
    mask = np.zeros((n_frames, cfg.n_raw), bool)
    for i, s in enumerate(scans):
        xyz[i], mask[i] = syn.pad_scan(s, cfg.n_raw)
    gt = (traj.trans - traj.trans[0]).astype(np.float32)
    np.savez(path, xyz=xyz, mask=mask, gt=gt)
    return xyz, mask, gt


def batched_bench_cfg(base=None):
    """The batched-path bench config, shared by bench.py and the tools
    (bisect_step, profile_*) so A/Bs always measure the headline path.

    ring_cap / n_raw are sized to the bench scene's sensor spec: the
    synthetic HDL-64 fires exactly BENCH_AZIMUTH (1800) steps per ring,
    so ring_cap = 1856 >= 1800 and n_raw = 64*1800 rounded up to 512 can
    never overflow — static shapes sized to the sensor is the TPU
    methodology (the PRESET keeps 2560/131072 for real KITTI's denser
    scans; overflow there is counted, never silent). Measured +10%:
    151.2 -> 166.7 scans/s at B=16.

    less_flat_cap = 36864 is likewise bench-scene sizing (measured max
    occupancy 30536 at B=16, 1.2x margin, +4 scans/s) — it lives HERE,
    not in the PRESET, because the frontend golden scene needs 40960
    (round-4 lesson: bench sizing in config.PRESETS broke the suite).

    assoc_cspan = 128 clips the assoc kernel's per-tile cell window
    (measured spans on this scene: corner p99 112 / max 125, surf max
    141 of a possible TQ+8 = 264 — tools/assoc_span.py; spill rate at
    128 is 0% corner / 0.007% surf, counted in overflow). Measured
    +1.9%: 175.6 -> 178.9 scans/s at B=16. OFF in the PRESET: exactness
    first."""
    base = base if base is not None else PRESETS["HDL-64"]
    return base.replace(
        map_query_chunk=int(os.environ.get("BENCH_QCHUNK", "2048")),
        ring_cap=_AZ + 56, n_raw=-(-64 * _AZ // 512) * 512,
        less_flat_cap=36864, assoc_cspan=128)


def load_streams(cfg, batch, n_frames):
    """Stack ``batch`` cached synthetic streams and fit them to ``cfg``.

    Returns (xyz (F, B, n_raw, 3), mask (F, B, n_raw), gt (B, F, 3)).
    Cached streams are padded to the PRESET's n_raw; valid points sit at
    the head (syn.pad_scan), so slicing to a smaller sensor-spec capacity
    loses nothing (asserted)."""
    streams = [_cached_sequence(n_frames, 100 + b, _stream_speed(b))
               for b in range(batch)]
    xyz = np.stack([s[0] for s in streams], axis=1)   # (F, B, n, 3)
    mask = np.stack([s[1] for s in streams], axis=1)
    gt = np.stack([s[2] for s in streams])            # (B, F, 3)
    if xyz.shape[2] != cfg.n_raw:
        assert not mask[:, :, cfg.n_raw:].any()
        xyz, mask = xyz[:, :, :cfg.n_raw], mask[:, :, :cfg.n_raw]
    return xyz, mask, gt


_N_BLOCKS = int(os.environ.get("BENCH_BLOCKS", "3"))

# bf16 peak FLOP/s by device kind, for the MFU line (VERDICT r3 weak #5:
# never assume the chip). Unknown kinds omit MFU rather than guess.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}


def _time_blocks(step, state, dev_frames, n_blocks=_N_BLOCKS):
    """Run the step over per-frame device inputs in ``n_blocks`` fenced
    blocks; returns (per-block seconds-per-frame list, stacked t_map
    trajectory, final state). Each block forces a host transfer
    (block_until_ready can return early on this runtime). The caller
    takes the MEDIAN block — one-sample runs halved the round-3 headline
    on a noisy tunnel (VERDICT r3 weak #1).

    The staged inputs' H2D transfers are lazily queued and would
    otherwise drain INTO the first timed block (~10x slowdown of block 1
    through the ~70 MB/s tunnel): fence them with one tiny on-device
    reduction per frame before timing starts."""
    _ = np.asarray(sum(jnp.sum(m) for _, m in dev_frames))
    n = len(dev_frames)
    per_block = max(1, n // n_blocks)
    outs, secs = [], []
    i = 0
    while i < n:
        frames = dev_frames[i:i + per_block] if i + 2 * per_block <= n \
            else dev_frames[i:]          # fold the remainder into the last
        t0 = time.perf_counter()
        for xyz, mask in frames:
            state, out = step(state, xyz, mask)
            outs.append(out.t_map)
        _ = np.asarray(out.t_map)
        secs.append((time.perf_counter() - t0) / len(frames))
        i += len(frames)
    est = np.stack([np.asarray(t) for t in outs])
    return secs, est, state


def bench_single(cfg, n_frames):
    warm_xyz, warm_mask, _ = _cached_sequence(4, 7, 10.0)
    xyz, mask, gt = _cached_sequence(n_frames, 42, 10.0)

    step = pipeline.make_step_fn(cfg)
    state = pipeline.init_state(cfg)
    for i in range(4):
        state, out = step(state, jnp.asarray(warm_xyz[i]),
                          jnp.asarray(warm_mask[i]))
    _ = np.asarray(out.t_map)

    dev = [(jnp.asarray(xyz[i]), jnp.asarray(mask[i]))
           for i in range(n_frames)]
    secs, est, _ = _time_blocks(step, pipeline.init_state(cfg), dev)
    ate = ate_rmse(est, gt[:, :3], align=False)
    return float(np.median(secs)), float(ate)


def _stream_speed(b: int) -> float:
    """Gate-compatible stream speeds: ≤ 8.94 m/s → ≤ 0.9 m/frame at
    10 Hz against the 1.0 m map NN gate (round 2 generated up to
    1.55 m/frame and manufactured its own worst-stream divergence).
    b < 16 keeps the ladder the committed 49.3-scans/s run used; blocks
    of 16 up to b = 63 interleave distinct speeds between the rungs (the
    offset pattern repeats with period 48 beyond that — worlds stay
    distinct via the seed)."""
    if b < 16:
        return 5.0 + 0.25 * b
    blk, off = divmod(b - 16, 16)
    extra = (0.125, 0.0625, 0.1875)[blk % 3]
    return 5.0 + 0.25 * off + extra


def bench_batched(cfg, batch, n_frames):
    """B distinct streams (distinct worlds/seeds/speeds), donated state."""
    from aloam_tpu.parallel import batched_init, batched_step_jit

    xyz, mask, gt = load_streams(cfg, batch, n_frames + 2)

    step = batched_step_jit(cfg, donate=True)
    state = batched_init(cfg, batch)
    # warm-up on the two leading frames (distinct data: the runtime
    # memoizes identical (computation, inputs) executions), then time the
    # continuation — steady-state SLAM, no state re-init mid-run
    for f in range(2):
        state, out = step(state, jnp.asarray(xyz[f]), jnp.asarray(mask[f]))
    _ = np.asarray(out.t_map)

    dev = [(jnp.asarray(xyz[2 + f]), jnp.asarray(mask[2 + f]))
           for f in range(n_frames)]
    secs, est, state = _time_blocks(step, state, dev)
    est = np.moveaxis(est, 0, 1)                             # (B, F, 3)
    rates = sorted(batch / s for s in secs)                  # scans/s/block

    # est is absolute from the stream's frame 0 (the warm-up frames ran on
    # the same state), so compare against the matching absolute GT rows
    ates = [float(ate_rmse(est[b], gt[b, 2:2 + n_frames], align=False))
            for b in range(batch)]
    flops = None
    try:
        ca = step.lower(state, dev[0][0], dev[0][1]).compile()
        ca = ca.cost_analysis()
        if ca:
            entry = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(entry.get("flops", 0.0)) or None
    except Exception:
        pass
    return (float(np.median(rates)), rates[-1] - rates[0],
            max(ates), float(np.median(ates)), flops)


def bench_stages(cfg, reps=6):
    """Fenced single-stream per-stage device timings (ms)."""
    from aloam_tpu import odometry as od
    from aloam_tpu import mapping as mp
    from aloam_tpu.frontend import extract_features, register_scan

    xyz, mask, _ = _cached_sequence(reps + 4, 3, 10.0)
    frames = [(jnp.asarray(xyz[i]), jnp.asarray(mask[i]))
              for i in range(reps + 4)]

    step1 = pipeline.make_step_fn(cfg, donate=False)
    state = pipeline.init_state(cfg)
    for x, m in frames[:4]:
        state, out = step1(state, x, m)
    _ = np.asarray(out.t_map)

    ff = jax.jit(lambda x, m: extract_features(
        *register_scan(x, m, cfg)[:2], cfg))
    feats = [jax.tree.map(jnp.asarray, ff(x, m)) for x, m in frames[4:]]

    def timeit(fn, inputs):
        out = fn(*inputs[0])
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for inp in inputs[1:]:
            out = fn(*inp)
        np.asarray(jax.tree.leaves(out)[0])
        return 1e3 * (time.perf_counter() - t0) / (len(inputs) - 1)

    out = {}
    out["frontend"] = timeit(ff, [(x, m) for x, m in frames[4:]])
    ostep = jax.jit(lambda s, f: od.odometry_step(s, f, cfg))
    out["odometry"] = timeit(ostep, [(state.odom, f) for f in feats])
    q0, t0_ = jnp.asarray([1., 0, 0, 0]), jnp.zeros(3)
    mstep = jax.jit(lambda s, c, f: mp.mapping_step(s, c, f, q0, t0_, cfg))
    out["mapping"] = timeit(
        mstep, [(state.map, f.less_sharp, f.less_flat) for f in feats])
    return {k: round(v, 2) for k, v in out.items()}


def verify_pallas_kernels():
    """Mosaic-compiled kernels vs NumPy references ON THE REAL CHIP.

    The interpret-mode CPU tests pin kernel semantics; this asserts the
    *compiled* kernels agree too (VERDICT r2 weak #5). Raises (so bench
    refuses to print its JSON line) on any mismatch."""
    rng = np.random.default_rng(7)

    # --- pallas_knn.knn_select on block-planar candidate rows ------------
    from aloam_tpu.ops.pallas_knn import knn_select
    n, bw = 512, 48
    crow = rng.uniform(-5, 5, size=(n, 8 * 3 * bw)).astype(np.float32)
    q = rng.uniform(-5, 5, size=(n, 4)).astype(np.float32)
    q[:, 3] = 0.0
    q[::13, 3] = 1.0
    d2_p, nb_p = knn_select(jnp.asarray(crow), jnp.asarray(q), 5, bw=bw)
    d2_p, nb_p = np.asarray(d2_p), np.asarray(nb_p)
    blk = crow.reshape(n, 8, 3, bw)
    xs = blk[:, :, 0, :].reshape(n, 8 * bw)
    ys = blk[:, :, 1, :].reshape(n, 8 * bw)
    zs = blk[:, :, 2, :].reshape(n, 8 * bw)
    d2 = ((xs - q[:, 0:1]) ** 2 + (ys - q[:, 1:2]) ** 2
          + (zs - q[:, 2:3]) ** 2)
    d2[q[:, 3] > 0] = np.inf
    for j in range(5):
        am = np.argmin(d2, axis=1)
        ref_d = d2[np.arange(n), am]
        ok = np.isfinite(ref_d)
        assert np.allclose(d2_p[ok, j], ref_d[ok], rtol=1e-4, atol=1e-4), \
            "compiled knn_select d2 mismatch"
        assert np.allclose(nb_p[ok, j, 0], xs[np.arange(n), am][ok],
                           atol=1e-4), "compiled knn_select nbr mismatch"
        d2[np.arange(n), am] = np.inf

    # --- pallas_assoc.assoc_cell (fused mapping association) --------------
    # ALL kernels were proven on-chip in round 4, so every kernel now
    # hard-fails the whole run on a compile failure or compiled-output
    # mismatch (VERDICT r4 #7) — a quiet XLA-twin fallback would silently
    # drop the headline ~30%. The only way to bench without a kernel is an
    # EXPLICIT ALOAM_DISABLE_PALLAS=<name>, which skips its verification
    # and is recorded in the JSON ("pallas_disabled"), never silent.
    user_disabled = {s.strip() for s in os.environ.get(
        "ALOAM_DISABLE_PALLAS", "").split(",") if s.strip()}
    if "all" in user_disabled:
        user_disabled |= {"knn", "assoc", "insert", "voxel", "odom",
                          "select", "lm"}
    disabled = [f"{n}: disabled by ALOAM_DISABLE_PALLAS"
                for n in sorted(user_disabled - {"all"})]

    from aloam_tpu.ops.pallas_assoc import assoc_cell, assoc_xla
    tq, bwa = 256, 48
    wa = 8 * bwa
    n_cells, nq = 96, 2 * tq
    pad_rows = n_cells + tq + 8   # ASSOC_PAD contract (+8: align8 window)
    cand = rng.uniform(-1.0, 1.0,
                       size=(pad_rows, 8, 3, bwa)).astype(np.float32)
    far = rng.uniform(size=(pad_rows, 8, 1, bwa)) < 0.1
    cand_flat = np.where(far, 1e9, cand).astype(np.float32).reshape(
        pad_rows, 3 * wa)
    cida = np.sort(rng.integers(0, n_cells, size=nq)).astype(np.int32)
    qa = rng.uniform(-0.8, 0.8, size=(nq, 3)).astype(np.float32)
    cid0 = cida[::tq].copy()
    q8 = np.zeros((nq, 8), np.float32)
    q8[:, :3], q8[:, 4] = qa, cida - np.repeat(cid0, tq)
    blk = cand_flat[cida].reshape(nq, 8, 3, bwa)
    xsa = blk[:, :, 0, :].reshape(nq, wa)
    ysa = blk[:, :, 1, :].reshape(nq, wa)
    zsa = blk[:, :, 2, :].reshape(nq, wa)
    d2a = ((xsa - qa[:, 0:1]) ** 2 + (ysa - qa[:, 1:2]) ** 2
           + (zsa - qa[:, 2:3]) ** 2)
    dsl, nbl = [], []
    for _ in range(5):
        am = np.argmin(d2a, axis=1)
        dsl.append(d2a[np.arange(nq), am].copy())
        nbl.append(np.stack([xsa[np.arange(nq), am],
                             ysa[np.arange(nq), am],
                             zsa[np.arange(nq), am]], -1))
        d2a[np.arange(nq), am] = np.inf
    d2k = np.stack(dsl, -1)
    near = np.stack(nbl, -2)
    if "assoc" not in user_disabled:
        for kind, okc, ncol in (("surf", 4, 4), ("corner", 6, 6)):
            ref = np.asarray(assoc_xla(jnp.asarray(d2k), jnp.asarray(near),
                                       1.0, kind))
            out = np.asarray(assoc_cell(
                jnp.asarray(cand_flat), jnp.asarray(cid0), jnp.asarray(q8),
                kind, 1.0, tq=tq, bw=bwa))
            # ok flags may flip only on threshold-knife-edge rows (compiled
            # f32 scalar chain vs einsum); coords must agree on shared-ok rows
            agree = np.mean(ref[:, okc] == out[:, okc])
            assert agree > 0.995, \
                f"compiled assoc_cell {kind} ok flags {agree}"
            both = (ref[:, okc] > 0) & (out[:, okc] > 0)
            assert both.sum() > 20, f"assoc_cell {kind} fit path unexercised"
            assert np.allclose(out[both][:, :ncol], ref[both][:, :ncol],
                               atol=5e-3), f"compiled assoc_cell {kind} coords"

    # --- pallas_insert.merge_tiles (fused map-insert merge/append) --------
    from aloam_tpu.ops import gridmap as gm
    from aloam_tpu.ops.pallas_insert import merge_tiles
    bsz_i, cap_c, cap_p, bki = 2, 64, 16, 48
    cs_i, leaf_i = 2.0, 0.4
    ptsi = rng.uniform(-20, 20, size=(bsz_i, cap_c, 3, bki)).astype(
        np.float32)
    occ = rng.uniform(size=(bsz_i, cap_c, bki)) > 0.4
    celli = np.where(occ[:, :, None, :],
                     np.floor(ptsi / cs_i).astype(np.int32), gm._EMPTY)
    voxi = np.floor(ptsi / leaf_i).astype(np.int32)
    voxi = ((voxi[:, :, 0] * 73856093) ^ (voxi[:, :, 1] * 19349663)
            ^ (voxi[:, :, 2] * 83492791))
    ptsi = np.where(occ[:, :, None, :], ptsi, 1e9).astype(np.float32)
    inti = rng.uniform(0, 1, size=(bsz_i, cap_c, bki)).astype(np.float32)
    ppl = [rng.uniform(-20, 20, size=(bsz_i, cap_c, cap_p)).astype(
        np.float32) for _ in range(3)]
    ppi_ = rng.uniform(0, 1, size=(bsz_i, cap_c, cap_p)).astype(np.float32)
    pvoxi = ((np.floor(ppl[0] / leaf_i).astype(np.int32) * 73856093)
             ^ (np.floor(ppl[1] / leaf_i).astype(np.int32) * 19349663)
             ^ (np.floor(ppl[2] / leaf_i).astype(np.int32) * 83492791))
    copy = rng.uniform(size=(bsz_i, cap_c, cap_p)) < 0.3
    which = rng.integers(0, bki, size=(bsz_i, cap_c, cap_p))
    pvoxi = np.where(copy, np.take_along_axis(voxi, which, axis=2), pvoxi)
    cnti = rng.integers(0, cap_p + 4, size=(bsz_i, cap_c)).astype(np.int32)
    centeri = rng.integers(-4, 4, size=(bsz_i, 3)).astype(np.int32)
    windowi = np.array([5, 5, 3], np.int32)
    argsi = [jnp.asarray(a) for a in (
        ptsi.reshape(bsz_i, cap_c, 3 * bki), inti,
        celli.reshape(bsz_i, cap_c, 3 * bki), voxi,
        ppl[0], ppl[1], ppl[2], ppi_, pvoxi, cnti, centeri, windowi)]
    if "insert" not in user_disabled:
        ref_m = gm._merge_dense_xla(*argsi, cs_i, leaf_i)
        out_m = merge_tiles(*argsi, cs_i, leaf_i)
        for nm, a, b in zip(["px", "py", "pz", "int", "cx", "cy", "cz",
                             "vox", "merged", "appended", "evicted"],
                            ref_m, out_m):
            a, b = np.asarray(a), np.asarray(b)
            tol = 0 if a.dtype.kind == "i" else 1e-5
            assert np.allclose(a, b, atol=tol), \
                f"compiled merge_tiles {nm} mismatch"

    # --- pallas_voxel.segmented_prefix_sums --------------------------------
    from aloam_tpu.ops.pallas_voxel import segmented_prefix_sums
    # nv > chunk (2560): exercises the cross-chunk carry with the same
    # compiled block shapes as the biggest real call (mapping, N = 40960)
    rv, nv = 16, 6400
    heads = rng.uniform(size=(rv, nv)) < 0.2
    heads[:, 0] = True
    chans = tuple(rng.uniform(-20, 20, size=(rv, nv)).astype(np.float32)
                  for _ in range(5))
    if "voxel" not in user_disabled:
        outs_v = segmented_prefix_sums(tuple(jnp.asarray(c) for c in chans),
                                       jnp.asarray(heads))
        # reference: plain numpy segmented inclusive scan
        for c, o in zip(chans, outs_v):
            o = np.asarray(o)
            ref_v = np.zeros_like(c)
            for rr in range(rv):
                acc = 0.0
                for j in range(nv):
                    acc = c[rr, j] if heads[rr, j] else acc + c[rr, j]
                    ref_v[rr, j] = acc
            assert np.allclose(o, ref_v, atol=2e-3), \
                "compiled segmented_prefix_sums mismatch"

    # --- pallas_odom.window_mins -----------------------------------------
    from aloam_tpu.ops.pallas_odom import window_mins
    bsz, qn, m = 2, 256, 2048
    sel = rng.uniform(-10, 10, size=(bsz, qn, 3)).astype(np.float32)
    ref = rng.uniform(-10, 10, size=(bsz, m, 3)).astype(np.float32)
    ring = np.sort(rng.integers(0, 16, size=(bsz, m)), axis=1)
    mask = rng.uniform(size=(bsz, m)) > 0.1
    big = np.float32(1e9)
    ref_p = np.concatenate(
        [np.where(mask[:, None, :], np.moveaxis(ref, 1, 2), big),
         np.where(mask[:, :, None], ring[..., None].astype(np.float32),
                  big).reshape(bsz, 1, m)], axis=1)
    pal = window_mins(jnp.asarray(sel), jnp.asarray(ref_p), 2.5)
    d2_all = np.sum((sel[:, :, None, :] - ref[:, None, :, :]) ** 2, axis=-1)
    d2_all[~np.broadcast_to(mask[:, None, :], d2_all.shape)] = np.inf
    nn_ref = np.argmin(d2_all, axis=2)
    d2_nn_ref = np.min(d2_all, axis=2)
    assert np.allclose(np.asarray(pal[0]), d2_nn_ref, rtol=1e-3,
                       atol=1e-3), "compiled window_mins d2_nn mismatch"
    # index agreement wherever the two nearest aren't a rounding-tie
    srt = np.sort(d2_all, axis=2)
    clear = (srt[..., 1] - srt[..., 0]) > 1e-3
    assert np.mean(np.asarray(pal[1])[clear] == nn_ref[clear]) == 1.0, \
        "compiled window_mins nn index mismatch"
    ring_nn = np.take_along_axis(ring, nn_ref, axis=1)
    adiff = np.abs(ring[:, None, :] - ring_nn[:, :, None])
    d2_diff = np.where((adiff >= 1) & (adiff <= 2.5), d2_all, np.inf)
    assert np.allclose(np.asarray(pal[2]), np.min(d2_diff, axis=2),
                       rtol=1e-3, atol=1e-3), \
        "compiled window_mins d2_diff mismatch"

    # ring_seg > 0 (the pass-2 chunk skip the in-pipeline calls use) must
    # be output-identical to the exhaustive compiled scan on a
    # ring-segmented cloud (head-packed segments, poisoned tails). The
    # geometry is RING-CORRELATED (ring r near z = 3r, queries z-sorted)
    # and m_chunk=256 gives 8 chunks, so the skip branch genuinely
    # engages under Mosaic — uncorrelated clouds never skip (advisor r3)
    n_rings, seg = 16, 128
    ms = n_rings * seg
    ring_s = np.repeat(np.arange(n_rings), seg)[None].repeat(bsz, 0)
    fill = rng.integers(seg // 2, seg, size=(bsz, n_rings))
    mask_s = (np.arange(seg)[None, None, :]
              < fill[:, :, None]).reshape(bsz, ms)
    ref_s = np.stack(
        [rng.uniform(-10, 10, size=(bsz, ms)),
         rng.uniform(-10, 10, size=(bsz, ms)),
         3.0 * ring_s + rng.uniform(-0.5, 0.5, size=(bsz, ms))],
        axis=-1).astype(np.float32)
    qz = np.sort(rng.uniform(0, 3.0 * (n_rings - 1), size=(bsz, qn)),
                 axis=1)
    sel_s = np.stack([rng.uniform(-10, 10, size=(bsz, qn)),
                      rng.uniform(-10, 10, size=(bsz, qn)), qz],
                     axis=-1).astype(np.float32)
    ref_sp = np.concatenate(
        [np.where(mask_s[:, None, :], np.moveaxis(ref_s, 1, 2), big),
         np.where(mask_s[:, :, None], ring_s[..., None].astype(np.float32),
                  big).reshape(bsz, 1, ms)], axis=1)
    full = window_mins(jnp.asarray(sel_s), jnp.asarray(ref_sp), 2.5,
                       tq=64, m_chunk=256)
    skip = window_mins(jnp.asarray(sel_s), jnp.asarray(ref_sp), 2.5,
                       tq=64, m_chunk=256, ring_seg=seg)
    for j, (a, b) in enumerate(zip(full, skip)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"compiled window_mins ring_seg skip output {j} mismatch"
    # assert the constructed data actually yields skippable chunks
    br = np.take_along_axis(
        ring_s, np.asarray(full[1]), axis=1).astype(float)
    skippable = 0
    for b in range(bsz):
        for t in range(qn // 64):
            tb = br[b, t * 64:(t + 1) * 64]
            lo, hi = tb.min() - 2.5, tb.max() + 2.5
            for c in range(ms // 256):
                if not (((c + 1) * 256 - 1) // seg >= lo
                        and (c * 256) // seg <= hi):
                    skippable += 1
    assert skippable > 0, "ring_seg check exercised no skip branch"

    # --- pallas_lm.lm_fused (one-dispatch LM solve) ------------------------
    if "lm" not in user_disabled:
        from aloam_tpu import solver as slv
        from aloam_tpu import geometry as geo
        from aloam_tpu.ops import pallas_lm
        bl, ne_l, np_l = 3, 256, 384
        e_p = rng.normal(scale=8.0, size=(bl, ne_l, 3)).astype(np.float32)
        e_a = e_p + rng.normal(scale=0.05,
                               size=(bl, ne_l, 3)).astype(np.float32)
        dirs = rng.normal(size=(bl, ne_l, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        e_m = rng.random((bl, ne_l)) < 0.7
        p_p = rng.normal(scale=8.0, size=(bl, np_l, 3)).astype(np.float32)
        nrm = rng.normal(size=(bl, np_l, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        d_l = (-np.sum(nrm * p_p, axis=-1) + rng.normal(
            scale=0.02, size=(bl, np_l))).astype(np.float32)
        p_m = rng.random((bl, np_l)) < 0.7
        e_p[~e_m] = np.inf          # masked padding must not leak
        edges_l = slv.EdgeFactors(
            p=jnp.asarray(e_p), a=jnp.asarray(e_a),
            b=jnp.asarray(e_a + 0.4 * dirs), mask=jnp.asarray(e_m))
        planes_l = slv.PlaneFactors(
            p=jnp.asarray(p_p), n=jnp.asarray(nrm), d=jnp.asarray(d_l),
            mask=jnp.asarray(p_m))
        q0l = jnp.broadcast_to(geo.qidentity(), (bl, 4))
        t0l = jnp.asarray(rng.normal(
            scale=0.1, size=(bl, 3)).astype(np.float32))
        out_l = np.asarray(pallas_lm.lm_fused(
            pallas_lm.pack_edge_channels(edges_l),
            pallas_lm.pack_plane_channels(planes_l),
            jnp.concatenate([q0l, t0l, jnp.zeros((bl, 1))], axis=1),
            4, 0.1))
        q_r, t_r, st_r = jax.vmap(lambda e, p, qq, tt: slv.lm_solve(
            (e, p), qq, tt, 4, 0.1))(edges_l, planes_l, q0l, t0l)
        assert np.allclose(out_l[:, 0:4], np.asarray(q_r), atol=5e-5), \
            "compiled lm_fused quaternion mismatch"
        assert np.allclose(out_l[:, 4:7], np.asarray(t_r), atol=5e-4), \
            "compiled lm_fused translation mismatch"
        assert np.array_equal(out_l[:, 9].astype(np.int32),
                              np.asarray(st_r.n_factors)), \
            "compiled lm_fused n_factors mismatch"
    return disabled


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    cfg = PRESETS["HDL-64"]

    pallas_disabled = []
    if jax.default_backend() == "tpu":
        pallas_disabled = verify_pallas_kernels()

    n_single = int(os.environ.get("BENCH_FRAMES", "16"))
    ms_single, ate_single = bench_single(cfg, n_single)

    result = {
        "metric": "scans_per_sec_hdl64_odom_map",
        "unit": "scans/sec/chip",
        "device_kind": jax.devices()[0].device_kind,
        "ms_per_scan_single": round(1e3 * ms_single, 2),
        "ate_rmse_m": round(ate_single, 4),
        "frames": n_single,
    }

    if batch > 0:
        bcfg = batched_bench_cfg(cfg)
        # ≥32 steady-state frames so the headline is self-consistent with
        # direct step timings (round-2 timed 8 frames and understated)
        n_b = int(os.environ.get("BENCH_BATCH_FRAMES", "32"))
        # batch ladder: measure every size and report the best (the
        # round-3 kernels removed the per-query candidate transient that
        # OOM'd B=24+ in round 2, but HBM-pressure slowdowns are also
        # possible — only a measurement decides); failures are recorded
        ladder = sorted({batch, 16} & set(range(1, batch + 1)), reverse=True)
        fell_back, per_batch = [], {}
        best = None

        def run_size(bi):
            nonlocal best
            try:
                sps, spread, ate_b, ate_med, flops = bench_batched(
                    bcfg, bi, n_b)
                per_batch[str(bi)] = round(sps, 2)
                if best is None or sps > best[0]:
                    best = (sps, spread, ate_b, ate_med, flops, bi)
            except Exception as e:  # noqa: BLE001 — e.g. RESOURCE_EXHAUSTED
                fell_back.append(f"B={bi}: {type(e).__name__}")

        for bi in ladder:
            run_size(bi)
        # near-linear scaling 16 -> 32 means latency still dominates:
        # probe 64 too (only from the default 32-topped ladder)
        if (ladder[:1] == [32]
                and per_batch.get("32", 0) > 1.7 * per_batch.get("16", 1e9)):
            run_size(64)
        if best is None:
            raise RuntimeError(f"every batch size failed: {fell_back}")
        sps, spread, ate_b, ate_med, flops, batch = best
        result.update(value=round(sps, 2), batch=batch,
                      blocks=_N_BLOCKS, spread_sps=round(spread, 2),
                      ate_batched_max_m=round(ate_b, 4),
                      ate_batched_med_m=round(ate_med, 4),
                      batch_frames=n_b, batch_ladder=per_batch)
        # self-describing sizing: the headline is measured at the bench
        # scene's sensor-spec caps, not the PRESET's (advisor r4)
        result["bench_caps"] = {"ring_cap": bcfg.ring_cap,
                                "n_raw": bcfg.n_raw,
                                "less_flat_cap": bcfg.less_flat_cap}
        if fell_back:
            result["batch_fallback"] = fell_back
        # KITTI-shaped rung (VERDICT r4 #5): same run at the untrimmed
        # HDL-64 PRESET caps a real-KITTI user gets, on record next to
        # the sensor-spec headline. BENCH_PRESET_RUNG=0 skips (A/B tools)
        if os.environ.get("BENCH_PRESET_RUNG", "1") != "0":
            pcfg = cfg.replace(map_query_chunk=bcfg.map_query_chunk)
            try:
                sps_p, _, ate_p, _, _ = bench_batched(pcfg, batch, n_b)
                result["value_preset"] = round(sps_p, 2)
                result["ate_preset_max_m"] = round(ate_p, 4)
                result["preset_caps"] = {"ring_cap": pcfg.ring_cap,
                                         "n_raw": pcfg.n_raw,
                                         "less_flat_cap":
                                             pcfg.less_flat_cap}
            except Exception as e:  # noqa: BLE001 — rung must not kill
                result["value_preset_error"] = type(e).__name__
        if flops:
            # model FLOPs utilization vs the chip's bf16 peak, keyed by
            # the measured device kind — SLAM is gather/sort-bound, so
            # this is expected to be <<1% and is tracked to keep the
            # bound honest; unknown chips report flops but no MFU
            step_s = batch / sps
            result["step_gflops"] = round(flops / 1e9, 1)
            peak = _PEAK_FLOPS.get(jax.devices()[0].device_kind)
            if peak:
                result["mfu_pct"] = round(100.0 * flops / step_s / peak, 4)
    else:
        result.update(value=round(1.0 / ms_single, 2), batch=0)

    result["vs_baseline"] = round(result["value"] / 10.0, 2)
    if pallas_disabled:
        result["pallas_disabled"] = pallas_disabled
    result["vs_target"] = round(result["value"] / 500.0, 3)

    if os.environ.get("BENCH_STAGES"):
        result["stage_ms"] = bench_stages(cfg)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
