"""NumPy (f64) oracle of the FULL odometry+mapping pipeline.

Clean-room reimplementation of the reference's trajectory semantics —
scan-to-scan odometry (``/root/reference/src/laserOdometry.cpp:267-597``)
chained into scan-to-map refinement (``/root/reference/src/
laserMapping.cpp:231-802``) — in double precision with brute-force exact
searches, for pinning the engine's trajectories (VERDICT r1 task 6: the
strongest accuracy anchor available without KITTI data on this machine).

Matches the engine's solver *schedule* (2 rounds x 4 Marquardt-damped
iterations per stage, Huber 0.1, left-multiplied quaternion retraction,
constant-velocity warm start) so the only differences are f64-vs-f32
rounding and tie-breaks.
"""

from __future__ import annotations

import numpy as np

from tests.oracle import registration as oreg
from tests.oracle import odometry as ood

HUBER = 0.1


# ---------------------------------------------------------------- quat math
def qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw])


def qconj(q):
    return q * np.array([1.0, -1, -1, -1])


def qrot(q, v):
    u, w = q[1:], q[0]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def exp_so3(dtheta):
    ang = np.linalg.norm(dtheta)
    if ang < 1e-12:
        return np.array([1.0, 0.5 * dtheta[0], 0.5 * dtheta[1],
                         0.5 * dtheta[2]])
    axis = dtheta / ang
    return np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])


def retract(q, dtheta):
    out = qmul(exp_so3(dtheta), q)
    return out / np.linalg.norm(out)


# ------------------------------------------------------------------- solver
def _huber_cost(s):
    d2 = HUBER * HUBER
    return np.where(s <= d2, s, 2 * HUBER * np.sqrt(np.maximum(s, 1e-300))
                    - d2)


def _residuals(factors, q, t):
    """factors: list of ("edge", p, a, b) / ("plane", p, n, d) arrays."""
    rs, js = [], []
    for kind, arrs in factors:
        if not len(arrs[0]):
            continue
        if kind == "edge":
            p, a, b = arrs
            u = qrot_rows(q, p) + t
            rp = u - t
            dv = a - b
            inv = 1.0 / np.maximum(np.linalg.norm(dv, axis=1,
                                                  keepdims=True), 1e-12)
            r = np.cross(u - a, u - b) * inv
            j_u = -skew_rows(dv) * inv[..., None]
            eye = np.eye(3)
            j_th = (rp[:, :, None] * dv[:, None, :]
                    - (dv * rp).sum(1)[:, None, None] * eye) * inv[..., None]
            rs.append(r)
            js.append(np.concatenate([j_th, j_u], axis=2))
        else:
            p, n, d = arrs
            u = qrot_rows(q, p) + t
            rp = u - t
            r = ((n * u).sum(1) + d)[:, None]
            j_th = np.cross(rp, n)
            js.append(np.concatenate([j_th, n], axis=1)[:, None, :])
            rs.append(r)
    return rs, js


def qrot_rows(q, pts):
    u, w = q[1:], q[0]
    uv = np.cross(np.broadcast_to(u, pts.shape), pts)
    return pts + 2.0 * (w * uv + np.cross(np.broadcast_to(u, pts.shape), uv))


def skew_rows(v):
    n = v.shape[0]
    out = np.zeros((n, 3, 3))
    out[:, 0, 1] = -v[:, 2]
    out[:, 0, 2] = v[:, 1]
    out[:, 1, 0] = v[:, 2]
    out[:, 1, 2] = -v[:, 0]
    out[:, 2, 0] = -v[:, 1]
    out[:, 2, 1] = v[:, 0]
    return out


def _cost(factors, q, t):
    rs, _ = _residuals(factors, q, t)
    return sum(0.5 * _huber_cost((r * r).sum(1)).sum() for r in rs)


def lm_solve(factors, q0, t0, n_iters):
    """Mirror of solver.lm_solve (fixed iterations, Marquardt damping,
    accept/reject, update-norm clamps) in f64."""
    q, t, lam = q0.copy(), t0.copy(), 1e-4
    cost = _cost(factors, q, t)
    for _ in range(n_iters):
        rs, js = _residuals(factors, q, t)
        h = np.zeros((6, 6))
        g = np.zeros(6)
        for r, j in zip(rs, js):
            s = (r * r).sum(1)
            d2 = HUBER * HUBER
            w = np.where(s <= d2, 1.0,
                         HUBER / np.sqrt(np.maximum(s, 1e-300)))
            jw = j * w[:, None, None]
            h += np.einsum("nbi,nbj->ij", jw, j)
            g += np.einsum("nbi,nb->i", jw, r)
        diag = np.diag(np.diagonal(h)) + 1e-8 * np.eye(6)
        try:
            delta = np.linalg.solve(h + lam * diag, -g)
        except np.linalg.LinAlgError:
            delta = np.zeros(6)
        nth, ntr = np.linalg.norm(delta[:3]), np.linalg.norm(delta[3:])
        if nth > 0.5:
            delta[:3] *= 0.5 / nth
        if ntr > 5.0:
            delta[3:] *= 5.0 / ntr
        q_new = retract(q, delta[:3])
        t_new = t + delta[3:]
        cost_new = _cost(factors, q_new, t_new)
        if np.isfinite(cost_new) and cost_new < cost:
            q, t, cost = q_new, t_new, cost_new
            lam = max(lam / 3.0, 1e-7)
        else:
            lam = min(lam * 10.0, 1e4)
    return q, t


# ----------------------------------------------------------------- odometry
def odometry_frame(sharp, flat, last_ls, last_lf, q_lc, t_lc, rounds=2,
                   iters=4):
    """One odometry frame (laserOdometry.cpp:277-506): per round, re-run the
    correspondence walks at the current estimate, then <=4 LM iterations."""
    for _ in range(rounds):
        sel_s = qrot_rows(q_lc, sharp[:, :3]) + t_lc
        ea, eb, ep = [], [], []
        for i in range(sharp.shape[0]):
            nn, ind2 = ood.edge_corr(sel_s[i], last_ls[:, :3], last_ls[:, 3])
            if nn >= 0 and ind2 >= 0:
                ep.append(sharp[i, :3])
                ea.append(last_ls[nn, :3])
                eb.append(last_ls[ind2, :3])
        sel_f = qrot_rows(q_lc, flat[:, :3]) + t_lc
        pp, pn, pd = [], [], []
        for i in range(flat.shape[0]):
            nn, ind2, ind3 = ood.plane_corr(sel_f[i], last_lf[:, :3],
                                            last_lf[:, 3])
            if nn >= 0 and ind2 >= 0 and ind3 >= 0:
                a = last_lf[nn, :3]
                n = np.cross(a - last_lf[ind2, :3], a - last_lf[ind3, :3])
                nn_ = np.linalg.norm(n)
                if nn_ <= 1e-6:
                    continue
                n = n / nn_
                pp.append(flat[i, :3])
                pn.append(n)
                pd.append(-float(n @ a))
        factors = [("edge", (np.asarray(ep).reshape(-1, 3),
                             np.asarray(ea).reshape(-1, 3),
                             np.asarray(eb).reshape(-1, 3))),
                   ("plane", (np.asarray(pp).reshape(-1, 3),
                              np.asarray(pn).reshape(-1, 3),
                              np.asarray(pd).reshape(-1)))]
        q_lc, t_lc = lm_solve(factors, q_lc, t_lc, iters)
    return q_lc, t_lc


# ------------------------------------------------------------------ mapping
def _knn5(sel, mp, chunk=512):
    """Exact 5-NN of each query row against ``mp``: returns (idx (Q,5) in
    increasing-distance order, d2 of the 5th (Q,)). Chunked argpartition —
    same set and order as ``np.argsort(d2)[:5]`` for distinct distances."""
    q_n = sel.shape[0]
    idx = np.empty((q_n, 5), np.int64)
    d5 = np.empty(q_n)
    for i0 in range(0, q_n, chunk):
        s = sel[i0:i0 + chunk]
        d2 = ((s[:, None, :] - mp[None]) ** 2).sum(-1)
        part = np.argpartition(d2, 4, axis=1)[:, :5]
        dsel = np.take_along_axis(d2, part, 1)
        order = np.argsort(dsel, axis=1, kind="stable")
        idx[i0:i0 + chunk] = np.take_along_axis(part, order, 1)
        d5[i0:i0 + chunk] = np.take_along_axis(dsel, order, 1)[:, 4]
    return idx, d5


def _corner_assoc_vec(map_corner, corner_stack, sel, gate_sq, eigen_ratio,
                      edge_half):
    """Vectorized twin of mapping_frame's per-point corner loop (gated 5-NN
    + PCA line fit, laserMapping.cpp:562-649)."""
    idx, d5 = _knn5(sel, map_corner)
    keep = d5 < gate_sq
    near = map_corner[idx]                              # (Q, 5, 3)
    c = near.mean(1)
    x = near - c[:, None]
    cov = np.einsum("qij,qik->qjk", x, x)
    vals, vecs = np.linalg.eigh(cov)
    keep &= vals[:, 2] > eigen_ratio * vals[:, 1]
    direction = vecs[:, :, 2]
    return (corner_stack[keep], (c + edge_half * direction)[keep],
            (c - edge_half * direction)[keep])


def _surf_assoc_vec(map_surf, surf_stack, sel, gate_sq, plane_tol):
    """Vectorized twin of the per-point surf loop (gated 5-NN + LSQ plane
    fit A·n = −1, laserMapping.cpp:651-719). pinv == lstsq for these
    full-rank 5x3 systems (both SVD minimum-norm)."""
    idx, d5 = _knn5(sel, map_surf)
    keep = d5 < gate_sq
    near = map_surf[idx]                                # (Q, 5, 3)
    n = -np.linalg.pinv(near).sum(-1)                   # pinv @ (-1 vector)
    norm = np.linalg.norm(n, axis=1)
    keep &= norm >= 1e-12
    norm = np.maximum(norm, 1e-300)
    n_hat = n / norm[:, None]
    d = 1.0 / norm
    resid = np.abs(np.einsum("qij,qj->qi", near, n_hat) + d[:, None])
    keep &= np.all(resid <= plane_tol, axis=1)
    return surf_stack[keep], n_hat[keep], d[keep]


def mapping_frame_vec(map_corner, map_surf, corner_stack, surf_stack,
                      q_w, t_w, rounds=2, iters=4, gate_sq=1.0,
                      eigen_ratio=3.0, plane_tol=0.2, edge_half=0.1,
                      min_corner=10, min_surf=50):
    """mapping_frame with the per-point association loops vectorized
    (VERDICT r3 #4: the loops capped the oracle pin at 2-4 frames). Factor
    math is identical up to summation order; tested equivalent to the
    literal loop in test_pipeline_oracle."""
    if map_corner.shape[0] <= min_corner or map_surf.shape[0] <= min_surf:
        return q_w, t_w
    for _ in range(rounds):
        sel = qrot_rows(q_w, corner_stack) + t_w
        ep, ea, eb = _corner_assoc_vec(map_corner, corner_stack, sel,
                                       gate_sq, eigen_ratio, edge_half)
        sel = qrot_rows(q_w, surf_stack) + t_w
        pp, pn, pd = _surf_assoc_vec(map_surf, surf_stack, sel,
                                     gate_sq, plane_tol)
        factors = [("edge", (ep.reshape(-1, 3), ea.reshape(-1, 3),
                             eb.reshape(-1, 3))),
                   ("plane", (pp.reshape(-1, 3), pn.reshape(-1, 3),
                              pd.reshape(-1)))]
        q_w, t_w = lm_solve(factors, q_w, t_w, iters)
    return q_w, t_w


def mapping_frame(map_corner, map_surf, corner_stack, surf_stack,
                  q_w, t_w, rounds=2, iters=4, gate_sq=1.0,
                  eigen_ratio=3.0, plane_tol=0.2, edge_half=0.1,
                  min_corner=10, min_surf=50):
    """One mapping frame (laserMapping.cpp:554-734): gated 5-NN + PCA edge
    factors and LSQ plane factors against the accumulated map clouds."""
    if map_corner.shape[0] <= min_corner or map_surf.shape[0] <= min_surf:
        return q_w, t_w
    for _ in range(rounds):
        ea, eb, ep = [], [], []
        sel = qrot_rows(q_w, corner_stack) + t_w
        for i in range(corner_stack.shape[0]):
            d2 = ((map_corner - sel[i]) ** 2).sum(1)
            idx = np.argsort(d2)[:5]
            if d2[idx[4]] >= gate_sq:
                continue
            near = map_corner[idx]
            c = near.mean(0)
            cov = (near - c).T @ (near - c)
            vals, vecs = np.linalg.eigh(cov)
            if vals[2] <= eigen_ratio * vals[1]:
                continue
            direction = vecs[:, 2]
            ep.append(corner_stack[i])
            ea.append(c + edge_half * direction)
            eb.append(c - edge_half * direction)
        pp, pn, pd = [], [], []
        sel = qrot_rows(q_w, surf_stack) + t_w
        for i in range(surf_stack.shape[0]):
            d2 = ((map_surf - sel[i]) ** 2).sum(1)
            idx = np.argsort(d2)[:5]
            if d2[idx[4]] >= gate_sq:
                continue
            near = map_surf[idx]
            n, *_ = np.linalg.lstsq(near, -np.ones(5), rcond=None)
            norm = np.linalg.norm(n)
            if norm < 1e-12:
                continue
            n_hat = n / norm
            d = 1.0 / norm
            if np.any(np.abs(near @ n_hat + d) > plane_tol):
                continue
            pp.append(surf_stack[i])
            pn.append(n_hat)
            pd.append(d)
        factors = [("edge", (np.asarray(ep).reshape(-1, 3),
                             np.asarray(ea).reshape(-1, 3),
                             np.asarray(eb).reshape(-1, 3))),
                   ("plane", (np.asarray(pp).reshape(-1, 3),
                              np.asarray(pn).reshape(-1, 3),
                              np.asarray(pd).reshape(-1)))]
        q_w, t_w = lm_solve(factors, q_w, t_w, iters)
    return q_w, t_w


def _voxel_merge(store: dict, pts: np.ndarray, leaf: float):
    """Insert-time iterated voxel centroid (laserMapping.cpp:787-801 via
    the engine's merge-on-insert redesign): store maps voxel index ->
    centroid; a new point in an occupied voxel becomes the midpoint."""
    for p in pts:
        key = tuple(np.floor(p / leaf).astype(int))
        if key in store:
            store[key] = 0.5 * (store[key] + p)
        else:
            store[key] = p.copy()


def run_pipeline(scans, scan_lines=16, line_res=0.2, plane_res=0.4,
                 min_range=0.3, mapping=None, checkpoint_path=None,
                 checkpoint_every=20):
    """Full oracle trajectory over a list of raw scans. Returns
    (t_odom (F,3), t_map (F,3), q_map (F,4)). ``mapping`` selects the
    mapping-frame implementation (default: the vectorized twin; pass
    ``mapping_frame`` for the literal per-point loop).

    ``checkpoint_path``: optional pickle path; the full loop state is
    dumped there every ``checkpoint_every`` frames and resumed from on
    the next call (long oracle runs cost hours of f64 NumPy — a killed
    run must not lose its progress). The caller owns key-invalidating
    the path when the oracle sources or scene change
    (tests/oracle/cache.py folds the source md5 into the filename)."""
    if mapping is None:
        mapping = mapping_frame_vec
    q_lc = np.array([1.0, 0, 0, 0])   # frame-to-frame (warm start carries)
    t_lc = np.zeros(3)
    q_wod = np.array([1.0, 0, 0, 0])  # odometry world pose
    t_wod = np.zeros(3)
    q_wm = np.array([1.0, 0, 0, 0])   # odom-world -> map-world correction
    t_wm = np.zeros(3)
    corner_store: dict = {}
    surf_store: dict = {}
    last_ls = last_lf = None
    t_odom, t_map, q_map = [], [], []
    f_start = 0

    if checkpoint_path is not None:
        import os
        import pickle
        if os.path.exists(checkpoint_path):
            with open(checkpoint_path, "rb") as fh:
                ck = pickle.load(fh)
            (f_start, q_lc, t_lc, q_wod, t_wod, q_wm, t_wm, corner_store,
             surf_store, last_ls, last_lf, t_odom, t_map, q_map) = ck

    for f, scan in enumerate(scans):
        if f < f_start:
            continue
        out = oreg.register_scan(np.asarray(scan, np.float64), scan_lines,
                                 min_range=min_range)
        ls = out["less_sharp"]
        lf = out["less_flat"]
        sharp, flat = out["sharp"], out["flat"]

        if last_ls is not None:
            q_lc, t_lc = odometry_frame(sharp, flat, last_ls, last_lf,
                                        q_lc, t_lc)
            # world accumulation (laserOdometry.cpp:504-505)
            t_wod = t_wod + qrot(q_wod, t_lc)
            q_wod = qmul(q_wod, q_lc)
            q_wod = q_wod / np.linalg.norm(q_wod)
        t_odom.append(t_wod.copy())

        # ---- mapping (every frame, skip=1) -----------------------------
        qw_m = qmul(q_wm, q_wod)
        tw_m = qrot(q_wm, t_wod) + t_wm
        corner_map = (np.array(list(corner_store.values()))
                      if corner_store else np.zeros((0, 3)))
        surf_map = (np.array(list(surf_store.values()))
                    if surf_store else np.zeros((0, 3)))
        cs = oreg.voxel_downsample(ls[:, :4], line_res)[:, :3]
        ss = oreg.voxel_downsample(lf[:, :4], plane_res)[:, :3]
        qw_m, tw_m = mapping(corner_map, surf_map, cs, ss, qw_m, tw_m)
        q_wm = qmul(qw_m, qconj(q_wod))
        q_wm = q_wm / np.linalg.norm(q_wm)
        t_wm = tw_m - qrot(q_wm, t_wod)

        # insert the stacks: world-frame re-voxelization (one point per
        # map voxel, laserMapping.cpp:787-801) then iterated-centroid merge
        cw = np.concatenate([qrot_rows(qw_m, cs) + tw_m,
                             np.zeros((len(cs), 1))], axis=1)
        sw = np.concatenate([qrot_rows(qw_m, ss) + tw_m,
                             np.zeros((len(ss), 1))], axis=1)
        _voxel_merge(corner_store,
                     oreg.voxel_downsample(cw, line_res)[:, :3], line_res)
        _voxel_merge(surf_store,
                     oreg.voxel_downsample(sw, plane_res)[:, :3], plane_res)

        t_map.append(tw_m)
        q_map.append(qw_m)
        last_ls, last_lf = ls, lf

        if checkpoint_path is not None and (f + 1) % checkpoint_every == 0:
            import pickle
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as fh:
                pickle.dump((f + 1, q_lc, t_lc, q_wod, t_wod, q_wm, t_wm,
                             corner_store, surf_store, last_ls, last_lf,
                             t_odom, t_map, q_map), fh)
            import os
            os.replace(tmp, checkpoint_path)

    return (np.asarray(t_odom), np.asarray(t_map), np.asarray(q_map))
