"""Multi-device scaling: batched LiDAR streams + sharded neighbor search.

The reference's only concurrency is three OS processes on one machine
(SURVEY.md §2.4). The TPU-native scaling axes are:

* **Stream/data parallelism** — `vmap` the whole SLAM step over a leading
  batch of independent LiDAR streams and shard that axis over the mesh
  ("data"). Each stream's full state (pose, last features, map cubes)
  carries the batch dim, so XLA partitions everything with zero collectives
  on the hot path (BASELINE config 5: 64 streams / slice).
* **Map-axis model parallelism** — the brute-force kNN reference axis
  (the local map, the biggest tensor) shards over "model"; each device
  computes a local top-k and the partial results merge with an
  `all_gather` over ICI (the CP/SP analog per SURVEY.md §5 long-context).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
try:  # jax >= 0.6 exposes shard_map at the top level; the experimental
    # module is deprecated (warns in 0.8, removed in 0.9). The replication
    # check kwarg was renamed check_rep -> check_vma in the move.
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aloam_tpu import pipeline
from aloam_tpu.config import AloamConfig
from aloam_tpu.neighbors import knn


def make_mesh(n_data: int, n_model: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}")
    import numpy as np
    dev = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def batched_init(cfg: AloamConfig, batch: int):
    """Replicate the SLAM state across a leading stream axis."""
    state = pipeline.init_state(cfg)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)


def batched_step_jit(cfg: AloamConfig, donate: bool = True):
    """Single-chip batched step over a leading stream axis (no mesh).

    The per-chip throughput lever (BASELINE config 5 / VERDICT r1 task 1):
    one SLAM step is latency-bound (~30 µs/op tail, small gathers), so B
    independent streams per chip amortize dispatch and row-latency across
    the batch. Uses the explicit flat-op batched step (pipeline.step_b) —
    NOT jax.vmap, whose batched gathers/scatters measured ~100x slower.
    State is donated -> map buffers update in place."""
    f = lambda s, x, m: pipeline.step_b(s, x, m, cfg)  # noqa: E731
    return jax.jit(f, donate_argnums=(0,) if donate else ())


def pin_table_layouts(cfg: AloamConfig, batch: int, donate: bool = True):
    """batched_step_jit with the persistent map-table leaves pinned to
    row-major entry/exit layouts (round-5 copy audit): left to XLA's auto
    layout assignment, the donated GridMap pts/aux tables get
    major_to_minor (0, 2, 1) — hash-slot minor — at the jit boundary while
    every internal consumer (bgather's bitcast reshape, the insert
    scatter-back) needs row-major, so the compiled step transposes ~1 GiB
    per call (4 tables × both directions at B=16). Pinning reproduces the
    unconstrained compile's auto formats for every other leaf and forces
    row-major only for the four table leaves.

    Returns a jitted step; costs one extra (cached) unconstrained compile
    to read the auto formats."""
    from jax.experimental.layout import Format, Layout

    import jax.tree_util as jtu

    f = lambda s, x, m: pipeline.step_b(s, x, m, cfg)  # noqa: E731
    st = jax.eval_shape(lambda: batched_init(cfg, batch))
    xyz = jax.ShapeDtypeStruct((batch, cfg.n_raw, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((batch, cfg.n_raw), jnp.bool_)
    base = jax.jit(f, donate_argnums=(0,) if donate else ())
    comp = base.lower(st, xyz, mask).compile()

    def is_table(shape) -> bool:
        return (getattr(shape, "ndim", 0) == 3
                and shape.shape[1] in (cfg.map_table_corner,
                                       cfg.map_table_surf)
                and shape.shape[2] % 8 == 0)

    def repin(fmt_tree, shape_tree):
        fmts = jtu.tree_leaves(fmt_tree)
        shapes = jtu.tree_leaves(shape_tree)
        out = []
        for fmt, sh in zip(fmts, shapes):
            if is_table(sh):
                out.append(Format(
                    layout=Layout(tuple(range(sh.ndim))),
                    sharding=fmt.sharding))
            else:
                out.append(fmt)
        return jtu.tree_unflatten(jtu.tree_structure(fmt_tree), out)

    # input_formats mirrors (args, kwargs); in_shardings wants just args
    in_args_fmt = comp.input_formats[0]
    in_fmt = repin(in_args_fmt, (st, xyz, mask))
    out_shape = jax.eval_shape(f, st, xyz, mask)
    # output formats can carry None layouts (tokens etc.) — keep them
    out_fmts = []
    for fmt, sh in zip(jtu.tree_leaves(comp.output_formats),
                       jtu.tree_leaves(out_shape)):
        if getattr(fmt, "layout", None) is not None and is_table(sh):
            out_fmts.append(Format(layout=Layout(tuple(range(sh.ndim))),
                                   sharding=fmt.sharding))
        else:
            out_fmts.append(fmt)
    out_fmt = jtu.tree_unflatten(
        jtu.tree_structure(comp.output_formats), out_fmts)
    return jax.jit(f, donate_argnums=(0,) if donate else (),
                   in_shardings=in_fmt, out_shardings=out_fmt)


def batched_step_fn(cfg: AloamConfig, mesh: Mesh):
    """Jitted batched step sharded over the mesh: streams over "data", the
    persistent map TABLES additionally over "model" (their hash-bucket
    axis). GSPMD partitions the map kernels across the model axis — each
    device holds 1/n_model of every stream's voxel-hash tables, bucket
    gathers/scatters run shard-local where the hash lands locally, and XLA
    inserts the ICI collectives for the cross-shard remainder (the
    SURVEY.md §2.4 "sharded map option"; the 21x21x11-cube world map is by
    far the largest state). n_model must divide the table sizes.

    Returns f(batched_state, xyz (B, n_raw, 3), mask (B, n_raw))
    -> (batched_state, batched_outputs).
    """
    from aloam_tpu.ops.gridmap import GridMap

    vstep = lambda s, x, m: pipeline.step_b(s, x, m, cfg)  # noqa: E731
    shard = NamedSharding(mesh, P("data"))
    shard_dm = NamedSharding(mesh, P("data", "model"))
    n_model = mesh.shape["model"]
    assert cfg.map_table_corner % n_model == 0
    assert cfg.map_table_surf % n_model == 0

    def put_grid(g: GridMap) -> GridMap:
        return GridMap(*(jax.lax.with_sharding_constraint(x, shard_dm)
                         for x in g))

    def put(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, shard), tree)

    def put_state(state):
        new_map = put(state.map)._replace(
            corner=put_grid(state.map.corner),
            surf=put_grid(state.map.surf))
        return state._replace(odom=put(state.odom), map=new_map,
                              frame=state.frame)

    @jax.jit
    def f(state, xyz, mask):
        state = put_state(state)
        xyz = jax.lax.with_sharding_constraint(xyz, shard)
        mask = jax.lax.with_sharding_constraint(mask, shard)
        new_state, outs = vstep(state, xyz, mask)
        return put_state(new_state), outs

    return f


def sharded_knn(mesh: Mesh, k: int = 5):
    """k-NN with the reference-point axis sharded over "model": local top-k
    per shard, then an all_gather merge over ICI. Exact, like the dense
    version; communication is O(Q·k·n_shards), not O(M)."""

    @jax.jit
    def f(query, ref, ref_mask):
        def local(q, r, m):
            d2, idx = knn(q, r, m, k)
            shard_id = jax.lax.axis_index("model")
            idx = idx + shard_id * r.shape[0]
            d_all = jax.lax.all_gather(d2, "model", axis=0)   # (S, Q, k)
            i_all = jax.lax.all_gather(idx, "model", axis=0)
            s, qn, _ = d_all.shape
            d_flat = jnp.moveaxis(d_all, 0, 1).reshape(qn, s * k)
            i_flat = jnp.moveaxis(i_all, 0, 1).reshape(qn, s * k)
            neg_top, pos = jax.lax.top_k(-d_flat, k)
            return -neg_top, jnp.take_along_axis(i_flat, pos, axis=1)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("model", None), P("model")),
            out_specs=(P(), P()), check_rep=False,
        )(query, ref, ref_mask)

    return f
