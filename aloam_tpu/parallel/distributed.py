"""Multi-host / multi-slice runtime (SURVEY.md §5 distributed backend).

The reference's only "distributed backend" is ROS TCP pub/sub on one
machine. The TPU-native replacement is ``jax.distributed`` + GSPMD: every
host calls :func:`initialize`, builds ONE global mesh over all devices,
and runs the same jitted batched step — XLA partitions state and inserts
collectives (ICI within a slice, DCN across slices).

Axis placement policy (the scaling-book recipe): the "data" axis (streams)
carries ZERO cross-shard collectives on the hot path — each stream's
entire SLAM state is private — so it is the axis to stretch across
slices/DCN. The "model" axis (map hash-bucket sharding,
``sharding.batched_step_fn``) moves bucket rows every frame and must stay
inside a slice on ICI; :func:`global_mesh` lays devices out so "model"
varies fastest (adjacent devices, same slice).

Single-process use is a no-op: ``initialize()`` skips when no coordinator
is configured, and the same code runs on one chip or a CPU mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the multi-host runtime (idempotent, no-op single-process).

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) so launchers only export three variables; on
    Cloud TPU pods with no explicit configuration,
    ``jax.distributed.initialize()`` auto-discovers via the metadata
    server."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and not coordinator_address:
        return  # single-process: nothing to initialize
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(n_model: int = 1) -> Mesh:
    """A ("data", "model") mesh over ALL global devices, model-fastest.

    ``jax.devices()`` orders devices so that intra-slice neighbors are
    adjacent; putting "model" on the fastest-varying axis keeps the map
    shards of one stream on ICI neighbors, while "data" (independent
    streams) spans slices over DCN."""
    devices = jax.devices()
    assert len(devices) % n_model == 0, (len(devices), n_model)
    dev = np.asarray(devices).reshape(len(devices) // n_model, n_model)
    return Mesh(dev, ("data", "model"))


def process_local_batch(total_batch: int) -> tuple[int, int]:
    """(local_batch, offset) for feeding per-host shards of the stream
    axis: each host loads only its own streams' scans (the standard
    multi-host input pattern — ``jax.make_array_from_process_local_data``
    assembles the global array)."""
    n = jax.process_count()
    assert total_batch % n == 0, (total_batch, n)
    local = total_batch // n
    return local, jax.process_index() * local


def _selftest() -> None:
    """Single-process self-test: initialize (no-op), build the global mesh,
    run one sharded batched step on tiny shapes."""
    initialize()
    import jax.numpy as jnp
    from aloam_tpu.config import AloamConfig
    from aloam_tpu.io import synthetic as syn
    from aloam_tpu.parallel import batched_init, batched_step_fn

    n_dev = len(jax.devices())
    n_model = 2 if n_dev % 2 == 0 and n_dev >= 4 else 1
    mesh = global_mesh(n_model)
    cfg = AloamConfig(
        scan_lines=16, minimum_range=0.3,
        line_resolution=0.2, plane_resolution=0.4,
        n_raw=4096, ring_cap=256, less_flat_cap=2048,
        map_table_corner=1024, map_table_surf=2048,
        corner_stack_cap=256, surf_stack_cap=1024)
    batch = mesh.shape["data"]
    local, off = process_local_batch(batch)
    scans, _ = syn.make_sequence(1, scan_lines=16, n_azimuth=256, seed=0)
    xyz1, mask1 = syn.pad_scan(scans[0], cfg.n_raw)
    xyz = jnp.asarray(np.broadcast_to(xyz1, (batch,) + xyz1.shape))
    mask = jnp.asarray(np.broadcast_to(mask1, (batch,) + mask1.shape))
    step = batched_step_fn(cfg, mesh)
    state = batched_init(cfg, batch)
    _, outs = step(state, xyz, mask)
    jax.block_until_ready(outs.t_map)
    print(f"distributed selftest OK: processes={jax.process_count()} "
          f"mesh=({mesh.shape['data']} data x {mesh.shape['model']} model) "
          f"local_batch={local}@{off}")


if __name__ == "__main__":
    _selftest()
