"""Worker process for the 2-process ``jax.distributed`` smoke test.

Run as ``python tests/_mp_worker.py <process_id> <num_processes> <port>``.
Each worker brings up the real multi-process runtime
(``parallel/distributed.initialize`` -> ``jax.distributed.initialize``
with a localhost coordinator), builds the ONE global ("data", "model")
mesh over all processes' CPU devices, proves a genuine cross-process
collective (a psum over the process-spanning "data" axis), and runs one
full sharded SLAM step with per-process input feeding
(``jax.make_array_from_process_local_data`` — the standard multi-host
input pattern). Prints ``MP_OK <pid> <psum>`` on success.

This is the executable counterpart of the reference's 4 communicating
OS processes (/root/reference/CMakeLists.txt:40-50) — the rebuild's
processes coordinate through jax.distributed instead of roscore.
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    # exercise the documented env-var path of distributed.initialize()
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    # this sandbox resolves the hostname to an interface gloo sometimes
    # cannot connect across; force every gloo pair onto loopback
    os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")  # axon plugin override
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from aloam_tpu.config import AloamConfig
    from aloam_tpu.io import synthetic as syn
    from aloam_tpu.parallel import (batched_init, batched_step_fn,
                                    distributed)
    from aloam_tpu.parallel.sharding import shard_map

    distributed.initialize()
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    # model varies fastest -> "model" pairs are intra-process ("ICI"),
    # "data" rows span processes ("DCN") — the documented axis policy
    mesh = distributed.global_mesh(n_model=2)
    assert mesh.shape["data"] == nproc and mesh.shape["model"] == 2

    def barrier(name, timeout_ms=900_000):
        # coordination-service barrier (KV store, no gloo): on this 1-core
        # host the two workers compile serially, and gloo's 30 s context
        # init expires if one reaches the first collective while the other
        # is still compiling — so compile FIRST, rendezvous, then execute
        try:
            from jax._src import distributed as _dist
            _dist.global_state.client.wait_at_barrier(name, timeout_ms)
        except Exception as e:  # noqa: BLE001 — best-effort on older jax
            print(f"barrier {name} skipped: {e}", flush=True)

    # --- cross-process collective: psum over the process-spanning axis ---
    batch = mesh.shape["data"]
    local, off = distributed.process_local_batch(batch)
    assert (local, off) == (1, pid)
    shard = NamedSharding(mesh, P("data"))
    mine = np.full((local, 128), float(pid + 1), np.float32)
    x = jax.make_array_from_process_local_data(shard, mine)
    # out_specs stays sharded over "data": a replicated P() output adds a
    # 4-device broadcast context spanning both axes, whose gloo TCP
    # handshake is flaky under this host's 1-core compile contention —
    # the psum itself (the actual cross-process proof) uses the 2-rank
    # per-process contexts, which connect reliably
    psum_c = jax.jit(shard_map(
        lambda v: jax.lax.psum(v, "data"), mesh,
        in_specs=P("data"), out_specs=P("data"))).lower(x).compile()
    barrier("psum_compiled")
    tot = psum_c(x)
    expect = nproc * (nproc + 1) / 2.0  # sum of (pid+1)
    got = float(np.asarray(tot.addressable_data(0))[0, 0])
    assert got == expect, (got, expect)

    # --- one full sharded SLAM step, per-process stream feeding ----------
    cfg = AloamConfig(
        scan_lines=16, minimum_range=0.3,
        line_resolution=0.2, plane_resolution=0.4,
        n_raw=4096, ring_cap=256, less_flat_cap=2048,
        map_table_corner=1024, map_table_surf=2048,
        corner_stack_cap=256, surf_stack_cap=1024)
    scans, _ = syn.make_sequence(1, scan_lines=16, n_azimuth=256,
                                 seed=10 + pid)
    xyz1, mask1 = syn.pad_scan(scans[0], cfg.n_raw)
    xyz = jax.make_array_from_process_local_data(
        shard, np.ascontiguousarray(
            np.broadcast_to(xyz1, (local,) + xyz1.shape)))
    mask = jax.make_array_from_process_local_data(
        shard, np.ascontiguousarray(
            np.broadcast_to(mask1, (local,) + mask1.shape)))
    state = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(shard,
                                                         np.asarray(a)),
        batched_init(cfg, local))
    step = batched_step_fn(cfg, mesh)
    # AOT-compile BEFORE the rendezvous: on this 1-core host the two
    # workers compile serially (minutes cold), and the step's first
    # cross-process collective would hit gloo's fixed 30 s context-init
    # timeout while the peer is still compiling
    step_c = step.lower(state, xyz, mask).compile()
    barrier("step_compiled")
    new_state, outs = step_c(state, xyz, mask)
    t_map = np.asarray(outs.t_map.addressable_data(0))
    assert np.all(np.isfinite(t_map)), t_map
    jax.block_until_ready(jax.tree.leaves(new_state))
    print(f"MP_OK {pid} {got}", flush=True)


if __name__ == "__main__":
    main()
