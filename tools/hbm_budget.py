"""Per-stream HBM budget for the batched step (VERDICT r4 #8).

Prints the arithmetic behind capacity decisions: the persistent state
bytes per stream (map tables dominate), the XLA-reported peak temp
allocation of the compiled batched step at each batch size, and the
implied per-chip ceiling vs the 16 GB HBM of a v5e/v5p chip. The numbers
land in docs/perf_notes.md so the next cap decision starts from
arithmetic, not bisection.

Usage: python tools/hbm_budget.py [B ...]     (default: 1 16 32 64)
Works on any backend — memory_analysis is computed from the HLO by the
compiler, not read off the device (the tunnel's memory_stats is None).
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import batched_bench_cfg  # noqa: E402
from aloam_tpu import pipeline  # noqa: E402
from aloam_tpu.parallel import batched_init  # noqa: E402


def _tree_bytes(tree) -> int:
    # leaves are ShapeDtypeStructs (eval_shape) — no .nbytes attribute
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(tree))


def state_table(cfg):
    """Static per-stream byte table of the persistent state."""
    st = jax.eval_shape(lambda: batched_init(cfg, 1))
    rows = []
    for name, sub in (("map.corner", st.map.corner),
                      ("map.surf", st.map.surf),
                      ("odom (last clouds)", st.odom),
                      ("map rest", st.map._replace(
                          corner=jax.tree.map(
                              lambda x: jax.ShapeDtypeStruct((0,), x.dtype),
                              st.map.corner),
                          surf=jax.tree.map(
                              lambda x: jax.ShapeDtypeStruct((0,), x.dtype),
                              st.map.surf)))):
        rows.append((name, _tree_bytes(sub)))
    total = _tree_bytes(st)
    return rows, total


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 16, 32, 64]
    cfg = batched_bench_cfg()

    rows, per_stream = state_table(cfg)
    print(f"--- persistent state per stream (bench cfg: ring_cap="
          f"{cfg.ring_cap}, n_raw={cfg.n_raw}, "
          f"less_flat_cap={cfg.less_flat_cap}) ---")
    for name, b in rows:
        print(f"{name:24s} {b / 2**20:8.2f} MiB")
    print(f"{'TOTAL state/stream':24s} {per_stream / 2**20:8.2f} MiB")

    print("\n--- compiled batched step, XLA memory analysis ---")
    print(f"{'B':>4} {'args MiB':>10} {'out MiB':>10} {'temp MiB':>10} "
          f"{'peak~ MiB':>10} {'per-strm temp':>14}")
    for b in sizes:
        st = jax.eval_shape(lambda: batched_init(cfg, b))
        xyz = jax.ShapeDtypeStruct((b, cfg.n_raw, 3), jnp.float32)
        mask = jax.ShapeDtypeStruct((b, cfg.n_raw), jnp.bool_)
        f = jax.jit(lambda s, x, m: pipeline.step_b(s, x, m, cfg),
                    donate_argnums=(0,))
        comp = f.lower(st, xyz, mask).compile()
        ma = comp.memory_analysis()
        if ma is None:
            print(f"{b:>4} memory_analysis unavailable on this backend")
            continue
        args = ma.argument_size_in_bytes
        out = ma.output_size_in_bytes
        tmp = ma.temp_size_in_bytes
        # donated state aliases output, so peak ~ max(args, out) + temp
        peak = max(args, out) + tmp + ma.generated_code_size_in_bytes
        print(f"{b:>4} {args / 2**20:>10.1f} {out / 2**20:>10.1f} "
              f"{tmp / 2**20:>10.1f} {peak / 2**20:>10.1f} "
              f"{tmp / b / 2**20:>14.2f}")
    hbm = 16 * 2**30
    print(f"\nv5e HBM = 16 GiB; streams that fit (state only): "
          f"{hbm // per_stream}")


if __name__ == "__main__":
    main()
