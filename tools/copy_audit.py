"""Audit the copies / dispatch-heavy ops in the compiled batched step.

The round-5 roofline (tools/roofline.py) showed 344 copy ops among the
1308 entry-computation program steps (B=16). This tool classifies them
by shape/bytes and by source location so op-count reduction work targets
the real offenders (big-table copies = missed donation aliasing;
swarms of tiny copies = layout/stacking churn).

Usage: python tools/copy_audit.py [B]
"""

import collections
import os
import re
import sys

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _here)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from aloam_tpu import pipeline  # noqa: E402
from aloam_tpu.parallel import batched_init  # noqa: E402

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
               "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
               "f64": 8, "s64": 8, "u64": 8}


def shape_bytes(sig: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", sig)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = bench.batched_bench_cfg()
    st = jax.eval_shape(lambda: batched_init(cfg, b))
    xyz = jax.ShapeDtypeStruct((b, cfg.n_raw, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((b, cfg.n_raw), jnp.bool_)
    f = jax.jit(lambda s, x, m: pipeline.step_b(s, x, m, cfg),
                donate_argnums=(0,))
    comp = f.lower(st, xyz, mask).compile()
    hlo = comp.as_text()

    by_loc = collections.Counter()
    by_loc_bytes = collections.Counter()
    total = 0
    total_bytes = 0
    sizes = []
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?[\w.-]+ = (\S+) copy\([^\n]*", hlo, re.M):
        line = m.group(0)
        nbytes = shape_bytes(m.group(1))
        sf = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
        loc = (f"{sf.group(1).rsplit('/', 1)[-1]}:{sf.group(2)}"
               if sf else "?")
        by_loc[loc] += 1
        by_loc_bytes[loc] += nbytes
        total += 1
        total_bytes += nbytes
        sizes.append((nbytes, m.group(1), loc))

    print(f"batch={b}  copies={total}  copy_bytes={total_bytes/2**20:.1f} MiB")
    print("\ntop locations by count:")
    for loc, n in by_loc.most_common(15):
        print(f"  {n:5d}  {by_loc_bytes[loc]/2**20:9.2f} MiB  {loc}")
    print("\ntop 15 individual copies by bytes:")
    for nbytes, sig, loc in sorted(sizes, reverse=True)[:15]:
        print(f"  {nbytes/2**20:9.2f} MiB  {sig:40s} {loc}")

    # also: the unattributed program steps (by_fn "?") — what op kinds?
    unattr = collections.Counter()
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ (fusion|sort|custom-call|"
            r"scatter|gather|dynamic-slice|dynamic-update-slice|"
            r"convolution|dot|copy)\([^\n]*", hlo, re.M):
        if 'source_file="' not in m.group(0):
            unattr[m.group(1)] += 1
    print(f"\nunattributed steps by kind: {dict(unattr)}")


if __name__ == "__main__":
    main()
