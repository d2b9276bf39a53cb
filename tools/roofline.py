"""Roofline accounting for the batched step (VERDICT r4 #2 'show the
arithmetic').

Decomposes the compiled batched step into its HLO fusions and prints the
two floors that bound it on this hardware:

* dispatch floor: #fusions x the measured ~30 us/op fixed device latency
  at SLAM-sized shapes (CLAUDE.md; each fusion is a sequential program
  step on TPU — XLA overlaps DMA with compute inside a fusion, not the
  fixed setup cost across them);
* bandwidth floor: unique HBM bytes touched per step (args + outputs +
  temp high-watermark as a lower-bound proxy for traffic) / ~800 GB/s.

The measured step time vs max(floors) says which regime the step is in
and how much headroom a further op-count or traffic cut could buy.

Usage: python tools/roofline.py [B]          (default 16, bench config)
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

import json  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from aloam_tpu import pipeline  # noqa: E402
from aloam_tpu.parallel import batched_init  # noqa: E402

DISPATCH_US = 30.0          # measured per-op latency class (CLAUDE.md)
HBM_GBPS = 800.0            # v5e-class HBM


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
    # entry-computation program steps: fusions + standalone expensive ops
    ops = collections.Counter()
    by_fn = collections.Counter()      # owner attribution via op_name
    by_file = collections.Counter()
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ (fusion|sort|custom-call|"
            r"all-reduce|scatter|gather|dynamic-slice|dynamic-update-slice|"
            r"convolution|dot|while|conditional|copy)\([^\n]*", hlo, re.M):
        ops[m.group(1)] += 1
        line = m.group(0)
        sf = re.search(r'source_file="([^"]+)"', line)
        by_file[sf.group(1).rsplit("/", 1)[-1] if sf else "?"] += 1
        on = re.search(r'op_name="([^"]+)"', line)
        if on:
            # innermost named jax function in the op_name path
            parts = [p for p in on.group(1).split("/") if not p.startswith(
                ("jit(main)", "jit(step", "while", "body", "cond",
                 "branch", "closed_call", "custom_vjp", "checkpoint"))]
            by_fn[parts[0] if parts else on.group(1).split("/")[-1]] += 1
        else:
            by_fn["?"] += 1
    n_steps = sum(ops.values())

    ma = comp.memory_analysis()
    out = {"batch": b, "hlo_ops": dict(ops), "program_steps": n_steps,
           "dispatch_floor_ms": round(n_steps * DISPATCH_US / 1e3, 2),
           "steps_by_fn": dict(by_fn.most_common(20)),
           "steps_by_file": dict(by_file.most_common(12))}
    if ma is not None:
        traffic = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + 2 * ma.temp_size_in_bytes)   # temps written + read once
        out.update(
            arg_mib=round(ma.argument_size_in_bytes / 2**20, 1),
            out_mib=round(ma.output_size_in_bytes / 2**20, 1),
            temp_mib=round(ma.temp_size_in_bytes / 2**20, 1),
            bandwidth_floor_ms=round(traffic / (HBM_GBPS * 1e6), 2))
    cost = comp.cost_analysis()
    if cost:
        c = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = c.get("flops", 0.0)
        out["step_gflops"] = round(flops / 1e9, 1)
        out["mxu_floor_ms"] = round(flops / 200e12 * 1e3, 3)  # ~bf16 v5e
    print(json.dumps(out))


if __name__ == "__main__":
    main()
