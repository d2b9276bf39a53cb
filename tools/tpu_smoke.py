#!/usr/bin/env python
"""Fast on-TPU smoke: compile + run every Pallas kernel and one batched
step at small shapes. Run this the moment the TPU tunnel is back to
validate the round's kernels in ~2-3 min instead of a full bench."""
import os
import sys

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _here)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    print("devices:", jax.devices(), flush=True)
    disabled = bench.verify_pallas_kernels()
    print("kernel verify done; disabled:", disabled, flush=True)

    # one tiny batched pipeline step (B=2, VLP-16 preset)
    from aloam_tpu.config import PRESETS
    from aloam_tpu.parallel import batched_init, batched_step_jit
    from aloam_tpu.io import synthetic as syn
    cfg = PRESETS["VLP-16"]
    step = batched_step_jit(cfg, donate=False)
    state = batched_init(cfg, 2)
    scans, _ = syn.make_sequence(2, scan_lines=16, n_azimuth=512, seed=1)
    xyz = np.stack([syn.pad_scan(s, cfg.n_raw)[0] for s in scans])
    mask = np.stack([syn.pad_scan(s, cfg.n_raw)[1] for s in scans])
    st, out = step(state, jnp.asarray(xyz), jnp.asarray(mask))
    print("step_b ok; t_map:", np.asarray(out.t_map), flush=True)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
