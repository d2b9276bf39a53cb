"""Dispatch gate for the Pallas kernel paths.

Every fused kernel has an XLA twin with identical semantics (pinned by
interpret-mode tests); dispatch is per-kernel so a Mosaic *compile*
failure on a new chip/toolchain can disable just that kernel and fall
back to the XLA path instead of taking the whole pipeline down —
``bench.py`` uses this to keep its end-to-end run honest-but-alive
(output *mismatches* still hard-fail there; only lowering failures
degrade). Set ``ALOAM_DISABLE_PALLAS`` to a comma-separated subset of
{assoc, insert, knn, lm, odom, select, voxel} (or ``all``) to force the
XLA paths.
"""

from __future__ import annotations

import os

import jax


def use_pallas(name: str) -> bool:
    if jax.default_backend() != "tpu":
        return False
    disabled = os.environ.get("ALOAM_DISABLE_PALLAS", "")
    if not disabled:
        return True
    items = {s.strip() for s in disabled.split(",")}
    return "all" not in items and name not in items
