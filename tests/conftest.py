"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's total lack of CI (SURVEY.md §4) with the opposite:
every stage is unit-tested against a NumPy oracle, and multi-device sharding
tests run on `--xla_force_host_platform_device_count=8` so no TPU slice is
needed (SURVEY.md §4 "multi-device without a cluster").
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS with "axon,cpu"; force the
# CPU backend explicitly so tests really run on the virtual 8-device mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
