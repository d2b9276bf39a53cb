"""Host-side cache for f64 oracle trajectories.

The NumPy oracle costs ~10 s/frame at VLP-16 scale and minutes/frame at
HDL-64 scale; long pins would dominate CI. Trajectories are cached under
tests/_cache keyed by the oracle sources' md5 + the scene parameters, so
the cache self-invalidates whenever the oracle implementation or the
scene changes. Cache files are committed: a fresh checkout replays them
instead of regenerating (delete tests/_cache to force regeneration).
"""

import hashlib
import pathlib

import numpy as np

_HERE = pathlib.Path(__file__).parent
_CACHE = _HERE.parent / "_cache"


def _key(tag: str) -> str:
    blob = b"".join((_HERE / f).read_bytes()
                    for f in ("pipeline.py", "registration.py",
                              "odometry.py"))
    return hashlib.md5(blob + tag.encode()).hexdigest()[:16]


def oracle_trajectory(tag: str, scans, run_kwargs: dict,
                      use_cache: bool = True):
    """(t_odom, t_map, q_map) of oracle.pipeline.run_pipeline over
    ``scans``, cached under ``tag`` (+ scene params the caller folds into
    the tag)."""
    from tests.oracle import pipeline as opipe

    f = _CACHE / f"oracle_{tag}_{_key(tag)}.npz"
    if use_cache and f.exists():
        z = np.load(f)
        return z["t_odom"], z["t_map"], z["q_map"]
    ckpt = None
    if use_cache:
        # key-invalidated resume checkpoint: an interrupted multi-hour
        # oracle run continues where it stopped (oracle.pipeline
        # run_pipeline checkpoint_path)
        _CACHE.mkdir(exist_ok=True)
        ckpt = str(f) + ".ckpt"
    t_odom, t_map, q_map = opipe.run_pipeline(
        scans, checkpoint_path=ckpt, **run_kwargs)
    if use_cache:
        np.savez(f, t_odom=t_odom, t_map=t_map, q_map=q_map)
        import os
        if ckpt and os.path.exists(ckpt):
            os.remove(ckpt)
    return t_odom, t_map, q_map
