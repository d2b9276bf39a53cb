"""Checkpoint / resume for the SLAM state pytree.

The reference has no persistence at all — every pose and all 4851 cube
clouds live in process globals and die with the process (SURVEY.md §5).
Here the whole pipeline state is one pytree, so checkpointing is a flat
save/restore; resume = load and keep scanning."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, state) -> None:
    """Save any pytree of arrays to a single .npz."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, n_leaves=len(leaves), **arrays)
    del treedef  # structure is re-supplied on load via an example pytree


def load(path: str, example):
    """Restore into the structure of `example` (same config/capacities)."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    ex_leaves, treedef = jax.tree.flatten(example)
    assert len(ex_leaves) == n, (
        f"checkpoint has {n} leaves, expected {len(ex_leaves)} — "
        "config/capacity mismatch")
    out = []
    for got, ex in zip(leaves, ex_leaves):
        ex_arr = jnp.asarray(ex)
        assert got.shape == ex_arr.shape, (got.shape, ex_arr.shape)
        out.append(jnp.asarray(got, dtype=ex_arr.dtype))
    return jax.tree.unflatten(treedef, out)
