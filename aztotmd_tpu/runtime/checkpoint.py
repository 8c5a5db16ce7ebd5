"""Full-state checkpoint / resume.

The reference can only resume from the final configuration files
(revcon.xyz -> atoms.xyz etc., main.cu:436-445) and loses velocities,
thermostat state and RNG (SURVEY.md §5).  Here the whole ``MDState``
pytree is serialized, so a resumed run continues bit-for-bit (same
shapes, same RNG stream).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..core.state import Energies, MDState

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: MDState, step_meta: dict | None = None):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    meta = dict(step_meta or {})
    meta["format_version"] = FORMAT_VERSION
    meta["n_leaves"] = len(leaves)
    np.savez_compressed(path, __meta__=np.asarray([repr(meta)]), **arrays)


def load_checkpoint(path: str, like: MDState) -> MDState:
    """Restore a checkpoint into the structure of ``like`` (shapes must
    match — build the system from the same decks first)."""
    import jax.numpy as jnp
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves)
    new_leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves[i]
        if hasattr(ref, "shape") and tuple(ref.shape) != tuple(arr.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected "
                f"{tuple(ref.shape)} — rebuild the system from the same deck")
        new_leaves.append(jnp.asarray(arr, getattr(ref, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
