"""Atom-sharded execution of the MD step over a device mesh.

Per-atom state arrays are sharded along their leading (atom) dimension
over a 1-D ``atoms`` mesh axis; force-field tables and global scalars are
replicated.  The step function itself is unchanged — XLA propagates the
shardings through the whole program and inserts the collectives
(all-gather for the cell-table scatter, psum for energy reductions) over
ICI.  This follows the scaling-book recipe: pick a mesh, annotate
shardings on the inputs, let the compiler lay out the collectives.

The reference has no multi-device capability at all (SURVEY.md §2.3);
its closest analog is the block/thread launch geometry of cuInit.cu:962.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import MDState
from ..runtime.step import make_step

AXIS = "atoms"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


def _is_per_atom(name: str, arr, n_at: int) -> bool:
    return hasattr(arr, "shape") and arr.ndim >= 1 and arr.shape[0] == n_at


def state_shardings(mesh: Mesh, state: MDState, n_at: int):
    """Sharding pytree for MDState: shard per-atom arrays on dim 0,
    replicate everything else (bond/angle tables, scalars, counters)."""
    repl = NamedSharding(mesh, P())

    def spec(path, arr):
        name = path[-1].name if path else ""
        if _is_per_atom(name, arr, n_at):
            return NamedSharding(mesh, P(AXIS, *([None] * (arr.ndim - 1))))
        return repl

    return jax.tree_util.tree_map_with_path(spec, state)


def ff_shardings(mesh: Mesh, ff):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: repl, ff)


def shard_system(mesh: Mesh, state: MDState, ff, n_at: int):
    """Place an existing (host/single-device) system onto the mesh."""
    st_sh = state_shardings(mesh, state, n_at)
    ff_sh = ff_shardings(mesh, ff)
    state = jax.tree_util.tree_map(jax.device_put, state, st_sh)
    ff = jax.tree_util.tree_map(jax.device_put, ff, ff_sh)
    return state, ff, st_sh, ff_sh


def make_sharded_step(cfg, aux, mesh: Mesh, state: MDState, ff,
                      donate: bool = True):
    """jit the full MD step with input/output shardings over the mesh.

    Requires cfg.n_at divisible by the mesh size so the per-atom shards
    are equal (pad the system with frozen ghost atoms otherwise).
    Returns (step_fn, sharded_state, sharded_ff).
    """
    n_dev = mesh.devices.size
    if cfg.n_at % n_dev:
        raise ValueError(
            f"n_at={cfg.n_at} not divisible by mesh size {n_dev}; pad the "
            "system (frozen ghost atoms) to a multiple of the mesh")
    state, ff, st_sh, ff_sh = shard_system(mesh, state, ff, cfg.n_at)
    step = make_step(cfg, aux)
    jit_kw = dict(in_shardings=(st_sh, ff_sh), out_shardings=st_sh)
    if donate:
        jit_kw["donate_argnums"] = (0,)
    return jax.jit(step, **jit_kw), state, ff
