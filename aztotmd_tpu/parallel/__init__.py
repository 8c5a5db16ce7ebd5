"""Multi-chip scale-out over a `jax.sharding.Mesh`.

The reference is a single-process, single-GPU code (SURVEY.md §2.3) — this
subsystem has no counterpart there; it is the TPU-native replacement for
the reference's shared-memory cell-pair machinery at scale.  Parallelism
taxonomy for an MD engine:

* **DP (data parallel over atoms)** — per-atom arrays sharded along atom
  dim over the mesh's ``atoms`` axis; XLA inserts the all-gathers needed
  for the cell-table build and `psum`s the energy reductions.  This is the
  default and maps every per-atom kernel (integrator, thermostat, pair
  gather) 1:1 onto chips over ICI.
* **Spatial decomposition (the MD analog of TP/SP)** — cell-grid slabs per
  chip with halo exchange; see `aztotmd_tpu.parallel.domain`.
"""

from .mesh import (make_mesh, state_shardings, ff_shardings,
                   make_sharded_step, shard_system)
from .domain import pair_forces_domain


def has_domain_step() -> bool:
    """True: the spatially-sharded full step loop is parallel/slab.py."""
    return True


def run_domain_step_demo(n_devices: int) -> None:
    """Dryrun hook: slab-ownership full step loop with migration —
    build a small system, distribute it by x-slab, scan 20 steps,
    verify atoms survived and the step counter advanced."""
    import dataclasses

    import numpy as np

    from . import slab
    from .mesh import make_mesh
    from ..ops.cellblock import make_block_grid
    from ..systems import build_lj_argon

    n_at = max(128, 16 * n_devices)
    cfg, ff, state, aux = build_lj_argon(n_atoms=n_at, density=0.012)
    grid = make_block_grid(cfg.box, cfg.r_max, cfg.n_at)
    ncx = max((grid.dims[0] // n_devices) * n_devices, n_devices)
    grid = dataclasses.replace(grid, dims=(ncx,) + grid.dims[1:],
                               edge=(cfg.box[0] / ncx,) + grid.edge[1:])
    if min(grid.dims) < 3 or any(abs(o) > 1 for off in grid.stencil
                                 for o in off):
        return                       # box too small for n_devices slabs
    cfg = dataclasses.replace(cfg, grid=grid, pair_engine="block")
    mesh = make_mesh(n_devices, axis=slab.AXIS)
    sstate = slab.make_slab_state(cfg, state, mesh)
    multi = slab.make_slab_multi_step(cfg, aux, mesh)
    out = multi(sstate, ff, 20)
    g = slab.gather_state(out, cfg.n_at)
    assert int(out.step) == int(state.step) + 20
    assert int(out.mig_lost) == 0
    assert np.isfinite(g["pos"]).all()
    n_live = int((np.asarray(out.gid) >= 0).sum())
    assert n_live == cfg.n_at, f"lost atoms: {n_live}/{cfg.n_at}"


__all__ = ["make_mesh", "state_shardings", "ff_shardings",
           "make_sharded_step", "shard_system", "pair_forces_domain",
           "has_domain_step", "run_domain_step_demo"]
