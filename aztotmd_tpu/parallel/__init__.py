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
    """True once the spatially-sharded full step loop exists."""
    try:
        from . import domain_step  # noqa: F401
        return True
    except ImportError:
        return False


def run_domain_step_demo(n_devices: int) -> None:
    """Dryrun hook: jit + run a few sharded full steps on tiny shapes."""
    from .domain_step import run_demo
    run_demo(n_devices)


__all__ = ["make_mesh", "state_shardings", "ff_shardings",
           "make_sharded_step", "shard_system", "pair_forces_domain",
           "has_domain_step", "run_domain_step_demo"]
