"""Debug-mode state invariants.

The reference compiles invariant kernels under DEBUG_MODE (defines.h:5):
``verify_clist`` (cell-table consistency, cuMDfunc.cu:716), ``verify_forces``
(NaN scan, :768), bond-type range checks that deliberately crash the GPU
(:373).  Here: one jitted pure function returning a flag vector, checked
by the runner under ``--debug`` — violations raise instead of corrupting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CHECKS = (
    "pos_finite", "vel_finite", "frc_finite",
    "pos_in_box", "types_in_range",
    "bond_atoms_in_range", "bond_types_in_range",
    "angle_atoms_in_range", "spec_number_consistent",
    "velocity_bound",
)

MX_VEL = 1.0e5      # DEBUG1_MODE velocity bound (defines.h:6-7)


def check_state(cfg, state):
    """Returns an int32 vector of violation counts, one per CHECKS."""
    N = cfg.n_at
    box = jnp.asarray(cfg.box, state.pos.dtype)

    def count(bad):
        return jnp.sum(bad.astype(jnp.int32))

    flags = []
    flags.append(count(~jnp.isfinite(state.pos)))
    flags.append(count(~jnp.isfinite(state.vel)))
    flags.append(count(~jnp.isfinite(state.frc)))
    flags.append(count((state.pos < 0.0) | (state.pos >= box)))
    flags.append(count((state.types < 0) | (state.types >= cfg.n_spec)))

    live = state.bond_type != 0
    at_ok = (state.bond_at1 >= 0) & (state.bond_at1 < N) \
        & (state.bond_at2 >= 0) & (state.bond_at2 < N)
    flags.append(count(live & ~at_ok))
    nbt = max(cfg.n_bond_types, 1)
    flags.append(count(live & (state.bond_type >= nbt)))

    alive = state.ang_type != 0
    a_ok = (state.ang_central >= 0) & (state.ang_central < N) \
        & (state.ang_lig1 >= 0) & (state.ang_lig1 < N) \
        & (state.ang_lig2 >= 0) & (state.ang_lig2 < N)
    flags.append(count(alive & ~a_ok))

    counted = jnp.zeros((cfg.n_spec,), jnp.int32).at[state.types].add(1)
    flags.append(count(counted != state.spec_number))

    flags.append(count(jnp.abs(state.vel) > MX_VEL))
    return jnp.stack(flags)


def assert_state_ok(cfg, state):
    """Host-side check; raises with the named violations."""
    vals = jax.jit(lambda s: check_state(cfg, s))(state)
    import numpy as np
    vals = np.asarray(vals)
    bad = {name: int(v) for name, v in zip(CHECKS, vals) if v}
    if bad:
        raise AssertionError(f"state invariant violations: {bad}")
