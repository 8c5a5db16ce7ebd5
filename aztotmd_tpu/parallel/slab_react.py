"""Reactive topology on the slab mesh: replicated tables, sharded geometry.

The reference's defining capability — runtime bond creation, breaking
and mutation plus electron hopping (src/cuBonds.cu:306-706, :898-1100,
src/cuEjump.cu:78-332) — has no reference scale-out story (it is
single-GPU).  This module gives the slab-decomposed step loop
(parallel/slab.py) the full reactive feature set with a design chosen
for XLA/TPU rather than translated locks:

  * the TOPOLOGY (bond/angle tables, per-atom types/parents/nbonds,
    reactive statistics, jump counters) is REPLICATED on every device;
  * the GEOMETRY stays sharded: per-step, one ``psum`` assembles a
    gid-keyed global position table from the slabs (each atom is owned
    by exactly one device, so the scatter-psum is exact);
  * every device then runs the SAME single-chip reactive functions
    (ops.bonds.apply_bonds / create_bonds, ops.ejump.do_jumps,
    ops.angles.refresh_angles / apply_angles) on the replicated view.
    They are pure functions of replicated inputs, so all devices reach
    bit-identical decisions — no cross-device claim protocol needed,
    the deterministic lowest-slot-wins claims of the single-chip path
    do double duty as the distributed consensus;
  * forces flow back to the slabs through a gid gather
    (``frc_global[gid]``), applied exactly once because each gid is
    owned by exactly one device.

Cost model: O(N + mxB) replicated compute + one (N,3) psum per step.
The expensive O(N * stencil * cap) pair pass stays sharded, which is
where the FLOPs are; the replicated topology work is the small serial
fraction (bond tables are ~N-sized).  Candidate selection
(ops.pairs.bind_jump_candidates) currently also runs replicated from
the global positions — bit-identical to the single-chip engines by
construction; sharding it into the slab stencil loop is a further
optimization, not a capability gap.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

AXIS = "x"

# MDState fields mirrored into the replicated reactive globals
_FIELDS = (
    "types", "parents", "nbonds", "touched", "spec_number",
    "bond_at1", "bond_at2", "bond_type", "bond_start", "n_bond",
    "bt_count", "bt_lt_sum", "bt_lt_count", "bt_r_sum", "bt_r_count",
    "bt_r_mean", "bt_lt_mean",
    "ang_central", "ang_lig1", "ang_lig2", "ang_type", "n_angle",
    "n_jump", "jump_pos", "jump_neg",
)


@jax.tree_util.register_dataclass
@dataclass
class ReactiveGlobals:
    """Replicated global topology state (field meanings: core/state.py)."""
    types: jax.Array        # (N,) int32 — authoritative species by gid
    parents: jax.Array      # (N,) int32
    nbonds: jax.Array       # (N,) int32
    touched: jax.Array      # (N,) bool
    spec_number: jax.Array  # (nsp,) int32
    bond_at1: jax.Array     # (mxB,) int32 — global atom ids
    bond_at2: jax.Array
    bond_type: jax.Array
    bond_start: jax.Array
    n_bond: jax.Array
    bt_count: jax.Array
    bt_lt_sum: jax.Array
    bt_lt_count: jax.Array
    bt_r_sum: jax.Array
    bt_r_count: jax.Array
    bt_r_mean: jax.Array
    bt_lt_mean: jax.Array
    ang_central: jax.Array
    ang_lig1: jax.Array
    ang_lig2: jax.Array
    ang_type: jax.Array
    n_angle: jax.Array
    n_jump: jax.Array
    jump_pos: jax.Array
    jump_neg: jax.Array

    def replace(self, **kw) -> "ReactiveGlobals":
        return dataclasses.replace(self, **kw)


def reactive_mode(cfg) -> bool:
    """True when the deck needs the replicated-topology path: reactive
    bonds/angles or electron jumps (constant-topology decks use the
    scalable per-atom-record path of parallel/slab.py instead)."""
    return cfg.use_bnd == 2 or cfg.use_angl == 2 or cfg.ejtype != 0


def make_globals(state) -> ReactiveGlobals:
    """Extract the replicated reactive globals from an MDState
    (host-side numpy; device placement is the caller's job)."""
    return ReactiveGlobals(**{k: np.asarray(getattr(state, k))
                              for k in _FIELDS})


def globals_spec():
    """Replicated PartitionSpec pytree (one P() per leaf)."""
    from jax.sharding import PartitionSpec as P
    return ReactiveGlobals(**{k: P() for k in _FIELDS})


def merge_into_state(state, rg: ReactiveGlobals):
    """Write the reactive globals back into an MDState pytree."""
    return state.replace(**{k: getattr(rg, k) for k in _FIELDS})


class _GlobalView:
    """Duck-typed MDState over the replicated globals + assembled
    geometry, so the single-chip reactive ops run unchanged."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def replace(self, **kw):
        d = dict(self.__dict__)
        d.update(kw)
        return _GlobalView(**d)


def assemble_global(n_at: int, gid, valid, arr, axis=AXIS):
    """psum-scatter a per-slot array to a gid-keyed global table.

    Each gid is owned by exactly one device (migration preserves
    uniqueness), so the sum over the mesh reproduces the exact local
    values — no averaging, no race."""
    idx = jnp.where(valid, gid, n_at)
    fill_shape = (n_at + 1,) + arr.shape[1:]
    tab = jnp.zeros(fill_shape, arr.dtype)
    m = valid if arr.ndim == 1 else valid[:, None]
    tab = tab.at[idx].set(jnp.where(m, arr, 0), mode="drop")
    return jax.lax.psum(tab[:n_at], axis)


def reactive_pass(cfg, ff, n_at, st_dict, valid, rg: ReactiveGlobals,
                  rng, step, eng_kin_prev=None, axis=AXIS):
    """Run the full single-chip reactive schedule on the replicated view.

    Mirrors runtime/step.py's stage order AROUND the pair pass:
    this function covers the pre-pair stage (apply_bonds with mutation)
    and returns a continuation for the post-pair stages (create_bonds,
    do_jumps, angles) so the caller can interleave the sharded pair and
    Ewald passes exactly where the single-chip step has them.

    Returns (stage2, frc_bond_local, e_bond, st_dict, rg) where
    ``stage2(rg, rng) -> (frc_post_local, e_angle, rg, rng)``.
    """
    from ..ops import angles as ops_angles
    from ..ops import bonds as ops_bonds
    from ..ops import cell_list as ops_cl
    from ..ops import ejump as ops_ejump
    from ..ops.pairs import bind_jump_candidates_rows

    N = n_at
    fdt = st_dict["pos"].dtype
    gid = st_dict["gid"]
    gsafe = jnp.clip(gid, 0, N - 1)

    # authoritative types live in the replicated table; per-slot types
    # are a cache refreshed after every mutation stage
    st_dict["types"] = jnp.where(valid, rg.types[gsafe], 0)

    pos_g = assemble_global(N, gid, valid, st_dict["pos"], axis)
    need_vel = bool(cfg.use_bnd == 2 and cfg.bond_equil_hack)
    vel_g = assemble_global(N, gid, valid, st_dict["vel"], axis) \
        if need_vel else jnp.zeros((N, 3), fdt)

    view = _GlobalView(
        pos=pos_g, vel=vel_g, frc=jnp.zeros((N, 3), fdt),
        rng=rng, step=step,
        **{k: getattr(rg, k) for k in _FIELDS})
    view = view.replace(touched=jnp.zeros((N,), bool))

    # --- bond forces + reactive repair/mutation (pre-pair stage) ---
    e_bond = jnp.zeros((), fdt)
    if cfg.use_bnd:
        view, e_bond = ops_bonds.apply_bonds(cfg, ff, view)
        if need_vel:
            # the equil hack zeroes velocities in the global view;
            # mirror per-slot (vel_g was assembled from these slots)
            st_dict["vel"] = jnp.where(valid[:, None],
                                       view.vel[gsafe], 0)
    frc_bond_local = jnp.where(valid[:, None], view.frc[gsafe], 0)
    view = view.replace(frc=jnp.zeros((N, 3), fdt))
    st_dict["types"] = jnp.where(valid, view.types[gsafe], 0)
    rg = ReactiveGlobals(**{k: getattr(view, k) for k in _FIELDS})

    want_bind = cfg.use_bnd == 2 and cfg.use_linkage != 0
    want_jump = cfg.ejtype != 0

    env_du_fn = None
    if want_jump and not cfg.use_bnd:
        # bond-free decks use the serial twin's environment dU
        # (ejump.cpp:200-262).  Shard the all-pairs sweep: each device
        # contributes the columns it OWNS (its valid slab slots) via
        # ops.ejump.env_du_partial — O(N*C) per device instead of a
        # replicated O(N^2) — and a psum restores the exact sums, so
        # every device still reaches the same jump decisions.
        from ..ops.ejump import env_du_partial
        pos_loc = st_dict["pos"]
        self_pairs = gid[None, :] == jnp.arange(
            N, dtype=jnp.int32)[:, None]
        valid_cols = valid

        def env_du_fn(s):
            tj_loc = jnp.where(valid_cols, s.types[gsafe], 0)
            dox, dred = env_du_partial(cfg, ff, pos_g, s.types,
                                       pos_loc, tj_loc, valid_cols,
                                       self_pairs)
            return (jax.lax.psum(dox, axis),
                    jax.lax.psum(dred, axis))

    def stage2(rg2: ReactiveGlobals, rng2):
        """Post-pair stages: create_bonds -> ejump -> angles."""
        v = _GlobalView(
            pos=pos_g, vel=vel_g, frc=jnp.zeros((N, 3), fdt),
            rng=rng2, step=step,
            **{k: getattr(rg2, k) for k in _FIELDS})

        if want_bind or want_jump:
            # SHARDED candidate selection: the cell table over the
            # global positions is replicated (cheap argsort), but each
            # device computes candidate rows only for the slots it
            # OWNS — O(N*M / n_dev) gather work instead of a replicated
            # O(N*M) — and one psum-scatter per output merges the
            # per-gid results.  Each row's arithmetic is identical to
            # the replicated pass, so devices still agree bit-exactly.
            table, _ = ops_cl.build_cell_table(cfg, pos_g)
            row_own = jnp.where(valid, gid, N)
            row_types = jnp.where(valid, v.types[gsafe], 0)
            row_parents = jnp.where(valid, v.parents[gsafe], -1)
            b_i, b_r2, j_i, _ = bind_jump_candidates_rows(
                cfg, ff, table, pos_g, v.types, v.parents,
                st_dict["pos"], row_own, row_types, row_parents,
                want_bind=want_bind, want_jump=want_jump)
            # merge with a SENTINEL-preserving psum: scatter (idx - N)
            # so a gid no device owns (an atom lost to a migration
            # deletion — already warned, run degraded) sums to 0 and
            # lands back on the sentinel N instead of looking like a
            # valid candidate pointing at atom 0
            bind_idx = assemble_global(N, gid, valid, b_i - N, axis) + N
            jump_idx = assemble_global(N, gid, valid, j_i - N, axis) + N
            bind_r2 = assemble_global(
                N, gid, valid, jnp.where(jnp.isfinite(b_r2), b_r2, 0),
                axis)
            bind_r2 = jnp.where(bind_idx >= N, jnp.inf, bind_r2)
        if want_bind:
            v = ops_bonds.create_bonds(cfg, ff, v, bind_idx, bind_r2)
        if want_jump:
            f = int(cfg.ejump_freq)
            if f < 0:
                active = (step % (-f)) == 0
                v = ops_ejump.do_jumps(cfg, ff, v, jump_idx,
                                       active=active,
                                       env_du_fn=env_du_fn)
            elif f <= 4:
                for _ in range(max(f, 1)):
                    v = ops_ejump.do_jumps(cfg, ff, v, jump_idx,
                                           env_du_fn=env_du_fn)
            else:
                # _GlobalView is not a pytree; loop over its dict
                def body(_, d):
                    s = ops_ejump.do_jumps(cfg, ff, _GlobalView(**d),
                                           jump_idx,
                                           env_du_fn=env_du_fn)
                    return {k: getattr(s, k) for k in d}
                v = _GlobalView(**jax.lax.fori_loop(
                    0, f, body, dict(v.__dict__)))

        e_angle = jnp.zeros((), fdt)
        if cfg.use_angl:
            if cfg.use_angl == 2:
                v = ops_angles.refresh_angles(cfg, ff, v)
            v, e_angle = ops_angles.apply_angles(cfg, ff, v)
        frc_post = jnp.where(valid[:, None], v.frc[gsafe], 0)
        rg2 = ReactiveGlobals(**{k: getattr(v, k) for k in _FIELDS})
        return frc_post, e_angle, rg2, v.rng

    return stage2, frc_bond_local, e_bond, st_dict, rg
