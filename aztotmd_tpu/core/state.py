"""Simulation state as a pure-functional pytree.

The reference keeps all mutable simulation state in the ``cudaMD``
mega-struct mutated in place by kernels (cuStruct.h:188-423).  Here the
state is an immutable pytree threaded through one jitted step function —
all fixed shapes, so topology mutation works via capacity-padded arrays
with validity encoded in the type columns (type 0 = empty bond/angle slot).
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class Energies:
    """Per-step energy scalars (cuStruct.h energy fields; reset each step
    by reset_quantities, cuMDfunc.cu:270-316)."""
    kin: jax.Array          # engKin
    vdw: jax.Array          # engVdW
    coul1: jax.Array        # real-space Coulomb
    coul2: jax.Array        # reciprocal-space Ewald
    coul3: jax.Array        # Ewald constant part
    bond: jax.Array
    angle: jax.Array
    temp: jax.Array         # radiative thermostat internal energy
    field: jax.Array        # external electric field
    pot: jax.Array
    tot: jax.Array

    @staticmethod
    def zeros(dtype=jnp.float32) -> "Energies":
        # distinct buffers per field (donation forbids aliased leaves)
        return Energies(*[jnp.zeros((), dtype)
                          for _ in fields(Energies)])


@jax.tree_util.register_dataclass
@dataclass
class MDState:
    # --- per-atom arrays ---
    pos: jax.Array          # (N, 3)
    vel: jax.Array          # (N, 3)
    frc: jax.Array          # (N, 3)
    types: jax.Array        # (N,) int32 species id
    parents: jax.Array      # (N,) int32 bonded partner, -1 none
    nbonds: jax.Array       # (N,) int32 covalent bond count
    pos0: jax.Array         # (N, 3) initial positions (MSD output)
    engs: jax.Array         # (N,) thermal internal energy (radiative tstat)
    radii: jax.Array        # (N,) thermal radius (Surkov potential)

    # --- species counters ---
    spec_number: jax.Array  # (nsp,) int32

    # --- thermostat scalars ---
    chit: jax.Array
    consint: jax.Array

    # --- energies & derived quantities ---
    energies: Energies
    pressure: jax.Array
    # momentum through walls (pressure bookkeeping, cuMDfunc.cu:72-107)
    pos_mom: jax.Array      # (3,)
    neg_mom: jax.Array      # (3,)
    mom_buf_pos: jax.Array  # (n_mom, 3) ring buffer (main.cu:131-158)
    mom_buf_neg: jax.Array
    i_mom: jax.Array        # int32 ring index
    # box-crossing counters per species/direction (MSD output)
    cross_pos: jax.Array    # (nsp, 3) int32
    cross_neg: jax.Array

    # --- bonds (fixed capacity mx_bond; type 0 = empty slot) ---
    bond_at1: jax.Array     # (mxB,) int32
    bond_at2: jax.Array
    bond_type: jax.Array    # (mxB,) int32
    bond_start: jax.Array   # (mxB,) int32 creation step (lifetime stats)
    n_bond: jax.Array       # int32 number of live bonds
    # per-bond-type statistics (cuStruct.h:154-176 cudaBond)
    bt_count: jax.Array     # (nbt,) int32 current count
    bt_lt_sum: jax.Array    # (nbt,) summed lifetimes of destroyed bonds
    bt_lt_count: jax.Array  # (nbt,) int32
    bt_r_sum: jax.Array     # (nbt,) summed lengths (this step)
    bt_r_count: jax.Array   # (nbt,) int32
    bt_r_mean: jax.Array    # (nbt,)
    bt_lt_mean: jax.Array   # (nbt,)

    # --- angles (fixed capacity mx_angle; type 0 = empty slot) ---
    ang_central: jax.Array  # (mxA,) int32
    ang_lig1: jax.Array
    ang_lig2: jax.Array
    ang_type: jax.Array
    n_angle: jax.Array      # int32

    # --- electron jumps ---
    n_jump: jax.Array       # int32 jumps this sampling window
    jump_pos: jax.Array     # int32 box-crossing jump counters (x only,
    jump_neg: jax.Array     #   mirroring posBxJump.x/negBxJump.x)

    # --- Verlet neighbor list (pair_engine="neighbor") ---
    nbr_idx: jax.Array      # (N, K) int32 neighbor ids (sentinel N)
    nbr_ref: jax.Array      # (N, 3) positions at last rebuild
    nbr_over: jax.Array     # int32 max real neighbor count seen
    nbr_viol: jax.Array     # int32 skin-violation counter (stale list)

    # --- bookkeeping ---
    touched: jax.Array      # (N,) bool: atom's type/topology changed this
                            # step (the reference's oldTypes != -1 marker)
    rng: jax.Array          # PRNG key data
    step: jax.Array         # int32 global step counter
    cell_overflow: jax.Array  # int32 max cell occupancy seen (monitoring)

    def replace(self, **kw) -> "MDState":
        import dataclasses
        return dataclasses.replace(self, **kw)


def init_state(cfg, types, pos, vel=None, parents=None, nbonds=None,
               bonds=None, angles=None, seed: int = 12345) -> MDState:
    """Build the initial state pytree from host data.

    ``bonds``/``angles`` are the optional BondList/AngleList from decks.
    """
    N = cfg.n_at
    dt = cfg.jnp_dtype
    f3 = lambda a: jnp.asarray(np.asarray(a), dtype=dt).reshape(N, 3)
    # distinct buffers everywhere: donation of the state pytree requires
    # that no two leaves alias the same device buffer
    z3 = lambda: jnp.zeros((N, 3), dt)

    pos = f3(pos)
    vel = f3(vel) if vel is not None else z3()
    types = jnp.asarray(np.asarray(types, dtype=np.int32))
    parents = (jnp.asarray(np.asarray(parents, np.int32)) if parents is not None
               else jnp.full((N,), -1, jnp.int32))
    nbonds = (jnp.asarray(np.asarray(nbonds, np.int32)) if nbonds is not None
              else jnp.zeros((N,), jnp.int32))

    spec_number = jnp.zeros((cfg.n_spec,), jnp.int32).at[types].add(1)

    mxB = max(cfg.mx_bond, 1)
    b_at1 = np.zeros(mxB, np.int32)
    b_at2 = np.zeros(mxB, np.int32)
    b_t = np.zeros(mxB, np.int32)
    n_bond = 0
    if bonds is not None and bonds.n_bonds:
        n_bond = bonds.n_bonds
        if n_bond > mxB:
            raise ValueError(f"bond list ({n_bond}) exceeds capacity {mxB}")
        b_at1[:n_bond] = bonds.at1
        b_at2[:n_bond] = bonds.at2
        b_t[:n_bond] = bonds.btype

    mxA = max(cfg.mx_angle, 1)
    a_c = np.zeros(mxA, np.int32)
    a_1 = np.zeros(mxA, np.int32)
    a_2 = np.zeros(mxA, np.int32)
    a_t = np.zeros(mxA, np.int32)
    n_angle = 0
    if angles is not None and angles.n_angles:
        n_angle = angles.n_angles
        if n_angle > mxA:
            raise ValueError(f"angle list ({n_angle}) exceeds capacity {mxA}")
        a_c[:n_angle] = angles.central
        a_1[:n_angle] = angles.lig1
        a_2[:n_angle] = angles.lig2
        a_t[:n_angle] = angles.atype

    nbt = max(cfg.n_bond_types, 1)
    bt_count = np.zeros(nbt, np.int32)
    for k in b_t[:n_bond]:
        bt_count[k] += 1

    i0 = lambda: jnp.zeros((), jnp.int32)
    f0 = lambda: jnp.zeros((), dt)
    # initial radii: 0.577 + small jitter (cuTemp.cu:41-42), to avoid
    # division by zero in radius-dependent potentials before the first
    # thermostat pass
    radii0 = 0.577 + 1e-4 * jax.random.uniform(
        jax.random.PRNGKey(seed ^ 0x5eed), (N,), dt)

    return MDState(
        pos=pos, vel=vel, frc=z3(), types=types, parents=parents,
        nbonds=nbonds, pos0=pos.copy(), engs=jnp.zeros((N,), dt),
        radii=radii0,
        spec_number=spec_number,
        chit=f0(), consint=f0(),
        energies=Energies.zeros(dt), pressure=f0(),
        pos_mom=jnp.zeros((3,), dt), neg_mom=jnp.zeros((3,), dt),
        mom_buf_pos=jnp.zeros((cfg.n_mom, 3), dt),
        mom_buf_neg=jnp.zeros((cfg.n_mom, 3), dt),
        i_mom=i0(),
        cross_pos=jnp.zeros((cfg.n_spec, 3), jnp.int32),
        cross_neg=jnp.zeros((cfg.n_spec, 3), jnp.int32),
        bond_at1=jnp.asarray(b_at1), bond_at2=jnp.asarray(b_at2),
        bond_type=jnp.asarray(b_t),
        bond_start=jnp.zeros(mxB, jnp.int32),
        n_bond=jnp.asarray(n_bond, jnp.int32),
        bt_count=jnp.asarray(bt_count),
        bt_lt_sum=jnp.zeros(nbt, dt), bt_lt_count=jnp.zeros(nbt, jnp.int32),
        bt_r_sum=jnp.zeros(nbt, dt), bt_r_count=jnp.zeros(nbt, jnp.int32),
        bt_r_mean=jnp.zeros(nbt, dt), bt_lt_mean=jnp.zeros(nbt, dt),
        ang_central=jnp.asarray(a_c), ang_lig1=jnp.asarray(a_1),
        ang_lig2=jnp.asarray(a_2), ang_type=jnp.asarray(a_t),
        n_angle=jnp.asarray(n_angle, jnp.int32),
        n_jump=i0(), jump_pos=i0(), jump_neg=i0(),
        nbr_idx=jnp.full((N, max(cfg.n_neigh, 1)), N, jnp.int32),
        nbr_ref=pos + 1e9,      # force a rebuild on the first step
        nbr_over=i0(), nbr_viol=i0(),
        touched=jnp.zeros((N,), bool),
        rng=jax.random.PRNGKey(seed),
        step=i0(), cell_overflow=i0(),
    )
