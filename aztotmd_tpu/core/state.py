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
        # distinct buffers per field (donation forbids aliased leaves);
        # built from host zeros: a jnp.zeros would compile a tiny device
        # program (~1 s each over the axon remote-compile tunnel)
        return Energies(*[jnp.asarray(np.zeros((), dtype))
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
    # outer level of the two-level Verlet list (cfg.nb_outer > 1)
    nbr2_idx: jax.Array     # (N, max(n_neigh2, 1)) int32 (sentinel N)
    nbr2_over: jax.Array    # int32 max outer neighbor count seen
    rdf_over: jax.Array     # int32 max RDF-list neighbor count seen
    # row-compacted walk (cfg.nb_rowcap > 0): [atom id | neighbor ids]
    # for the rows that HAVE neighbors (ops/neighbors.compact_rows)
    nbrow_idx: jax.Array    # (max(nb_rowcap, 1), 1 + K) int32
    nbrow_over: jax.Array   # int32 max occupied-row count seen
    # outer-row-compacted refine (cfg.nb_orowcap > 0): ascending atom
    # ids with >=1 OUTER-list entry at the last full rebuild (sentinel
    # N); the every-nb_rebuild refine scans only these rows
    orow_idx: jax.Array     # (max(nb_orowcap, 1),) int32
    orow_over: jax.Array    # int32 max outer-occupied-row count seen
    #                         (ring mode builds an (N, k_cap) list per
    #                         stat period; counts beyond k_cap would be
    #                         silently truncated without this monitor)

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
    npdt = np.dtype(dt)
    # ALL init values are computed on the host; the finished pytree is
    # shipped with ONE async jax.device_put at the end.  Eager jnp ops
    # (zeros/full/scatter/random) would each compile a tiny XLA program,
    # and per-leaf jnp.asarray pays a synchronous tunnel round trip per
    # leaf — both cost minutes of setup on the axon tunnel.
    f3 = lambda a: np.asarray(a, npdt).reshape(N, 3)
    # distinct buffers everywhere: donation of the state pytree requires
    # that no two leaves alias the same device buffer
    z3 = lambda: np.zeros((N, 3), npdt)

    types_h = np.asarray(types, dtype=np.int32)
    pos = f3(pos)
    vel = f3(vel) if vel is not None else z3()
    parents = (np.asarray(parents, np.int32) if parents is not None
               else np.full((N,), -1, np.int32))
    nbonds = (np.asarray(nbonds, np.int32) if nbonds is not None
              else np.zeros((N,), np.int32))

    spec_number = np.bincount(types_h, minlength=cfg.n_spec) \
        .astype(np.int32)

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

    i0 = lambda: np.zeros((), np.int32)
    f0 = lambda: np.zeros((), npdt)
    # initial radii: 0.577 + small jitter (cuTemp.cu:41-42), to avoid
    # division by zero in radius-dependent potentials before the first
    # thermostat pass (host RNG: device-side sampling would compile)
    radii0 = (0.577 + 1e-4 * np.random.default_rng(seed ^ 0x5eed)
              .uniform(size=N)).astype(npdt)
    # threefry key data built on host: PRNGKey(seed) == [hi32, lo32]
    rng0 = np.array([seed >> 32, seed & 0xffffffff], np.uint32)

    zi = lambda *s: np.zeros(s, np.int32)
    zf = lambda *s: np.zeros(s, npdt)
    host_state = MDState(
        pos=pos, vel=vel, frc=z3(), types=types_h, parents=parents,
        nbonds=nbonds, pos0=pos.copy(), engs=zf(N),
        radii=radii0,
        spec_number=spec_number,
        chit=f0(), consint=f0(),
        energies=Energies(*[np.zeros((), npdt)
                            for _ in fields(Energies)]),
        pressure=f0(),
        pos_mom=zf(3), neg_mom=zf(3),
        mom_buf_pos=zf(cfg.n_mom, 3),
        mom_buf_neg=zf(cfg.n_mom, 3),
        i_mom=i0(),
        cross_pos=zi(cfg.n_spec, 3),
        cross_neg=zi(cfg.n_spec, 3),
        bond_at1=b_at1, bond_at2=b_at2,
        bond_type=b_t,
        bond_start=zi(mxB),
        n_bond=np.asarray(n_bond, np.int32),
        bt_count=bt_count,
        bt_lt_sum=zf(nbt), bt_lt_count=zi(nbt),
        bt_r_sum=zf(nbt), bt_r_count=zi(nbt),
        bt_r_mean=zf(nbt), bt_lt_mean=zf(nbt),
        ang_central=a_c, ang_lig1=a_1,
        ang_lig2=a_2, ang_type=a_t,
        n_angle=np.asarray(n_angle, np.int32),
        n_jump=i0(), jump_pos=i0(), jump_neg=i0(),
        nbr_idx=np.full((N, max(cfg.n_neigh, 1)), N, np.int32),
        # force a rebuild on the first step
        nbr_ref=pos + np.asarray(1e9, npdt),
        nbr_over=i0(), nbr_viol=i0(),
        nbr2_idx=np.full((N, max(cfg.n_neigh2, 1)), N, np.int32),
        nbr2_over=i0(), rdf_over=i0(),
        nbrow_idx=np.full(
            (max(cfg.nb_rowcap, 1),
             1 + (cfg.n_neigh if cfg.nb_rowcap else 1)), N, np.int32),
        nbrow_over=i0(),
        orow_idx=np.full((max(cfg.nb_orowcap, 1),), N, np.int32),
        orow_over=i0(),
        touched=np.zeros((N,), bool),
        rng=rng0,
        step=i0(), cell_overflow=i0(),
    )
    return jax.device_put(host_state)
