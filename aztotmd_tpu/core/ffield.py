"""Force-field tables as device arrays.

The reference stores per-pair physics as device function pointers bound at
startup (cuVdW.cu:260-302 ``define_vdw_func``; cuBonds.cu:1236
``define_bond_potential``) and a charge-product matrix (cuInit.cu:811-873).
On TPU the function-pointer tables become integer *kind* matrices driving a
masked multi-family evaluation, and all parameters live in dense
(n_spec, n_spec, P) tables gathered per pair — a layout XLA can fuse
straight into the pair kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from ..io.field import FieldSpec


@jax.tree_util.register_dataclass
@dataclass
class ForceField:
    """Dense per-species / per-pair parameter tables (all jnp arrays)."""
    # species tables (dataStruct.h:244-290 Spec)
    spec_mass: jax.Array        # (nsp,)
    spec_rmass_hdt: jax.Array   # 0.5*dt/mass (sys_init.cpp:1056)
    spec_charge: jax.Array      # (nsp,)
    spec_energy: jax.Array      # own energy for e-jump dE
    spec_frozen: jax.Array      # (nsp,) int32
    spec_donacc: jax.Array      # (nsp,) int32 bit0 donor bit1 acceptor
    spec_oxform: jax.Array      # (nsp,) int32, 0 = none (1-based)
    spec_redform: jax.Array
    spec_varnumber: jax.Array   # (nsp,) int32
    spec_angle_type: jax.Array  # (nsp,) int32
    spec_rad_a: jax.Array       # thermal-radius params (radii section)
    spec_rad_b: jax.Array
    spec_mx_eng: jax.Array

    # pair tables
    chprod: jax.Array           # (nsp, nsp) q_i q_j / eps
    vdw_kind: jax.Array         # (nsp, nsp) int32, 0 = none, else VDW_*
    vdw_p: jax.Array            # (nsp, nsp, 5) parameters p0..p4
    vdw_r2cut: jax.Array        # (nsp, nsp)

    # bond-type tables (dataStruct.h:321-339 Bond); row 0 = empty bond
    bond_kind: jax.Array        # (nbt,) int32
    bond_spec1: jax.Array       # (nbt,) int32
    bond_spec2: jax.Array
    bond_p: jax.Array           # (nbt, 5)
    bond_r2min: jax.Array       # (nbt,)
    bond_r2max: jax.Array
    bond_mn_ex: jax.Array       # (nbt,) int32 lower-limit mutation flag
    bond_mx_ex: jax.Array       # upper-limit mutation/break flag
    bond_new_type: jax.Array    # (nbt, 2) int32 (may be negative = reversed)
    bond_new_spec1: jax.Array   # (nbt, 2) int32
    bond_new_spec2: jax.Array
    bond_hatom: jax.Array       # (nbt,) int32, -1 = covalent
    bond_evol: jax.Array        # (nbt,) int32

    # species-pair bond defaults (field.txt 'bonds' section matrix)
    def_bond: jax.Array         # (nsp, nsp) int32 signed bond type
    bonding_matr: jax.Array     # (nsp, nsp) int32 linkage bond type (signed)
    bind_r2: jax.Array          # (nsp, nsp) linkage radius^2

    # angle-type tables; row 0 = empty
    ang_kind: jax.Array         # (nat,) int32
    ang_central: jax.Array      # (nat,) int32
    ang_p: jax.Array            # (nat, 3)


def vdw_tables(fld: FieldSpec):
    """Dense (nsp, nsp) kind / parameter / cutoff tables from the parsed
    pair potentials (shared by the device tables and the static config
    the Pallas kernel specializes on)."""
    nsp = fld.nSpec
    vdw_kind = np.zeros((nsp, nsp), dtype=np.int32)
    vdw_p = np.zeros((nsp, nsp, 5))
    vdw_r2 = np.zeros((nsp, nsp))
    for idx, pp in enumerate(fld.pairpots):
        pairs = [(pp.spec1, pp.spec2)]
        # all potentials are symmetric in the tables; Surkov's (rad1, rad2)
        # asymmetry is carried by per-atom radii, not by spec order
        pairs.append((pp.spec2, pp.spec1))
        for (a, b) in pairs:
            if fld.vdw_index[a][b] == idx or (a, b) == (pp.spec1, pp.spec2):
                vdw_kind[a, b] = pp.type
                vdw_p[a, b] = [pp.p0, pp.p1, pp.p2, pp.p3, pp.p4]
                vdw_r2[a, b] = pp.r2cut
    return vdw_kind, vdw_p, vdw_r2


def build_forcefield(fld: FieldSpec, dt: float, eps: float = 1.0,
                     dtype=np.float32) -> ForceField:
    import jax.numpy as jnp

    nsp = fld.nSpec
    f = lambda a: jnp.asarray(np.asarray(a, dtype=dtype))
    i = lambda a: jnp.asarray(np.asarray(a, dtype=np.int32))

    mass = np.array([s.mass for s in fld.species])
    charge = np.array([s.charge for s in fld.species])

    chprod = np.outer(charge, charge) / eps

    vdw_kind, vdw_p, vdw_r2 = vdw_tables(fld)

    nbt = max(1, len(fld.bonds))
    bond_kind = np.zeros(nbt, dtype=np.int32)
    bond_s1 = np.zeros(nbt, dtype=np.int32)
    bond_s2 = np.zeros(nbt, dtype=np.int32)
    bond_p = np.zeros((nbt, 5))
    bond_r2min = np.zeros(nbt)
    bond_r2max = np.full(nbt, 1e18)
    bond_mn = np.zeros(nbt, dtype=np.int32)
    bond_mx = np.zeros(nbt, dtype=np.int32)
    bond_nt = np.zeros((nbt, 2), dtype=np.int32)
    bond_ns1 = np.zeros((nbt, 2), dtype=np.int32)
    bond_ns2 = np.zeros((nbt, 2), dtype=np.int32)
    bond_h = np.full(nbt, -1, dtype=np.int32)
    bond_ev = np.zeros(nbt, dtype=np.int32)
    for k, b in enumerate(fld.bonds):
        if k == 0:
            continue
        bond_kind[k] = b.type
        bond_s1[k], bond_s2[k] = b.spec1, b.spec2
        bond_p[k] = [b.p0, b.p1, b.p2, b.p3, b.p4]
        bond_r2min[k] = b.r2min
        bond_r2max[k] = b.r2max if b.mxEx else 1e18
        bond_mn[k], bond_mx[k] = b.mnEx, b.mxEx
        bond_nt[k] = b.new_type
        bond_ns1[k] = b.new_spec1
        bond_ns2[k] = b.new_spec2
        bond_h[k] = b.hatom
        bond_ev[k] = b.evol

    def mat(rows, default=0, dt_=np.int32):
        if rows:
            return np.asarray(rows, dtype=dt_)
        return np.full((nsp, nsp), default, dtype=dt_)

    def_bond = mat(fld.bond_matrix)
    bonding = mat(fld.bonding_matr)
    bind_r2 = np.asarray(fld.bindR2matrix, dtype=np.float64) \
        if fld.bindR2matrix else np.zeros((nsp, nsp))

    nat = max(1, len(fld.angles))
    ang_kind = np.zeros(nat, dtype=np.int32)
    ang_central = np.zeros(nat, dtype=np.int32)
    ang_p = np.zeros((nat, 3))
    for k, a in enumerate(fld.angles):
        if k == 0:
            continue
        ang_kind[k] = a.type
        ang_central[k] = a.central
        ang_p[k] = [a.p0, a.p1, a.p2]

    return ForceField(
        spec_mass=f(mass),
        spec_rmass_hdt=f(0.5 * dt / mass),
        spec_charge=f(charge),
        spec_energy=f([s.energy for s in fld.species]),
        spec_frozen=i([s.frozen for s in fld.species]),
        spec_donacc=i([s.donacc for s in fld.species]),
        spec_oxform=i([s.oxForm for s in fld.species]),
        spec_redform=i([s.redForm for s in fld.species]),
        spec_varnumber=i([s.varNumber for s in fld.species]),
        spec_angle_type=i([s.angleType for s in fld.species]),
        spec_rad_a=f([s.radA for s in fld.species]),
        spec_rad_b=f([s.radB for s in fld.species]),
        spec_mx_eng=f([s.mxEng for s in fld.species]),
        chprod=f(chprod),
        vdw_kind=i(vdw_kind), vdw_p=f(vdw_p), vdw_r2cut=f(vdw_r2),
        bond_kind=i(bond_kind), bond_spec1=i(bond_s1), bond_spec2=i(bond_s2),
        bond_p=f(bond_p), bond_r2min=f(bond_r2min), bond_r2max=f(bond_r2max),
        bond_mn_ex=i(bond_mn), bond_mx_ex=i(bond_mx),
        bond_new_type=i(bond_nt), bond_new_spec1=i(bond_ns1),
        bond_new_spec2=i(bond_ns2), bond_hatom=i(bond_h), bond_evol=i(bond_ev),
        def_bond=i(def_bond), bonding_matr=i(bonding), bind_r2=f(bind_r2),
        ang_kind=i(ang_kind), ang_central=i(ang_central), ang_p=f(ang_p),
    )
