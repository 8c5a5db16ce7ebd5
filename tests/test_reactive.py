"""Reactive topology tests: bond formation via linkage rules and bond
breaking at the upper length limit (the 'hard part' of SURVEY.md §7 —
atomicCAS locks replaced by deterministic claims)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aztotmd_tpu.io.atoms import AtomsData
from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
from aztotmd_tpu.io.field import parse_field
from aztotmd_tpu.runtime.setup import build_system
from aztotmd_tpu.runtime.step import make_step

# A and B form a harmonic bond (k=10, r0=1.5) when within 1.8 A
# (linkage); the bond breaks at r > 2.5 back into free A + B
FIELD = """
spec 2
A\tA\t20.0\t0.0\t0.0
B\tB\t20.0\t0.0\t0.0
red-ox 0
vdw 1
A\tA\tlnjs\t4.0\t0.005\t2.0
bonds 1
1 A B harm 10.0 1.5 con br 2.5 A B
linkage 1
A B 1.8 1
"""


def reactive_system(pos, names):
    fld = parse_field(FIELD)
    assert fld.use_bnd == 2 and fld.use_linkage == 1
    ctl = ControlSpec(t_step=0.0001, n_step=4,
                      tstat=TStatSpec(type=0, temp=10.0),
                      elec=ElecSpec(type=0))
    atoms = AtomsData(names=names, pos=np.asarray(pos, float),
                      box=(12.0, 12.0, 12.0))
    return build_system(ctl, fld, atoms, dtype="f64", seed=3)


def test_bond_forms_within_linkage_radius():
    pos = [[5.0, 5.0, 5.0], [6.2, 5.0, 5.0],      # A-B pair at 1.2 A
           [1.0, 1.0, 1.0], [10.0, 10.0, 10.0]]   # far-away A, B
    cfg, ff, state, aux = reactive_system(pos, ["A", "B", "A", "B"])
    assert int(state.n_bond) == 0
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)
    assert int(state.n_bond) == 1
    at1 = int(state.bond_at1[0])
    at2 = int(state.bond_at2[0])
    assert {at1, at2} == {0, 1}
    assert int(state.bond_type[0]) == 1
    assert int(state.bt_count[1]) == 1
    # parents recorded both ways
    assert int(state.parents[at1]) == at2
    assert int(state.parents[at2]) == at1
    # the far pair (9+ A apart) did not bind
    assert int(state.n_bond) == 1


def test_bond_breaks_beyond_upper_limit():
    pos = [[5.0, 5.0, 5.0], [6.2, 5.0, 5.0],
           [1.0, 1.0, 1.0], [10.0, 10.0, 10.0]]
    cfg, ff, state, aux = reactive_system(pos, ["A", "B", "A", "B"])
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)
    assert int(state.bt_count[1]) == 1
    # yank the pair apart beyond the break radius (2.5 A)
    newpos = state.pos.at[1, 0].set(state.pos[0, 0] + 3.1)
    state = state.replace(pos=newpos)
    state = step(state, ff)
    assert int(state.bt_count[1]) == 0
    live = int(jnp.sum(state.bond_type != 0))
    assert live == 0
    # atoms are free again and can re-bind on approach
    newpos = state.pos.at[1, 0].set(state.pos[0, 0] + 1.3)
    state = state.replace(pos=newpos,
                          vel=jnp.zeros_like(state.vel))
    state = step(state, ff)
    assert int(state.bt_count[1]) == 1


def test_no_double_binding_three_candidates():
    """Three atoms in a row: the middle B can bind only one A (the
    deterministic claim replaces the reference's CAS lock,
    cuBonds.cu:977-986)."""
    pos = [[5.0, 5.0, 5.0], [6.3, 5.0, 5.0], [7.6, 5.0, 5.0]]
    cfg, ff, state, aux = reactive_system(pos, ["A", "B", "A"])
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)
    assert int(state.n_bond) == 1
    # B (atom 1) is bonded exactly once
    assert int(state.nbonds[1]) == 1


def test_hbond_nbonds_convention():
    """H-bonds (field.txt 'h-bonds' section): the heavy endpoint does not
    count the bond toward nbonds; only the H atom gets a parent
    (cuBonds.cu:1047-1056; bonds.cpp:85-99)."""
    field = """
spec 2
O\tO\t16.0\t0.0\t0.0
H\tH\t1.0\t0.0\t0.0
red-ox 0
vdw 1
O\tO\tlnjs\t4.0\t0.005\t2.5
bonds 1
1 O H harm 20.0 1.0 con con
h-bonds 1
1 H
"""
    from aztotmd_tpu.io.field import parse_field
    from aztotmd_tpu.io.toplists import parse_bondlist
    from aztotmd_tpu.ops.bonds import refresh_derived
    fld = parse_field(field)
    assert fld.bonds[1].hatom == 1        # H species id
    pos = [[5.0, 5.0, 5.0], [6.0, 5.0, 5.0], [1.0, 1.0, 1.0]]
    names = ["O", "H", "O"]
    types = np.array([0, 1, 0], np.int32)
    bonds = parse_bondlist("1\n0 1 1\n", types, fld.bonds)
    from aztotmd_tpu.io.atoms import AtomsData
    from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
    ctl = ControlSpec(t_step=0.0001, n_step=2,
                      tstat=TStatSpec(type=0, temp=10.0),
                      elec=ElecSpec(type=0))
    atoms = AtomsData(names=names, pos=np.asarray(pos, float),
                      box=(10.0, 10.0, 10.0))
    from aztotmd_tpu.runtime.setup import build_system
    cfg, ff, state, aux = build_system(ctl, fld, atoms, bonds=bonds,
                                       dtype="f64", seed=2)
    state = refresh_derived(cfg, ff, state)
    # O (atom 0) does NOT count the H-bond; H (atom 1) does
    assert int(state.nbonds[0]) == 0
    assert int(state.nbonds[1]) == 1
    # only the H atom is parented
    assert int(state.parents[1]) == 0
    assert int(state.parents[0]) == -1
