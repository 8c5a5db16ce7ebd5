"""Deck parser tests against the reference case-study decks."""

import math
import os

import numpy as np
import pytest

from aztotmd_tpu import units
from aztotmd_tpu.io import (parse_atoms_file, parse_control_file,
                            parse_device_cfg_dir, parse_field_file)
from aztotmd_tpu.io import control as ctl
from aztotmd_tpu.io import field as fld
from aztotmd_tpu.io.atoms import write_atoms, parse_atoms
from aztotmd_tpu.io.toplists import parse_bondlist, parse_anglelist


def test_units_match_reference_constants():
    # const.h:50 kB in eV/K; main.cu:40 Fcoul_scale
    assert units.KB == pytest.approx(8.617332e-5, rel=1e-5)
    assert units.FCOUL_SCALE == pytest.approx(14.3996, rel=1e-4)
    # mass unit: amu -> eV ps^2/A^2
    assert units.M_SCALE == pytest.approx(1.0364269e-4, rel=1e-5)


def test_control_case1(case1_dir):
    c = parse_control_file(os.path.join(case1_dir, "control.txt"),
                           charged_spec=False)
    assert c.t_step == 0.001
    assert c.n_step == 100000
    assert c.n_equil == 0
    assert c.freq_equil == 0            # nEq == 0 -> eqfreq not read
    assert c.tstat.type == ctl.TSTAT_RADI
    assert c.tstat.temp == 298.0
    assert c.tstat.step == 0            # "%d" on "0.2" reads 0
    # Ar is neutral -> electrostatics switched off (WARNING[b004])
    assert c.elec.type == ctl.ELEC_NONE
    assert c.elec.eps == 1.0
    assert c.init_vel == ctl.INITVEL_ZERO
    assert c.use_clist and c.cell_size == 85.0
    assert c.max_neigh == 185
    assert c.r_rdf == 14.0 and c.d_rdf == 0.02
    assert c.fr_rdf == 50 and c.fr_rdf_out == 500000
    assert c.nuclei_rdf is True
    assert c.ejump == 0 and c.ejtype == ctl.JUMP_NONE
    assert c.stat == 200
    assert c.revcon == 0


def test_control_case1_charged_keeps_fennel(case1_dir):
    c = parse_control_file(os.path.join(case1_dir, "control.txt"),
                           charged_spec=True)
    assert c.elec.type == ctl.ELEC_FENNEL
    assert c.elec.r_real == 8.0
    assert c.elec.alpha == 0.4


def test_control_case2(case2_dir):
    c = parse_control_file(os.path.join(case2_dir, "control.txt"),
                           charged_spec=False)
    assert c.n_step == 500000
    assert c.n_equil == 10000 and c.freq_equil == 2500
    assert c.tstat.type == ctl.TSTAT_RADI and c.tstat.temp == 500.0
    assert c.use_clist and c.cell_size == 2.7
    assert c.nuclei_rdf is False        # "-nucl" != "nucl"
    assert c.revcon == 50000


def test_field_case1(case1_dir):
    f = parse_field_file(os.path.join(case1_dir, "field.txt"))
    assert f.nSpec == 1
    sp = f.species[0]
    assert sp.name == "Ar"
    assert sp.mass == pytest.approx(39.9 * units.M_SCALE)
    assert sp.charge == 0.0
    assert not f.charged_spec
    assert len(f.pairpots) == 1
    pp = f.pairpots[0]
    assert pp.type == fld.VDW_LJ
    # LJ pre-scaling (vdw.cpp:283-288): p0=4e, p1=s^2, p2=24e
    assert pp.p0 == pytest.approx(4 * 0.01006)
    assert pp.p1 == pytest.approx(3.3952 ** 2)
    assert pp.p2 == pytest.approx(24 * 0.01006)
    assert pp.r2cut == pytest.approx(16.0)
    assert f.maxRvdw == pytest.approx(4.0)
    assert f.use_bnd == 0 and f.use_angl == 0


def test_field_case2_surkov(case2_dir):
    f = parse_field_file(os.path.join(case2_dir, "field.txt"))
    assert f.nSpec == 1
    pp = f.pairpots[0]
    assert pp.type == fld.VDW_SURK
    assert pp.use_radii == 1
    assert (pp.p0, pp.p1, pp.p2, pp.p3) == (75.0, 8.0, 1.0, 1.0)
    assert pp.r2cut == pytest.approx(36.0)
    sp = f.species[0]
    assert (sp.radA, sp.radB, sp.mxEng) == (2.73, 4.731, 0.2)


def test_atoms_case1(case1_dir):
    a = parse_atoms_file(os.path.join(case1_dir, "atoms.xyz"))
    assert a.n_atoms == 40000
    assert a.box == (1141.5, 1141.5, 1141.5)
    assert a.names[0] == "Ar"
    np.testing.assert_allclose(a.pos[0], [15.642396, 75.783592, 34.769455])
    assert a.pos.min() >= 0.0 and a.pos.max() <= 1141.5


def test_atoms_roundtrip(tmp_path):
    path = tmp_path / "rt.xyz"
    names = ["Ar", "Na", "Cl"]
    pos = np.array([[1.0, 2.0, 3.0], [4.5, 5.5, 6.5], [0.0, 0.1, 0.2]])
    write_atoms(path, names, pos, (10.0, 11.0, 12.0))
    a = parse_atoms(path.read_text())
    assert a.names == names
    np.testing.assert_allclose(a.pos, pos, atol=1e-6)
    assert a.box == (10.0, 11.0, 12.0)


def test_device_cfg_case1(case1_dir):
    d = parse_device_cfg_dir(case1_dir)
    assert d.nstep_stat == 50
    assert d.nstep_msdstat == 50
    assert d.nstep_bondstat == 50
    assert d.nstep_traj == 10
    assert d.nstep_bindtraj == 20
    assert d.bindtraj_per_thread == 1 and d.n_bindtraj_thread == 32
    assert d.pair_thread_a == 16 and d.pair_thread_b == 32


def test_bondlist_orients_bonds():
    from aztotmd_tpu.io.field import BondSpec
    # species: 0 = O, 1 = H; bond type 1 is O-H
    bonds = [BondSpec(), BondSpec(type=1, spec1=0, spec2=1)]
    types = [0, 1, 1]
    text = "2\n0 1 1\n2 0 1\n"   # second bond is reversed (H O)
    bl = parse_bondlist(text, types, bonds)
    assert bl.n_bonds == 2
    assert (bl.at1[1], bl.at2[1]) == (0, 2)   # swapped to O-H order
    assert bl.nbonds[0] == 2
    assert bl.parents[1] == 0 and bl.parents[2] == 0


def test_anglelist_roundtrip(tmp_path):
    text = "2\n0 1 2 1\n3 4 5 1\n"
    al = parse_anglelist(text)
    assert al.n_angles == 2
    assert list(al.central) == [0, 3]
    assert list(al.atype) == [1, 1]
