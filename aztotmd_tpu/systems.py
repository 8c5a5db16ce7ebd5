"""Programmatic system builders (no deck files needed).

The reference can only be driven by its text decks (control.txt /
field.txt / atoms.xyz, sys_init.cpp:1036); these helpers build equivalent
in-memory systems for benchmarks, tests, and the driver entry points.
"""

from __future__ import annotations

import numpy as np

from . import units
from .io.atoms import AtomsData
from .io.control import (ControlSpec, ElecSpec, TStatSpec, INITVEL_GAUSS,
                         TSTAT_NONE)
from .io.field import VDW_LJ, FieldSpec, SpeciesSpec, VdWSpec
from .runtime.setup import build_system

# case study 1 argon parameters (reference: case study 1/field.txt:5-6)
AR_EPS = 0.01006        # eV
AR_SIG = 3.3952         # A
AR_MASS = 39.9


def lj_argon_field(rcut: float = 4.0, eps: float = AR_EPS,
                   sig: float = AR_SIG) -> FieldSpec:
    f = FieldSpec()
    f.species = [SpeciesSpec(name="Ar", nuclei=0, mass=AR_MASS * units.M_SCALE,
                             charge=0.0, energy=0.0)]
    f.nnames = ["Ar"]
    f.nnumbers = [0]
    # LJ pre-scaling as the reference reader does (vdw.cpp:283-288):
    # p0 = 4 eps, p1 = sigma^2, p2 = 24 eps
    f.pairpots = [VdWSpec(type=VDW_LJ, spec1=0, spec2=0, r2cut=rcut * rcut,
                          p0=4 * eps, p1=sig * sig, p2=24 * eps)]
    f.vdw_index = [[0]]
    f.maxRvdw = rcut
    return f


def lattice_positions(n_atoms: int, density: float,
                      jitter: float = 0.05, seed: int = 0):
    """Cubic lattice filling a cubic box at the given number density."""
    rng = np.random.default_rng(seed)
    box = (n_atoms / density) ** (1.0 / 3.0)
    n_side = int(np.ceil(n_atoms ** (1.0 / 3.0)))
    spacing = box / n_side
    g = (np.arange(n_side) + 0.5) * spacing
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pos = pos[:n_atoms] + rng.uniform(-jitter, jitter, (n_atoms, 3)) * spacing
    return pos % box, box


def build_lj_argon(n_atoms: int = 4096, density: float = 0.012,
                   temp: float = 120.0, rcut: float = 4.0,
                   tstat: int = TSTAT_NONE, dt: float = 0.001,
                   dtype: str = "f32", seed: int = 7, **kw):
    """Liquid-ish argon LJ system; density in atoms/A^3.

    Returns (cfg, ff, state, aux).  Defaults give a realistic dense system
    (argon liquid is ~0.021 atoms/A^3); case study 1's dilute gas is
    density=2.69e-5.
    """
    pos, box = lattice_positions(n_atoms, density, seed=seed)
    ctl = ControlSpec(t_step=dt, n_step=100,
                      tstat=TStatSpec(type=tstat, temp=temp, tau=0.5),
                      elec=ElecSpec(type=0))
    ctl.init_vel = INITVEL_GAUSS
    ctl.tstat.temp = temp
    fld = lj_argon_field(rcut=rcut)
    atoms = AtomsData(names=["Ar"] * n_atoms, pos=pos, box=(box, box, box))
    return build_system(ctl, fld, atoms, dtype=dtype, seed=seed, **kw)
