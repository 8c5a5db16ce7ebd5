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


def write_lj_deck(path, n_side=9, box=40.0, steps=300, seed=5):
    """Write a small Ar LJ text deck (radiative tstat + RDF) at `path`
    — the runner-level fixture used by tests and dryrun_multichip.
    Format: the reference's three-file deck (sys_init.cpp:1036)."""
    import os
    rng = np.random.default_rng(seed)
    g = (np.arange(n_side) + 0.5) * (box / n_side)
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    pos += rng.uniform(-0.4, 0.4, pos.shape)
    with open(os.path.join(path, "atoms.xyz"), "w") as f:
        f.write(f"{len(pos)}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for p in pos:
            f.write(f"Ar\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    with open(os.path.join(path, "control.txt"), "w") as f:
        f.write(f"""timestep 0.001 ps
nstep {steps}
nequil  0
eqfreq 100
temperature 60.0\tradi\t0.2
init_vel\tzero\t0.0332
permittivity  1.0
elec\tfenn\t4.0\t0.4\t6\t6\t6
rdf\t6.0   0.05\t50\t0\tnucl
stat\t100
""")
    with open(os.path.join(path, "field.txt"), "w") as f:
        f.write("""spec 1
Ar\tAr\t39.9\t0.0\t0.0
red-ox 0
vdw 1
Ar\tAr\tlnjs\t4.0    0.01006\t3.3952
""")


def clustered_slab_system(n_dev=4, seed=11):
    """Two 6x6x6 jittered LJ clusters spanning slab boundaries in a
    dilute 40 A box — the dense/clustered regime that routes to the
    slab dense rectangular pair pass (parallel.slab._pair_pass_dense).
    Returns (cfg, ff, state, aux) with cfg already slab-prepared."""
    import dataclasses

    import jax.numpy as jnp

    from .parallel import slab

    n_side = 6
    n_at = 2 * n_side ** 3
    box = 40.0
    cfg, ff, state, aux = build_lj_argon(n_atoms=n_at,
                                         density=n_at / box ** 3,
                                         dtype="f32", seed=seed,
                                         temp=30.0)
    assert abs(cfg.box[0] - box) < 1e-6
    rng = np.random.default_rng(seed)
    g = np.arange(n_side) * 3.6
    lat = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    pos = np.concatenate([lat + np.array([2.0, 2.0, 2.0]),
                          lat + np.array([20.0, 18.0, 16.0])])
    pos = (pos + rng.uniform(-0.25, 0.25, (n_at, 3))) % box
    pos = pos.astype(np.float32)
    cfg = dataclasses.replace(cfg, pair_engine="pallas")
    cfg = slab.prepare_slab_cfg(cfg, n_dev)
    assert cfg.pair_engine == "pallas"      # dense slab path routed
    state = state.replace(pos=jnp.asarray(pos),
                          pos0=jnp.asarray(pos.copy()),
                          nbr_ref=jnp.asarray(pos + 1e9))
    return cfg, ff, state, aux


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
