"""System assembly: parsed decks -> (SimConfig, ForceField, MDState, aux).

Plays the role of the reference's init_md + init_cudaMD
(sys_init.cpp:1036-1121, cuInit.cu:756-1208): derived constants, initial
velocities, photon tables, Ewald k-tables, and the device state pytree.
"""

from __future__ import annotations

import os

import numpy as np

from .. import units
from ..core.config import SimConfig, build_sim_config
from ..core.ffield import ForceField, build_forcefield
from ..core.state import MDState, init_state
from ..io import (parse_atoms_file, parse_control_file, parse_device_cfg_dir,
                  parse_field_file)
from ..io.control import (ELEC_EWALD, INITVEL_CONST, INITVEL_ENG,
                          INITVEL_GAUSS, TSTAT_RADI, ControlSpec)
from ..io.toplists import parse_anglelist_file, parse_bondlist_file
from ..ops.elec import ewald_self_energy, make_kvectors
from ..ops.thermostat import sample_photon_energies
from .step import StepAux


def _gauss_velocities(masses, te_kin, deg_free, rng):
    """Gaussian initial velocities scaled to the target kinetic energy
    (temperature.cpp:262-337 ``gauss_temp``): sample, remove drift, scale."""
    n = len(masses)
    v = rng.normal(size=(n, 3)) / np.sqrt(masses)[:, None]
    v -= v.mean(axis=0, keepdims=True)
    kin = 0.5 * np.sum(masses[:, None] * v * v)
    if kin > 0:
        v *= np.sqrt(te_kin / kin)
    return v


def build_system(ctl: ControlSpec, fld, atoms, bonds=None, angles=None,
                 dtype: str = "f32", seed: int = 12345,
                 target_occupancy: float = 4.0, max_cells: int = 1 << 21,
                 extras: dict | None = None, pair_engine: str = "auto"):
    """Returns (cfg, ff, state, aux).

    ``extras``: optional dict that receives host-side init byproducts
    (currently ``vel0``, the NumPy initial velocities) so callers can
    avoid reading them back from the device.
    """
    n_at = atoms.n_atoms
    types = np.array([fld.spec_id(nm) for nm in atoms.names], dtype=np.int32)
    if (types < 0).any() or any(t is None for t in types):
        raise ValueError("unknown atom species in atoms deck")

    n_bonds_init = bonds.n_bonds if bonds is not None else 0
    cfg = build_sim_config(ctl, fld, atoms.box, n_at,
                           n_bonds_init=n_bonds_init, dtype=dtype,
                           target_occupancy=target_occupancy,
                           max_cells=max_cells, pos=atoms.pos,
                           pair_engine=pair_engine)

    # Ewald constant part needs actual charges
    if ctl.elec.type == ELEC_EWALD:
        q = np.array([fld.species[t].charge for t in types])
        import dataclasses
        cfg = dataclasses.replace(
            cfg, eng_ewald_const=ewald_self_energy(q, cfg))

    ff = build_forcefield(fld, ctl.t_step, eps=ctl.elec.eps,
                          dtype=np.float64 if dtype == "f64" else np.float32)

    rng = np.random.default_rng(seed)
    masses = np.array([fld.species[t].mass for t in types])
    vel = None
    if ctl.init_vel == INITVEL_GAUSS:
        vel = _gauss_velocities(masses, cfg.te_kin, cfg.deg_free, rng)
    elif ctl.init_vel == INITVEL_CONST:
        vel = np.tile(np.asarray(ctl.init_vel_vec), (n_at, 1))
    elif ctl.init_vel == INITVEL_ENG:
        # |v| from per-atom kinetic energy, random isotropic direction
        # (sys_init.cpp:762-790 used rand()%32 grids; we use true uniforms)
        speed = np.sqrt(2.0 * ctl.init_vel_ekin / masses)
        u = rng.normal(size=(n_at, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        vel = speed[:, None] * u

    state = init_state(
        cfg, types, atoms.pos, vel=vel,
        parents=bonds.parents if bonds is not None else None,
        nbonds=bonds.nbonds if bonds is not None else None,
        bonds=bonds, angles=angles, seed=seed)
    if extras is not None:
        extras["vel0"] = vel

    aux = StepAux()
    if cfg.tstat_type == TSTAT_RADI:
        import jax.numpy as jnp
        ph = sample_photon_energies(n_at, ctl.tstat.temp, rng)
        aux = StepAux(photons=jnp.asarray(ph, cfg.jnp_dtype))
    if cfg.elec_type == ELEC_EWALD:
        import jax.numpy as jnp
        rk, w = make_kvectors(cfg)
        aux = StepAux(photons=aux.photons,
                      rk=jnp.asarray(rk, cfg.jnp_dtype),
                      kweights=jnp.asarray(w, cfg.jnp_dtype))
    return cfg, ff, state, aux


def load_deck_dir(path, dtype: str = "f32", seed: int = 12345, **kw):
    """Load a reference deck directory (control.txt + field.txt + atoms.xyz
    [+ bonds.txt, angles.txt, cuda.txt])."""
    if dtype == "f64":
        import jax
        if not jax.config.jax_enable_x64:
            # jnp.asarray would silently truncate every array to f32
            # (observed on the TPU backend) — fail loudly instead of
            # "validating" in the precision under test
            raise RuntimeError(
                "dtype='f64' needs jax_enable_x64: set "
                "jax.config.update('jax_enable_x64', True) before any "
                "jax computation (the CLI does this for --dtype f64)")
    fld = parse_field_file(os.path.join(path, "field.txt"))
    ctl = parse_control_file(os.path.join(path, "control.txt"),
                             charged_spec=fld.charged_spec)
    atoms = parse_atoms_file(os.path.join(path, "atoms.xyz"))
    types = np.array([fld.spec_id(nm) for nm in atoms.names], dtype=np.int32)

    bonds = angles = None
    bpath = os.path.join(path, "bonds.txt")
    if fld.has_bond_list and os.path.exists(bpath):
        bonds = parse_bondlist_file(bpath, types, fld.bonds)
    apath = os.path.join(path, "angles.txt")
    if fld.has_angle_list and os.path.exists(apath):
        angles = parse_anglelist_file(apath, types, fld.angles)

    dev = parse_device_cfg_dir(path)
    extras: dict = {}
    cfg, ff, state, aux = build_system(ctl, fld, atoms, bonds, angles,
                                       dtype=dtype, seed=seed,
                                       extras=extras, **kw)
    return dict(cfg=cfg, ff=ff, state=state, aux=aux, ctl=ctl, fld=fld,
                atoms=atoms, dev=dev, bonds=bonds, angles=angles,
                vel0=extras.get("vel0"))
