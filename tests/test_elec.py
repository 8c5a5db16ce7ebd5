"""Electrostatics tests: Ewald vs direct lattice sum (Madelung), Fennel
DSF consistency, reciprocal-space force vs autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aztotmd_tpu import units
from aztotmd_tpu.io.atoms import AtomsData
from aztotmd_tpu.io.control import (ControlSpec, ElecSpec, TStatSpec,
                                    ELEC_EWALD, ELEC_FENNEL)
from aztotmd_tpu.io.field import FieldSpec, SpeciesSpec, VdWSpec, VDW_LJ
from aztotmd_tpu.runtime.setup import build_system
from aztotmd_tpu.ops.elec import ewald_recip, ewald_self_energy, make_kvectors


def nacl_system(n_side=2, a=5.64, elec_type=ELEC_EWALD, alpha=0.35,
                kmax=8, jitter=0.0, seed=0, r_real=None):
    """Rock-salt lattice of +-1 charges (NaCl, a = 5.64 A)."""
    rng = np.random.default_rng(seed)
    f = FieldSpec()
    f.species = [
        SpeciesSpec(name="Na", nuclei=0, mass=23.0 * units.M_SCALE,
                    charge=1.0, energy=0.0),
        SpeciesSpec(name="Cl", nuclei=1, mass=35.5 * units.M_SCALE,
                    charge=-1.0, energy=0.0),
    ]
    f.nnames = ["Na", "Cl"]
    f.nnumbers = [0, 0]
    # tiny LJ so there is some short-range repulsion; cutoff far from
    # the NN distance so truncation jumps don't pollute NVE tests
    pp = VdWSpec(type=VDW_LJ, spec1=0, spec2=1, r2cut=25.0,
                 p0=4 * 0.01, p1=2.3 ** 2, p2=24 * 0.01)
    f.pairpots = [pp]
    f.vdw_index = [[-1, 0], [0, -1]]
    f.maxRvdw = 5.0

    cells = n_side
    box = a * cells
    names, pos = [], []
    for i in range(2 * cells):
        for j in range(2 * cells):
            for k in range(2 * cells):
                names.append("Na" if (i + j + k) % 2 == 0 else "Cl")
                pos.append([i * a / 2, j * a / 2, k * a / 2])
    pos = np.asarray(pos, float)
    if jitter:
        pos = (pos + rng.uniform(-jitter, jitter, pos.shape)) % box

    ctl = ControlSpec(
        t_step=0.001, n_step=5,
        tstat=TStatSpec(type=0, temp=300.0),
        elec=ElecSpec(type=elec_type,
                      r_real=r_real if r_real else box / 2 * 0.99,
                      alpha=alpha,
                      kx=kmax, ky=kmax, kz=kmax))
    atoms = AtomsData(names=names, pos=pos, box=(box, box, box))
    cfg, ff, state, aux = build_system(ctl, f, atoms, dtype="f64", seed=1)
    return cfg, ff, state, aux


def direct_madelung_energy(pos, q, box, n_images=6):
    """Brute-force periodic lattice sum (slowly convergent; adequate for
    the Madelung constant at a few images)."""
    n = len(pos)
    eng = 0.0
    box = np.asarray(box)
    for sx in range(-n_images, n_images + 1):
        for sy in range(-n_images, n_images + 1):
            for sz in range(-n_images, n_images + 1):
                shift = np.array([sx, sy, sz]) * box
                d = pos[:, None, :] - pos[None, :, :] + shift
                r = np.sqrt(np.sum(d * d, axis=-1))
                qq = np.outer(q, q)
                if sx == sy == sz == 0:
                    np.fill_diagonal(r, np.inf)
                eng += 0.5 * np.sum(qq / r)
    return units.FCOUL_SCALE * eng


def test_ewald_reproduces_madelung_constant():
    """Total Ewald Coulomb energy of rock salt must give the Madelung
    constant M = -E a / (Fcoul N q^2) ~ 1.7476."""
    jax.config.update("jax_enable_x64", True)
    cfg, ff, state, aux = nacl_system(n_side=2, alpha=0.6, kmax=14)
    from aztotmd_tpu.ops.pairs import all_pairs_forces
    pr = all_pairs_forces(cfg, ff, state.pos, state.types)
    q = np.asarray(ff.spec_charge)[np.asarray(state.types)]
    frc_r, eng_r = ewald_recip(cfg, state.pos, jnp.asarray(q),
                               aux.rk, aux.kweights)
    e_total = float(pr.eng_coul) + float(eng_r) + cfg.eng_ewald_const
    n = cfg.n_at
    a_nn = 5.64 / 2                      # nearest-neighbor distance
    # E_lattice = -(N/2) * M * Fcoul * q^2 / a_nn  (M per ion pair)
    madelung = -2.0 * e_total * a_nn / (units.FCOUL_SCALE * n)
    assert madelung == pytest.approx(1.747565, rel=1e-4)


def test_ewald_recip_force_is_minus_grad():
    jax.config.update("jax_enable_x64", True)
    cfg, ff, state, aux = nacl_system(n_side=1, alpha=0.4, kmax=8,
                                      jitter=0.3, seed=3)
    q = jnp.asarray(np.asarray(ff.spec_charge)[np.asarray(state.types)])

    def e_recip(pos):
        _, e = ewald_recip(cfg, pos, q, aux.rk, aux.kweights)
        return e

    g = jax.grad(e_recip)(state.pos)
    frc, _ = ewald_recip(cfg, state.pos, q, aux.rk, aux.kweights)
    np.testing.assert_allclose(np.asarray(frc), -np.asarray(g),
                               rtol=1e-9, atol=1e-12)


def test_ewald_full_step_conserves_energy():
    """NVE with full Ewald on a jittered NaCl lattice (f64)."""
    jax.config.update("jax_enable_x64", True)
    from aztotmd_tpu.runtime.step import make_step
    # n_side=2 keeps erfc(alpha*Rc) ~ 2e-6 so the real-space cutoff
    # introduces no energy jump when pairs cross it
    cfg, ff, state, aux = nacl_system(n_side=2, alpha=0.6, kmax=14,
                                      jitter=0.1, seed=7)
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)
    e0 = float(state.energies.tot)
    for _ in range(150):
        state = step(state, ff)
    e1 = float(state.energies.tot)
    assert np.isfinite(e1)
    assert abs(e1 - e0) < 2e-4 * max(1.0, abs(e0))


def test_fennel_shifted_force_vanishes_at_cutoff():
    """The defining damped-shifted-force property (Fennel-Gezelter):
    both energy and force go smoothly to zero at r = Rc."""
    jax.config.update("jax_enable_x64", True)
    from aztotmd_tpu.ops.elec import coul_eval
    cfg, ff, state, aux = nacl_system(elec_type=ELEC_FENNEL, alpha=0.3)
    rc = cfg.r_real
    r = jnp.asarray([rc, 0.5 * rc], jnp.float64)
    f, e = coul_eval(cfg, r * r, r, jnp.asarray([1.0, 1.0]))
    # at the cutoff: exactly zero (within roundoff of the eV scale)
    assert abs(float(e[0])) < 1e-12 * units.FCOUL_SCALE
    assert abs(float(f[0]) * rc) < 1e-12 * units.FCOUL_SCALE
    # inside the cutoff: attractive-scale energy close to bare Coulomb
    # minus the shift terms, and f = -(1/r) dE/dr via autodiff
    def e_of_r(rr):
        ff_, ee_ = coul_eval(cfg, rr * rr, rr, jnp.asarray(1.0))
        return ee_
    g = jax.grad(e_of_r)(0.5 * rc)
    f_ref = -float(g) / (0.5 * rc)
    assert float(f[1]) == pytest.approx(f_ref, rel=1e-9)


def test_neighbor_engine_coulomb_matches_all_pairs():
    """Charged system through the Verlet-list engine (real-space Ewald
    fused into the pair pass) vs the all-pairs oracle."""
    import dataclasses
    jax.config.update("jax_enable_x64", True)
    from aztotmd_tpu.ops import neighbors as nbr
    from aztotmd_tpu.ops.pairs import all_pairs_forces
    cfg, ff, state, aux = nacl_system(n_side=2, alpha=0.6, kmax=14,
                                      jitter=0.2, seed=4)
    if cfg.pair_engine != "neighbor":
        cfg = dataclasses.replace(cfg, pair_engine="neighbor")
    idx, nmax, occ = nbr.build_neighbors(cfg, state.pos)
    assert int(nmax) <= cfg.n_neigh
    pr = nbr.pair_forces_neighbors(cfg, ff, state.pos, state.types, idx)
    po = all_pairs_forces(cfg, ff, state.pos, state.types)
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(po.frc),
                               rtol=1e-9, atol=1e-10)
    assert float(pr.eng_coul) == pytest.approx(float(po.eng_coul),
                                               rel=1e-10)
    assert float(pr.eng_vdw) == pytest.approx(float(po.eng_vdw),
                                              rel=1e-10)
