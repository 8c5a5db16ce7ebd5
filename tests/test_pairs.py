"""Pair-force unit tests: analytic values, autodiff cross-check, cell list
vs all-pairs oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aztotmd_tpu.core.config import build_sim_config
from aztotmd_tpu.core.ffield import build_forcefield
from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
from aztotmd_tpu.io.field import (VDW_LJ, FieldSpec, SpeciesSpec, VdWSpec,
                                  parse_field)
from aztotmd_tpu.ops import pairs as ops_pairs
from aztotmd_tpu.ops.vdw import vdw_eval

EPS, SIG = 0.01006, 3.3952


def lj_field(rcut=4.0):
    from aztotmd_tpu import units
    f = FieldSpec()
    f.species = [SpeciesSpec(name="Ar", nuclei=0,
                             mass=39.9 * units.M_SCALE, charge=0.0,
                             energy=0.0)]
    f.nnames = ["Ar"]
    f.nnumbers = [0]
    pp = VdWSpec(type=VDW_LJ, spec1=0, spec2=0, r2cut=rcut * rcut,
                 p0=4 * EPS, p1=SIG * SIG, p2=24 * EPS)
    f.pairpots = [pp]
    f.vdw_index = [[0]]
    f.maxRvdw = rcut
    return f


def lj_control(box=20.0, temp=10.0):
    c = ControlSpec(t_step=0.001, n_step=10, tstat=TStatSpec(type=0, temp=temp),
                    elec=ElecSpec(type=0))
    return c


def make_cfg(n_at, box, fld, ctl, dtype="f64", pos=None, **kw):
    return build_sim_config(ctl, fld, (box, box, box), n_at, dtype=dtype,
                            pos=pos, **kw)


def analytic_lj(r):
    sr6 = (SIG / r) ** 6
    e = 4 * EPS * sr6 * (sr6 - 1)
    # force magnitude along r: -dU/dr
    fmag = 24 * EPS / r * sr6 * (2 * sr6 - 1)
    return e, fmag


def test_lj_energy_force_analytic():
    for r in (3.0, 3.5, 3.8):
        kind = jnp.array([VDW_LJ])
        p = jnp.array([[4 * EPS, SIG * SIG, 24 * EPS, 0.0, 0.0]])
        r2 = jnp.array([r * r], jnp.float64)
        f, e = vdw_eval(kind, p, r2, jnp.sqrt(r2), families=(VDW_LJ,))
        e_ref, fmag_ref = analytic_lj(r)
        assert float(e[0]) == pytest.approx(e_ref, rel=1e-12)
        # vdw_eval returns force/r: F = f * r
        assert float(f[0] * r) == pytest.approx(fmag_ref, rel=1e-12)


def lattice(n_side, spacing, jitter, rng):
    """Cubic lattice + jitter: realistic separations, no force-cap clipping."""
    g = np.arange(n_side) * spacing
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    return pos + rng.uniform(-jitter, jitter, pos.shape)


def test_lj_force_matches_autodiff():
    """Force = -grad(U) on a jittered lattice (f64)."""
    jax.config.update("jax_enable_x64", True)
    fld, ctl = lj_field(), lj_control()
    rng = np.random.default_rng(0)
    pos = lattice(3, 4.0, 0.4, rng)
    N, box = len(pos), 12.0
    cfg = make_cfg(N, box, fld, ctl)
    ff = build_forcefield(fld, ctl.t_step, dtype=np.float64)
    pos = jnp.asarray(pos)
    types = jnp.zeros((N,), jnp.int32)

    def energy(x):
        pr = ops_pairs.all_pairs_forces(cfg, ff, x, types)
        return pr.eng_vdw.astype(jnp.float64)

    pr = ops_pairs.all_pairs_forces(cfg, ff, pos, types)
    g = jax.grad(energy)(pos)
    np.testing.assert_allclose(np.asarray(pr.frc), -np.asarray(g),
                               rtol=1e-8, atol=1e-10)


def test_cell_list_matches_all_pairs():
    jax.config.update("jax_enable_x64", True)
    fld, ctl = lj_field(), lj_control()
    rng = np.random.default_rng(1)
    pos = lattice(6, 4.1, 0.5, rng)
    N, box = len(pos), 6 * 4.1
    cfg = make_cfg(N, box, fld, ctl, target_occupancy=2.0, pos=pos)
    assert cfg.grid.n_cell > 8            # actually uses a grid
    ff = build_forcefield(fld, ctl.t_step, dtype=np.float64)
    pos = jnp.asarray(pos)
    types = jnp.zeros((N,), jnp.int32)

    a = ops_pairs.all_pairs_forces(cfg, ff, pos, types)
    b = ops_pairs.pair_forces(cfg, ff, pos, types)
    np.testing.assert_allclose(np.asarray(b.frc), np.asarray(a.frc),
                               rtol=1e-9, atol=1e-12)
    assert float(b.eng_vdw) == pytest.approx(float(a.eng_vdw), rel=1e-9)


def test_cell_list_small_grid_degenerate():
    """Tiny box -> degenerate grid with deduplicated stencil."""
    jax.config.update("jax_enable_x64", True)
    fld, ctl = lj_field(), lj_control()
    rng = np.random.default_rng(2)
    pos = lattice(2, 4.0, 0.3, rng)
    N, box = len(pos), 8.5
    cfg = make_cfg(N, box, fld, ctl, pos=pos)
    ff = build_forcefield(fld, ctl.t_step, dtype=np.float64)
    pos = jnp.asarray(pos)
    types = jnp.zeros((N,), jnp.int32)
    a = ops_pairs.all_pairs_forces(cfg, ff, pos, types)
    b = ops_pairs.pair_forces(cfg, ff, pos, types)
    np.testing.assert_allclose(np.asarray(b.frc), np.asarray(a.frc),
                               rtol=1e-9, atol=1e-12)


def test_surkov_potential_value():
    """Surkov radius-dependent potential vs direct formula
    (cuVdW.cu:236-257)."""
    from aztotmd_tpu.io.field import VDW_SURK
    p0, p1, p2, p3 = 75.0, 8.0, 1.0, 1.0
    r, r1, r2_ = 2.5, 0.6, 0.7
    kind = jnp.array([VDW_SURK])
    p = jnp.array([[p0, p1, p2, p3, 0.0]])
    f, e = vdw_eval(kind, p, jnp.array([r * r]), jnp.array([r]),
                    jnp.array([r1]), jnp.array([r2_]),
                    families=(VDW_SURK,))
    c2 = p1 / (p2 * r1 + p3 * r2_)
    rp = r1 * r2_
    c1ab2 = rp * rp * p0
    e_ref = rp / r ** 6 * (c1ab2 / r - c2)
    f_ref = rp / r ** 8 * (7 * c1ab2 / r - 6 * c2)
    assert float(e[0]) == pytest.approx(e_ref, rel=1e-5)
    assert float(f[0]) == pytest.approx(f_ref, rel=1e-5)
