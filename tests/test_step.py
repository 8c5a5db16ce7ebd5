"""Integration tests: energy/momentum conservation, thermostats."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aztotmd_tpu.core.ffield import build_forcefield
from aztotmd_tpu.core.state import init_state
from aztotmd_tpu.io.control import TSTAT_NONE, TSTAT_NOSE, TSTAT_RADI
from aztotmd_tpu.runtime.setup import build_system
from aztotmd_tpu.runtime.step import make_multi_step, make_step
from tests.test_pairs import lattice, lj_control, lj_field, make_cfg

from aztotmd_tpu.io.atoms import AtomsData


def build_lj_gas(n_side=4, spacing=4.2, temp=30.0, tstat=TSTAT_NONE,
                 dtype="f64", seed=3, rcut=4.0):
    rng = np.random.default_rng(seed)
    pos = lattice(n_side, spacing, 0.2, rng) + spacing / 2
    box = n_side * spacing + 1.0
    fld = lj_field(rcut)
    ctl = lj_control(temp=temp)
    ctl.tstat.type = tstat
    ctl.tstat.temp = temp
    if tstat == TSTAT_NOSE:
        ctl.tstat.tau = 0.2
    ctl.init_vel = 1    # gauss
    atoms = AtomsData(names=["Ar"] * len(pos), pos=pos % box,
                      box=(box, box, box))
    cfg, ff, state, aux = build_system(ctl, fld, atoms, dtype=dtype,
                                       seed=seed)
    return cfg, ff, state, aux


def total_energy(state):
    return float(state.energies.tot)


def test_nve_energy_conservation():
    """The unshifted truncation makes total energy jump by exactly U(rcut)
    when a pair crosses the cutoff (same as the reference); the integrator
    drift itself must be orders of magnitude below that.  The median
    per-step energy change is robust against the rare crossing jumps."""
    cfg, ff, state, aux = build_lj_gas(tstat=TSTAT_NONE, rcut=8.0)
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)      # energies valid after first full step
    es = [total_energy(state)]
    for _ in range(200):
        state = step(state, ff)
        es.append(total_energy(state))
    d = np.abs(np.diff(es))
    assert np.median(d) < 1e-8                  # integrator drift
    assert abs(es[-1] - es[0]) < 5e-3           # incl. crossing jumps
    assert int(state.step) == 201


def test_nve_momentum_conservation():
    cfg, ff, state, aux = build_lj_gas(tstat=TSTAT_NONE)
    mass = np.asarray(ff.spec_mass)[np.asarray(state.types)]
    p0 = (mass[:, None] * np.asarray(state.vel)).sum(axis=0)
    multi = make_multi_step(cfg, aux)
    state = multi(state, ff, 100)
    p1 = (mass[:, None] * np.asarray(state.vel)).sum(axis=0)
    np.testing.assert_allclose(p1, p0, atol=1e-9)


def test_nose_hoover_controls_temperature():
    cfg, ff, state, aux = build_lj_gas(temp=40.0, tstat=TSTAT_NOSE)
    multi = make_multi_step(cfg, aux)
    state = multi(state, ff, 500)
    # temperature = 2 engKin / (kB degFree)
    from aztotmd_tpu import units
    T = 2 * float(state.energies.kin) / (units.KB * cfg.deg_free)
    assert T == pytest.approx(40.0, rel=0.35)


def test_radiative_thermostat_runs_and_sets_radii():
    cfg, ff, state, aux = build_lj_gas(temp=298.0, tstat=TSTAT_RADI)
    assert aux.photons is not None
    # photon energies ~ Gamma(5, kT): mean 5 kT
    from aztotmd_tpu import units
    mean = float(np.mean(np.asarray(aux.photons)))
    assert mean == pytest.approx(5 * units.KB * 298.0, rel=0.15)
    multi = make_multi_step(cfg, aux)
    state = multi(state, ff, 50)
    # no 'radii' deck section -> radA=0 -> radii = 0/(B-E) = 0 like the
    # reference; they must at least be finite and the thermal energy real
    assert np.isfinite(np.asarray(state.radii)).all()
    assert float(state.energies.temp) > 0
    assert np.isfinite(np.asarray(state.vel)).all()
    # internal thermal energies should hover near the photon scale
    engs = np.asarray(state.engs)
    assert engs.mean() > 0


def test_wall_momentum_and_pressure_accumulate():
    cfg, ff, state, aux = build_lj_gas(temp=200.0)
    multi = make_multi_step(cfg, aux)
    state = multi(state, ff, 1500)
    crossings = int(np.asarray(state.cross_pos).sum()
                    + np.asarray(state.cross_neg).sum())
    assert crossings > 0
    assert np.isfinite(float(state.pressure))


def test_determinism_same_seed_same_trajectory():
    """Two runs from the same seed must be bit-identical (replaces the
    reference's hand-rolled atomics/race model, SURVEY.md §5)."""
    cfg, ff, state, aux = build_lj_gas(tstat=TSTAT_RADI, temp=40.0,
                                       dtype="f32", seed=17)
    step = jax.jit(make_step(cfg, aux))
    s1, s2 = state, state
    for _ in range(20):
        s1 = step(s1, ff)
        s2 = step(s2, ff)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    np.testing.assert_array_equal(np.asarray(s1.vel), np.asarray(s2.vel))
    assert float(s1.energies.tot) == float(s2.energies.tot)


def test_debug_invariants_clean_and_detect():
    from aztotmd_tpu.runtime.debug import assert_state_ok, check_state
    cfg, ff, state, aux = build_lj_gas(dtype="f64", seed=2)
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)
    assert_state_ok(cfg, state)          # clean state passes
    # corrupt: NaN force and out-of-range type are caught
    bad = state.replace(
        frc=state.frc.at[0, 0].set(jnp.nan),
        types=state.types.at[1].set(99))
    import pytest as _pt
    with _pt.raises(AssertionError):
        assert_state_ok(cfg, bad)


def test_f32_drift_envelope_matches_f64():
    """BASELINE.md target: f32 NVE drift within a usable envelope.
    Dense LJ, 500 steps: f64 conserves to ~1e-6; f32 must stay within
    1e-3 relative — the reference's own regime (float32 + force caps)."""
    import numpy as _np
    outs = {}
    for dt_ in ("f64", "f32"):
        cfg, ff, state, aux = build_lj_gas(n_side=5, spacing=4.0,
                                           temp=30.0, dtype=dt_, seed=11,
                                           rcut=8.0)
        step = jax.jit(make_step(cfg, aux))
        state = step(state, ff)
        e0 = float(state.energies.tot)
        for _ in range(500):
            state = step(state, ff)
        outs[dt_] = abs(float(state.energies.tot) - e0) / max(abs(e0), 1e-9)
    # both precisions share the truncation-jump noise of the unshifted
    # cutoff (same as the reference); f32 must stay within a small factor
    # of the f64 envelope plus the float resolution floor
    assert outs["f64"] < 2e-3
    assert outs["f32"] < max(5.0 * outs["f64"], 2e-3)


def test_shiftx_applies_constant_z_force():
    """shiftX directive: atoms beyond the x threshold get F_z = shiftVal
    (serial integrators.cpp:30-36)."""
    import dataclasses
    cfg, ff, state, aux = build_lj_gas(dtype="f64", seed=6, rcut=4.0)
    cfg = dataclasses.replace(cfg, shift_x=float(cfg.box[0]) / 2,
                              shift_val=0.25)
    from aztotmd_tpu.ops.integrate import verlet1
    upd, _ = verlet1(cfg, ff, state)
    pos, frc = np.asarray(upd["pos"]), np.asarray(upd["frc"])
    right = pos[:, 0] > cfg.shift_x
    assert right.any() and (~right).any()
    np.testing.assert_allclose(frc[right, 2], 0.25)
    np.testing.assert_allclose(frc[~right, 2], 0.0)
