"""Statistical validation of the radiative thermostat
(ops/thermostat.py:tstat_radiative; reference semantics
cuTemp.cu:689-773 tstat_radi9 + temperature.cpp:28-89 photon_engs).

Model recap (per atom, per step):
  absorb: photon energy pe ~ Gamma(5, kT) clamped at 1 eV, velocity
      kick pe/(c m) in a uniform random direction; internal energy
      engs += pe - dKE_absorb.
  emit (when engs > 1e-4 eV): ph = 0.9 engs, kick ph/(c m) at angle
      acos(cos_phi) from v with cos_phi uniform in [-1, 1 - 2 ermc/v0]
      (mean -ermc/v0: net momentum bias AGAINST the motion);
      engs -= ph + dKE_emit.

Two analytic consequences this file pins statistically:

1. engTemp fixed point.  The internal-energy map is
   E_{n+1} = 0.1 (E_n + pe_n) + O(pe^2/(2 m c^2)), so the stationary
   mean is E* = <pe>/9 = 5 kB T / 9 per atom and
        engTemp = sum engs -> N * 5 kB T / 9,
   with per-atom stationary std sqrt(0.01/0.99 * Var(pe))
   = sqrt(0.0101 * 5) kT = 0.225 kT and ~90% decorrelation per step.
   Cross-check on real data: case study 1 (N=40000, T=298 K) predicts
   570.7 eV; the production run's stat.dat engTemp column sits at 572.

2. Kinetic energetics.  Mean kinetic-energy exchange per step is
        <dKE> = <pe^2>/(2 m c^2) - <ph^2>/(2 m c^2),
   absorb recoil vs emission drain, where the drain's sign comes
   ENTIRELY from the biased emission direction:
   <dKE_emit> = m v0 <cos> ermc + m ermc^2 / 2 = -m ermc^2 / 2
   (<cos> = -ermc/v0).  An isotropic-emission bug flips it to
   +m ermc^2 / 2 — a ~40 sigma shift in the test below.

Why no "kinetic temperature reaches the reservoir" assertion: the
radiative coupling is O((kT)^2/(m c^2)) ~ 1e-10 eV/atom/step for argon
at 298 K, so thermalizing the 40k-atom case-study-1 gas needs ~1e7
steps — the reference's own 100k-step headline run only reaches
engKin = 0.83 eV of the 1540 eV equipartition value.  The stationary
claim that IS reachable (engTemp) is pinned tightly instead, and the
kinetic side is pinned as a rate (single-step energetics, high N).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aztotmd_tpu import units
from aztotmd_tpu.io.control import TSTAT_RADI
from aztotmd_tpu.ops.thermostat import REV_LIGHT, tstat_radiative
from aztotmd_tpu.runtime.step import make_multi_step
from tests.test_step import build_lj_gas


def _mean_engtemp(temp, seed, n_side=8, n_settle=120, n_meas=30,
                  every=10):
    """Time-averaged engTemp of a radiative LJ gas, f64."""
    cfg, ff, state, aux = build_lj_gas(
        n_side=n_side, temp=temp, tstat=TSTAT_RADI, dtype="f64",
        seed=seed)
    multi = make_multi_step(cfg, aux)
    state = multi(state, ff, n_settle)
    vals = []
    for _ in range(n_meas):
        state = multi(state, ff, every)
        vals.append(float(state.energies.temp))
    return cfg.n_at, float(np.mean(vals)), float(np.std(vals))


def test_radiative_engtemp_stationary_matches_reservoir():
    """Stationary engTemp = N * 5 kB T / 9 (reservoir-derived, see
    module docstring).  Band: per-sample std 0.225 kT sqrt(N) is
    ~0.9% of the mean at N=512; the time average of 30 near-
    independent samples is ~0.17%; assert 6% (35x the expected
    fluctuation, room for the O(dKE) correction and the settle tail).
    """
    temp = 500.0
    n_at, mean, _ = _mean_engtemp(temp, seed=11)
    pred = n_at * 5.0 * units.KB * temp / 9.0
    assert mean == pytest.approx(pred, rel=0.06), (mean, pred)


def test_radiative_engtemp_scales_with_reservoir():
    """The fixed point is proportional to the reservoir temperature:
    doubling T must double the stationary engTemp (per-run band 6%
    each -> ratio band 10%)."""
    n1, m1, _ = _mean_engtemp(250.0, seed=7)
    n2, m2, _ = _mean_engtemp(500.0, seed=7)
    assert n1 == n2
    assert m2 / m1 == pytest.approx(2.0, rel=0.10), (m1, m2)


def test_radiative_regulation_same_fixed_point_from_hot_and_cold():
    """Regulation: a gas started with engs = 0 (cold) and a gas started
    with engs = 5 E* (hot) settle to the SAME stationary engTemp — the
    thermostat pulls toward its fixed point from both sides."""
    temp = 400.0
    cfg, ff, state, aux = build_lj_gas(
        n_side=8, temp=temp, tstat=TSTAT_RADI, dtype="f64", seed=3)
    estar = 5.0 * units.KB * temp / 9.0
    hot = state.replace(engs=jnp.full_like(state.engs, 5.0 * estar))
    multi = make_multi_step(cfg, aux)
    outs = []
    for s0 in (state, hot):
        s = multi(s0, ff, 120)
        vals = []
        for _ in range(20):
            s = multi(s, ff, 10)
            vals.append(float(s.energies.temp))
        outs.append(np.mean(vals))
    cold_m, hot_m = outs
    assert hot_m == pytest.approx(cold_m, rel=0.04), (cold_m, hot_m)
    assert cold_m == pytest.approx(cfg.n_at * estar, rel=0.06)


def test_radiative_single_step_kinetic_energetics():
    """High-statistics single-step test of the kinetic exchange.

    N = 2^17 argon atoms, engs preset to E*, Maxwell velocities at a
    cold T_kin (v_th >> emission recoil ermc so the cos-bias window
    never clips).  The photon assignment is a pure rotation of the
    table (thermostat.py:137-141), so the per-atom photon energies are
    a permutation of the table and the PREDICTED mean exchange is
    exact in the direction-average:

        pred = mean_j [ pe_j^2 - 0.81 (E* + pe_j)^2 ] / (2 m c^2)

    The residual noise is the random-direction terms (absorb
    m v.u dv and emission m v0 ermc cos), whose std the test measures
    from the data itself; the assertion is a 6-sigma band plus a 10%
    modeling floor.  Sensitivity: an isotropic-emission bug shifts the
    mean by m <ermc^2> (= 2x the emission drain), ~40 sigma here; a
    dropped absorb recoil shifts it by <pe^2>/(2 m c^2), ~20 sigma.
    """
    temp = 298.0
    t_kin = 0.5                      # K; v_th ~ 0.06 A/ps >> ermc ~2e-3
    n = 1 << 17
    kt = units.KB * temp
    rng = np.random.default_rng(42)

    # minimal one-species system: masses etc. from the LJ helpers
    cfg, ff, state, aux = build_lj_gas(n_side=4, temp=temp,
                                       tstat=TSTAT_RADI, dtype="f64")
    m = float(np.asarray(ff.spec_mass)[0])

    from aztotmd_tpu.ops.thermostat import sample_photon_energies
    photons = jnp.asarray(sample_photon_energies(n, temp, rng))
    estar = 5.0 * kt / 9.0

    v_std = np.sqrt(units.KB * t_kin / m)
    vel = rng.normal(0.0, v_std, size=(n, 3))
    mc2 = m / (REV_LIGHT * REV_LIGHT)

    # synthetic state at exactly the stationary internal energy
    big = dataclasses.replace(
        cfg, n_at=n, n_spec=1,
        # neighbor machinery unused by the direct tstat call
    )
    st = state.replace(
        pos=jnp.zeros((n, 3), jnp.float64),
        vel=jnp.asarray(vel),
        engs=jnp.full((n,), estar, jnp.float64),
        types=jnp.zeros((n,), jnp.int32),
        rng=jnp.asarray([123456789, 987654321], jnp.uint32),
        step=jnp.asarray(17, jnp.int32),
    )

    @jax.jit
    def one(st, photons):
        vel2, engs2, _, _, key = tstat_radiative(big, ff, st, photons)
        return vel2, engs2, key

    reps = 96
    resid = []
    preds = []
    sum_dke = 0.0
    sum_pred = 0.0
    for k in range(reps):
        e0 = np.asarray(st.engs)
        pe = np.asarray(photons)          # permutation-invariant mean
        pred = np.mean(pe**2 - 0.81 * (e0.mean() + pe) ** 2) / (2 * mc2)
        ke0 = 0.5 * m * float(jnp.sum(st.vel * st.vel))
        vel2, engs2, key = one(st, photons)
        ke1 = 0.5 * m * float(jnp.sum(vel2 * vel2))
        dke = (ke1 - ke0) / n
        sum_dke += dke
        sum_pred += pred
        resid.append(dke - pred)
        preds.append(pred)
        st = st.replace(vel=vel2, engs=engs2, rng=key,
                        step=st.step + 1)

    resid = np.asarray(resid)
    # se of the mean over reps: the per-rep residual is already an
    # average over n atoms, so its run-to-run std captures the full
    # direction noise
    se = resid.std(ddof=1) / np.sqrt(reps)
    mean_resid = resid.mean()
    floor = 0.10 * abs(sum_pred / reps)
    tol = 6.0 * se + floor
    assert abs(mean_resid) < tol, (mean_resid, se, sum_pred / reps)

    # scale sanity: the drain and the recoil are each O(1e-9) eV/atom
    # at 298 K — make sure the test is actually sensitive (a 2x-drain
    # bug = m<ermc^2> would exceed the band)
    drain2x = np.mean((0.9 * (estar + np.asarray(photons))) ** 2) / mc2
    assert drain2x > 3.0 * tol, (drain2x, tol)


def test_radiative_engs_distribution_matches_gamma_map():
    """The stationary per-atom engs distribution of the map
    E' = 0.1(E + pe) has mean <pe>/9 and variance Var(pe)/99.
    Checked on the pooled per-atom engs of a settled gas (4096 atoms
    x 1 snapshot; se of the variance ~ 2.2%)."""
    temp = 500.0
    cfg, ff, state, aux = build_lj_gas(
        n_side=16, temp=temp, tstat=TSTAT_RADI, dtype="f64", seed=5)
    multi = make_multi_step(cfg, aux)
    state = multi(state, ff, 150)
    engs = np.asarray(state.engs)
    kt = units.KB * temp
    assert engs.mean() == pytest.approx(5 * kt / 9, rel=0.05)
    assert engs.var() == pytest.approx(5 * kt * kt / 99, rel=0.25)
