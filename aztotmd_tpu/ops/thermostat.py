"""Thermostats: naive scaling, Nosé–Hoover, and the radiative
(photon-exchange) thermostat.

Re-design of reference src/cuTemp.cu: ``temp_scale`` (:77-107),
``before_nose``/``tstat_nose``/``after_nose`` (:115-163) and
``tstat_radi9`` (:689-773) with its photon absorb/emit helpers
(:484-507 ``adsorb_rand_photon``, :631-685 ``radiate_photon3``).

The xorshift128 RNG + precomputed unit-vector table of the reference
become threefry (`jax.random`) with exact isotropic vectors; the
precomputed photon-energy array (temperature.cpp:28-89 ``photon_engs``,
a bisection sampler of P ~ e^4 exp(-e/kT), i.e. Gamma(5, kT)) is sampled
directly from the Gamma(5) distribution on the host at init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..io.control import TSTAT_NOSE, TSTAT_RADI

LIGHT = 2.9979e4            # speed of light, A/ps (cuTemp.h)
REV_LIGHT = 3.33567e-5      # 1/c


def sample_photon_energies(n: int, temp: float, rng: np.random.Generator):
    """Photon energies for the radiative thermostat.

    The reference's bisection inverts the CDF of P(e) ~ e^4 exp(-e/kT)
    restricted to [0, 1] eV (temperature.cpp:28-89) — a Gamma(5, kT)
    distribution capped at 1 eV.  We sample Gamma(5) exactly and clamp.
    """
    from .. import units
    kt = units.KB * temp
    e = rng.gamma(5.0, kt, size=n)
    return np.minimum(e, 1.0)


def temp_scale(cfg, vel, eng_kin):
    """Naive velocity rescale to target kinetic energy (cuTemp.cu:77-113).
    The 0.25 factor for the radiative thermostat comes from the model's
    kinetic-energy partition (cuTemp.cu:90-94)."""
    c = 0.25 if cfg.tstat_type == TSTAT_RADI else 1.0
    k = jnp.sqrt(c * cfg.te_kin / eng_kin)
    k = jnp.where(eng_kin > 0.0, k, 1.0)
    return vel * k, jnp.asarray(cfg.te_kin, eng_kin.dtype)


def nose_apply(cfg, vel, eng_kin, chit, consint):
    """One Nosé–Hoover scaling pass (before_nose + tstat_nose +
    after_nose(refresh_kin=1), cuTemp.cu:115-163).  Called twice per step
    like the reference (start of step, main.cu:291-299, and in apply_tstat,
    cuTemp.cu:787-793)."""
    dt = cfg.dt
    chit = chit + dt * (eng_kin - cfg.te_kin) * cfg.rqmass
    tscale = 1.0 - dt * chit
    vel = vel * tscale
    eng_kin = eng_kin * tscale * tscale
    consint = consint + dt * chit * cfg.qmass_tau2
    chit = chit + dt * (eng_kin - cfg.te_kin) * cfg.rqmass
    return vel, eng_kin, chit, consint


def _rand_uvect_from(u, v, dtype):
    """Uniform unit vector from two uniforms (sphere point picking) —
    no normals, no norm (cheaper than normal-deviate + normalize)."""
    z = 2.0 * u - 1.0
    rho = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * jnp.pi) * v
    return jnp.stack([rho * jnp.cos(phi), rho * jnp.sin(phi), z], axis=-1)


def _angled_vector(v, cos_phi, theta):
    """Unit vector at angle acos(cos_phi) from v, rotated by theta around
    it (cuTemp.cu:395-453 ``get_angled_vector``), vectorized with a
    branch-free orthonormal basis (rsqrt instead of norm+divide)."""
    v1 = v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-30)
    # branch-free perpendicular: pick the axis least aligned with v1
    ax = jnp.argmin(jnp.abs(v1), axis=-1)
    e = jax.nn.one_hot(ax, 3, dtype=v.dtype)
    v2 = jnp.cross(v1, e)
    v2 = v2 * jax.lax.rsqrt(jnp.sum(v2 * v2, axis=-1, keepdims=True)
                            + 1e-30)
    v3 = jnp.cross(v1, v2)
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))
    ct, st = jnp.cos(theta), jnp.sin(theta)
    return (v1 * cos_phi[..., None]
            + sin_phi[..., None] * (ct[..., None] * v2 + st[..., None] * v3))


def tstat_radiative(cfg, ff, state, photons, gid=None, valid=None):
    """Radiative thermostat step (tstat_radi9, cuTemp.cu:689-773).

    Every atom absorbs one photon from the precomputed energy table
    (rotating index) and, if its internal energy exceeds 1e-4 eV, re-emits
    90% of it in a velocity-biased direction; the thermal radius
    r = A/(B - E) feeding the Surkov potential is refreshed.

    ``gid``: global atom ids (defaults to arange(n)); the noise is a pure
    function of (seed, step, gid) — see ops/prng.py — so the sharded slab
    step reproduces the single-device trajectory atom for atom.
    ``valid``: slot mask for slab mode (empty slots contribute nothing).

    Returns (vel, engs, radii, eng_temp, rng).
    """
    from . import prng
    dt = state.pos.dtype
    types = state.types
    n = types.shape[0]
    mass = ff.spec_mass[types]
    vel = state.vel
    engs = state.engs

    if gid is None:
        gid = jnp.arange(n, dtype=jnp.int32)
    # counter RNG: four 16-bit uniforms per atom (two for the absorb
    # direction, cosine + azimuth for the emit), keyed by the run seed
    # (rng word 1), the step counter, and the global atom id — the
    # per-thread xorshift streams of the reference, made deterministic.
    # The returned key is freshly advanced (never the input buffer:
    # donation forbids output leaves aliasing input leaves) but the
    # draw itself depends only on (seed, step, gid), so every device
    # of a slab decomposition reproduces the same per-atom kicks.
    u = prng.uniform4_16(state.rng.reshape(-1)[-1], state.step, gid, dt)
    key = state.rng + jnp.uint32(0x9E3779B9) * jnp.asarray(
        [1, 0], state.rng.dtype)

    # rotating photon index (the reference walks the table by per-block
    # atomicAdd of curEng; a stride by a large odd constant per step gives
    # the same decorrelation without the race).  pe[i] =
    # photons[(gid_i + step*C) % N]; for the contiguous single-device
    # gid this is a pure rotation — jnp.roll (two dynamic slices), NOT a
    # general gather, which TPU executes at ~6.6 ns/element (265 us/step
    # profiled, the single most expensive per-step op before this).
    N = cfg.n_at
    shift = (state.step.astype(jnp.uint32)
             * jnp.uint32(2654435761)) % jnp.uint32(N)
    if valid is None and gid.shape[0] == N:
        pe = jnp.roll(photons, -shift.astype(jnp.int32))
    else:
        ei = (gid.astype(jnp.uint32) + shift) % jnp.uint32(N)
        pe = photons[ei.astype(jnp.int32)]
        pe = jnp.where(valid, pe, 0.0) if valid is not None else pe

    # --- absorb (adsorb_rand_photon, cuTemp.cu:484-507) ---
    v02 = jnp.sum(vel * vel, axis=-1)
    uvec = _rand_uvect_from(u[:, 0], u[:, 1], dt)
    vel = vel + (pe * REV_LIGHT / mass)[:, None] * uvec
    v12 = jnp.sum(vel * vel, axis=-1)
    engs = engs + pe + 0.5 * mass * (v02 - v12)

    # --- radiate (radiate_photon3, cuTemp.cu:631-685) ---
    do_rad = engs > 1e-4
    v02 = v12
    rv0 = jax.lax.rsqrt(jnp.maximum(v02, 1e-30))
    v0 = v02 * rv0
    ph = 0.9 * engs
    ermc = ph * REV_LIGHT / mass
    ermcv0 = ermc * rv0
    # random cosine in [-1, 1 - 2*ermc/v0], mean -ermc/v0 (momentum bias)
    xi = u[:, 2]
    cos_phi = jnp.where(ermcv0 >= 1.0, -1.0,
                        xi * 2.0 * (1.0 - jnp.minimum(ermcv0, 1.0)) - 1.0)
    theta = (2.0 * jnp.pi) * u[:, 3]
    rv = _angled_vector(vel, cos_phi, theta)
    vel_r = vel + ermc[:, None] * rv
    v12 = jnp.sum(vel_r * vel_r, axis=-1)
    engs_r = engs - (ph + 0.5 * mass * (v12 - v02))
    vel = jnp.where(do_rad[:, None], vel_r, vel)
    engs = jnp.where(do_rad, engs_r, engs)

    # --- thermal radius r = A/(B - E) (cuTemp.cu:755-759) ---
    rest = jnp.minimum(engs, ff.spec_mx_eng[types])
    radii = ff.spec_rad_a[types] / (ff.spec_rad_b[types] - rest)

    if valid is not None:
        engs = jnp.where(valid, engs, 0.0)
        radii = jnp.where(valid, radii, 1.0)
    eng_temp = jnp.sum(engs)
    return vel, engs, radii, eng_temp, key


def apply_tstat(cfg, ff, state, eng_kin, photons=None):
    """Thermostat dispatch at end of step (apply_tstat, cuTemp.cu:775-803).
    Equilibration rescale every freq_equil steps while step <= n_equil,
    then the configured thermostat.  Returns a dict of state updates."""
    vel = state.vel
    upd = {}

    if cfg.n_equil and cfg.freq_equil:
        do_scale = (state.step <= cfg.n_equil) & \
            (state.step % cfg.freq_equil == 0)
        vel_s, ek_s = temp_scale(cfg, vel, eng_kin)
        vel = jnp.where(do_scale, vel_s, vel)
        eng_kin = jnp.where(do_scale, ek_s, eng_kin)

    if cfg.tstat_type == TSTAT_NOSE:
        vel, eng_kin, chit, consint = nose_apply(
            cfg, vel, eng_kin, state.chit, state.consint)
        upd.update(chit=chit, consint=consint)
    elif cfg.tstat_type == TSTAT_RADI:
        state2 = state.replace(vel=vel)
        vel, engs, radii, eng_temp, rng = tstat_radiative(
            cfg, ff, state2, photons)
        upd.update(engs=engs, radii=radii, rng=rng)
        upd["_eng_temp"] = eng_temp

    upd.update(vel=vel)
    upd["_eng_kin"] = eng_kin
    return upd
