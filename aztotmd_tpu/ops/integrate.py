"""Velocity-Verlet integration with periodic wrap + wall-momentum pressure
bookkeeping.

Re-design of the reference's fused integrator kernels (reference:
src/cuMDfunc.cu:333-519 ``verlet_1stage``, :521-600 ``verlet_2stage``,
:35-176 ``put_periodic``): per-atom atomics for box-crossing counters and
wall momenta become segment-sums; the kinetic-energy shared-memory
reduction becomes a plain masked sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def verlet1(cfg, ff, state):
    """First Verlet half-kick + drift + periodic wrap + force reset.

    Returns updated (pos, vel, frc, pos_mom, neg_mom, cross_pos, cross_neg,
    eng_field) — a dict of state fields to merge.
    """
    dt = state.pos.dtype
    types = state.types
    rm_hdt = ff.spec_rmass_hdt[types][:, None]
    mass = ff.spec_mass[types]
    frozen = (ff.spec_frozen[types] > 0)[:, None]

    vel = state.vel + rm_hdt * state.frc
    pos = jnp.where(frozen, state.pos, state.pos + vel * cfg.dt)

    # periodic wrap (put_periodic, cuMDfunc.cu:35-111): count whole-box
    # crossings and accumulate the wall momentum per direction
    box = jnp.asarray(cfg.box, dt)
    n = jnp.floor(pos / box)                 # (N,3) crossing counts
    pos = pos - n * box
    pos = jnp.where(pos >= box, 0.0, pos)    # f32 edge-case guard

    ni = n.astype(jnp.int32)
    mom = mass[:, None] * vel
    pos_mom = state.pos_mom + jnp.sum(jnp.where(ni > 0, mom, 0.0), axis=0)
    neg_mom = state.neg_mom + jnp.sum(jnp.where(ni < 0, -mom, 0.0), axis=0)
    # per-species crossing counters: static loop over the (small) species
    # set instead of a 40k-row scatter onto a (nsp, 3) array
    nsp = state.cross_pos.shape[0]
    if nsp == 1:
        dpos = jnp.sum((ni > 0).astype(jnp.int32), axis=0,
                       dtype=jnp.int32)[None, :]
        dneg = jnp.sum((ni < 0).astype(jnp.int32), axis=0,
                       dtype=jnp.int32)[None, :]
    else:
        onehot = jax.nn.one_hot(types, nsp, dtype=dt)        # (N, nsp)
        dpos = (onehot.T @ (ni > 0).astype(dt)).astype(jnp.int32)
        dneg = (onehot.T @ (ni < 0).astype(dt)).astype(jnp.int32)
    cross_pos = state.cross_pos + dpos
    cross_neg = state.cross_neg + dneg

    # external electric field: E = -grad U; eng = q (r . dU/dr)
    ext = jnp.asarray(cfg.ext_field, dt)
    charge = ff.spec_charge[types]
    if any(v != 0.0 for v in cfg.ext_field):
        eng_field = jnp.sum(charge * (pos @ ext))
        frc = jnp.broadcast_to(-charge[:, None] * ext, pos.shape)
    else:
        eng_field = jnp.zeros((), dt)
        frc = jnp.zeros_like(pos)

    # shiftX directive: constant z-force on atoms beyond the x threshold
    # (serial clear_force, integrators.cpp:30-36)
    if cfg.shift_x != 0.0 or cfg.shift_val != 0.0:
        fz = jnp.where(pos[:, 0] > cfg.shift_x, cfg.shift_val, frc[:, 2])
        frc = frc.at[:, 2].set(fz)

    return dict(pos=pos, vel=vel, frc=frc, pos_mom=pos_mom, neg_mom=neg_mom,
                cross_pos=cross_pos, cross_neg=cross_neg), eng_field


def verlet2(cfg, ff, vel, frc, types):
    """Second half-kick; returns (vel, eng_kin)."""
    rm_hdt = ff.spec_rmass_hdt[types][:, None]
    vel = vel + rm_hdt * frc
    mass = ff.spec_mass[types]
    eng_kin = 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))
    return vel, eng_kin


def pressure_update(cfg, state, eng_dict=None):
    """Pressure from the wall-momentum ring buffer (main.cu:121-166
    ``calc_quantities``): P = dM/dt / area averaged over the last
    (n_mom - 1) samples and all six walls."""
    dt_ = state.pos.dtype
    i = state.i_mom
    n_mom = cfg.n_mom
    step = state.step
    la, lb, lc = cfg.box
    rev_area = jnp.asarray([1.0 / (lb * lc), 1.0 / (la * lc),
                            1.0 / (la * lb)], dt_)
    # 1.58e6: eV/A^3 -> atm conversion constant (main.cu:133)
    k = 2.0 * 1.58e6 / (cfg.dt * (n_mom - 1))

    # branch-free: the two paths differ only in write slot / outputs, and
    # a per-step lax.cond costs ~7 us of plumbing on TPU (profiled
    # cond.45) for what is arithmetic on a (n_mom, 3) ring
    w = step >= n_mom - 1                       # steady regime?
    j = jnp.where(i - 1 < 0, n_mom - 1, i - 1)  # steady write slot
    slot = jnp.where(w, j, step)                # warmup writes at `step`
    buf_p = state.mom_buf_pos.at[slot].set(state.pos_mom, mode="drop")
    buf_n = state.mom_buf_neg.at[slot].set(state.neg_mom, mode="drop")
    pp = k * (state.pos_mom - state.mom_buf_pos[i]) * rev_area
    pn = k * (state.neg_mom - state.mom_buf_neg[i]) * rev_area
    pres = jnp.where(w, (jnp.sum(pp) + jnp.sum(pn)) / 6.0,
                     state.pressure)
    i_next = jnp.where(w, jnp.where(i + 1 >= n_mom, 0, i + 1),
                       state.i_mom)
    return pres, buf_p, buf_n, i_next
