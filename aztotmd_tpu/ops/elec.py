"""Electrostatics: pair-level Coulomb terms + reciprocal-space Ewald.

Pair terms re-design the reference's ``md->funcCoul`` device-pointer
dispatch (reference: src/cuElec.cu:20-149: no_coul/direct_coul/real_ewald/
fennel) as a statically selected branch — the elec type never changes
during a run, so it is a compile-time constant.

The reciprocal-space Ewald sum (reference: src/cuElec.cu:151-382
``recip_ewald``/``ewald_force``; serial src/elec.cpp:167-336 ``ewald_rec``)
is restructured for the MXU: the per-atom complex-recursion over k-vectors
becomes two dense matmuls —

    theta = pos @ rk^T                  (N,3) x (3,K)   -> phases
    S(k)  = sum_i q_i e^{i theta_ik}    column reduction
    F_i   = fscale * [W sin/cos combo] @ rk   (N,K) x (K,3)

with the k-vector table and exp(-k^2/4a^2)/k^2 weights precomputed on host
(cuInit.cu:1014-1056 equivalent).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc

from .. import units
from ..io.control import ELEC_DIRECT, ELEC_EWALD, ELEC_FENNEL, ELEC_NONE


def coul_eval(cfg, r2, r, chprod):
    """Pair Coulomb force-over-r and energy.

    chprod already carries 1/eps.  Returns (f, e) with f such that
    F_i = f * (r_i - r_j).
    """
    kqq = chprod * cfg.coul_scale
    ri = 1.0 / r
    r2i = 1.0 / r2
    if cfg.elec_type == ELEC_NONE:
        z = jnp.zeros_like(r2)
        return z, z
    if cfg.elec_type == ELEC_DIRECT:
        # cuElec.cu:27-37
        return kqq * ri * r2i, kqq * ri
    if cfg.elec_type == ELEC_EWALD:
        # real-space part, cuElec.cu:94-113
        ar = cfg.alpha * r
        erfcar = erfc(ar)
        e = kqq * erfcar * ri
        f = kqq * ri * r2i * (erfcar + cfg.daipi2 * r * jnp.exp(-ar * ar))
        return f, e
    if cfg.elec_type == ELEC_FENNEL:
        # damped-shifted-force, cuElec.cu:115-134
        ar = cfg.alpha * r
        erfcar = erfc(ar)
        e = kqq * (erfcar * ri - cfg.fennel_c1
                   + cfg.fennel_c2 * (r - cfg.r_real))
        f = kqq * ri * ((erfcar * r2i + cfg.daipi2 * jnp.exp(-ar * ar) * ri)
                        - cfg.fennel_c2)
        return f, e
    raise ValueError(f"unknown elec type {cfg.elec_type}")


def make_kvectors(cfg):
    """Precompute the half-space k-vector table (host, f64).

    Enumeration matches cuInit.cu:1024-1048: l in [0,kx), m in [mmin,ky),
    n in [nmin,kz) with mmin/nmin opening to negative after the first row,
    under the spherical cutoff rkcut2.  Returns (rk (K,3), weights (K,))
    where weight = exp(-k^2/4a^2)/k^2.
    """
    kx, ky, kz = cfg.kmax
    la, lb, lc = cfg.box
    c = -0.25 / (cfg.alpha * cfg.alpha)
    rks, ws = [], []
    mmin, nmin = 0, 1
    for l in range(kx):
        rkx = l * units.TWOPI / la
        for m in range(mmin, ky):
            rky = m * units.TWOPI / lb
            for n in range(nmin, kz):
                rkz = n * units.TWOPI / lc
                rk2 = rkx * rkx + rky * rky + rkz * rkz
                if rk2 < cfg.rkcut2:
                    rks.append((rkx, rky, rkz))
                    ws.append(math.exp(c * rk2) / rk2)
            nmin = 1 - kz
        mmin = 1 - ky
    rk = np.asarray(rks, dtype=np.float64).reshape(-1, 3)
    w = np.asarray(ws, dtype=np.float64)
    return rk, w


def ewald_recip(cfg, pos, charge, rk, w, axis=None):
    """Reciprocal-space energy and forces.

    pos: (N,3), charge: (N,), rk: (K,3), w: (K,)
    Returns (forces (N,3), energy scalar).
    escale = 2pi/V * Fcoul/eps;  fscale = 2*escale  (cuInit.cu:1011-1012)

    axis: optional shard_map axis name — each device computes the
    partial structure factor over its local atoms and the full S(k)
    comes from one psum over the mesh (the multi-chip extension of
    recip_ewald's shared->global reduction, cuElec.cu:151-328); the
    returned energy is the replicated GLOBAL recip energy, the forces
    cover the local atoms.
    """
    import jax as _jax
    dt = pos.dtype
    # half-space k-sum: E = (4pi/V) sum_half w |S|^2, F = 2x that
    # (ewald_scale = 2*2pi/V*Fcoul/eps, elec.cpp:381)
    escale = cfg.ewald_scale
    fscale = 2.0 * cfg.ewald_scale
    rk = rk.astype(dt)
    w = w.astype(dt)
    theta = pos @ rk.T                             # (N, K) on the MXU
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    qc = charge[:, None] * c                       # Re q e^{i th}
    qs = charge[:, None] * s                       # Im
    Sre = jnp.sum(qc, axis=0)                      # (K,)
    Sim = jnp.sum(qs, axis=0)
    if axis is not None:
        Sre = _jax.lax.psum(Sre, axis)
        Sim = _jax.lax.psum(Sim, axis)
    eng = escale * jnp.sum(w * (Sre * Sre + Sim * Sim))
    # per-atom force: fscale * w * (Im(q e^{ith}) Re S - Re(q e^{ith}) Im S)
    coef = fscale * w * (qs * Sre[None, :] - qc * Sim[None, :])  # (N, K)
    frc = coef @ rk                                # (N, 3) on the MXU
    return frc, eng


def ewald_self_energy(charges_per_atom, cfg) -> float:
    """Constant part of the Ewald sum (elec.cpp:144-165 ``ewald_const``):
    -alpha/sqrt(pi) sum q_i^2 - pi/(2 alpha^2 V) (sum q_i)^2, times
    Fcoul/eps.  Host-side, recomputed only when charges change."""
    q = np.asarray(charges_per_atom, dtype=np.float64)
    sq = q.sum()
    eng = -(q * q).sum() * cfg.alpha / units.SQRTPI
    eng += -0.5 * units.PI * sq * sq / (cfg.alpha ** 2) / cfg.volume
    return units.FCOUL_SCALE * eng / cfg.eps
