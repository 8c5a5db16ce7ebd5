"""Short-range pair potential families.

TPU re-design of the reference's device function-pointer dispatch
(reference: src/cuVdW.cu:25-302; serial twins src/vdw.cpp:16-190): the
per-pair ``vdw->feng_r`` pointer becomes an integer *kind* gathered from a
(n_spec, n_spec) table, and the potential is evaluated as a masked sum over
the families present in the deck (a static tuple), so XLA fuses the whole
thing into the pair kernel with no divergent control flow.

Force convention (same as the reference): the returned ``f`` satisfies
``F_i = f * (r_i - r_j)`` — i.e. force divided by distance.

All families (ids match aztotmd_tpu.io.field.VDW_*):
  1 lnjs  U = 4e[(s/r)^12 - (s/r)^6]        params (pre-scaled): p0=4e, p1=s^2, p2=24e
  2 buck  U = A exp(-r/ro) - C/r^6           p0=A, p1=ro, p2=C
  3 p746  U = A/r^7 - B/r^4 - C/r^6          p0=A, p1=B, p2=C
  4 bmhs  U = A exp[B(s-r)] - C/r^6 - D/r^8  p0=A, p1=B, p2=s, p3=C, p4=D
  5 elin  U = A exp(-r/ro) + C r             p0=A, p1=ro, p2=C
  6 einv  U = A exp(-r/ro) - C/r             p0=A, p1=ro, p2=C
  7 surk  U = ri rj (C1 ri^2 rj^2 / r^7 - C2/(ki ri + kj rj) / r^6)
          (radius-dependent Surkov potential, cuVdW.cu:236-257)
          p0=C1, p1=C2, p2=ki, p3=kj; ri/rj are per-atom thermal radii
"""

from __future__ import annotations

import jax.numpy as jnp

from ..io.field import (VDW_746, VDW_BHM, VDW_BUCK, VDW_EINV, VDW_ELIN,
                        VDW_LJ, VDW_SURK)


def vdw_eval(kind, p, r2, r, rad_i=None, rad_j=None, families=()):
    """Evaluate force-over-r and energy for a batch of pairs.

    kind: (...,) int32 family id per pair (0 = none)
    p:    (..., 5) parameters per pair
    r2,r: (...,) squared / plain distance (must be > 0; mask upstream)
    rad_i, rad_j: (...,) thermal radii (only used by Surkov)
    families: static tuple of family ids present

    Returns (f, e) with the same leading shape.
    """
    f = jnp.zeros_like(r2)
    e = jnp.zeros_like(r2)
    p0, p1, p2, p3, p4 = (p[..., k] for k in range(5))
    r2i = 1.0 / r2
    ri = 1.0 / r

    for fam in families:
        m = kind == fam
        if fam == VDW_LJ:
            sr2 = p1 * r2i
            sr6 = sr2 * sr2 * sr2
            ee = p0 * sr6 * (sr6 - 1.0)
            ff = p2 * r2i * sr6 * (2.0 * sr6 - 1.0)
        elif fam == VDW_BUCK:
            r4i = r2i * r2i
            # mask p1 to avoid 0/0 in exp argument for absent pairs
            ex = jnp.exp(-r * _safe(p1, m))
            ee = p0 * ex - p2 * r4i * r2i
            ff = p0 * ex * ri * _safe(p1, m) - 6.0 * p2 * r4i * r4i
        elif fam == VDW_746:
            r4i = r2i * r2i
            ee = r4i * (p0 * r2i * ri - p1 - p2 * r2i)
            ff = r4i * r2i * (7.0 * p0 * r2i * ri - 4.0 * p1 - 6.0 * p2 * r2i)
        elif fam == VDW_BHM:
            r4i = r2i * r2i
            ex = jnp.exp(p1 * (p2 - r))
            ee = p0 * ex - p3 * r4i * r2i - p4 * r4i * r4i
            ff = (p0 * p1 * ex * ri - 6.0 * p3 * r4i * r4i
                  - 8.0 * p4 * r4i * r4i * r2i)
        elif fam == VDW_ELIN:
            ex = jnp.exp(-r * _safe(p1, m))
            ee = p0 * ex + p2 * r
            ff = p0 * ex * ri * _safe(p1, m) - p2 * ri
        elif fam == VDW_EINV:
            ex = jnp.exp(-r * _safe(p1, m))
            ee = p0 * ex - p2 * ri
            ff = p0 * ex * ri * _safe(p1, m) - p2 * ri * r2i
        elif fam == VDW_SURK:
            r6i = r2i * r2i * r2i
            c2sum = p1 / jnp.where(m, p2 * rad_i + p3 * rad_j, 1.0)
            rprod = rad_i * rad_j
            c1ab2 = rprod * rprod * p0
            ee = rprod * r6i * (c1ab2 * ri - c2sum)
            ff = rprod * r6i * r2i * (7.0 * c1ab2 * ri - 6.0 * c2sum)
        else:
            continue
        f = jnp.where(m, ff, f)
        e = jnp.where(m, ee, e)
    return f, e


def _safe(ro, mask):
    """1/ro with masked divisor (absent pairs carry ro=0)."""
    return 1.0 / jnp.where(mask, ro, 1.0)
