"""Pallas TPU kernel for the cell-block pair pass — the speed-of-light
path for non-reactive force fields.

The XLA cell-block engine (ops.cellblock) is correct but materializes its
(cap, cap, n_cell) pair tiles per stencil offset in HBM (~2 GB/step on
the 40k-atom case study).  This kernel keeps every pair tile in VMEM:

* outside the kernel, the 27 rolled block copies are STACKED once into
  (S, cap, n_cell) arrays (~regular copies, a few MB);
* the kernel tiles the cell axis; per grid step it loads the own block
  and the S neighbor blocks for a chunk of cells, computes all S*cap*cap
  interactions fully in VMEM, and writes only the (cap, chunk) force
  rows and two energy scalars;
* the species-pair dispatch is specialized at trace time on the static
  ``cfg.vdw_kind_table`` (the Pallas analog of the reference's device
  function-pointer tables, cuVdW.cu:260-302); per-pair parameters arrive
  as SMEM scalars.

Covers the pair physics (all VdW families incl. radius-dependent Surkov,
all Coulomb modes); reactive candidate registration (bind/jump) falls
back to the XLA engine — those decks mutate topology and are not the
steps/s headline path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..io.control import (ELEC_DIRECT, ELEC_EWALD, ELEC_FENNEL, ELEC_NONE)
from ..io.field import (VDW_746, VDW_BHM, VDW_BUCK, VDW_EINV, VDW_ELIN,
                        VDW_LJ, VDW_SURK)
from .cellblock import bin_atoms, _roll3
from .pairs import MX_FRC, PairResult


def _erfc(x):
    """erfc via the Abramowitz-Stegun 7.1.26 rational approximation
    (|err| < 1.5e-7, well under f32 resolution) — jax.scipy's erfc is not
    lowerable inside Pallas."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def _vdw_pair(kind, r2i, ri, rr, p, ra=None, rb=None):
    """force-over-r and energy for one species-pair entry with STATIC
    kind and SMEM scalar params p[0..4] (formulas: ops.vdw)."""
    p0, p1, p2, p3, p4 = p
    if kind == VDW_LJ:
        sr6 = (p1 * r2i) ** 3
        e = p0 * sr6 * (sr6 - 1.0)
        f = p2 * r2i * sr6 * (2.0 * sr6 - 1.0)
    elif kind == VDW_BUCK:
        # p1 holds rho; the exponent is -r/rho (ops.vdw._safe)
        ip1 = 1.0 / p1
        r6i = r2i * r2i * r2i
        ex = jnp.exp(-rr * ip1)
        e = p0 * ex - p2 * r6i
        f = p0 * ex * ri * ip1 - 6.0 * p2 * r6i * r2i
    elif kind == VDW_746:
        r4i = r2i * r2i
        e = r4i * (p0 * r2i * ri - p1 - p2 * r2i)
        f = r4i * r2i * (7.0 * p0 * r2i * ri - 4.0 * p1 - 6.0 * p2 * r2i)
    elif kind == VDW_BHM:
        r6i = r2i * r2i * r2i
        ex = jnp.exp(p1 * (p2 - rr))
        e = p0 * ex - p3 * r6i - p4 * r6i * r2i
        f = p0 * p1 * ex * ri - 6.0 * p3 * r6i * r2i - 8.0 * p4 * r6i * r2i * r2i
    elif kind == VDW_ELIN:
        ip1 = 1.0 / p1
        ex = jnp.exp(-rr * ip1)
        e = p0 * ex + p2 * rr
        f = p0 * ex * ri * ip1 - p2 * ri
    elif kind == VDW_EINV:
        ip1 = 1.0 / p1
        ex = jnp.exp(-rr * ip1)
        e = p0 * ex - p2 * ri
        f = p0 * ex * ri * ip1 - p2 * ri * r2i
    elif kind == VDW_SURK:
        r6i = r2i * r2i * r2i
        c2sum = p1 / (p2 * ra + p3 * rb)
        rprod = ra * rb
        c1ab2 = rprod * rprod * p0
        e = rprod * r6i * (c1ab2 * ri - c2sum)
        f = rprod * r6i * r2i * (7.0 * c1ab2 * ri - 6.0 * c2sum)
    else:
        raise ValueError(f"unknown vdw kind {kind}")
    return f, e


def _coul_pair(cfg, r2i, ri, rr, kqq):
    """Pair Coulomb with static elec type and SMEM scalar kqq
    (formulas: ops.elec.coul_eval)."""
    if cfg.elec_type == ELEC_DIRECT:
        return kqq * ri * r2i, kqq * ri
    if cfg.elec_type == ELEC_EWALD:
        ar = cfg.alpha * rr
        ec = _erfc(ar)
        return (kqq * ri * r2i * (ec + cfg.daipi2 * rr * jnp.exp(-ar * ar)),
                kqq * ec * ri)
    if cfg.elec_type == ELEC_FENNEL:
        ar = cfg.alpha * rr
        ec = _erfc(ar)
        e = kqq * (ec * ri - cfg.fennel_c1
                   + cfg.fennel_c2 * (rr - cfg.r_real))
        f = kqq * ri * ((ec * r2i + cfg.daipi2 * jnp.exp(-ar * ar) * ri)
                        - cfg.fennel_c2)
        return f, e
    raise ValueError


def _pair_kernel(cfg, S, cap, chunk, nsp, use_coul, use_radii,
                 # refs:
                 params_ref,                    # SMEM (nsp*nsp, 8)
                 xs_ref, ys_ref, zs_ref,        # VMEM (S, cap, chunk)
                 vm_ref,                        # VMEM (S, cap, chunk) f32
                 ts_ref,                        # VMEM (S, cap, chunk) i32
                 rad_ref,                       # VMEM (S, cap, chunk) or None
                 fx_ref, fy_ref, fz_ref,        # VMEM (cap, chunk)
                 fjx_ref, fjy_ref, fjz_ref,     # VMEM (S-1, cap, chunk)
                 ev_ref, ec_ref):               # VMEM (1, 8, 128) tiles
    f32 = jnp.float32

    xi = xs_ref[0][:, None, :]
    yi = ys_ref[0][:, None, :]
    zi = zs_ref[0][:, None, :]
    vi = vm_ref[0][:, None, :]
    ti = ts_ref[0][:, None, :]
    if use_radii:
        rai = rad_ref[0][:, None, :]

    fx = jnp.zeros((cap, chunk), f32)
    fy = jnp.zeros((cap, chunk), f32)
    fz = jnp.zeros((cap, chunk), f32)
    ev = f32(0.0)
    ec = f32(0.0)

    kind_tab = cfg.vdw_kind_table

    for s in range(S):
        # neighbor stacks arrive pre-shifted by the per-cell periodic
        # image (the reference's precomputed cell-pair shift vectors,
        # cuCellList.cu:134-211) — no min-image rounding needed here
        dx = xi - xs_ref[s][None, :, :]
        dy = yi - ys_ref[s][None, :, :]
        dz = zi - zs_ref[s][None, :, :]
        r2 = dx * dx + dy * dy + dz * dz

        vmask = vi * vm_ref[s][None, :, :]
        if s == 0:
            eye = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0) \
                == jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
            vmask = vmask * jnp.where(eye, 0.0, 1.0)[:, :, None]
        inr = jnp.where(r2 <= f32(cfg.r2_max), vmask, 0.0)

        r2s = jnp.where(inr > 0.0, r2, 1.0)
        ri = jax.lax.rsqrt(r2s)
        r2i = ri * ri
        rr = r2s * ri

        tj = ts_ref[s][None, :, :]
        if use_radii:
            raj = rad_ref[s][None, :, :]

        fsum = jnp.zeros((cap, cap, chunk), f32)
        # static species-pair dispatch (function-pointer tables ->
        # compile-time loop over (a, b) entries)
        for a in range(nsp):
            for b in range(nsp):
                kind = kind_tab[a][b]
                row = a * nsp + b
                need_vdw = kind != 0
                if not (need_vdw or use_coul):
                    continue
                if nsp == 1:
                    pm = inr
                else:
                    pm = jnp.where((ti == a) & (tj == b), inr, 0.0)
                # HALF stencil: self-offset pairs appear in both (i,j)
                # orders -> energy weight 0.5; cross-offset pairs appear
                # once -> full weight, j-side force emitted separately
                w = 0.5 if s == 0 else 1.0
                if need_vdw:
                    p = [params_ref[row, k] for k in range(5)]
                    r2cut = params_ref[row, 6]
                    vdw_m = jnp.where(r2 <= r2cut, pm, 0.0)
                    fv, e_v = _vdw_pair(
                        kind, r2i, ri, rr, p,
                        ra=rai if use_radii else None,
                        rb=raj if use_radii else None)
                    fsum = fsum + vdw_m * fv
                    ev = ev + w * jnp.sum(vdw_m * e_v)
                if use_coul:
                    kqq = params_ref[row, 5]
                    fc, e_c = _coul_pair(cfg, r2i, ri, rr, kqq)
                    fsum = fsum + pm * fc
                    ec = ec + w * jnp.sum(pm * e_c)

        fsum = jnp.clip(fsum, -MX_FRC, MX_FRC)
        fx = fx + jnp.sum(fsum * dx, axis=1)
        fy = fy + jnp.sum(fsum * dy, axis=1)
        fz = fz + jnp.sum(fsum * dz, axis=1)
        if s > 0:
            # Newton's third law: the partner cells' atoms get the
            # negated sum over i; rolled back to their own cells outside
            fjx_ref[s - 1, :, :] = jnp.sum(fsum * dx, axis=0)
            fjy_ref[s - 1, :, :] = jnp.sum(fsum * dy, axis=0)
            fjz_ref[s - 1, :, :] = jnp.sum(fsum * dz, axis=0)

    fx_ref[:, :] = fx
    fy_ref[:, :] = fy
    fz_ref[:, :] = fz
    ev_ref[:, :, :] = jnp.full((1, 8, 128), ev, f32)
    ec_ref[:, :, :] = jnp.full((1, 8, 128), ec, f32)


_BIG = 1e30
_IBIG = 2 ** 31 - 1


def _tile_physics(cfg, T, nsp, use_coul, use_radii, want_bind, want_jump,
                  params_ref, donacc_ref, r2, inr, gi, gj,
                  ti, tj, rai, raj, par_ok):
    """Shared (T, T)-tile pair physics: masked force-over-r sum, per-row
    energies, and running bind/jump row minima.

    Used by both the dense O(N^2) kernel (gi/gj from the grid position)
    and the Morton block-sparse kernel (gi/gj gathered global ids) —
    the Pallas analog of pair_1's body (cuPairs.cu:117-167).

    Returns (fsum_clipped, ev, ec, cands) where cands is a list of
    (min_r2, argmin_id) (T, 1) pairs in [bind, jump_donor, jump_acc]
    order for the enabled features.
    """
    f32 = jnp.float32
    r2s = jnp.where(inr > 0.0, r2, 1.0)
    ri = jax.lax.rsqrt(r2s)
    r2i = ri * ri
    rr = r2s * ri

    kind_tab = cfg.vdw_kind_table
    fsum = jnp.zeros((T, T), f32)
    ev = jnp.zeros((T, 1), f32)
    ec = jnp.zeros((T, 1), f32)

    def tile_min(can):
        """Row-wise (min_r2, global argmin id) of a masked tile, as
        pure min reductions (no argmin lowering needed): ties break to
        the lowest global id like the serial scans."""
        r2m = jnp.where(can, r2, f32(_BIG))
        m = jnp.min(r2m, axis=1, keepdims=True)
        idm = jnp.min(jnp.where((r2m == m) & can, gj, _IBIG),
                      axis=1, keepdims=True)
        return m, idm

    if want_bind:
        bind_r2t = jnp.full((T, 1), _BIG, f32)
        bind_idt = jnp.full((T, 1), _IBIG, jnp.int32)
    if want_jump:
        in_ej = r2 <= f32(cfg.r2_elec)
        jd_r2t = jnp.full((T, 1), _BIG, f32)
        jd_idt = jnp.full((T, 1), _IBIG, jnp.int32)
        ja_r2t = jnp.full((T, 1), _BIG, f32)
        ja_idt = jnp.full((T, 1), _IBIG, jnp.int32)

    for a in range(nsp):
        for b in range(nsp):
            kind = kind_tab[a][b]
            row = a * nsp + b
            need_vdw = kind != 0
            if not (need_vdw or use_coul or want_bind or want_jump):
                continue
            pm = inr if nsp == 1 else \
                jnp.where((ti == a) & (tj == b), inr, 0.0)
            # every unordered pair is visited in both (i,j) orders ->
            # energy weight 0.5; the row force takes the full term
            if need_vdw:
                p = [params_ref[row, k] for k in range(5)]
                r2cut = params_ref[row, 6]
                vdw_m = jnp.where(r2 <= r2cut, pm, 0.0)
                fv, e_v = _vdw_pair(
                    kind, r2i, ri, rr, p,
                    ra=rai if use_radii else None,
                    rb=raj if use_radii else None)
                fsum = fsum + vdw_m * fv
                ev = ev + 0.5 * jnp.sum(vdw_m * e_v, axis=1,
                                        keepdims=True)
            if use_coul:
                kqq = params_ref[row, 5]
                fc, e_c = _coul_pair(cfg, r2i, ri, rr, kqq)
                fsum = fsum + pm * fc
                ec = ec + 0.5 * jnp.sum(pm * e_c, axis=1,
                                        keepdims=True)
            if want_bind:
                # col 7 holds bind_r2 * (bonding_matr != 0): zero means
                # this species pair never binds (try_to_bind,
                # cuBonds.cu:8-59)
                br2 = params_ref[row, 7]
                m, idm = tile_min((pm > 0.0) & (r2 <= br2) & par_ok)
                upd = m < bind_r2t
                bind_r2t = jnp.where(upd, m, bind_r2t)
                bind_idt = jnp.where(upd, idm, bind_idt)
            if want_jump:
                # per-role nearest candidates (pairs._jump_candidates
                # semantics; try_to_jump, cuEjump.cu:39-76)
                da = donacc_ref[a, 0]
                db = donacc_ref[b, 0]
                can = (pm > 0.0) & in_ej
                m, idm = tile_min(can & ((da & 1) > 0) & ((db & 2) > 0))
                upd = m < jd_r2t
                jd_r2t = jnp.where(upd, m, jd_r2t)
                jd_idt = jnp.where(upd, idm, jd_idt)
                m, idm = tile_min(can & ((da & 2) > 0) & ((db & 1) > 0))
                upd = m < ja_r2t
                ja_r2t = jnp.where(upd, m, ja_r2t)
                ja_idt = jnp.where(upd, idm, ja_idt)

    cands = []
    if want_bind:
        cands.append((bind_r2t, bind_idt))
    if want_jump:
        cands.append((jd_r2t, jd_idt))
        cands.append((ja_r2t, ja_idt))
    return jnp.clip(fsum, -MX_FRC, MX_FRC), ev, ec, cands


def _allpairs_kernel(cfg, T, nsp, use_coul, use_radii,
                     want_bind, want_jump,
                     params_ref, donacc_ref,
                     xi_ref, yi_ref, zi_ref, vi_ref, ti_ref, ri_ref,
                     pi_ref,
                     xj_ref, yj_ref, zj_ref, vj_ref, tj_ref, rj_ref,
                     pj_ref,
                     fx_ref, fy_ref, fz_ref, ev_ref, ec_ref,
                     cand_refs):
    """One (T_i, T_j) tile of the dense O(N^2) pair pass.

    The j grid axis is innermost, so the (1, T) output rows for tile i
    stay VMEM-resident while every j tile streams past — the classic
    flash-attention-style accumulation (reference all_pair kernel:
    cuPairs.cu:220-270, redesigned for the VPU instead of a thread per
    atom)."""
    f32 = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)

    # i-side blocks are (T, 1) columns, j-side (1, T) rows — the
    # outer-product broadcast gives the (T, T) tile with no transposes,
    # and lane-axis sums land back in the (T, 1) output layout
    dx = xi_ref[0] - xj_ref[0]
    dy = yi_ref[0] - yj_ref[0]
    dz = zi_ref[0] - zj_ref[0]
    # min-image (box can be smaller than 2*rcut only for tiny decks the
    # dispatcher sends elsewhere)
    bx, by, bz = (f32(cfg.box[k]) for k in range(3))
    dx = dx - bx * jnp.round(dx * f32(1.0 / cfg.box[0]))
    dy = dy - by * jnp.round(dy * f32(1.0 / cfg.box[1]))
    dz = dz - bz * jnp.round(dz * f32(1.0 / cfg.box[2]))
    r2 = dx * dx + dy * dy + dz * dz

    vm = vi_ref[0] * vj_ref[0]
    # self-pair exclusion by GLOBAL slot index (only the diagonal tile
    # can hit it, but the compare is cheap enough to apply everywhere)
    gi = i * T + jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    gj = j * T + jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    vm = jnp.where(gi == gj, 0.0, vm)
    inr = jnp.where(r2 <= f32(cfg.r2_max), vm, 0.0)

    rai = ri_ref[0] if use_radii else None
    raj = rj_ref[0] if use_radii else None
    ti = ti_ref[0] if nsp > 1 else None
    tj = tj_ref[0] if nsp > 1 else None
    par_ok = ((pi_ref[0] != gj) & (pj_ref[0] != gi)) \
        if (want_bind and pi_ref is not None) \
        else jnp.ones((T, T), bool)

    fsum, ev, ec, cands = _tile_physics(
        cfg, T, nsp, use_coul, use_radii, want_bind, want_jump,
        params_ref, donacc_ref, r2, inr, gi, gj, ti, tj, rai, raj,
        par_ok)

    @pl.when(j == 0)
    def _():
        fx_ref[0] = jnp.zeros((T, 1), f32)
        fy_ref[0] = jnp.zeros((T, 1), f32)
        fz_ref[0] = jnp.zeros((T, 1), f32)
        ev_ref[0] = jnp.zeros((T, 1), f32)
        ec_ref[0] = jnp.zeros((T, 1), f32)
        for k, r in enumerate(cand_refs):
            r[0] = jnp.full((T, 1), _BIG, f32) if k % 2 == 0 \
                else jnp.full((T, 1), _IBIG, jnp.int32)

    fx_ref[0] += jnp.sum(fsum * dx, axis=1, keepdims=True)
    fy_ref[0] += jnp.sum(fsum * dy, axis=1, keepdims=True)
    fz_ref[0] += jnp.sum(fsum * dz, axis=1, keepdims=True)
    ev_ref[0] += ev
    ec_ref[0] += ec

    for k, (m, idm) in enumerate(cands):
        r2_ref, id_ref = cand_refs[2 * k], cand_refs[2 * k + 1]
        cur = r2_ref[0]
        upd = m < cur
        r2_ref[0] = jnp.where(upd, m, cur)
        id_ref[0] = jnp.where(upd, idm, id_ref[0])


def allpairs_cost(cfg) -> int:
    """Modeled slot-pair count of the dense tiled kernel (for the
    engine cost comparison against stencil * cap^2 * n_cell)."""
    T = 512
    n_pad = _round_up_int(cfg.n_at, T)
    return n_pad * n_pad


def _round_up_int(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pair_forces_allpairs(cfg, ff, pos, types, radii=None, parents=None,
                         want_bind: bool = False,
                         want_jump: bool = False,
                         interpret: bool | None = None,
                         tile: int = 512) -> PairResult:
    """Dense tiled O(N^2) Pallas pair pass — the winner for CLUSTERED
    decks (case study 2: ~0.43 atoms/A^3 core), where every cell
    decomposition overcounts: the block engine's stencil*cap^2*n_cell
    is ~20x the padded N^2 at 4k atoms, and Verlet lists degenerate
    (K ~ 1600, gather-bound).  No binning, no gathers, no overflow
    monitors — pure regular VPU tiles.  Reactive candidate
    registration (bind/jump per-role nearest candidates) runs fused
    inside the kernel as running row minima over the j tiles (the
    Pallas analog of pair_1's try_to_bind/try_to_jump,
    cuPairs.cu:117-167).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = cfg.n_at
    dt = pos.dtype
    nsp = cfg.n_spec
    f32 = jnp.float32
    T = min(tile, _round_up_int(N, 128))
    if want_bind or want_jump:
        # Fused candidate registration (per-role running minima, donor/
        # acceptor masks, bonding/tpair tables) roughly doubles the
        # kernel's live (T, T) working set: at T=384 with want_jump the
        # Mosaic scoped-VMEM stack measured 19.56 MB against the 16 MB
        # v5e limit (compile-time OOM on the ejump_redox example deck;
        # round 5).  T=256 bounds the same working set at ~8.7 MB.
        # Plain pair physics keeps the full tile (cs2's T=512 kernel
        # measured fine — jump/bind are compile-time-off there).
        T = min(T, 256)
    n_pad = _round_up_int(N, T)
    n_t = n_pad // T
    padn = n_pad - N

    def flat(a, fill=0.0, dtype=f32):
        a = a.astype(dtype)
        if padn:
            a = jnp.concatenate([a, jnp.full((padn,), fill, dtype)])
        return a

    # i-side (T, 1) column blocks, j-side (1, T) row blocks (see the
    # kernel docstring: no transposes, lane sums land in (T, 1))
    def cols(a):
        return a.reshape(n_t, T, 1)

    def rows(a):
        return a.reshape(n_t, 1, T)

    xs = flat(pos[:, 0])
    ys = flat(pos[:, 1])
    zs = flat(pos[:, 2])
    vm = flat(jnp.ones((N,), f32))
    use_radii = bool(cfg.use_radii and radii is not None)
    rad = flat(radii, 1.0) if use_radii else None
    ts = flat(types, 0, jnp.int32) if nsp > 1 else None
    use_par = bool(want_bind and parents is not None)
    par = flat(parents, -1, jnp.int32) if use_par else None

    prm = jnp.zeros((nsp * nsp, 8), f32)
    prm = prm.at[:, 0:5].set(ff.vdw_p.reshape(-1, 5).astype(f32))
    prm = prm.at[:, 5].set((ff.chprod.reshape(-1)
                            * cfg.coul_scale).astype(f32))
    prm = prm.at[:, 6].set(ff.vdw_r2cut.reshape(-1).astype(f32))
    if want_bind:
        prm = prm.at[:, 7].set(
            (ff.bind_r2 * (ff.bonding_matr != 0)).reshape(-1)
            .astype(f32))
    donacc = ff.spec_donacc.reshape(nsp, 1).astype(jnp.int32)
    use_coul = cfg.elec_type != ELEC_NONE

    ispec = lambda: pl.BlockSpec((1, T, 1), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    jspec = lambda: pl.BlockSpec((1, 1, T), lambda i, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM)
    ospec = lambda: pl.BlockSpec((1, T, 1), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    ins = [prm, donacc]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    for shape, spec in ((cols, ispec), (rows, jspec)):
        ins += [shape(xs), shape(ys), shape(zs), shape(vm)]
        in_specs += [spec() for _ in range(4)]
        if nsp > 1:
            ins.append(shape(ts))
            in_specs.append(spec())
        if use_radii:
            ins.append(shape(rad))
            in_specs.append(spec())
        if use_par:
            ins.append(shape(par))
            in_specs.append(spec())

    n_cand = (2 if want_bind else 0) + (4 if want_jump else 0)

    def kern(params_ref, donacc_ref, *refs):
        half = len(refs) - 5 - n_cand
        assert half % 2 == 0
        half //= 2

        def unpack(rs):
            rs = list(rs)
            x, y, z, v = rs[:4]
            k = 4
            t = r = p = None
            if nsp > 1:
                t = rs[k]; k += 1
            if use_radii:
                r = rs[k]; k += 1
            if use_par:
                p = rs[k]; k += 1
            return x, y, z, v, t, r, p
        iside = unpack(refs[:half])
        jside = unpack(refs[half:2 * half])
        outs = refs[2 * half:2 * half + 5]
        cand_refs = refs[2 * half + 5:]
        _allpairs_kernel(cfg, T, nsp, use_coul, use_radii,
                         want_bind, want_jump, params_ref, donacc_ref,
                         *iside, *jside, *outs, cand_refs)

    out_shape = [jax.ShapeDtypeStruct((n_t, T, 1), f32)
                 for _ in range(5)]
    out_specs = [ospec() for _ in range(5)]
    for k in range(n_cand):
        out_shape.append(jax.ShapeDtypeStruct(
            (n_t, T, 1), f32 if k % 2 == 0 else jnp.int32))
        out_specs.append(ospec())
    res = pl.pallas_call(
        kern,
        grid=(n_t, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    fx, fy, fz, ev, ec = res[:5]
    cand = res[5:]

    frc = jnp.stack([fx.reshape(-1)[:N], fy.reshape(-1)[:N],
                     fz.reshape(-1)[:N]], axis=1).astype(dt)
    big = jnp.asarray(jnp.inf, dt)

    def cand_out(r2t, idt):
        """(n_t, T, 1) running minima -> (N,) id/r2 with sentinels."""
        r2f = r2t.reshape(-1)[:N]
        idf = idt.reshape(-1)[:N]
        none = r2f >= f32(_BIG)
        return (jnp.where(none, N, idf).astype(jnp.int32),
                jnp.where(none, big, r2f.astype(dt)))

    z = jnp.full((N,), N, jnp.int32)
    zr = jnp.full((N,), big, dt)
    bind_idx, bind_r2 = (z, zr)
    jump_idx, jump_r2 = (z, zr)
    k = 0
    if want_bind:
        bind_idx, bind_r2 = cand_out(cand[0], cand[1])
        k = 2
    if want_jump:
        jd_idx, jd_r2 = cand_out(cand[k], cand[k + 1])
        ja_idx, ja_r2 = cand_out(cand[k + 2], cand[k + 3])
        don_row = (ff.spec_donacc[types] & 1).astype(bool)
        jump_idx = jnp.where(don_row, jd_idx, ja_idx)
        jump_r2 = jnp.where(don_row, jd_r2, ja_r2)

    return PairResult(frc=frc,
                      eng_vdw=jnp.sum(ev).astype(dt),
                      eng_coul=jnp.sum(ec).astype(dt),
                      max_occ=jnp.zeros((), jnp.int32),
                      bind_idx=bind_idx, bind_r2=bind_r2,
                      jump_idx=jump_idx, jump_r2=jump_r2)


def pair_forces_allpairs_rect(cfg, ff, pos_i, types_i, valid_i,
                              pos_j, types_j, valid_j,
                              radii_i=None, radii_j=None,
                              interpret: bool | None = None,
                              tile: int = 512):
    """Rectangular dense pair pass: forces on the Ni i-side slots from
    all Nj j-side slots, reusing `_allpairs_kernel` unchanged.

    The i-side slots MUST be the first Ni j-side slots (locals-first
    layout) so the kernel's global-diagonal self-exclusion ``gi == gj``
    keeps skipping exactly the self pairs.  The slab mesh pair pass
    (parallel.slab._pair_pass_dense) calls this with i = owned slots
    and j = [owned slots; neighbour-slab halos]: every unordered pair
    is then visited once per endpoint device, so the kernel's 0.5
    per-visit energy weights psum to exact totals, and each i row
    receives its full force sum locally (no force psum needed).  The
    kernel's full-box min-image handles the periodic wrap, so halo
    coordinates need no shifting.  Invalid slots ride the ``valid``
    masks (vm product zero; `_tile_physics` sanitizes masked r2).

    Returns (frc_i (Ni, 3), e_vdw, e_coul) — per-device partial
    energies, each 0.5-weighted per visited ordered pair.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = pos_i.dtype
    f32 = jnp.float32
    nsp = cfg.n_spec
    Ni, Nj = pos_i.shape[0], pos_j.shape[0]
    T = min(tile, _round_up_int(Ni, 128), _round_up_int(Nj, 128))
    ni_pad = _round_up_int(Ni, T)
    nj_pad = _round_up_int(Nj, T)
    n_ti, n_tj = ni_pad // T, nj_pad // T
    use_radii = bool(cfg.use_radii and radii_i is not None)
    use_coul = cfg.elec_type != ELEC_NONE

    def flat(a, n_pad, fill=0.0, dtype=f32):
        a = a.astype(dtype)
        if n_pad - a.shape[0]:
            a = jnp.concatenate(
                [a, jnp.full((n_pad - a.shape[0],), fill, dtype)])
        return a

    def cols(a):
        return a.reshape(n_ti, T, 1)

    def rows(a):
        return a.reshape(n_tj, 1, T)

    prm = jnp.zeros((nsp * nsp, 8), f32)
    prm = prm.at[:, 0:5].set(ff.vdw_p.reshape(-1, 5).astype(f32))
    prm = prm.at[:, 5].set((ff.chprod.reshape(-1)
                            * cfg.coul_scale).astype(f32))
    prm = prm.at[:, 6].set(ff.vdw_r2cut.reshape(-1).astype(f32))
    donacc = ff.spec_donacc.reshape(nsp, 1).astype(jnp.int32)

    ispec = lambda: pl.BlockSpec((1, T, 1), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    jspec = lambda: pl.BlockSpec((1, 1, T), lambda i, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM)
    ospec = lambda: pl.BlockSpec((1, T, 1), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    ins = [prm, donacc]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    for (p3, t1, v1, r1, n_pad, shape, spec) in (
            (pos_i, types_i, valid_i, radii_i, ni_pad, cols, ispec),
            (pos_j, types_j, valid_j, radii_j, nj_pad, rows, jspec)):
        ins += [shape(flat(p3[:, 0], n_pad)),
                shape(flat(p3[:, 1], n_pad)),
                shape(flat(p3[:, 2], n_pad)),
                shape(flat(v1.astype(f32), n_pad))]
        in_specs += [spec() for _ in range(4)]
        if nsp > 1:
            ins.append(shape(flat(t1, n_pad, 0, jnp.int32)))
            in_specs.append(spec())
        if use_radii:
            ins.append(shape(flat(r1, n_pad, 1.0)))
            in_specs.append(spec())

    def kern(params_ref, donacc_ref, *refs):
        half = (len(refs) - 5) // 2

        def unpack(rs):
            rs = list(rs)
            x, y, z, v = rs[:4]
            k = 4
            t = r = None
            if nsp > 1:
                t = rs[k]; k += 1
            if use_radii:
                r = rs[k]; k += 1
            return x, y, z, v, t, r, None

        iside = unpack(refs[:half])
        jside = unpack(refs[half:2 * half])
        outs = refs[2 * half:]
        _allpairs_kernel(cfg, T, nsp, use_coul, use_radii, False, False,
                         params_ref, donacc_ref, *iside, *jside,
                         *outs, ())

    out_shape = [jax.ShapeDtypeStruct((n_ti, T, 1), f32)
                 for _ in range(5)]
    out_specs = [ospec() for _ in range(5)]
    fx, fy, fz, ev, ec = pl.pallas_call(
        kern,
        grid=(n_ti, n_tj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    frc = jnp.stack([fx.reshape(-1)[:Ni], fy.reshape(-1)[:Ni],
                     fz.reshape(-1)[:Ni]], axis=1).astype(dt)
    return frc, jnp.sum(ev).astype(dt), jnp.sum(ec).astype(dt)


def pair_forces_pallas(cfg, ff, pos, types, radii=None, parents=None,
                       want_bind: bool = False,
                       want_jump: bool = False,
                       chunk: int = 512,
                       interpret: bool | None = None) -> PairResult:
    """Pallas fast path: the dense O(N^2) kernel when it undercuts the
    modeled block cost (incl. fused reactive candidates), the stacked
    cell-block kernel otherwise; XLA block engine for the reactive
    stacked case.  f64 validation mode always takes the XLA engines:
    the Mosaic kernels compute in f32 (one ulp of a large energy sum
    showed up as a 2.0 eV "discrepancy" in an f64 oracle run)."""
    if jnp.dtype(pos.dtype) == jnp.dtype(jnp.float64):
        from .cellblock import pair_forces_block
        return pair_forces_block(cfg, ff, pos, types, radii=radii,
                                 parents=parents, want_bind=want_bind,
                                 want_jump=want_jump)
    # dense/clustered decks: the tiled O(N^2) kernel beats any cell
    # decomposition when padded N^2 is below the modeled block cost
    g = cfg.grid
    block_cost = len(g.stencil) * g.cap * g.cap * g.n_cell
    if allpairs_cost(cfg) < block_cost:
        return pair_forces_allpairs(cfg, ff, pos, types, radii=radii,
                                    parents=parents,
                                    want_bind=want_bind,
                                    want_jump=want_jump,
                                    interpret=interpret)
    if want_bind or want_jump or min(cfg.grid.dims) < 3 \
            or any(abs(o) > 1 for off in cfg.grid.stencil for o in off):
        # reactive candidate registration, tiny aliased grids, and
        # wide stencils use the XLA block engine
        from .cellblock import pair_forces_block
        return pair_forces_block(cfg, ff, pos, types, radii=radii,
                                 parents=parents, want_bind=want_bind,
                                 want_jump=want_jump)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    N = cfg.n_at
    dt = pos.dtype
    nsp = cfg.n_spec
    grid = cfg.grid
    cap = grid.cap
    n_cell = grid.n_cell
    dims = grid.dims
    # Newton half stencil: self + one of each +-off pair
    half = [(0, 0, 0)] + sorted(o for o in grid.stencil if o > (0, 0, 0))
    S = len(half)
    f32 = jnp.float32

    extra = [("types", types, 0)]
    use_radii = bool(cfg.use_radii and radii is not None)
    if use_radii:
        extra.append(("radii", radii, 1.0))
    B = bin_atoms(cfg, pos, extra=extra)

    # pad the cell axis to a chunk multiple
    chunk = min(chunk, 1 << int(math.ceil(math.log2(max(n_cell, 1)))))
    n_pad = ((n_cell + chunk - 1) // chunk) * chunk
    padc = n_pad - n_cell

    def stack(flat, fill, shifts=None, astype=None):
        a0 = flat.reshape(cap, n_cell)
        rolled = []
        for k, off in enumerate(half):
            a = (a0 if off == (0, 0, 0)
                 else _roll3(flat, off, dims).reshape(cap, n_cell))
            sh = shifts.get(k) if shifts is not None else None
            if sh is not None and not isinstance(sh, float):
                a = a + sh[None, :]
            rolled.append(a)
        st = jnp.stack(rolled, axis=0)                     # (S, cap, nc)
        if padc:
            st = jnp.pad(st, ((0, 0), (0, 0), (0, padc)),
                         constant_values=fill)
        return st.astype(astype) if astype is not None else st

    # per-offset per-cell periodic image shift: the rolled entry at cell
    # c holds the atom of cell (c+off) mod dims; when c+off wraps, the
    # true image sits one box length away (valid because edge >= rcut
    # and dims >= 3, checked above)
    coord = [jax.lax.broadcasted_iota(jnp.int32, dims, k).reshape(-1)
             for k in range(3)]

    def off_shift(off, k):
        o = off[k]
        if o == 0:
            return 0.0
        b = jnp.asarray(cfg.box[k], f32)
        if o > 0:
            return jnp.where(coord[k] >= dims[k] - o, b, 0.0)
        return jnp.where(coord[k] < -o, -b, 0.0)

    shifts = {k: [off_shift(off, kk) for kk in range(3)]
              for k, off in enumerate(half)}
    xs = stack(B["x"].astype(f32), 0.0,
               shifts={k: v[0] for k, v in shifts.items()})
    ys = stack(B["y"].astype(f32), 0.0,
               shifts={k: v[1] for k, v in shifts.items()})
    zs = stack(B["z"].astype(f32), 0.0,
               shifts={k: v[2] for k, v in shifts.items()})
    vm = stack(B["valid"].astype(f32), 0.0)
    ts = stack(B["types"], 0)
    rad = stack(B["radii"].astype(f32), 1.0) if use_radii else None

    # SMEM parameter table: p0..p4, kqq(+scale), r2cut, pad
    prm = jnp.zeros((nsp * nsp, 8), f32)
    prm = prm.at[:, 0:5].set(ff.vdw_p.reshape(-1, 5).astype(f32))
    prm = prm.at[:, 5].set((ff.chprod.reshape(-1)
                            * cfg.coul_scale).astype(f32))
    prm = prm.at[:, 6].set(ff.vdw_r2cut.reshape(-1).astype(f32))

    use_coul = cfg.elec_type != ELEC_NONE
    n_chunks = n_pad // chunk

    def kern(*refs):
        if use_radii:
            (params_ref, xr, yr, zr, vr, tr, rr_,
             fxr, fyr, fzr, fjxr, fjyr, fjzr, evr, ecr) = refs
        else:
            (params_ref, xr, yr, zr, vr, tr,
             fxr, fyr, fzr, fjxr, fjyr, fjzr, evr, ecr) = refs
            rr_ = None
        _pair_kernel(cfg, S, cap, chunk, nsp, use_coul, use_radii,
                     params_ref, xr, yr, zr, vr, tr, rr_,
                     fxr, fyr, fzr, fjxr, fjyr, fjzr, evr, ecr)

    vspec = lambda: pl.BlockSpec((S, cap, chunk), lambda c: (0, 0, c),
                                 memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                vspec(), vspec(), vspec(), vspec(), vspec()]
    ins = [prm, xs, ys, zs, vm, ts]
    if use_radii:
        in_specs.append(vspec())
        ins.append(rad)

    fspec = lambda: pl.BlockSpec((cap, chunk), lambda c: (0, c),
                                 memory_space=pltpu.VMEM)
    fjspec = lambda: pl.BlockSpec((S - 1, cap, chunk),
                                  lambda c: (0, 0, c),
                                  memory_space=pltpu.VMEM)
    espec = lambda: pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((cap, n_pad), f32),        # fx
        jax.ShapeDtypeStruct((cap, n_pad), f32),        # fy
        jax.ShapeDtypeStruct((cap, n_pad), f32),        # fz
        jax.ShapeDtypeStruct((S - 1, cap, n_pad), f32),  # fj per offset
        jax.ShapeDtypeStruct((S - 1, cap, n_pad), f32),
        jax.ShapeDtypeStruct((S - 1, cap, n_pad), f32),
        jax.ShapeDtypeStruct((n_chunks, 8, 128), f32),  # ev per chunk
        jax.ShapeDtypeStruct((n_chunks, 8, 128), f32),  # ec per chunk
    ]
    out_specs = [fspec(), fspec(), fspec(),
                 fjspec(), fjspec(), fjspec(), espec(), espec()]

    fx, fy, fz, fjx, fjy, fjz, ev, ec = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)

    # add the rolled-back j-side contributions (Newton's third law):
    # the partial at cell c belongs to atoms of cell c+off -> roll by -off
    def rollback(fj):
        out = jnp.zeros((cap, n_cell), f32)
        for k, off in enumerate(half[1:]):
            noff = tuple(-o for o in off)
            out = out + _roll3(fj[k, :, :n_cell].reshape(-1),
                               noff, dims).reshape(cap, n_cell)
        return out

    fx = fx[:, :n_cell] - rollback(fjx)
    fy = fy[:, :n_cell] - rollback(fjy)
    fz = fz[:, :n_cell] - rollback(fjz)

    soa = B["slot_of_atom"]

    def unsort(a, fill):
        flat = jnp.concatenate(
            [a[:, :n_cell].reshape(-1), jnp.full((1,), fill, a.dtype)])
        return flat[jnp.minimum(soa, n_cell * cap)]

    frc = jnp.stack([unsort(fx, 0.0), unsort(fy, 0.0),
                     unsort(fz, 0.0)], axis=1).astype(dt)
    big = jnp.asarray(jnp.inf, dt)
    z = jnp.full((N,), N, jnp.int32)
    zr = jnp.full((N,), big, dt)
    return PairResult(frc=frc,
                      eng_vdw=jnp.sum(ev[:, 0, 0]).astype(dt),
                      eng_coul=jnp.sum(ec[:, 0, 0]).astype(dt),
                      max_occ=B["max_occ"],
                      bind_idx=z, bind_r2=zr, jump_idx=z, jump_r2=zr)
