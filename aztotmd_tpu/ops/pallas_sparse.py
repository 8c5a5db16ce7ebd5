"""Morton block-sparse Pallas pair engine — LARGE clustered decks.

The dense O(N^2) kernel (ops.pallas_pair.pair_forces_allpairs) wins on
clustered decks up to ~8k atoms, but its slot-pair count grows as N^2;
cell decompositions (ops.cellblock) pay stencil*cap^2*n_cell with cap
set by the densest cell, so a dense core poisons the whole grid.  This
engine makes "cells" CONTIGUOUS SLICES of a space-filling curve:

* atoms are sorted by the Morton (Z-order) code of their fine-grid
  cell coords each call — spatially near atoms land in the same or an
  adjacent T-slot tile, so per-tile bounding boxes are tight;
* a tile PAIR interacts iff the periodic min-image gap between the two
  axis-aligned bounding boxes is within the cutoff.  The AABB gap is
  an exact lower bound on any cross-tile atom distance (per axis:
  min_m |d+e+mL| >= |minimage(d)| - h_i - h_j for |e| <= h_i + h_j),
  so the test never drops a real pair;
* the compacted i-major worklist of interacting ordered tile pairs is
  scalar-prefetched into the Pallas kernel (PrefetchScalarGridSpec):
  the grid walks the worklist, the index_maps select the i-side (T,1)
  column block and j-side (1,T) row block through the prefetched tile
  ids, and the (T,1) force/energy/candidate accumulators for tile i
  stay VMEM-resident across its consecutive worklist entries.

This is the TPU answer to the reference's sorted fast cell list
(cell_list4b_noshared + cell_list5a, cuPairs.cu:1474,2266 and driver
:2519-2568): the counting sort becomes a Morton argsort, the static
cell-pair lists with shift vectors become a per-call AABB worklist,
and the shared-memory cell tiles become VMEM outer-product tiles.
Unlike a fixed cell decomposition there is no per-cell capacity — a
tile always holds exactly T atoms, dense cores just produce more
interacting tile pairs (monitored against cfg.sparse_pair_cap via
PairResult.max_occ, which carries the REQUIRED worklist length here).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..io.control import ELEC_NONE
from .pairs import PairResult
from .pallas_pair import _BIG, _IBIG, _round_up_int, _tile_physics


def _part1by2(x):
    """Spread the low 10 bits of x to every third bit (Morton helper)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_dims(box, r_max):
    """Per-axis power-of-2 fine-grid sizes (<= 1024).  Finer than the
    cutoff improves sort locality at zero extra cost — the AABB test,
    not the grid, decides interaction."""
    dims = []
    for b in box:
        want = max(1.0, 2.0 * float(b) / max(float(r_max), 1e-6))
        dims.append(int(min(1024, 1 << max(0, math.ceil(math.log2(want))))))
    return tuple(dims)


def morton_codes(box, r_max, pos):
    """int32 Morton code per atom from wrapped positions (jnp or np)."""
    dims = _morton_dims(box, r_max)
    if isinstance(pos, np.ndarray):
        xp, part = np, lambda v: _part1by2(v.astype(np.int64)).astype(np.int64)
    else:
        xp, part = jnp, lambda v: _part1by2(v.astype(jnp.int32))
    code = None
    for k in range(3):
        b = float(box[k])
        w = pos[:, k] - b * xp.floor(pos[:, k] / b)
        c = xp.clip((w * (dims[k] / b)).astype(xp.int32), 0, dims[k] - 1)
        s = part(c) << k
        code = s if code is None else code | s
    return code.astype(xp.int32) if xp is jnp else np.asarray(code, np.int64)


def _tile_worklist(box, r2_max, xs, ys, zs, valid, n_t, T, pair_cap):
    """AABB-interacting ordered tile pairs, compacted i-major.

    Returns (it, jt, first, valid_pair) int32 (pair_cap,) arrays plus
    the int32 REQUIRED pair count (the overflow monitor: entries past
    pair_cap are truncated and must trigger a regrow upstream)."""
    f32 = jnp.float32
    vt = valid.reshape(n_t, T) > 0
    tile_valid = jnp.any(vt, axis=1)

    def aabb(a):
        at = a.reshape(n_t, T)
        lo = jnp.min(jnp.where(vt, at, jnp.inf), axis=1)
        hi = jnp.max(jnp.where(vt, at, -jnp.inf), axis=1)
        return (lo + hi) * 0.5, (hi - lo) * 0.5

    gap2 = jnp.zeros((n_t, n_t), f32)
    for k, a in enumerate((xs, ys, zs)):
        c, h = aabb(a)
        d = c[:, None] - c[None, :]
        b = f32(box[k])
        d = d - b * jnp.round(d * (1.0 / b))
        g = jnp.maximum(jnp.abs(d) - h[:, None] - h[None, :], 0.0)
        gap2 = gap2 + g * g
    mask = (gap2 <= f32(r2_max)) & tile_valid[:, None] & tile_valid[None, :]

    n_need = jnp.sum(mask).astype(jnp.int32)
    # ascending flat indices == i-major order; padding points at the
    # (n_t-1, n_t-1) self pair with valid_pair=0, so the output block
    # index stays monotone and the last tile's accumulator is reused
    flat = jnp.nonzero(mask.reshape(-1), size=pair_cap,
                       fill_value=-1)[0].astype(jnp.int32)
    vp = (flat >= 0).astype(jnp.int32)
    safe = jnp.where(vp > 0, flat, n_t * n_t - 1)
    it = safe // n_t
    jt = safe - it * n_t
    first = jnp.concatenate([jnp.ones((1,), jnp.int32),
                             (it[1:] != it[:-1]).astype(jnp.int32)])
    return it, jt, first, vp, n_need


def _sparse_kernel(cfg, T, nsp, use_coul, use_radii, want_bind,
                   want_jump, use_par, n_cand,
                   # scalar prefetch:
                   it_ref, jt_ref, first_ref, valid_ref,
                   # inputs:
                   params_ref, donacc_ref, refs):
    """One worklist entry: tile pair (it[p], jt[p]) of the Morton-sorted
    arrays.  Same physics as the dense kernel's tile; the i-row
    accumulators live across consecutive entries of the same i tile."""
    f32 = jnp.float32
    p = pl.program_id(0)

    def unpack(rs):
        x, y, z, g = rs[:4]
        k = 4
        t = r = pa = None
        if nsp > 1:
            t = rs[k]; k += 1
        if use_radii:
            r = rs[k]; k += 1
        if use_par:
            pa = rs[k]; k += 1
        return x, y, z, g, t, r, pa, k

    half = (len(refs) - 5 - n_cand) // 2
    xi, yi, zi, gi_r, ti_r, ra_i, pi_r, _ = unpack(refs[:half])
    xj, yj, zj, gj_r, tj_r, ra_j, pj_r, _ = unpack(refs[half:2 * half])
    fx_ref, fy_ref, fz_ref, ev_ref, ec_ref = refs[2 * half:2 * half + 5]
    cand_refs = refs[2 * half + 5:]

    @pl.when(first_ref[p] != 0)
    def _():
        fx_ref[0] = jnp.zeros((T, 1), f32)
        fy_ref[0] = jnp.zeros((T, 1), f32)
        fz_ref[0] = jnp.zeros((T, 1), f32)
        ev_ref[0] = jnp.zeros((T, 1), f32)
        ec_ref[0] = jnp.zeros((T, 1), f32)
        for k, r in enumerate(cand_refs):
            r[0] = jnp.full((T, 1), _BIG, f32) if k % 2 == 0 \
                else jnp.full((T, 1), _IBIG, jnp.int32)

    # padding entries (worklist slack up to pair_cap) skip the tile
    # physics entirely — they only exist to keep the grid static
    @pl.when(valid_ref[p] != 0)
    def _():
        dx = xi[0] - xj[0]
        dy = yi[0] - yj[0]
        dz = zi[0] - zj[0]
        bx, by, bz = (f32(cfg.box[k]) for k in range(3))
        dx = dx - bx * jnp.round(dx * f32(1.0 / cfg.box[0]))
        dy = dy - by * jnp.round(dy * f32(1.0 / cfg.box[1]))
        dz = dz - bz * jnp.round(dz * f32(1.0 / cfg.box[2]))
        r2 = dx * dx + dy * dy + dz * dz

        gi = gi_r[0]                            # (T, 1) global atom ids
        gj = gj_r[0]                            # (1, T)
        # real atoms have gi >= 0 (padding slots carry -1)
        vm = jnp.where((gi >= 0) & (gj >= 0) & (gi != gj), 1.0, 0.0)
        inr = jnp.where(r2 <= f32(cfg.r2_max), vm, 0.0)

        par_ok = ((pi_r[0] != gj) & (pj_r[0] != gi)) if use_par \
            else jnp.ones((T, T), bool)
        fsum, ev, ec, cands = _tile_physics(
            cfg, T, nsp, use_coul, use_radii, want_bind, want_jump,
            params_ref, donacc_ref, r2, inr, gi, gj,
            ti_r[0] if nsp > 1 else None, tj_r[0] if nsp > 1 else None,
            ra_i[0] if use_radii else None,
            ra_j[0] if use_radii else None,
            par_ok)

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


def estimate_sparse_pairs(box, r_max, pos, tile: int) -> int:
    """Host-side (NumPy) worklist size on the given positions — used by
    the setup cost model and to size cfg.sparse_pair_cap."""
    pos = np.asarray(pos, np.float64)
    n = len(pos)
    code = morton_codes(box, r_max, pos)
    order = np.argsort(code, kind="stable")
    T = int(tile)
    n_pad = _round_up_int(n, T)
    n_t = n_pad // T
    r2m = float(r_max) * float(r_max)
    gap2 = np.zeros((n_t, n_t))
    for k in range(3):
        b = float(box[k])
        w = pos[order, k] - b * np.floor(pos[order, k] / b)
        w = np.concatenate([w, np.full(n_pad - n, np.nan)])
        wt = w.reshape(n_t, T)
        lo = np.nanmin(wt, axis=1)
        hi = np.nanmax(wt, axis=1)
        c, h = (lo + hi) * 0.5, (hi - lo) * 0.5
        d = c[:, None] - c[None, :]
        d -= b * np.round(d / b)
        g = np.maximum(np.abs(d) - h[:, None] - h[None, :], 0.0)
        gap2 += g * g
    return int(np.sum(gap2 <= r2m))


def pair_forces_sparse(cfg, ff, pos, types, radii=None, parents=None,
                       want_bind: bool = False,
                       want_jump: bool = False,
                       interpret: bool | None = None,
                       tile: int | None = None,
                       pair_cap: int | None = None) -> PairResult:
    """Morton block-sparse pair pass (see module docstring).

    max_occ carries the REQUIRED worklist length: values above
    cfg.sparse_pair_cap mean truncated (wrong) forces this step and
    must trigger the runner's monitored regrow, exactly like a cell
    overflow in the block engine.
    """
    if jnp.dtype(pos.dtype) == jnp.dtype(jnp.float64):
        from .cellblock import pair_forces_block
        return pair_forces_block(cfg, ff, pos, types, radii=radii,
                                 parents=parents, want_bind=want_bind,
                                 want_jump=want_jump)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = cfg.n_at
    dt = pos.dtype
    nsp = cfg.n_spec
    f32 = jnp.float32
    T = int(tile if tile is not None else (cfg.sparse_tile or 256))
    T = min(T, _round_up_int(N, 128))
    n_pad = _round_up_int(N, T)
    n_t = n_pad // T
    if pair_cap is None:
        # the configured capacity is sized for cfg.sparse_tile; any
        # other tiling repartitions the worklist, so fall back to the
        # always-sufficient n_t^2
        pair_cap = (int(cfg.sparse_pair_cap)
                    if T == int(cfg.sparse_tile) else 0) or n_t * n_t
    pair_cap = max(n_t, min(int(pair_cap), n_t * n_t))
    padn = n_pad - N

    # ---- Morton sort + one AoS row gather (layout rule: fuse the
    # per-atom fields into rows so the permutation is ONE table walk)
    code = morton_codes(cfg.box, cfg.r_max, pos)
    perm = jnp.argsort(code)
    use_radii = bool(cfg.use_radii and radii is not None)
    use_par = bool(want_bind and parents is not None)
    cols = [pos[:, 0], pos[:, 1], pos[:, 2],
            jnp.arange(N, dtype=jnp.int32).astype(f32)]
    if nsp > 1:
        cols.append(types.astype(f32))
    if use_radii:
        cols.append(radii.astype(f32))
    if use_par:
        cols.append(parents.astype(f32))
    table = jnp.stack([c.astype(f32) for c in cols], axis=1)
    srt = jnp.take(table, perm, axis=0)
    if padn:
        pad = jnp.zeros((padn, srt.shape[1]), f32)
        pad = pad.at[:, 3].set(-1.0)          # gid -1 marks padding
        if use_radii:
            # radius 1.0 keeps the Surkov 1/(k1*ra + k2*rb) term finite
            # on masked padding rows (0 * nan = nan would leak through
            # the energy sum)
            pad = pad.at[:, 5 if nsp > 1 else 4].set(1.0)
        srt = jnp.concatenate([srt, pad])

    xs, ys, zs = srt[:, 0], srt[:, 1], srt[:, 2]
    gid = srt[:, 3].astype(jnp.int32)
    k = 4
    ts = ra = par = None
    if nsp > 1:
        ts = srt[:, k].astype(jnp.int32); k += 1
    if use_radii:
        ra = srt[:, k]; k += 1
    if use_par:
        par = srt[:, k].astype(jnp.int32); k += 1

    it, jt, first, vp, n_need = _tile_worklist(
        cfg.box, cfg.r2_max, xs, ys, zs, (gid >= 0).astype(jnp.int32),
        n_t, T, pair_cap)

    # ---- parameter tables (same layout as the dense kernel)
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

    def icols(a):
        return a.reshape(n_t, T, 1)

    def jrows(a):
        return a.reshape(n_t, 1, T)

    ispec = lambda: pl.BlockSpec((1, T, 1),
                                 lambda p, it, jt, fr, vp: (it[p], 0, 0),
                                 memory_space=pltpu.VMEM)
    jspec = lambda: pl.BlockSpec((1, 1, T),
                                 lambda p, it, jt, fr, vp: (jt[p], 0, 0),
                                 memory_space=pltpu.VMEM)
    ospec = lambda: pl.BlockSpec((1, T, 1),
                                 lambda p, it, jt, fr, vp: (it[p], 0, 0),
                                 memory_space=pltpu.VMEM)

    ins = [prm, donacc]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    for shape, spec in ((icols, ispec), (jrows, jspec)):
        ins += [shape(xs), shape(ys), shape(zs), shape(gid)]
        in_specs += [spec() for _ in range(4)]
        if nsp > 1:
            ins.append(shape(ts))
            in_specs.append(spec())
        if use_radii:
            ins.append(shape(ra))
            in_specs.append(spec())
        if use_par:
            ins.append(shape(par))
            in_specs.append(spec())

    n_cand = (2 if want_bind else 0) + (4 if want_jump else 0)
    out_shape = [jax.ShapeDtypeStruct((n_t, T, 1), f32)
                 for _ in range(5)]
    out_specs = [ospec() for _ in range(5)]
    for q in range(n_cand):
        out_shape.append(jax.ShapeDtypeStruct(
            (n_t, T, 1), f32 if q % 2 == 0 else jnp.int32))
        out_specs.append(ospec())

    def kern(it_ref, jt_ref, first_ref, valid_ref,
             params_ref, donacc_ref, *refs):
        _sparse_kernel(cfg, T, nsp, use_coul, use_radii, want_bind,
                       want_jump, use_par, n_cand,
                       it_ref, jt_ref, first_ref, valid_ref,
                       params_ref, donacc_ref, refs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(pair_cap,),
        in_specs=in_specs,
        out_specs=out_specs)
    res = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(it, jt, first, vp, *ins)
    fx, fy, fz, ev, ec = res[:5]
    cand = res[5:]

    # ---- mask tiles the (possibly truncated) worklist never visited:
    # their output blocks were never written and read back whatever the
    # allocator held (garbage/NaN on TPU).  Truncation then degrades to
    # the block engine's failure mode — bounded finite errors until the
    # max_occ monitor triggers a regrow — instead of a NaN cascade.
    visited = jnp.zeros((n_t,), jnp.int32).at[it].max(vp)
    vis_slot = jnp.repeat(visited, T)[:, None].astype(f32)  # (n_pad, 1)

    def vis_mask(a, fill):
        # jnp.where, not arithmetic masking: the garbage being masked
        # can be NaN/inf and 0 * NaN = NaN
        return jnp.where(vis_slot > 0, a.reshape(n_pad, 1), fill)

    fx, fy, fz = (vis_mask(a, 0.0) for a in (fx, fy, fz))
    ev = vis_mask(ev, 0.0)
    ec = vis_mask(ec, 0.0)
    cand = [vis_mask(a, _IBIG if a.dtype == jnp.int32 else f32(_BIG))
            for a in cand]

    # ---- unsort back to atom order (perm is a bijection)
    frc_s = jnp.stack([fx.reshape(-1)[:N], fy.reshape(-1)[:N],
                       fz.reshape(-1)[:N]], axis=1).astype(dt)
    frc = jnp.zeros((N, 3), dt).at[perm].set(frc_s, unique_indices=True)
    big = jnp.asarray(jnp.inf, dt)

    def cand_out(r2t, idt):
        r2f = r2t.reshape(-1)[:N]
        idf = idt.reshape(-1)[:N]
        none = r2f >= f32(_BIG)
        idx_s = jnp.where(none, N, idf).astype(jnp.int32)
        r2_s = jnp.where(none, big, r2f.astype(dt))
        idx = jnp.full((N,), N, jnp.int32).at[perm].set(
            idx_s, unique_indices=True)
        r2o = jnp.full((N,), big, dt).at[perm].set(
            r2_s, unique_indices=True)
        return idx, r2o

    z = jnp.full((N,), N, jnp.int32)
    zr = jnp.full((N,), big, dt)
    bind_idx, bind_r2 = (z, zr)
    jump_idx, jump_r2 = (z, zr)
    q = 0
    if want_bind:
        bind_idx, bind_r2 = cand_out(cand[0], cand[1])
        q = 2
    if want_jump:
        jd_idx, jd_r2 = cand_out(cand[q], cand[q + 1])
        ja_idx, ja_r2 = cand_out(cand[q + 2], cand[q + 3])
        don_row = (ff.spec_donacc[types] & 1).astype(bool)
        jump_idx = jnp.where(don_row, jd_idx, ja_idx)
        jump_r2 = jnp.where(don_row, jd_r2, ja_r2)

    return PairResult(frc=frc,
                      eng_vdw=jnp.sum(ev).astype(dt),
                      eng_coul=jnp.sum(ec).astype(dt),
                      max_occ=n_need,
                      bind_idx=bind_idx, bind_r2=bind_r2,
                      jump_idx=jump_idx, jump_r2=jump_r2)
