"""Roll-based cell-block pair engine — the fast path.

The gather-based engine (ops.pairs) builds a per-atom (N, S*cap)
candidate matrix with random-access gathers, which XLA lowers poorly on
TPU (~27 ms/step on the 40k-atom case study).  This engine removes every
gather from the hot path by exploiting the *regularity* of the cell
stencil (the structural idea behind the reference's precomputed cell-pair
lists, cuCellList.cu:134-211, re-expressed for the VPU):

1. atoms are binned into a dense SoA block structure
   (ncx, ncy, ncz, cap) — one scatter per component at step start;
2. the 27-stencil neighbor access becomes **27 static `jnp.roll`s** of
   that block structure (regular slice+concat data movement — no
   random-access gathers at all);
3. pair physics runs on (cap_i, cap_j, n_cell) tiles per offset — the
   long cell axis sits in the TPU's 128-lane dimension, so every vector
   register is full; XLA fuses the physics with the force/energy
   reductions;
4. per-atom forces come back through one inverse-permutation gather of
   N rows.

Work scales as S * n_cell * cap^2, so the grid is chosen for average
occupancy ~1-4 with cell edge >= cutoff (see ``make_block_grid``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..io.control import ELEC_NONE
from .elec import coul_eval
from .pairs import MX_FRC, PairResult
from .vdw import vdw_eval


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_grid_candidate(box, r_max, n_at, k, max_cells, min_occupancy,
                          pos):
    """One candidate grid with cell edge ~ r_max/k; returns
    (cost, CellGrid) or None if over budget.  Cost model: per-offset
    work is stencil * cap^2 * n_cell — CLUSTERED decks prefer sub-
    cutoff cells (cap shrinks ~e^3, squared; the stencil only grows
    ~(2k+1)^3/k^3 -> 8)."""
    from ..core.config import CellGrid
    dims = [max(1, int(length * k / r_max)) for length in box]
    n_cell = dims[0] * dims[1] * dims[2]
    budget = min(max_cells, max(1, int(n_at * k ** 3 / min_occupancy)))
    if n_cell > budget:
        if k > 1:
            return None
        s = (budget / n_cell) ** (1.0 / 3.0)
        dims = [max(1, int(d * s)) for d in dims]
    dims = tuple(dims)
    n_cell = dims[0] * dims[1] * dims[2]
    edge = tuple(length / n for length, n in zip(box, dims))

    # stencil identical to the gather engine (cfg-compatible)
    def reach(d, e):
        return max(0.0, (abs(d) - 1)) * e
    sx = [int(math.ceil(r_max / e)) for e in edge]
    # deduplicate offsets that alias mod dims (tiny grids), keeping the
    # smallest representative so the zero class is exactly (0,0,0) — the
    # self-pair exclusion in the pair pass keys on it
    classes = {}
    for dx in range(-sx[0], sx[0] + 1):
        for dy in range(-sx[1], sx[1] + 1):
            for dz in range(-sx[2], sx[2] + 1):
                d2 = (reach(dx, edge[0]) ** 2 + reach(dy, edge[1]) ** 2
                      + reach(dz, edge[2]) ** 2)
                if d2 <= r_max * r_max:
                    off = (dx, dy, dz)
                    key = tuple(o % d for o, d in zip(off, dims))
                    cur = classes.get(key)
                    if cur is None or (sum(map(abs, off))
                                       < sum(map(abs, cur))):
                        classes[key] = off
    stencil = sorted(classes.values(), key=lambda o: sum(map(abs, o)))

    avg = n_at / n_cell
    cap = _round_up(max(2, int(math.ceil(avg * 3.0))), 2)
    if pos is not None:
        p = np.asarray(pos, dtype=np.float64)
        c = np.floor(p / np.asarray(edge)).astype(np.int64) % np.asarray(dims)
        cid = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
        occ = int(np.bincount(cid, minlength=n_cell).max())
        cap = max(cap, _round_up(occ + max(2, occ // 4), 2))
    cap = min(cap, _round_up(n_at, 2))
    # the pair pass unrolls a Python loop per stencil offset, so the
    # compiled graph (and TPU compile time) scales with S; a 125-offset
    # grid took the scanned chunk past the compile budget.  Keep only
    # candidates with a modest stencil.
    if len(stencil) > 32 and k > 1:
        return None
    cost = len(stencil) * cap * cap * n_cell
    return cost, CellGrid(dims=dims, cap=cap, stencil=tuple(stencil),
                          edge=edge)


def make_block_grid(box, r_max: float, n_at: int,
                    min_occupancy: float = 1.0,
                    max_cells: int = 1 << 20,
                    pos=None, hint_edge: float = 0.0):
    """Choose block-grid dims by minimizing the modeled pair-pass cost
    over sub-cutoff cell sizes (edge ~ r_max/k for k = 1..4).

    Clustered decks (e.g. case study 2, local density ~5x the mean)
    gain most: with edge >= r the densest cell sets cap (~320 at 4k
    atoms) and the pass does stencil*cap^2*n_cell slots; quartering the
    edge cuts cap ~64x for only a ~(2k+1)^3 stencil.  Without ``pos``
    only k=1 is considered (cap would be guessed, and the dilute case
    prefers big cells anyway).
    """
    if r_max <= 0.0:
        raise ValueError("r_max must be positive")
    ks = [1, 2, 3, 4] if pos is not None else [1]
    if hint_edge and hint_edge > 0:
        # the deck's `cell_list <size>` directive (sys_init.cpp:700-706)
        # competes as one more candidate under the same cost model, so
        # the auto-pick can honor but never lose to it
        ks.append(r_max / hint_edge)
    best = None
    for k in ks:
        cand = _block_grid_candidate(box, r_max, n_at, k, max_cells,
                                     min_occupancy, pos)
        if cand is not None and (best is None or cand[0] < best[0]):
            best = cand
    return best[1]


def bin_atoms(cfg, pos, extra=()):
    """Bin atoms into the (cap * n_cell,) SoA block structure.

    Slot layout is TRANSPOSED — slot = rank * n_cell + cid — so block
    views are (cap, n_cell) with the long cell axis in the TPU's 128-wide
    lane dimension (a (n_cell, cap) layout with cap ~ 8 would waste 15/16
    of every vector register).

    Returns dict with per-slot arrays: x, y, z (f32 blocks), valid
    (bool), aid (int32 atom id; N for empty), slot_of_atom (N,)
    (cap * n_cell for dropped atoms), max_occ, plus one block per item of
    ``extra`` (list of (name, (N,) array, fill_value)).
    """
    N = cfg.n_at
    grid = cfg.grid
    cap = grid.cap
    n_cell = grid.n_cell
    dt = pos.dtype

    dims = jnp.asarray(grid.dims, jnp.int32)
    scale = jnp.asarray([grid.dims[k] / cfg.box[k] for k in range(3)], dt)
    c = jnp.floor(pos * scale).astype(jnp.int32) % dims
    cid = (c[:, 0] * grid.dims[1] + c[:, 1]) * grid.dims[2] + c[:, 2]

    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(N, dtype=jnp.int32) - first.astype(jnp.int32)
    slot = rank * n_cell + sorted_cid
    slot = jnp.where(rank < cap, slot, n_cell * cap)      # drop overflow
    max_occ = jnp.max(rank) + 1

    def blk(vals, fill, dtype=None):
        out = jnp.full((n_cell * cap,), fill, dtype or vals.dtype)
        return out.at[slot].set(vals[order], mode="drop")

    out = dict(
        x=blk(pos[:, 0], 0.0),
        y=blk(pos[:, 1], 0.0),
        z=blk(pos[:, 2], 0.0),
        valid=blk(jnp.ones((N,), bool), False),
        aid=blk(jnp.arange(N, dtype=jnp.int32), N),
        max_occ=max_occ,
    )
    # inverse mapping atom -> slot (dropped atoms point at a sentinel)
    soa = jnp.full((N,), n_cell * cap, jnp.int32)
    soa = soa.at[order].set(jnp.where(rank < cap, slot, n_cell * cap))
    out["slot_of_atom"] = soa
    for name, vals, fill in extra:
        out[name] = blk(vals, fill)
    return out


def _roll3(a, off, dims):
    """Roll the flat (cap*n_cell,)-shaped block array by a cell offset:
    reshape to (cap, ncx, ncy, ncz) and circularly shift the cell axes.
    Static shift -> XLA lowers to slice+concatenate (regular copies)."""
    ncx, ncy, ncz = dims
    a4 = a.reshape(-1, ncx, ncy, ncz)
    dx, dy, dz = off
    if dx:
        a4 = jnp.roll(a4, -dx, axis=1)
    if dy:
        a4 = jnp.roll(a4, -dy, axis=2)
    if dz:
        a4 = jnp.roll(a4, -dz, axis=3)
    return a4.reshape(a.shape)


def pair_forces_block(cfg, ff, pos, types, radii=None, parents=None,
                      want_bind: bool = False,
                      want_jump: bool = False) -> PairResult:
    """Drop-in replacement for ops.pairs.pair_forces (same PairResult)."""
    N = cfg.n_at
    dt = pos.dtype
    nsp = cfg.n_spec
    grid = cfg.grid
    cap = grid.cap
    n_cell = grid.n_cell
    dims = grid.dims

    extra = [("types", types, 0)]
    if cfg.use_radii and radii is not None:
        extra.append(("radii", radii, 1.0))
    if want_bind and parents is not None:
        extra.append(("parents", parents, -1))
    B = bin_atoms(cfg, pos, extra=extra)

    # (cap, n_cell) views — long cell axis in the lane dimension
    def v(a):
        return a.reshape(cap, n_cell)

    xi, yi, zi = v(B["x"]), v(B["y"]), v(B["z"])
    vi = v(B["valid"])
    ti = v(B["types"])
    aidi = v(B["aid"])
    radi = v(B["radii"]) if "radii" in B else None
    pari = v(B["parents"]) if "parents" in B else None

    box = jnp.asarray(cfg.box, dt)
    zero = jnp.zeros((cap, n_cell), dt)
    fx, fy, fz = zero, zero, zero
    eng_vdw = jnp.zeros((), dt)
    eng_coul = jnp.zeros((), dt)

    big = jnp.asarray(jnp.inf, dt)
    bind_r2b = jnp.full((cap, n_cell), big, dt)
    bind_idb = jnp.full((cap, n_cell), N, jnp.int32)
    jump_r2b = jnp.full((cap, n_cell), big, dt)
    jump_idb = jnp.full((cap, n_cell), N, jnp.int32)

    if want_jump:
        don_i = (ff.spec_donacc[ti] & 1).astype(bool) & vi
        # pure-acceptor rows track their nearest DONOR so the jmp_oft
        # extra passes can let a freshly-reduced atom donate back
        # (pairs._jump_candidates semantics, per-role argmins)
        accrow_i = (ff.spec_donacc[ti] & 2).astype(bool) & vi & ~don_i
        jmpa_r2b = jnp.full((cap, n_cell), big, dt)
        jmpa_idb = jnp.full((cap, n_cell), N, jnp.int32)

    for off in grid.stencil:
        # self-cell class: any offset that is ≡ 0 mod dims (covers tiny
        # grids where nonzero offsets alias back to the own cell)
        same = all(o % d == 0 for o, d in zip(off, dims))
        r = lambda a: v(a) if same else v(_roll3(a, off, dims))
        xj, yj, zj = r(B["x"]), r(B["y"]), r(B["z"])
        vj = r(B["valid"])
        tj = r(B["types"])
        aidj = r(B["aid"])

        # pair tiles are (cap_i, cap_j, n_cell)
        dx = xi[:, None, :] - xj[None, :, :]
        dy = yi[:, None, :] - yj[None, :, :]
        dz = zi[:, None, :] - zj[None, :, :]
        dx = dx - box[0] * jnp.round(dx / box[0])
        dy = dy - box[1] * jnp.round(dy / box[1])
        dz = dz - box[2] * jnp.round(dz / box[2])
        r2 = dx * dx + dy * dy + dz * dz

        mask = vi[:, None, :] & vj[None, :, :] & (r2 <= cfg.r2_max)
        if same:
            eye = jnp.eye(cap, dtype=bool)
            mask = mask & ~eye[:, :, None]

        r2s = jnp.where(mask, r2, 1.0)
        rr = jnp.sqrt(r2s)

        tpair = ti[:, None, :] * nsp + tj[None, :, :]

        if cfg.elec_type != ELEC_NONE:
            chp = ff.chprod.reshape(-1)[tpair]
            fc, ec = coul_eval(cfg, r2s, rr, chp)
            fc = jnp.where(mask, fc, 0.0)
            ec = jnp.where(mask, ec, 0.0)
        else:
            fc = ec = jnp.zeros_like(r2s)

        if cfg.vdw_families:
            if nsp == 1:
                kind = jnp.broadcast_to(ff.vdw_kind[0, 0], r2s.shape)
                vp = jnp.broadcast_to(ff.vdw_p[0, 0], r2s.shape + (5,))
                r2cut = ff.vdw_r2cut[0, 0]
            else:
                kind = ff.vdw_kind.reshape(-1)[tpair]
                vp = ff.vdw_p.reshape(-1, 5)[tpair]
                r2cut = ff.vdw_r2cut.reshape(-1)[tpair]
            vmask = mask & (r2 <= r2cut)
            if cfg.use_radii and radi is not None:
                ra = jnp.broadcast_to(radi[:, None, :], r2s.shape)
                rb = jnp.broadcast_to(r(B["radii"])[None, :, :], r2s.shape)
            else:
                ra = rb = None
            kind = jnp.where(vmask, kind, 0)
            fv, ev = vdw_eval(kind, vp, r2s, rr, ra, rb,
                              families=cfg.vdw_families)
            fv = jnp.where(vmask, fv, 0.0)
            ev = jnp.where(vmask, ev, 0.0)
        else:
            fv = ev = jnp.zeros_like(r2s)

        f = jnp.clip(fc + fv, -MX_FRC, MX_FRC)
        fx = fx + jnp.sum(f * dx, axis=1)
        fy = fy + jnp.sum(f * dy, axis=1)
        fz = fz + jnp.sum(f * dz, axis=1)
        eng_vdw = eng_vdw + 0.5 * jnp.sum(ev)
        eng_coul = eng_coul + 0.5 * jnp.sum(ec)

        if want_bind:
            can = (ff.bonding_matr.reshape(-1)[tpair] != 0) & mask \
                & (r2 <= ff.bind_r2.reshape(-1)[tpair])
            if pari is not None:
                parj = r(B["parents"])
                can = can & (pari[:, None, :] != aidj[None, :, :]) \
                    & (parj[None, :, :] != aidi[:, None, :])
            r2m = jnp.where(can, r2, big)
            j = jnp.argmin(r2m, axis=1)                    # (cap, n_cell)
            best = jnp.take_along_axis(r2m, j[:, None, :], axis=1)[:, 0, :]
            bid = jnp.take_along_axis(
                jnp.broadcast_to(aidj[None, :, :], r2m.shape),
                j[:, None, :], axis=1)[:, 0, :]
            better = best < bind_r2b
            bind_r2b = jnp.where(better, best, bind_r2b)
            bind_idb = jnp.where(better, bid, bind_idb)

        if want_jump:
            acc_j = (ff.spec_donacc[tj] & 2).astype(bool) & vj
            don_j = (ff.spec_donacc[tj] & 1).astype(bool) & vj
            in_rng = mask & (r2 <= cfg.r2_elec)

            def tile_min(can, r2b, idb):
                r2m = jnp.where(can, r2, big)
                j = jnp.argmin(r2m, axis=1)
                best = jnp.take_along_axis(
                    r2m, j[:, None, :], axis=1)[:, 0, :]
                jid = jnp.take_along_axis(
                    jnp.broadcast_to(aidj[None, :, :], r2m.shape),
                    j[:, None, :], axis=1)[:, 0, :]
                better = best < r2b
                return (jnp.where(better, best, r2b),
                        jnp.where(better, jid, idb))

            jump_r2b, jump_idb = tile_min(
                don_i[:, None, :] & acc_j[None, :, :] & in_rng,
                jump_r2b, jump_idb)
            jmpa_r2b, jmpa_idb = tile_min(
                accrow_i[:, None, :] & don_j[None, :, :] & in_rng,
                jmpa_r2b, jmpa_idb)

    # unsort: per-atom values via the inverse permutation (N-row gather)
    soa = B["slot_of_atom"]

    def unsort(a, fill):
        flat = jnp.concatenate(
            [a.reshape(-1), jnp.full((1,), fill, a.dtype)])
        return flat[jnp.minimum(soa, n_cell * cap)]

    frc = jnp.stack([unsort(fx, 0.0), unsort(fy, 0.0),
                     unsort(fz, 0.0)], axis=1)
    if want_bind:
        bind_idx = unsort(bind_idb, N)
        bind_r2 = unsort(bind_r2b, big)
    else:
        bind_idx = jnp.full((N,), N, jnp.int32)
        bind_r2 = jnp.full((N,), big, dt)
    if want_jump:
        # donor rows carry their nearest-acceptor entry; pure-acceptor
        # rows their nearest-donor entry (accrow_i and don_i are
        # disjoint, so a plain min-merge combines them)
        jump_idb = jnp.where(jmpa_r2b < jump_r2b, jmpa_idb, jump_idb)
        jump_r2b = jnp.minimum(jump_r2b, jmpa_r2b)
        jump_idx = unsort(jump_idb, N)
        jump_r2 = unsort(jump_r2b, big)
    else:
        jump_idx = jnp.full((N,), N, jnp.int32)
        jump_r2 = jnp.full((N,), big, dt)

    return PairResult(frc=frc, eng_vdw=eng_vdw.astype(dt),
                      eng_coul=eng_coul.astype(dt),
                      max_occ=B["max_occ"],
                      bind_idx=bind_idx, bind_r2=bind_r2,
                      jump_idx=jump_idx, jump_r2=jump_r2)
