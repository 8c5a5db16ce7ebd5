"""Verlet neighbor list with skin — the fast path for per-step pair work.

The reference rebuilds its cell pair structure every step
(iter_fastCellList, cuPairs.cu:2519); its serial engine keeps per-atom
neighbor captures bounded by the control.txt ``max_neigh`` directive
(integrators.cpp:75-115).  Here the classic MD optimization: candidates
within ``r_max + skin`` are collected every ``rebuild_every`` steps into a
fixed-shape (N, K) index list; between rebuilds the pair pass touches
only true neighbors (K ~ a handful in dilute systems vs the hundreds of
masked slots a dense cell pass evaluates).

Safety: the step monitors max displacement since the last rebuild; when
2*max_disp exceeds the skin the list may be stale — the violation flag
surfaces in MDState (like cell_overflow) and the runner warns/tightens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..io.control import ELEC_NONE
from . import cell_list as cl
from .elec import coul_eval
from .pairs import MX_FRC, PairResult, _row_argmin, min_image
from .vdw import vdw_eval


def sorted_build_ok(cfg) -> bool:
    """True when build_neighbors takes the fused sorted pipeline for
    this cfg, i.e. its lists are NEAREST-FIRST at build positions and
    build_neighbors_keys is available."""
    if cfg.nb_grid is None:
        return False
    M = len(cfg.nb_grid.stencil) * cfg.nb_grid.cap
    return M <= 1024 and cfg.n_at < (1 << 24)   # f32 idx must be exact


def build_neighbors_keys(cfg, pos):
    """Fused sorted candidate pass (requires sorted_build_ok(cfg)).

    Returns (idx (N, K) nearest-first, skey (N, K) f32 sorted r2 at
    build positions with +inf padding, n_real_max, max_occ).  The keys
    let callers that run AT the build positions replace a
    refine_neighbors pass with a prefix slice: entries within a smaller
    reach r are exactly the rows' leading columns with skey <= r^2.
    """
    import dataclasses
    N = cfg.n_at
    K = cfg.n_neigh
    gcfg = dataclasses.replace(cfg, grid=cfg.nb_grid)
    coords = cl.cell_coords(gcfg, pos)
    M = len(gcfg.grid.stencil) * gcfg.grid.cap
    own = jnp.arange(N, dtype=jnp.int32)[:, None]
    r_nb = cfg.r_max + cfg.nb_skin
    chunk = max(1, int((2 << 30) // max(N * 128 * 4, 1)))

    ptab, max_occ = cl.build_pos_table(gcfg, pos)
    cap = gcfg.grid.cap
    S = len(gcfg.grid.stencil)
    # gather whole CELL rows (cap*4 contiguous floats per fetch) instead
    # of per-slot AoS rows: the candidate pass is HBM-latency bound, so
    # 27ish fetches/atom beat S*cap fetches/atom by ~cap x (the 85 ms
    # outer rebuild at 40k atoms was ~60 ms of per-slot gather latency;
    # round-4 TPU profile).  Output ordering is identical to the
    # per-slot gather, so lists and keys stay bitwise-the-same.
    ptab_rows = ptab.reshape(gcfg.grid.n_cell, cap * 4)
    ncid = cl.stencil_cell_ids(gcfg, coords)               # (N, S)
    chunk_cells = max(1, chunk // cap)

    def aos_chunk(cid):
        g = ptab_rows[cid].reshape(N, -1, 4)               # (N, s*cap, 4)
        delta = min_image(pos[:, None, :] - g[..., :3], cfg)
        return (jnp.sum(delta * delta, axis=-1),
                g[..., 3].astype(jnp.int32))
    parts = [aos_chunk(ncid[:, i:i + chunk_cells])
             for i in range(0, S, chunk_cells)]
    r2 = jnp.concatenate([p[0] for p in parts], axis=1) \
        if len(parts) > 1 else parts[0][0]
    cand = jnp.concatenate([p[1] for p in parts], axis=1) \
        if len(parts) > 1 else parts[0][1]
    mask = (cand != N) & (cand != own) & (r2 <= r_nb * r_nb)

    # stable row sort on masked r2: deterministic nearest-first
    key = jnp.where(mask, r2, jnp.inf).astype(jnp.float32)
    skey, sval = jax.lax.sort((key, cand), dimension=1, num_keys=1)
    kk = min(K, M)
    idx = jnp.where(jnp.isfinite(skey[:, :kk]), sval[:, :kk],
                    N).astype(jnp.int32)
    skey = skey[:, :kk]
    if kk < K:
        idx = jnp.concatenate(
            [idx, jnp.full((N, K - kk), N, jnp.int32)], axis=1)
        skey = jnp.concatenate(
            [skey, jnp.full((N, K - kk), jnp.inf, jnp.float32)], axis=1)
    n_real = jnp.sum(mask, axis=1)
    return idx, skey, jnp.max(n_real).astype(jnp.int32), max_occ


def prefix_refine(idx, skey, reach, K, n_at):
    """Refine a SORTED list to a smaller reach AT THE BUILD POSITIONS:
    the entries within `reach` are exactly the leading columns with
    skey <= reach^2 — no gather, no top_k (vs ~11 ms for the
    refine_neighbors pass at 40k atoms).  Returns (idx (N, K), n_max)
    with the same contract as refine_neighbors (sentinel = n_at)."""
    within = skey <= jnp.float32(reach * reach)            # (N, kk)
    k2 = min(K, idx.shape[1])
    out = jnp.where(within[:, :k2], idx[:, :k2],
                    jnp.int32(n_at)).astype(jnp.int32)
    if k2 < K:
        out = jnp.concatenate(
            [out, jnp.full((out.shape[0], K - k2), n_at, jnp.int32)],
            axis=1)
    return out, jnp.max(jnp.sum(within, axis=1)).astype(jnp.int32)


def build_neighbors(cfg, pos):
    """(N, K) neighbor indices within r_max + skin (sentinel = N).

    Uses the stencil candidate sweep over cfg.nb_grid, then a row
    compaction.  K = cfg.n_neigh.  Two pipelines (tools/bench_nbr.py,
    TPU v5e, 40k atoms):

      * sorted_build_ok (production reach at cs1 scale): gather the
        FUSED (x, y, z, idx) table (cell_list.build_pos_table) — one
        AoS HBM walk instead of int-table gather + position gather —
        and compact by a stable row sort on masked r2.  The list comes
        out NEAREST-FIRST (overflow drops the farthest, and downstream
        refines can prefix-slice).  62 -> 33 ms (RDF list) and
        90 -> 59 ms (outer force list) vs the two-gather + top_k path.
      * larger M (dense decks, K ~ hundreds): the sort's O(M log^2 M)
        bitonic passes lose to the O(M) cumsum+scatter compaction, and
        a top_k at K ~ 1600 took seconds; keep the two-gather +
        scatter pipeline (first-K truncation, monitored).
    """
    import dataclasses
    N = cfg.n_at
    K = cfg.n_neigh
    if sorted_build_ok(cfg):
        idx, _, nmax, max_occ = build_neighbors_keys(cfg, pos)
        return idx, nmax, max_occ

    gcfg = dataclasses.replace(cfg, grid=cfg.nb_grid)
    coords = cl.cell_coords(gcfg, pos)
    dt = pos.dtype
    M = len(gcfg.grid.stencil) * gcfg.grid.cap
    own = jnp.arange(N, dtype=jnp.int32)[:, None]
    r_nb = cfg.r_max + cfg.nb_skin
    # layout note: the vector (N, M, 3|4) gather is ~5x faster on TPU
    # than SoA component gathers (consecutive rows; the SoA path
    # measured 57 ms per pass on the 8.6M-candidate outer rebuild), but
    # its result buffer lane-pads the row to 128.  Bound the transient
    # by processing the candidate columns in chunks.
    chunk = max(1, int((2 << 30) // max(N * 128 * 4, 1)))

    table, max_occ = cl.build_cell_table(gcfg, pos)
    cand = cl.gather_candidates(gcfg, table, coords)       # (N, M)
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)

    def aos_r2(c):
        delta = min_image(pos[:, None, :] - pos_p[c], cfg)
        return jnp.sum(delta * delta, axis=-1)

    if M <= chunk:
        r2 = aos_r2(cand)
    else:
        r2 = jnp.concatenate(
            [aos_r2(cand[:, i:i + chunk]) for i in range(0, M, chunk)],
            axis=1)
    mask = (cand != N) & (cand != own) & (r2 <= r_nb * r_nb)

    if K <= 32:
        r2m = jnp.where(mask, r2, jnp.inf)
        _, sel = jax.lax.top_k(-r2m.astype(jnp.float32), K)
        rows = jnp.arange(N, dtype=jnp.int32)[:, None]
        idx = cand[rows, sel]
        keep = jnp.take_along_axis(mask, sel, axis=1)
        idx = jnp.where(keep, idx, N).astype(jnp.int32)
        n_real = jnp.sum(mask, axis=1)
    else:
        cnt = jnp.cumsum(mask, axis=1)
        rows = jnp.arange(N, dtype=jnp.int32)[:, None]
        tgt = jnp.where(mask & (cnt <= K), cnt - 1, K)    # K = dump slot
        out = jnp.full((N * (K + 1),), N, jnp.int32)
        out = out.at[(rows * (K + 1) + tgt).reshape(-1)].set(
            cand.reshape(-1), mode="drop")
        idx = out.reshape(N, K + 1)[:, :K]
        n_real = cnt[:, -1]
    # overflow monitoring: neighbors beyond K are silently dropped —
    # count the worst case so the runtime can grow K
    return idx, jnp.max(n_real).astype(jnp.int32), max_occ


def pair_forces_neighbors(cfg, ff, pos, types, nbr_idx, radii=None,
                          parents=None, want_bind: bool = False,
                          want_jump: bool = False) -> PairResult:
    """Pair physics over the (N, K) neighbor list — same PairResult as
    the cell engines (bind/jump radii are <= r_max <= list reach)."""
    return _walk(cfg, ff, pos, types, nbr_idx, rows=None, radii=radii,
                 parents=parents, want_bind=want_bind,
                 want_jump=want_jump)


def pair_forces_rows(cfg, ff, pos, types, nbrow_idx, radii=None,
                     parents=None, want_bind: bool = False,
                     want_jump: bool = False) -> PairResult:
    """Row-compacted neighbor walk: same physics as
    pair_forces_neighbors but only over the rows that HAVE neighbors.

    In dilute decks almost every (N, K) row is all-sentinel (case
    study 1: 442 of 40000 rows have any entry), yet the dense walk
    gathers and evaluates all N*K slots — measured 310 us/step of
    marginal cost at cs1 scale vs 72 us for this compacted form
    (tools/bench_gather.py).  The list has both pair directions, so
    i-side accumulation over compacted rows is exact; per-row sums are
    bitwise identical to the dense walk and the unique-sorted scatter
    adds each row's force once.  Candidates (bind/jump) scatter back
    the same way, so reactive decks are fully supported.
    """
    return _walk(cfg, ff, pos, types, nbrow_idx[:, 1:],
                 rows=nbrow_idx[:, 0], radii=radii, parents=parents,
                 want_bind=want_bind, want_jump=want_jump)


def compact_rows(nbr_idx, r_cap: int, n_at: int):
    """Compact the (N, K) list to the rows with >=1 real neighbor.

    Returns (nbrow (r_cap, 1 + K) int32, n_rows): column 0 is the atom
    id (sentinel N on padding rows), columns 1..K its neighbor list.
    Row ids come out ascending (the scatter back into per-atom arrays
    can promise sorted+unique indices).  n_rows is the TRUE number of
    occupied rows — when it exceeds r_cap the highest-index rows were
    dropped and the runner must regrow (nbrow_over monitor).
    """
    N = n_at
    K = nbr_idx.shape[1]
    has = jnp.any(nbr_idx != N, axis=1)
    # dtype pinned: jnp.sum promotes int32 -> int64 under x64 mode,
    # which breaks the scan-carry contract for the nbrow_over monitor
    n_rows = jnp.sum(has, dtype=jnp.int32)
    # smallest keys = occupied rows ascending, padded with sentinel N
    key = jnp.where(has, jnp.arange(N, dtype=jnp.int32), N)
    rows = (-jax.lax.top_k(-key, r_cap)[0]).astype(jnp.int32)
    nbr_p = jnp.concatenate(
        [nbr_idx, jnp.full((1, K), N, jnp.int32)], axis=0)
    nbrow = jnp.concatenate([rows[:, None], nbr_p[rows]], axis=1)
    return nbrow, n_rows


def compact_orows(idx2, o_cap: int, n_at: int):
    """Ascending atom ids with >=1 real entry in the OUTER (N, K2) list
    (sentinel N on padding rows) + the true occupied count.

    Computed once per full rebuild; refine_neighbors_rows then scans
    only these rows — exact, because the inner refine selects from the
    outer list, so a row empty here stays empty until the next rebuild.
    """
    N = n_at
    has = jnp.any(idx2 != N, axis=1)
    n_rows = jnp.sum(has, dtype=jnp.int32)
    key = jnp.where(has, jnp.arange(N, dtype=jnp.int32), N)
    orow = (-jax.lax.top_k(-key, o_cap)[0]).astype(jnp.int32)
    return orow, n_rows


def _walk(cfg, ff, pos, types, cand, rows=None, radii=None,
          parents=None, want_bind: bool = False,
          want_jump: bool = False) -> PairResult:
    """Shared walk core: rows=None walks all N atoms (row r = atom r);
    otherwise rows (R,) maps compacted rows to atom ids (sentinel N)."""
    N = cfg.n_at
    dt = pos.dtype
    nsp = cfg.n_spec

    types_p = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)], axis=0)

    # one vector gather: TPU gathers fetch consecutive (x,y,z) triples
    # efficiently; per-component gathers measured 5x slower here (the
    # rebuild path, which has a huge candidate axis, uses SoA instead).
    # Sentinel ids CLIP to a real row instead of indexing a padded copy
    # of pos: the (N+1, 3) concatenate materializes a row-major
    # {1,0:T(8,128)} buffer whose 3-wide minor dim pads to 128 lanes
    # (20.5 MB at 40k atoms, ~6 us/step measured; tools/bench_layout.py)
    # — every sentinel contribution is masked to zero below anyway.
    cand_c = jnp.minimum(cand, N - 1)
    if rows is None:
        pos_i = pos
        row_types = types
    else:
        pos_i = pos[jnp.minimum(rows, N - 1)]
        row_types = types_p[rows]
    delta = min_image(pos_i[:, None, :] - pos[cand_c], cfg)
    r2 = jnp.sum(delta * delta, axis=-1)
    valid = cand != N
    mask = valid & (r2 <= cfg.r2_max)
    r2s = jnp.where(mask, r2, 1.0)
    r = jnp.sqrt(r2s)

    tj = types_p[cand]
    ti = row_types[:, None]

    if cfg.elec_type != ELEC_NONE:
        tp = ti * nsp + tj
        chp = ff.chprod.reshape(-1)[tp]
        fc, ec = coul_eval(cfg, r2s, r, chp)
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
            tp = ti * nsp + tj
            kind = ff.vdw_kind.reshape(-1)[tp]
            vp = ff.vdw_p.reshape(-1, 5)[tp]
            r2cut = ff.vdw_r2cut.reshape(-1)[tp]
        vmask = mask & (r2 <= r2cut)
        if cfg.use_radii and radii is not None:
            rad_p = jnp.concatenate([radii, jnp.ones((1,), dt)], axis=0)
            rad_row = radii if rows is None else rad_p[rows]
            rad_i = jnp.broadcast_to(rad_row[:, None], r2s.shape)
            rad_j = rad_p[cand]
        else:
            rad_i = rad_j = None
        kind = jnp.where(vmask, kind, 0)
        fv, ev = vdw_eval(kind, vp, r2s, r, rad_i, rad_j,
                          families=cfg.vdw_families)
        fv = jnp.where(vmask, fv, 0.0)
        ev = jnp.where(vmask, ev, 0.0)
    else:
        fv = ev = jnp.zeros_like(r2s)

    f = jnp.clip(fc + fv, -MX_FRC, MX_FRC)
    frow = jnp.sum(f[:, :, None] * delta, axis=1)
    eng_vdw = 0.5 * jnp.sum(ev)
    eng_coul = 0.5 * jnp.sum(ec)

    big = jnp.asarray(jnp.inf, dt)
    R = cand.shape[0]
    if want_bind:
        tpair = ti * nsp + tj
        can = (ff.bonding_matr.reshape(-1)[tpair] != 0) & valid \
            & (r2 <= ff.bind_r2.reshape(-1)[tpair])
        if parents is not None:
            own = (jnp.arange(N, dtype=jnp.int32)[:, None]
                   if rows is None else rows[:, None])
            par_p = jnp.concatenate([parents, -jnp.ones((1,), jnp.int32)])
            par_row = parents if rows is None else par_p[rows]
            can = can & (par_row[:, None] != cand) & (par_p[cand] != own)
        bind_idx, bind_r2 = _row_argmin(cand, r2, can, N)
    else:
        bind_idx = jnp.full((R,), N, jnp.int32)
        bind_r2 = jnp.full((R,), big, dt)

    if want_jump:
        # per-role argmins (nearest acceptor for a donor row, nearest
        # donor for a pure-acceptor row) — see pairs._jump_candidates
        from .pairs import _jump_candidates
        jump_idx, jump_r2 = _jump_candidates(cfg, ff, row_types, tj,
                                             cand, r2, valid, sentinel=N)
        jump_r2 = jump_r2.astype(dt)
    else:
        jump_idx = jnp.full((R,), N, jnp.int32)
        jump_r2 = jnp.full((R,), big, dt)

    if rows is not None:
        # scatter compacted rows back to per-atom arrays.  Row ids are
        # ascending-unique by construction (compact_rows); the padding
        # rows all target the dump slot N with masked-zero/default
        # values, so the uniqueness promise only "lies" about entries
        # whose results are sliced off below.
        kw = dict(unique_indices=True, indices_are_sorted=True)
        frc = jnp.zeros((N + 1, 3), dt).at[rows].add(frow, **kw)[:N]
        bind_idx = jnp.full((N + 1,), N, jnp.int32).at[rows] \
            .set(bind_idx, **kw)[:N]
        bind_r2 = jnp.full((N + 1,), big, dt).at[rows] \
            .set(bind_r2, **kw)[:N]
        jump_idx = jnp.full((N + 1,), N, jnp.int32).at[rows] \
            .set(jump_idx, **kw)[:N]
        jump_r2 = jnp.full((N + 1,), big, dt).at[rows] \
            .set(jump_r2, **kw)[:N]
    else:
        frc = frow

    return PairResult(frc=frc, eng_vdw=eng_vdw, eng_coul=eng_coul,
                      max_occ=jnp.zeros((), jnp.int32),
                      bind_idx=bind_idx, bind_r2=bind_r2,
                      jump_idx=jump_idx, jump_r2=jump_r2)


def refine_neighbors(cfg, pos, nbr2):
    """Inner Verlet refine: select the n_neigh nearest within
    r_max + nb_skin from the OUTER (N, n_neigh2) list — one small AoS
    gather + top_k instead of the full candidate pass (~1 ms vs ~40 ms
    at 40k atoms; the full pass's table gather runs at ~6.6 ns/element).

    Returns (idx (N, K), n_real_max) — same contract as the inner list
    of build_neighbors.
    """
    N = cfg.n_at
    K = cfg.n_neigh
    dt = pos.dtype
    cand = nbr2                                           # (N, K2)
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    delta = min_image(pos[:, None, :] - pos_p[cand], cfg)
    r2 = jnp.sum(delta * delta, axis=-1)
    r_nb = cfg.r_max + cfg.nb_skin
    mask = (cand != N) & (r2 <= r_nb * r_nb)
    r2m = jnp.where(mask, r2, jnp.inf)
    kk = min(K, cand.shape[1])
    _, cols = jax.lax.top_k(-r2m.astype(jnp.float32), kk)
    rows = jnp.arange(N, dtype=jnp.int32)[:, None]
    idx = cand[rows, cols]
    keep = jnp.take_along_axis(mask, cols, axis=1)
    idx = jnp.where(keep, idx, N).astype(jnp.int32)
    if kk < K:
        idx = jnp.concatenate(
            [idx, jnp.full((N, K - kk), N, jnp.int32)], axis=1)
    n_real = jnp.sum(mask, axis=1)
    return idx, jnp.max(n_real).astype(jnp.int32)


def refine_neighbors_rows(cfg, pos, nbr2, r_cap: int, orow=None):
    """Row-first inner refine for the row-compacted walk
    (cfg.nb_rowcap > 0): select the OCCUPIED rows first (a fused
    gather+reduce over the outer list, (N,) output), then build inner
    lists only for those r_cap rows — replacing refine_neighbors'
    (N, K2) top_k + two (N*K) gathers (~3 ms of the 4.4 ms refine at
    40k atoms, TPU profile round 4) with (r_cap, K2) work.

    orow (cfg.nb_orowcap > 0): ascending atom ids with >=1 OUTER entry
    at the last full rebuild (ops.neighbors.compact_orows) — phase 1
    then scans (o_cap, K2) instead of (N, K2).  EXACT, not heuristic: a
    row with an empty outer list refines to an empty inner list, so
    skipping it changes nothing (the 70 ms (N, K2) sweep at 320k atoms
    drops to the ~27%-occupied outer rows).  Requires r_cap <= o_cap.

    Returns (idx (N, K) dense, nbrow (r_cap, 1 + K), n_real_max,
    n_rows) — idx/nbrow bitwise-match refine_neighbors + compact_rows
    for all occupied rows when n_rows <= r_cap; beyond r_cap both paths
    drop the highest-index rows (nbrow_over monitor -> runner regrow),
    and here the dense idx drops them too (the walk never sees them
    either way).
    """
    N = cfg.n_at
    K = cfg.n_neigh
    K2 = nbr2.shape[1]
    dt = pos.dtype
    r_nb = cfg.r_max + cfg.nb_skin

    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    if orow is None:
        # phase 1: per-row within-reach counts — the (N, K2, 3) gather
        # fuses into an (N,) reduce (no materialized (N, K2) buffer)
        delta = min_image(pos[:, None, :] - pos_p[nbr2], cfg)
        r2 = jnp.sum(delta * delta, axis=-1)
        mask = (nbr2 != N) & (r2 <= r_nb * r_nb)
        n_real = jnp.sum(mask, axis=1)
        has = n_real > 0
        row_ids = jnp.arange(N, dtype=jnp.int32)
    else:
        # phase 1 over the outer-occupied rows only; sentinel rows
        # (orow == N) hit the all-sentinel padding row of cand_p and
        # the zero row of pos_p, and mask to zero counts
        cand_p = jnp.concatenate(
            [nbr2, jnp.full((1, K2), N, jnp.int32)], axis=0)
        co = cand_p[orow]                                 # (o_cap, K2)
        pos_o = pos_p[orow]
        delta = min_image(pos_o[:, None, :] - pos_p[co], cfg)
        r2 = jnp.sum(delta * delta, axis=-1)
        mask = (co != N) & (r2 <= r_nb * r_nb)
        n_real = jnp.sum(mask, axis=1)
        has = n_real > 0
        row_ids = orow
    nmax = jnp.max(n_real).astype(jnp.int32)
    n_rows = jnp.sum(has, dtype=jnp.int32)

    # phase 2: occupied rows ascending (same contract as compact_rows)
    key = jnp.where(has, row_ids, N)
    rows = (-jax.lax.top_k(-key, r_cap)[0]).astype(jnp.int32)

    # phase 3: candidates + exact r2 for the selected rows only; the
    # same arithmetic on the same values as refine_neighbors, so the
    # resulting lists are bitwise-identical
    cand_p = jnp.concatenate([nbr2, jnp.full((1, K2), N, jnp.int32)],
                             axis=0)
    cr = cand_p[rows]                                    # (r_cap, K2)
    pos_r = pos_p[jnp.minimum(rows, N)]                  # (r_cap, 3)
    delta_r = min_image(pos_r[:, None, :] - pos_p[cr], cfg)
    r2_r = jnp.sum(delta_r * delta_r, axis=-1)
    mask_r = (cr != N) & (r2_r <= r_nb * r_nb)
    r2m = jnp.where(mask_r, r2_r, jnp.inf)
    kk = min(K, K2)
    _, cols = jax.lax.top_k(-r2m.astype(jnp.float32), kk)
    ridx = jnp.arange(r_cap, dtype=jnp.int32)[:, None]
    idx_r = cr[ridx, cols]
    keep = jnp.take_along_axis(mask_r, cols, axis=1)
    idx_r = jnp.where(keep, idx_r, N).astype(jnp.int32)
    if kk < K:
        idx_r = jnp.concatenate(
            [idx_r, jnp.full((r_cap, K - kk), N, jnp.int32)], axis=1)
    nbrow = jnp.concatenate([rows[:, None], idx_r], axis=1)

    # phase 4: dense (N, K) for the non-walk consumers (ejump env
    # sweep, oracles) — a small scatter of the occupied rows
    idx = jnp.full((N + 1, K), N, jnp.int32).at[rows].set(
        idx_r, unique_indices=True, indices_are_sorted=True)[:N]
    return idx, nbrow, nmax, n_rows


def build_outer_neighbors(cfg, pos):
    """Full candidate pass at the OUTER reach r_max + nb_skin2 into an
    (N, n_neigh2) list (cfg.nb_grid is sized for the outer reach when
    the two-level list is enabled).  Returns (idx2, n_real2_max, occ)."""
    import dataclasses
    ocfg = dataclasses.replace(cfg, n_neigh=cfg.n_neigh2,
                               nb_skin=cfg.nb_skin2)
    return build_neighbors(ocfg, pos)
