"""Radial distribution functions on device.

Re-design of the reference's brute-force O(N^2) RDF kernel
(reference: src/cuStat.cu:436-512 ``brute_rdf``, :614-700 ``brute_nrdf``)
as a cell-list histogram: the RDF reach ``r_rdf`` usually exceeds the
force cutoff, so RDF sampling uses its *own* cell grid sized for the RDF
radius, and scatters the per-pair weights into the (n_bin, n_pair)
histogram with a single ``.at[].add`` — no atomics, O(N * neighbors).

Weights and normalization follow the reference exactly: each unordered
in-range pair contributes 2*V/(N_i*N_j) to bin floor(r/dRDF) of pair
index ``triu(min_t, max_t)``; the writer divides by the spherical-shell
volume and sample count (cuStat.cu:514-561 ``copy_rdf``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CellGrid, make_cell_grid
from . import cell_list as cl


def n_pairs(n: int) -> int:
    return n * (n + 1) // 2


def pair_index(n: int, t1, t2):
    """Upper-triangle pair index (cuStat.cu:483 ``iPair``):
    i*(n-1) + i*(1-i)/2 + j with i = min, j = max."""
    mn = jnp.minimum(t1, t2)
    mx = jnp.maximum(t1, t2)
    return mn * (n - 1) + (mn * (1 - mn)) // 2 + mx


@dataclass(frozen=True)
class RdfConfig:
    """Static RDF sampling configuration (control.txt ``rdf`` directive,
    rdf.cpp:14-38)."""
    n_bin: int                  # nRDF = r_rdf / d_rdf
    d_rdf: float
    r2_max: float
    n_spec: int
    n_nucl: int
    nuclei: bool                # also accumulate the nuclei histogram
    grid: CellGrid
    # neighbor-list sampling (dilute decks): reuse ops.neighbors to keep
    # an (N, k_cap) RDF neighbor list with `skin` Angstrom of slack,
    # rebuilt once per stat period instead of per sample.  0 = off
    # (sample directly from the candidate matrix).
    k_cap: int = 0
    skin: float = 0.0

    @property
    def n_pair(self) -> int:
        return n_pairs(self.n_spec)

    @property
    def n_npair(self) -> int:
        return n_pairs(self.n_nucl)


def make_rdf_config(ctl, cfg, max_cells: int = 1 << 20,
                    pos=None, m_min: float = 0.0) -> RdfConfig | None:
    if ctl.fr_rdf <= 0 or ctl.r_rdf <= 0.0 or ctl.d_rdf <= 0.0:
        return None
    grid = make_cell_grid(cfg.box, ctl.r_rdf, cfg.n_at, max_cells=max_cells,
                          pos=pos)
    # bin count clamped to the box edge (rdf.cpp:41-47 init_rdf)
    min_r = min(ctl.r_rdf, min(cfg.box))
    k_cap = 0
    skin = 0.0
    if pos is not None and ctl.stat > 0 and ctl.fr_rdf < ctl.stat:
        # list-based sampling pays off when several samples share one
        # rebuild; the skin must absorb the drift over a stat period
        # (the same 6x thermal-speed bound as the force Verlet list,
        # core/config.py) and the list capacity covers the measured
        # local density at the padded reach with headroom
        from .. import units
        from ..core.config import _max_neigh_count, _round_up
        import math as _math
        if ctl.tstat.temp > 0 and m_min > 0:
            v_th = _math.sqrt(3.0 * units.KB * ctl.tstat.temp / m_min)
            skin = 6.0 * v_th * ctl.t_step * ctl.stat
        else:
            skin = 2.0
        skin = min(max(skin, 1.0), 0.5 * min(cfg.box))
        mx = _max_neigh_count(pos, cfg.box, ctl.r_rdf + skin)
        k_cap = _round_up(mx + mx // 2 + 8, 8)
        M = len(grid.stencil) * grid.cap
        # disable when the list would not be smaller than the candidate
        # matrix, when the deck is small/dense enough that rdf_sample
        # dispatches to the all-pairs path anyway, or when the "list"
        # would hold most of the system
        if k_cap >= M or cfg.n_at <= M or k_cap > cfg.n_at // 4:
            k_cap = 0
            skin = 0.0
    return RdfConfig(
        n_bin=int(min_r / ctl.d_rdf),
        d_rdf=ctl.d_rdf,
        r2_max=ctl.r_rdf * ctl.r_rdf,
        n_spec=cfg.n_spec,
        n_nucl=cfg.n_nucl,
        nuclei=ctl.nuclei_rdf,
        grid=grid,
        k_cap=k_cap, skin=skin)


def zero_hist(rcfg: RdfConfig, dtype=jnp.float32):
    # host zeros transferred, not jnp.zeros: eager device fills compile
    # tiny XLA programs (slow over the axon remote-compile tunnel)
    h = jnp.asarray(np.zeros((rcfg.n_bin, rcfg.n_pair), dtype))
    nh = jnp.asarray(np.zeros((rcfg.n_bin, rcfg.n_npair), dtype))
    return (h, nh) if rcfg.nuclei else (h, None)


def _hist_counts(flat, n_slot: int, dtype):
    """Histogram COUNTS of int32 ids in [0, n_slot) (ids == n_slot are
    dropped) — scatter-free (a TPU scatter serializes per source
    element: the (N, M)-candidate scatter onto a ~700-slot histogram
    cost ~200 ms/sample on cs1).

    Small/medium E: one global sort + binary-searched bin edges,
    O(E log E).  Large E on TPU: sorts of tens of millions of elements
    inside the scanned chunk have crashed the TPU worker (and cost
    ~65 ms warm); the (n_slot, E) masked-compare reduction is pure VPU
    streaming (~50 ms at E=20M x 2400 slots) and robust, so it takes
    over past 8M elements.  On CPU the compare matrix is minutes —
    always sort there."""
    ids = flat.reshape(-1)
    # compare wins in two regimes: huge E (sort crashes/costs ~65 ms at
    # tens of millions inside a scan) and small E*n_slot (the compare
    # matrix streams at ~1G element-compares/ms on the VPU, so e.g.
    # 960k ids x 700 slots ~ 1 ms vs ~10 ms for the 960k-element sort)
    use_compare = (jax.default_backend() != "cpu"
                   and (ids.size > (8 << 20)
                        or ids.size * n_slot <= (2 << 30)))
    if use_compare:
        # materialize the ids ONCE: without the barrier XLA fuses the
        # whole upstream id pipeline (N^2 distances, sqrt, bin index)
        # into the reduce over EACH slot tile, recomputing it n_slot/8
        # times (~260 ms/sample on cs2 vs ~7 ms with the barrier)
        ids = jax.lax.optimization_barrier(ids)
        slots = jnp.arange(n_slot, dtype=jnp.int32)
        return jnp.sum((ids[None, :] == slots[:, None]).astype(dtype),
                       axis=1)
    ids = jnp.sort(ids)
    edges = jnp.arange(n_slot + 1, dtype=ids.dtype)
    pos = jnp.searchsorted(ids, edges, side="left")
    return jnp.diff(pos).astype(dtype)


def rdf_sample_allpairs(cfg, rcfg: RdfConfig, pos, types, spec_number,
                        spec_nuclei, nucl_number, hist, nhist=None):
    """All-pairs RDF sample for small dense systems (the reference's
    own approach, brute_rdf cuStat.cu:436-512 — but as broadcasts, no
    atomics).  Preferred when N^2 is smaller than the cell-candidate
    matrix (clustered decks blow the per-cell cap: case study 2's RDF
    grid reached cap ~770, an 83M-slot candidate matrix, vs N^2=16M).
    SoA per-component broadcasts: zero gathers, no (N,N,3) lane-padded
    intermediate."""
    N = cfg.n_at
    dt = pos.dtype
    box = jnp.asarray(cfg.box, dt)
    r2 = jnp.zeros((N, N), dt)
    for k in range(3):
        d = pos[:, k][:, None] - pos[:, k][None, :]
        d = d - box[k] * jnp.round(d / box[k])
        r2 = r2 + d * d
    own = jnp.arange(N, dtype=jnp.int32)
    mask = (own[:, None] < own[None, :]) & (r2 < rcfg.r2_max)
    r = jnp.sqrt(jnp.where(mask, r2, 1.0))
    ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32), rcfg.n_bin - 1)
    if rcfg.n_spec == 1:
        ip = 0
    else:
        ip = pair_index(rcfg.n_spec, types[:, None], types[None, :])
    B = rcfg.n_bin * rcfg.n_pair
    flat = jnp.where(mask, ib * rcfg.n_pair + ip, B)
    counts = _hist_counts(flat, B, dt).reshape(rcfg.n_bin, rcfg.n_pair)
    return _apply_weights(cfg, rcfg, counts, spec_number, spec_nuclei,
                          nucl_number, hist, nhist)


def rdf_counts_rows(cfg, rcfg: RdfConfig, row_pos, row_gid, row_types,
                    pos_g, types_g):
    """Partial all-pairs RDF COUNTS for an arbitrary row set against
    the global atom table, deduplicated by global id (a pair lands on
    the row owning the smaller gid; dead rows carry gid -1).

    Summing the counts over DISJOINT row sets (``lax.psum`` over slab
    devices, parallel/slab.py) reproduces rdf_sample_allpairs' integer
    counts exactly: each row's positions are bit-identical to its
    pos_g entry (the table is psum-assembled from them), so the
    distances and bin ids match the single-chip sweep bitwise.
    """
    dt = pos_g.dtype
    N = pos_g.shape[0]
    box = jnp.asarray(cfg.box, dt)
    r2 = jnp.zeros((row_pos.shape[0], N), dt)
    for k in range(3):
        d = row_pos[:, k][:, None] - pos_g[:, k][None, :]
        d = d - box[k] * jnp.round(d / box[k])
        r2 = r2 + d * d
    j = jnp.arange(N, dtype=jnp.int32)
    mask = (row_gid[:, None] >= 0) & (row_gid[:, None] < j[None, :]) \
        & (r2 < rcfg.r2_max)
    r = jnp.sqrt(jnp.where(mask, r2, 1.0))
    ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32), rcfg.n_bin - 1)
    if rcfg.n_spec == 1:
        ip = 0
    else:
        ip = pair_index(rcfg.n_spec, row_types[:, None], types_g[None, :])
    B = rcfg.n_bin * rcfg.n_pair
    flat = jnp.where(mask, ib * rcfg.n_pair + ip, B)
    return _hist_counts(flat, B, dt).reshape(rcfg.n_bin, rcfg.n_pair)


def rdf_counts_rows_cells(cfg, rcfg: RdfConfig, row_pos, row_gid,
                          row_types, pos_g, types_g):
    """Cell-candidate variant of rdf_counts_rows for LARGE N: the
    rows-vs-global broadcast is O(C * N) (a 41-billion-element array at
    320k atoms / 4 devices — found by the round-5 mesh scale probe),
    while the per-row candidate sweep over the RDF cell grid is
    O(C * stencil * cap).

    Each device bins the GLOBAL position table on the RDF grid
    (replicated O(N) compute, same table on every device) and gathers
    candidates only for its own row set.  Pair dedup is by global id
    (row_gid < candidate id), identical to rdf_counts_rows /
    rdf_sample, so summing over disjoint row sets reproduces the
    single-chip integer counts exactly.
    """
    import dataclasses
    dt = pos_g.dtype
    N = pos_g.shape[0]
    gcfg = dataclasses.replace(cfg, grid=rcfg.grid, n_at=N)
    table, _ = cl.build_cell_table(gcfg, pos_g)
    coords = cl.cell_coords(gcfg, row_pos)
    cand = cl.gather_candidates(gcfg, table, coords)       # (C, M)

    box = jnp.asarray(cfg.box, dt)
    pos_p = jnp.concatenate([pos_g, jnp.zeros((1, 3), dt)], axis=0)
    d = row_pos[:, None, :] - pos_p[cand]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)

    mask = (cand != N) & (row_gid[:, None] >= 0) \
        & (row_gid[:, None] < cand) & (r2 < rcfg.r2_max)
    r = jnp.sqrt(jnp.where(mask, r2, 1.0))
    ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32), rcfg.n_bin - 1)
    if rcfg.n_spec == 1:
        ip = 0
    else:
        types_p = jnp.concatenate([types_g, jnp.zeros((1,), jnp.int32)],
                                  axis=0)
        ip = pair_index(rcfg.n_spec, row_types[:, None], types_p[cand])
    B = rcfg.n_bin * rcfg.n_pair
    flat = jnp.where(mask, ib * rcfg.n_pair + ip, B)
    return _hist_counts(flat, B, dt).reshape(rcfg.n_bin, rcfg.n_pair)


def rdf_sample(cfg, rcfg: RdfConfig, pos, types, spec_number,
               spec_nuclei, nucl_number, hist, nhist=None):
    """Accumulate one RDF sample into the histogram(s).

    ``spec_nuclei``: (n_spec,) nucleus id per species; ``nucl_number``:
    (n_nucl,) atom counts per nucleus.  Returns updated (hist, nhist).

    The per-pair weight 2*V/(N_i*N_j) depends only on the species pair,
    which the flat bin id already encodes — so the histogram reduces to
    integer COUNTS per (bin, pair) slot (no scatter; see _hist_counts)
    scaled by a tiny per-pair weight table.
    """
    import dataclasses
    N = cfg.n_at
    dt = pos.dtype
    # dense/small systems: the cell candidate matrix (N, S*cap) is
    # LARGER than all-pairs once the densest cell sets cap — use the
    # brute broadcast path instead (no gathers, no giant table)
    if N <= len(rcfg.grid.stencil) * rcfg.grid.cap:
        return rdf_sample_allpairs(cfg, rcfg, pos, types, spec_number,
                                   spec_nuclei, nucl_number, hist, nhist)
    # reuse the bucketed cell machinery with the RDF grid
    gcfg = dataclasses.replace(cfg, grid=rcfg.grid)
    coords = cl.cell_coords(gcfg, pos)
    table, _ = cl.build_cell_table(gcfg, pos)
    cand = cl.gather_candidates(gcfg, table, coords)       # (N, M)

    # TPU random gathers run at ~6-7 ns/element, so they dominate this
    # whole function (six gather fusions at ~28 ms each profiled on cs1).
    # The (N, M, 3) AoS gather fetches consecutive triples ~5x faster
    # than three per-component gathers (same finding as the neighbor-list
    # rebuild, neighbors.py:44-49); its lane-padded 3->128 result buffer
    # is the price, so fall back to SoA only when it would not fit.
    box = jnp.asarray(cfg.box, dt)
    padded_bytes = cand.size * 128 * 4
    if padded_bytes <= (4 << 30):
        pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
        d = pos[:, None, :] - pos_p[cand]
        d = d - box * jnp.round(d / box)
        r2 = jnp.sum(d * d, axis=-1)
    else:
        r2 = jnp.zeros(cand.shape, dt)
        for k in range(3):
            xk = jnp.concatenate([pos[:, k], jnp.zeros((1,), dt)])
            d = pos[:, k][:, None] - xk[cand]
            d = d - box[k] * jnp.round(d / box[k])
            r2 = r2 + d * d

    own = jnp.arange(N, dtype=jnp.int32)[:, None]
    # each unordered pair once (the reference iterates i<j)
    mask = (cand != N) & (cand > own) & (r2 < rcfg.r2_max)

    r = jnp.sqrt(jnp.where(mask, r2, 1.0))
    ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32), rcfg.n_bin - 1)

    if rcfg.n_spec == 1:
        ip = 0                     # single species: skip the type gather
    else:
        types_p = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)],
                                  axis=0)
        ip = pair_index(rcfg.n_spec, types[:, None], types_p[cand])

    B = rcfg.n_bin * rcfg.n_pair
    flat = jnp.where(mask, ib * rcfg.n_pair + ip, B)       # drop slot
    counts = _hist_counts(flat, B, dt).reshape(rcfg.n_bin, rcfg.n_pair)
    return _apply_weights(cfg, rcfg, counts, spec_number, spec_nuclei,
                          nucl_number, hist, nhist)


def _apply_weights(cfg, rcfg: RdfConfig, counts, spec_number, spec_nuclei,
                   nucl_number, hist, nhist):
    """Scale per-(bin, species-pair) COUNTS by the 2V/(Ni*Nj) weight
    table and fold into the species/nuclei histograms."""
    dt = counts.dtype
    # per-species-pair weight tables over the static upper triangle
    iu, ju = np.triu_indices(rcfg.n_spec)
    vol = jnp.asarray(cfg.volume, dt)
    num = spec_number.astype(dt)
    w_tab = 2.0 * vol / (num[iu] * num[ju])                # (n_pair,)
    # accumulate in the HISTOGRAM's dtype: the buffers are f32 ring
    # carries, and an f64-mode sample (counts in the state dtype) must
    # not promote them mid-scan (carry dtype mismatch, found on the
    # first f64 run with x64 actually enabled, round 5)
    hist = hist + (counts * w_tab[None, :]).astype(hist.dtype)

    if rcfg.nuclei and nhist is not None:
        # species-pair -> nucleus-pair fold: a (n_pair, n_npair) matrix
        # carrying the nucleus-pair weights (several species pairs can
        # map to one nucleus pair)
        ni = spec_nuclei[jnp.asarray(iu)]
        nj = spec_nuclei[jnp.asarray(ju)]
        inp = pair_index(rcfg.n_nucl, ni, nj)              # (n_pair,)
        nnum = nucl_number.astype(dt)
        nw = 2.0 * vol / (nnum[jnp.minimum(ni, nj)]
                          * nnum[jnp.maximum(ni, nj)])
        fold = (inp[:, None] == jnp.arange(rcfg.n_npair)[None, :]) \
            .astype(dt) * nw[:, None]
        nhist = nhist + (counts @ fold).astype(nhist.dtype)

    return hist, nhist


# spherical-shell normalization constant 4*pi/3 ("sphera", const.h)
SPHERA = 4.0 * np.pi / 3.0


def normalize_rdf(rcfg: RdfConfig, hist: np.ndarray, count: int,
                  nuclei: bool = False) -> np.ndarray:
    """Host-side normalization (copy_rdf, cuStat.cu:514-561): returns the
    (n_bin, n_pair) g(r) table; the kernel already applied the factor 2,
    so C1 drops it (copy_nrdf uses C1 without the 2)."""
    n = rcfg.n_nucl if nuclei else rcfg.n_spec
    c1 = 1.0 / (SPHERA * rcfg.d_rdf ** 3 * max(count, 1))
    i = np.arange(rcfg.n_bin)[:, None]
    c2 = 1.0 / (3.0 * i * (i + 1.0) + 1.0)
    # C3: 0.5 for unlike pairs (each counted once but normalized by Ni*Nj)
    c3 = np.empty(n_pairs(n))
    k = 0
    for a in range(n):
        for b in range(a, n):
            c3[k] = 1.0 if a == b else 0.5
            k += 1
    return np.asarray(hist, np.float64) * c1 * c2 * c3[None, :]


def rdf_list_cfg(cfg, rcfg: RdfConfig, max_cells: int = 1 << 20):
    """A SimConfig view that points ops.neighbors.build_neighbors at the
    RDF reach: list reach = r_rdf + skin, capacity k_cap."""
    import dataclasses
    import math as _math
    r_rdf = _math.sqrt(rcfg.r2_max)
    grid = make_cell_grid(cfg.box, r_rdf + rcfg.skin, cfg.n_at,
                          max_cells=max_cells)
    return dataclasses.replace(cfg, nb_grid=grid, n_neigh=rcfg.k_cap,
                               nb_skin=rcfg.skin, r_max=r_rdf)


def rdf_refine_rows(cfg, rcfg: RdfConfig, pos, nbr2, reach: float,
                    r_cap: int, k_rdf: int):
    """Per-stat-period RDF candidate compaction for the rdf_from_outer
    ring cadence (runtime/runner.py:_build_programs).

    The outer Verlet list (N, K2) covers the RDF reach for a whole
    superblock, but at dilute densities most rows have NO entry within
    r_rdf + one-period drift — cs1's thermalized gas keeps ~60% of its
    40000 rows empty at the 19 A refine reach, and the per-sample
    (N, K2, 3) gather was 4.8 ms x 16 per superblock (the single
    biggest ring-overhead item, round-5 attribution).  One refine at
    the stat-period start selects the rows with >=1 entry within
    ``reach`` (= r_rdf + drift bound over the period, the same
    nb_skin/nb_rebuild rate bound that sizes k_super) and trims each
    to its k_rdf nearest candidates; the period's samples then walk
    only (r_cap, k_rdf).

    Exactness: a pair within r_rdf at ANY sample of the period is
    within ``reach`` of the period start (drift bound), hence in the
    refined table unless r_cap/k_rdf truncated it — truncation is
    reported, monitored and regrown by the runner (packed into
    rdf_over, see below).

    Returns (tbl (r_cap, 1 + k_rdf) int32 [row id | candidates],
    over): ``over`` packs the TRUE requirements as
    n_rows_needed * 1024 + max_entries_per_row for the single
    rdf_over monitor slot (int32-safe to n_at ~ 2e6).
    """
    N = cfg.n_at
    K2 = nbr2.shape[1]
    dt = pos.dtype
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    box = jnp.asarray(cfg.box, dt)
    # phase 1: per-row in-reach counts — the (N, K2, 3) gather fuses
    # into the (N,) reduce, nothing (N, K2)-shaped is materialized
    # (materializing r2/mask here and row-gathering them below was the
    # first version: three (r_cap, K2) SoA gathers at ~6.6 ns/element
    # cost MORE than the full-list sampling it replaced — recompute
    # beats re-fetch, the same lesson as refine_neighbors_rows)
    d = pos[:, None, :] - pos_p[nbr2]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)
    mask = (nbr2 != N) & (r2 <= reach * reach)
    n_in = jnp.sum(mask, axis=1)
    has = n_in > 0
    n_rows = jnp.sum(has, dtype=jnp.int32)
    k_need = jnp.max(n_in).astype(jnp.int32)

    # phase 2: occupied rows ascending — full sort of the (N,) key
    # (top_k at k ~ N/2 is much slower than one bitonic sort here)
    key = jnp.where(has, jnp.arange(N, dtype=jnp.int32), N)
    rows = jax.lax.sort(key)[:r_cap]

    # phase 3: candidate ids for the selected rows (ONE whole-row int
    # gather, 24 contiguous ints per fetch) and RECOMPUTED distances
    # (AoS triple gathers at ~1.3 ns/element) — same arithmetic on the
    # same values as phase 1, so the kept set is exact
    cand_p = jnp.concatenate([nbr2, jnp.full((1, K2), N, jnp.int32)],
                             axis=0)
    cr = cand_p[rows]                                     # (r_cap, K2)
    pos_r = pos_p[jnp.minimum(rows, N)]
    dr = pos_r[:, None, :] - pos_p[cr]
    dr = dr - box * jnp.round(dr / box)
    r2r = jnp.sum(dr * dr, axis=-1)
    mr = (cr != N) & (r2r <= reach * reach)
    r2m = jnp.where(mr, r2r, jnp.inf)
    kk = min(k_rdf, K2)
    _, cols = jax.lax.top_k(-r2m.astype(jnp.float32), kk)
    ridx = jnp.arange(rows.shape[0], dtype=jnp.int32)[:, None]
    idx_r = jnp.where(jnp.take_along_axis(mr, cols, axis=1),
                      cr[ridx, cols], N).astype(jnp.int32)
    if kk < k_rdf:
        idx_r = jnp.concatenate(
            [idx_r, jnp.full((rows.shape[0], k_rdf - kk), N, jnp.int32)],
            axis=1)
    tbl = jnp.concatenate([rows[:, None], idx_r], axis=1)
    over = n_rows * jnp.int32(1024) + jnp.minimum(k_need, 1023)
    return tbl, over


def rdf_sample_rows(cfg, rcfg: RdfConfig, pos, types, spec_number,
                    spec_nuclei, nucl_number, tbl, hist, nhist=None):
    """Accumulate one RDF sample from a row-compacted candidate table
    (rdf_refine_rows).  Counts are exactly rdf_sample_list's when the
    caps sufficed: pair (i, j), i < j, within r_rdf lands once on row
    i (the cand > own mask below), and the f32 count accumulation is
    integer-exact, so the histograms match bitwise."""
    N = cfg.n_at
    dt = pos.dtype
    rows = tbl[:, 0]
    cand = tbl[:, 1:]
    box = jnp.asarray(cfg.box, dt)
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    d = pos_p[rows][:, None, :] - pos_p[cand]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)

    mask = (cand != N) & (cand > rows[:, None]) & (r2 < rcfg.r2_max)

    r = jnp.sqrt(jnp.where(mask, r2, 1.0))
    ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32), rcfg.n_bin - 1)
    if rcfg.n_spec == 1:
        ip = 0
    else:
        types_p = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)],
                                  axis=0)
        ip = pair_index(rcfg.n_spec, types_p[rows][:, None],
                        types_p[cand])

    B = rcfg.n_bin * rcfg.n_pair
    flat = jnp.where(mask, ib * rcfg.n_pair + ip, B)
    counts = _hist_counts(flat, B, dt).reshape(rcfg.n_bin, rcfg.n_pair)
    return _apply_weights(cfg, rcfg, counts, spec_number, spec_nuclei,
                          nucl_number, hist, nhist)


def rdf_sample_list(cfg, rcfg: RdfConfig, pos, types, spec_number,
                    spec_nuclei, nucl_number, nbr, hist, nhist=None):
    """Accumulate one RDF sample from a prebuilt (N, k_cap) neighbor
    list (see rdf_list_cfg / ops.neighbors.build_neighbors).

    The list is rebuilt once per stat period and shared by the samples
    inside it; k_cap is ~7x smaller than the raw candidate matrix on
    dilute decks, which cuts the gather+distance bandwidth (the
    dominant cost: ~50 ms/sample direct vs ~2 ms here on case study 1)
    by the same factor.
    """
    N = cfg.n_at
    dt = pos.dtype
    cand = nbr                                            # (N, K)
    box = jnp.asarray(cfg.box, dt)
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    d = pos[:, None, :] - pos_p[cand]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)

    own = jnp.arange(N, dtype=jnp.int32)[:, None]
    mask = (cand != N) & (cand > own) & (r2 < rcfg.r2_max)

    r = jnp.sqrt(jnp.where(mask, r2, 1.0))
    ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32), rcfg.n_bin - 1)
    if rcfg.n_spec == 1:
        ip = 0
    else:
        types_p = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)],
                                  axis=0)
        ip = pair_index(rcfg.n_spec, types[:, None], types_p[cand])

    B = rcfg.n_bin * rcfg.n_pair
    flat = jnp.where(mask, ib * rcfg.n_pair + ip, B)
    counts = _hist_counts(flat, B, dt).reshape(rcfg.n_bin, rcfg.n_pair)
    return _apply_weights(cfg, rcfg, counts, spec_number, spec_nuclei,
                          nucl_number, hist, nhist)
