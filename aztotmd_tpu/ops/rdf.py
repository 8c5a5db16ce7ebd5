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

    @property
    def n_pair(self) -> int:
        return n_pairs(self.n_spec)

    @property
    def n_npair(self) -> int:
        return n_pairs(self.n_nucl)


def make_rdf_config(ctl, cfg, max_cells: int = 1 << 20) -> RdfConfig | None:
    if ctl.fr_rdf <= 0 or ctl.r_rdf <= 0.0 or ctl.d_rdf <= 0.0:
        return None
    grid = make_cell_grid(cfg.box, ctl.r_rdf, cfg.n_at, max_cells=max_cells)
    # bin count clamped to the box edge (rdf.cpp:41-47 init_rdf)
    min_r = min(ctl.r_rdf, min(cfg.box))
    return RdfConfig(
        n_bin=int(min_r / ctl.d_rdf),
        d_rdf=ctl.d_rdf,
        r2_max=ctl.r_rdf * ctl.r_rdf,
        n_spec=cfg.n_spec,
        n_nucl=cfg.n_nucl,
        nuclei=ctl.nuclei_rdf,
        grid=grid)


def zero_hist(rcfg: RdfConfig, dtype=jnp.float32):
    # host zeros transferred, not jnp.zeros: eager device fills compile
    # tiny XLA programs (slow over the axon remote-compile tunnel)
    h = jnp.asarray(np.zeros((rcfg.n_bin, rcfg.n_pair), dtype))
    nh = jnp.asarray(np.zeros((rcfg.n_bin, rcfg.n_npair), dtype))
    return (h, nh) if rcfg.nuclei else (h, None)


def _hist_counts(flat, n_slot: int, dtype):
    """Histogram COUNTS of int32 ids in [0, n_slot) (ids == n_slot are
    dropped) via one global sort + ``searchsorted`` — O(E log E).

    Alternatives measured and rejected: a TPU scatter serializes per
    source element (the (N, M)-candidate scatter onto a ~700-slot
    histogram cost ~200 ms/sample on cs1); a (n_slot, E) masked-compare
    reduction is O(E*n_slot), which explodes on dense decks (cs2:
    E~20M x 2400 slots = 48 G ops/sample).  Sort + binary-searched bin
    edges is scatter-free, compare-matrix-free, and exact."""
    ids = jnp.sort(flat.reshape(-1))
    edges = jnp.arange(n_slot + 1, dtype=ids.dtype)
    pos = jnp.searchsorted(ids, edges, side="left")
    return jnp.diff(pos).astype(dtype)


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
    # reuse the bucketed cell machinery with the RDF grid
    gcfg = dataclasses.replace(cfg, grid=rcfg.grid)
    coords = cl.cell_coords(gcfg, pos)
    table, _ = cl.build_cell_table(gcfg, pos)
    cand = cl.gather_candidates(gcfg, table, coords)       # (N, M)

    types_p = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)], axis=0)

    # SoA distance components: an (N, M, 3) delta would lane-pad 3 -> 128
    # on TPU (measured 40x memory blowup on large RDF reaches)
    box = jnp.asarray(cfg.box, dt)
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

    ti = types[:, None]
    tj = types_p[cand]
    ip = pair_index(rcfg.n_spec, ti, tj)

    B = rcfg.n_bin * rcfg.n_pair
    flat = jnp.where(mask, ib * rcfg.n_pair + ip, B)       # drop slot
    counts = _hist_counts(flat, B, dt).reshape(rcfg.n_bin, rcfg.n_pair)

    # per-species-pair weight tables over the static upper triangle
    iu, ju = np.triu_indices(rcfg.n_spec)
    vol = jnp.asarray(cfg.volume, dt)
    num = spec_number.astype(dt)
    w_tab = 2.0 * vol / (num[iu] * num[ju])                # (n_pair,)
    hist = hist + counts * w_tab[None, :]

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
        nhist = nhist + counts @ fold

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
