"""Static simulation configuration.

Everything the compiled step function's *trace* depends on lives here, as a
frozen (hashable) dataclass: shapes, feature flags, potential families in
play, cell-grid geometry, and physical constants that never change during a
run.  This plays the role of the scalar half of the reference's ``cudaMD``
mega-struct (reference: src/cuStruct.h:188-423) — but split out so that XLA
sees them as compile-time constants instead of loaded scalars.

Dynamic arrays (positions, force-field parameter tables, counters) live in
``MDState`` / ``ForceField``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dfield

from .. import units
from ..io.control import (ELEC_EWALD, ELEC_FENNEL, ELEC_NONE, TSTAT_NONE,
                          TSTAT_NOSE, ControlSpec)
from ..io.field import FieldSpec


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _max_neigh_count(pos, box, reach: float, n_sample: int = 4096,
                     seed: int = 0) -> int:
    """Max per-atom neighbor count within ``reach`` (host side)."""
    return _neigh_stats(pos, box, reach, n_sample, seed)[0]


def _neigh_stats(pos, box, reach: float, n_sample: int = 4096,
                 seed: int = 0):
    """(max per-atom neighbor count, fraction of atoms with >=1
    neighbor) within ``reach`` (host side).

    Cell-binned: O(n_sample x local density) instead of the
    O(n_sample x N) all-pairs distance matrix this replaces (which cost
    ~100 s of setup at 40k atoms).  Used only for engine auto-selection
    and Verlet-list capacity sizing; the runtime's overflow monitors
    correct any underestimate.
    """
    import numpy as np
    p = np.asarray(pos, np.float64)
    n = len(p)
    if n == 0:
        return 0, 0.0
    bx = np.asarray([float(b) for b in box])
    dims = np.maximum((bx // max(reach, 1e-9)).astype(np.int64), 1)
    cell = np.floor(p / bx * dims).astype(np.int64) % dims
    cid = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    order = np.argsort(cid, kind="stable")
    starts = np.searchsorted(cid[order], np.arange(dims.prod() + 1))
    idx = np.arange(n) if n <= n_sample else \
        np.random.default_rng(seed).choice(n, n_sample, replace=False)
    # per-axis offsets; small grids collapse aliased periodic images
    ax = [(-1, 0, 1) if d >= 3 else ((0, 1) if d == 2 else (0,))
          for d in dims]
    offs = [(a, b, c) for a in ax[0] for b in ax[1] for c in ax[2]]
    r2 = reach * reach
    mx = 0
    n_occ = 0
    for i in idx:
        c = cell[i]
        cand = np.concatenate([
            order[starts[k]:starts[k + 1]]
            for k in (((c[0] + a) % dims[0] * dims[1]
                       + (c[1] + b) % dims[1]) * dims[2]
                      + (c[2] + cc) % dims[2]
                      for a, b, cc in offs)])
        d = p[cand] - p[i]
        d -= bx * np.round(d / bx)
        cnt = int(np.count_nonzero(np.sum(d * d, axis=1) <= r2)) - 1
        n_occ += cnt > 0
        if cnt > mx:
            mx = cnt
    return mx, n_occ / max(len(idx), 1)


@dataclass(frozen=True)
class CellGrid:
    """Cell-list geometry (replaces src/cuCellList.cu:9-34 ``split_cells``).

    The box is divided into ``dims`` cells; each cell holds at most ``cap``
    atoms in a fixed-shape (n_cell, cap) index table.  ``stencil`` is the
    static tuple of (dx, dy, dz) cell offsets that can contain an atom
    within the interaction cutoff — the TPU replacement for the reference's
    precomputed cell-pair lists (cuCellList.cu:134-211).
    """
    dims: tuple                 # (ncx, ncy, ncz)
    cap: int                    # max atoms per cell (power-of-2 padded)
    stencil: tuple              # ((dx,dy,dz), ...) including (0,0,0)
    edge: tuple                 # cell edge lengths

    @property
    def n_cell(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]


def make_cell_grid(box, r_max: float, n_at: int,
                   target_occupancy: float = 4.0,
                   cap_safety: float = 4.0,
                   max_cells: int = 1 << 21,
                   pos=None) -> CellGrid:
    """Choose a cell grid for a given box and cutoff.

    Unlike the reference (which takes the desired cell size from the
    ``cell_list`` directive and requires edge >= rcut, cuCellList.cu:9-34),
    we pick the grid for the hardware: cells no smaller than needed to keep
    the per-atom candidate count low, but few enough that the (n_cell, cap)
    table and (n_at, n_stencil*cap) pair matrix stay HBM-friendly.  When a
    cell edge is below the cutoff the stencil simply widens, so any edge is
    correct.
    """
    if r_max <= 0.0:
        raise ValueError("r_max must be positive")
    # aim for edge ~ r_max (largest grid with a 27-stencil)
    dims = [max(1, int(length / r_max)) for length in box]
    # cap the total cell count (dilute systems: huge box, small cutoff) by
    # scaling all dims uniformly — the per-atom candidate count grows as
    # the cell volume, so shrink as little as possible
    n_cell = dims[0] * dims[1] * dims[2]
    if n_cell > max_cells:
        s = (max_cells / n_cell) ** (1.0 / 3.0)
        dims = [max(1, int(d * s)) for d in dims]
    dims = tuple(dims)
    n_cell = dims[0] * dims[1] * dims[2]
    edge = tuple(length / n for length, n in zip(box, dims))

    # stencil: all offsets whose nearest approach is within r_max
    def reach(d, e):
        return max(0.0, (abs(d) - 1)) * e
    stencil = []
    sx = [int(math.ceil(r_max / e)) for e in edge]
    for dx in range(-sx[0], sx[0] + 1):
        for dy in range(-sx[1], sx[1] + 1):
            for dz in range(-sx[2], sx[2] + 1):
                d2 = (reach(dx, edge[0]) ** 2 + reach(dy, edge[1]) ** 2
                      + reach(dz, edge[2]) ** 2)
                if d2 <= r_max * r_max:
                    stencil.append((dx, dy, dz))
    # periodic wrap can alias offsets on tiny grids; deduplicate mod dims
    seen, dedup = set(), []
    for off in stencil:
        key = tuple(o % d for o, d in zip(off, dims))
        if key not in seen:
            seen.add(key)
            dedup.append(off)

    avg = n_at / n_cell
    cap = _round_up(max(4, int(math.ceil(avg * cap_safety))), 4)
    if pos is not None:
        # measure the real occupancy of the starting configuration and pad
        # a little (the cell_overflow monitor catches later density
        # fluctuations and triggers a rebuild with a larger cap)
        import numpy as np
        p = np.asarray(pos, dtype=np.float64)
        c = np.floor(p / np.asarray(edge)).astype(np.int64) % np.asarray(dims)
        cid = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
        occ = int(np.bincount(cid, minlength=n_cell).max())
        margin = max(2, occ // 4)
        cap = min(max(cap, _round_up(occ + margin, 4)),
                  _round_up(occ * 2, 4))
    cap = min(cap, _round_up(n_at, 4))
    return CellGrid(dims=dims, cap=cap, stencil=tuple(dedup), edge=edge)


@dataclass(frozen=True)
class SimConfig:
    """Hashable static configuration; closed over by the jitted step."""
    n_at: int
    n_spec: int
    n_nucl: int
    box: tuple                  # (la, lb, lc)
    dt: float

    # feature flags
    tstat_type: int = TSTAT_NONE
    elec_type: int = ELEC_NONE
    ejtype: int = 0
    ejump_freq: int = 0
    use_bnd: int = 0            # 0 none / 1 constant / 2 variable
    use_angl: int = 0           # 0 none / 1 constant / 2 variable
    use_linkage: int = 0
    vdw_families: tuple = ()    # sorted tuple of VDW_* ids present
    # static (nsp, nsp) potential-kind matrix (tuple of tuples) — the
    # Pallas pair kernel specializes its species-pair loop on it
    vdw_kind_table: tuple = ()
    bond_kinds: tuple = ()
    use_radii: bool = False     # any radius-dependent potential present
    n_bond_types: int = 0
    n_angle_types: int = 0
    # the reference zeroes velocities of reactive-bonded atoms near
    # force equilibrium ("temporary" equilibration hack,
    # cuBonds.cu:622-627); deck/CLI-visible for reproducibility
    bond_equil_hack: bool = True

    # cutoffs
    r_max: float = 0.0          # global pair cutoff (sys_init.cpp:1060-1072)
    r2_max: float = 0.0
    r2_elec: float = 0.0        # e-jump radius^2
    d_ejump: float = 0.0

    # electrostatics constants (elec.cpp:371-406 prepare_elec)
    alpha: float = 0.0
    eps: float = 1.0
    coul_scale: float = units.FCOUL_SCALE
    fennel_c1: float = 0.0      # erfc(aRc)/Rc
    fennel_c2: float = 0.0      # erfc(aRc)/Rc^2 + 2a/sqrt(pi) exp(-(aRc)^2)/Rc
    daipi2: float = 0.0         # 2 alpha / sqrt(pi)
    r_real: float = 0.0
    # Ewald reciprocal space
    kmax: tuple = (0, 0, 0)
    rkcut2: float = 0.0
    ewald_scale: float = 0.0    # 4 pi / V * Fcoul / eps
    eng_ewald_const: float = 0.0  # self + neutralizing background terms

    # thermostat constants (sys_init.cpp:1099-1111)
    temp: float = 0.0
    te_kin: float = 0.0         # target kinetic energy
    deg_free: int = 0
    rqmass: float = 0.0
    qmass_tau2: float = 0.0
    tstat_step: int = 0
    n_equil: int = 0
    freq_equil: int = 0
    reset_vels: int = 0

    # external field
    ext_field: tuple = (0.0, 0.0, 0.0)
    # shiftX directive: atoms with x > shift_x get F_z := shift_val
    # (serial integrators.cpp:34-35 clear_force)
    shift_x: float = 0.0
    shift_val: float = 0.0

    # cell grid
    grid: CellGrid | None = None
    # pair traversal engine: "neighbor" (Verlet list, fast path),
    # "block" (roll-based cell blocks), "pallas" (fused TPU kernel for
    # the block pass), or "gather" (per-atom candidate matrix)
    pair_engine: str = "neighbor"
    # Verlet-list parameters (ops.neighbors)
    nb_grid: CellGrid | None = None
    nb_skin: float = 1.5
    nb_rebuild: int = 40
    n_neigh: int = 4
    # two-level list: the expensive full candidate pass builds an OUTER
    # (N, n_neigh2) list at reach r_max + nb_skin2 every nb_outer inner
    # intervals; inner rebuilds refine it with one cheap (N, n_neigh2)
    # gather + top_k.  nb_outer == 1 disables the outer level.
    n_neigh2: int = 0
    nb_skin2: float = 0.0
    nb_outer: int = 1
    # row-compacted walk: capacity for the rows that HAVE neighbors
    # (0 disables).  In dilute decks almost every (N, K) row is
    # all-sentinel; walking only occupied rows cut the cs1 pair pass
    # ~4x (tools/bench_gather.py).  nbrow_over monitors overflow.
    nb_rowcap: int = 0
    # outer-row-compacted refine: capacity for the rows with >=1 OUTER
    # list entry (0 disables).  A row with an empty outer list can never
    # gain inner neighbors between full rebuilds (the inner refine
    # selects from nbr2 only), so the every-nb_rebuild refine can scan
    # just these rows instead of all N — exact, and the (N, K2)
    # gather+reduce was the dominant refine cost at large N (70 ms at
    # 320k atoms vs ~20 ms over the ~27%-occupied outer rows).
    # orow_over monitors overflow (runner regrows + full rebuild).
    nb_orowcap: int = 0
    # Morton block-sparse engine (ops.pallas_sparse): tile size and the
    # static worklist capacity (interacting ordered tile pairs); the
    # runner regrows pair_cap when PairResult.max_occ exceeds it
    sparse_tile: int = 256
    sparse_pair_cap: int = 0

    # capacities
    mx_bond: int = 0
    mx_angle: int = 0
    n_free_el: int = 0
    max_neigh: int = 50

    # pressure ring buffer (cuInit.cu:921 nMom=20)
    n_mom: int = 20

    # compute dtype: "f32" (reference GPU parity) or "f64" (validation)
    dtype: str = "f32"

    @property
    def jnp_dtype(self):
        import jax.numpy as jnp
        return jnp.float64 if self.dtype == "f64" else jnp.float32

    @property
    def half_box(self):
        return tuple(0.5 * b for b in self.box)

    @property
    def volume(self) -> float:
        return self.box[0] * self.box[1] * self.box[2]


def build_sim_config(ctl: ControlSpec, fld: FieldSpec, box, n_at: int,
                     n_bonds_init: int = 0, dtype: str = "f32",
                     target_occupancy: float = 4.0,
                     max_cells: int = 1 << 21,
                     mx_bond: int | None = None,
                     mx_angle: int | None = None,
                     pair_engine: str = "auto",
                     pos=None) -> SimConfig:
    """Derive the static config from parsed decks.

    Mirrors init_md (sys_init.cpp:1036-1121) + prepare_elec
    (elec.cpp:371-406) + init_cudaMD scalar setup.
    """
    use_bnd = fld.use_bnd
    if ctl.ejump != 0 and use_bnd == 1:
        use_bnd = 2             # bonds may mutate during e-transfer

    # global cutoff
    r_max = 0.0
    if ctl.elec.type:
        r_max = ctl.elec.r_real
    else:
        if fld.pairpots:
            r_max = fld.maxRvdw
        if use_bnd == 2:
            r_max = max(r_max, fld.maxRbind)
        if ctl.ejump != 0:
            r_max = max(r_max, ctl.r_elec)
    if r_max <= 0.0:
        raise ValueError("no interactions: r_max is zero")

    # engine auto-selection: the Verlet list wins when per-atom
    # neighbor counts are small (its per-step cost is gather-bound,
    # ~tens of ns per (atom, slot)); the roll-based block engine wins on
    # dense/clustered decks where K would be large (its cap^2 tiles are
    # gather-free ALU work). Threshold measured on the two case studies
    # (case 1: K=4 -> neighbor 12x faster; case 2: K=1596 -> block 15x).
    if pair_engine == "auto":
        mx_cnt = 0
        if pos is not None:
            mx_cnt = _max_neigh_count(pos, box, r_max + 1.5,
                                      n_sample=2048)
        pair_engine = "neighbor" if mx_cnt <= 64 else "block"

    sparse_tile = 256
    sparse_pair_cap = 0
    if pair_engine in ("block", "pallas", "sparse"):
        from ..ops.cellblock import make_block_grid
        grid = make_block_grid(box, r_max, n_at, max_cells=max_cells,
                               pos=pos,
                               hint_edge=ctl.cell_size
                               if ctl.use_clist else 0.0)
        block_cost = (len(grid.stencil) * grid.cap * grid.cap
                      * grid.dims[0] * grid.dims[1] * grid.dims[2])
        if pair_engine == "block":
            # three modeled slot-pair costs, best engine wins:
            # * block: stencil * cap^2 * n_cell (cap set by the densest
            #   cell, so a clustered core poisons the whole grid);
            # * pallas dense O(N^2): padded N^2 (cs2 regime, ~20x under
            #   block at 4k atoms in a 21 A cluster);
            # * Morton block-sparse tiles (ops.pallas_sparse): occupied
            #   tile-pair count * T^2, weighted 2x for its per-step
            #   sort/worklist overhead (large multi-cluster decks).
            n_pad = _round_up(n_at, 512)
            cost = block_cost
            if n_pad * n_pad < cost:
                pair_engine, cost = "pallas", n_pad * n_pad
            p0 = None
            if pos is not None and n_at > 4096:
                from ..ops.pallas_sparse import estimate_sparse_pairs
                p0 = estimate_sparse_pairs(box, r_max, pos, sparse_tile)
                if 2 * p0 * sparse_tile * sparse_tile < cost:
                    pair_engine = "sparse"
        else:
            p0 = None
        if pair_engine == "sparse":
            n_t = _round_up(n_at, sparse_tile) // sparse_tile
            if p0 is None:
                if pos is not None:
                    from ..ops.pallas_sparse import estimate_sparse_pairs
                    p0 = estimate_sparse_pairs(box, r_max, pos,
                                               sparse_tile)
                else:
                    p0 = n_t * n_t
            sparse_pair_cap = min(_round_up(p0 + p0 // 2 + 4 * n_t, 64),
                                  n_t * n_t)
    else:
        grid = make_cell_grid(box, r_max, n_at,
                              target_occupancy=target_occupancy,
                              max_cells=max_cells, pos=pos)

    # Verlet-list skin + rebuild interval + neighbor capacity.
    # A rebuild costs a full candidate-matrix gather (~20 ms at 40k
    # atoms), so prefer the LARGEST skin that doesn't inflate K: in
    # dilute systems a thick skin is free and lets the list live for
    # hundreds of steps. The safe interval comes from the thermal
    # speed: rebuild before 2 * 3*v_th * R * dt can exceed the skin.
    nb_skin = 1.5
    nb_grid = None
    n_neigh = 4
    nb_rebuild = 40
    nb_rowcap = 0
    nb_orowcap = 0
    if pair_engine == "neighbor":

        def count_k(reach):
            if pos is None:
                return 4
            return _max_neigh_count(pos, box, reach, n_sample=4096)

        # (a thicker skin inflates K and the per-step gather cost
        # faster than it saves rebuilds — measured on case study 1)
        # safe interval from the thermal speed at the target temperature
        if ctl.tstat.temp > 0 and fld.species:
            m_min = min(sp.mass for sp in fld.species if sp.mass > 0)
            v_th = math.sqrt(3.0 * units.KB * ctl.tstat.temp / m_min)
            nb_rebuild = int(nb_skin / (6.0 * v_th * ctl.t_step))
        nb_rebuild = max(10, min(nb_rebuild, 200))

        r_nb = r_max + nb_skin
        mx = count_k(r_nb)
        # tight margin: the runner's nbr_over monitor grows K and forces
        # a rebuild if density fluctuations ever exceed it, so the
        # initial capacity only needs modest headroom (pair-pass gather
        # cost is directly proportional to K)
        n_neigh = _round_up(max(4, mx + max(2, mx // 4)), 4)
        n_neigh = min(n_neigh, n_at)

        # two-level list: the full candidate pass costs ~33 ms at 40k
        # atoms (the table gather runs at ~6.6 ns/element from HBM), so
        # amortize it over nb_outer inner intervals when the outer
        # capacity stays small (dilute systems).  skin2 = nb_outer x
        # skin keeps the same 6x thermal-speed staleness bound for
        # inner refines made from an aging outer list.  The q candidates
        # and the K2 <= max(32, 6K) bound come from a real-TPU sweep on
        # case study 1 (tools/bench_tune.py): Q=24/K2=24 measured 1699
        # steps/s vs 1512 at the old Q=8 cap; Q=32/K2=40 and beyond
        # regress (the every-R refine is proportional to K2).
        nb_outer = 1
        nb_skin2 = 0.0
        n_neigh2 = 0
        for q in (24, 16, 12, 8, 6, 4, 3, 2):
            skin2 = nb_skin * q
            mx2 = count_k(r_max + skin2)
            k2 = _round_up(max(8, mx2 + max(4, mx2 // 4)), 8)
            if k2 <= max(32, 6 * n_neigh) and k2 < n_at:
                nb_outer, nb_skin2, n_neigh2 = q, skin2, k2
                break
        grid_reach = r_nb if nb_outer == 1 else r_max + nb_skin2
        nb_grid = make_cell_grid(box, grid_reach, n_at,
                                 target_occupancy=target_occupancy,
                                 max_cells=max_cells, pos=pos)

        # row-compacted walk: enabled when few rows have any neighbor
        # (dilute decks).  The estimate is a 4096-atom sample, so give
        # 2x headroom + slack; the nbrow_over monitor regrows on
        # overflow.  Crossover is conservative (measured win at 1% row
        # occupancy is ~4x; near 25% the dense walk's regular layout
        # wins back).
        if pos is not None:
            _, frac_occ = _neigh_stats(pos, box, r_nb)
            if frac_occ <= 0.15:
                est = int(frac_occ * n_at)
                nb_rowcap = min(_round_up(2 * est + 256, 128), n_at)

        # outer-row-compacted refine: scan only the rows with outer
        # entries during the every-nb_rebuild refine.  Exact (empty
        # outer row => empty inner row), so the only cost of a generous
        # capacity is memory; past ~60% occupancy the full (N, K2) scan
        # is no worse and needs no capacity monitor.
        if nb_rowcap and nb_outer > 1 and pos is not None:
            _, frac2 = _neigh_stats(pos, box, r_max + nb_skin2)
            if frac2 <= 0.6:
                est2 = int(frac2 * n_at)
                nb_orowcap = max(
                    min(_round_up(2 * est2 + 256, 128), n_at),
                    nb_rowcap)

    # degrees of freedom and thermostat constants (sys_init.cpp:1099-1111)
    deg_free = 3 * n_at - n_bonds_init
    if ctl.tstat.type:
        deg_free -= 1
    te_kin = 0.5 * ctl.tstat.temp * units.KB * deg_free
    rqmass = qmass_tau2 = 0.0
    if ctl.tstat.type == TSTAT_NOSE:
        rqmass = 0.5 / te_kin / ctl.tstat.tau / ctl.tstat.tau
        qmass_tau2 = 2.0 * te_kin

    # electrostatics constants
    alpha = ctl.elec.alpha
    fennel_c1 = fennel_c2 = daipi2 = 0.0
    rkcut2 = ewald_scale = 0.0
    kmax = (0, 0, 0)
    if ctl.elec.type == ELEC_FENNEL:
        a_rc = alpha * ctl.elec.r_real
        daipi2 = 2.0 * alpha / units.SQRTPI
        fennel_c1 = math.erfc(a_rc) / ctl.elec.r_real
        fennel_c2 = (math.erfc(a_rc) / ctl.elec.r_real ** 2
                     + daipi2 * math.exp(-a_rc * a_rc) / ctl.elec.r_real)
    elif ctl.elec.type == ELEC_EWALD:
        daipi2 = 2.0 * alpha / units.SQRTPI
        kmax = (ctl.elec.kx, ctl.elec.ky, ctl.elec.kz)
        vol = box[0] * box[1] * box[2]
        # elec.cpp:381: scale = 2*2pi/V * Fcoul / eps
        ewald_scale = 2.0 * units.TWOPI / vol * units.FCOUL_SCALE / ctl.elec.eps
        rkcut = min(kmax[0] / box[0], kmax[1] / box[1], kmax[2] / box[2])
        rkcut *= units.TWOPI * 1.05
        rkcut2 = rkcut * rkcut

    n_free_el = 0
    if ctl.ejump != 0:
        n_free_el = sum(s.nFreeEl for s in fld.species) and n_at or 0
    # (recomputed properly by the runtime from actual atom types)

    families = tuple(sorted({p.type for p in fld.pairpots}))
    from ..core.ffield import vdw_tables
    vkind, _, _ = vdw_tables(fld)
    vdw_kind_table = tuple(tuple(int(x) for x in row) for row in vkind)
    bond_kinds = tuple(sorted({b.type for b in fld.bonds[1:]}))

    if mx_bond is None:
        mx_bond = _round_up(max(16, 2 * n_bonds_init + (4096 if use_bnd == 2 else 0)), 16) \
            if use_bnd else 0
    if mx_angle is None:
        mx_angle = _round_up(max(16, 4096), 16) if fld.use_angl else 0

    return SimConfig(
        n_at=n_at, n_spec=fld.nSpec, n_nucl=len(fld.nnames),
        box=tuple(map(float, box)), dt=ctl.t_step,
        tstat_type=ctl.tstat.type, elec_type=ctl.elec.type,
        ejtype=ctl.ejtype, ejump_freq=ctl.ejump,
        use_bnd=use_bnd, use_angl=fld.use_angl,
        use_linkage=fld.use_linkage,
        vdw_families=families, vdw_kind_table=vdw_kind_table,
        bond_kinds=bond_kinds,
        use_radii=any(p.use_radii for p in fld.pairpots),
        n_bond_types=len(fld.bonds), n_angle_types=len(fld.angles),
        r_max=r_max, r2_max=r_max * r_max,
        r2_elec=ctl.r2_elec, d_ejump=ctl.d_ejump,
        alpha=alpha, eps=ctl.elec.eps,
        fennel_c1=fennel_c1, fennel_c2=fennel_c2, daipi2=daipi2,
        r_real=ctl.elec.r_real, kmax=kmax, rkcut2=rkcut2,
        ewald_scale=ewald_scale,
        temp=ctl.tstat.temp, te_kin=te_kin, deg_free=deg_free,
        rqmass=rqmass, qmass_tau2=qmass_tau2, tstat_step=ctl.tstat.step,
        n_equil=ctl.n_equil, freq_equil=ctl.freq_equil,
        reset_vels=ctl.reset_vels,
        ext_field=(ctl.ux, ctl.uy, ctl.uz),
        shift_x=ctl.shift_x, shift_val=ctl.shift_val,
        grid=grid, pair_engine=pair_engine,
        sparse_tile=sparse_tile, sparse_pair_cap=sparse_pair_cap,
        nb_grid=nb_grid, nb_skin=nb_skin, n_neigh=n_neigh,
        nb_rebuild=nb_rebuild,
        n_neigh2=n_neigh2 if pair_engine == "neighbor" else 0,
        nb_skin2=nb_skin2 if pair_engine == "neighbor" else 0.0,
        nb_outer=nb_outer if pair_engine == "neighbor" else 1,
        nb_rowcap=nb_rowcap if pair_engine == "neighbor" else 0,
        nb_orowcap=nb_orowcap if pair_engine == "neighbor" else 0,
        mx_bond=mx_bond, mx_angle=mx_angle,
        n_free_el=n_free_el, max_neigh=ctl.max_neigh,
        dtype=dtype,
    )
