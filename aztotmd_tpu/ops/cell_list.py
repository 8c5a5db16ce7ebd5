"""Bucketed cell list — the TPU replacement for the reference's
counting-sort + cell-pair machinery (reference: src/cuSort.cu:114-197
``count_cell``/``sort_atoms``; src/cuCellList.cu:9-34 ``split_cells``,
:134-211 ``add_cell_pairs``).

Instead of per-step counting sort into double-buffered arrays plus a
serial prefix-sum kernel (cuSort.cu:130-143, a known bottleneck), atoms are
binned into a fixed-shape (n_cell, cap) index table with one `argsort` —
a single fused XLA op chain, no atomics, no host round-trip.  Overflowing
atoms are *dropped from the table* and reported via the returned occupancy
maximum so the runtime can rebuild with a larger capacity (the reference
instead corrupts memory and prints, cuMDfunc.cu:264-265).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cell_coords(cfg, pos):
    """Integer cell coordinates per atom (periodic wrap for robustness
    against slightly out-of-box positions)."""
    dims = jnp.asarray(cfg.grid.dims, jnp.int32)
    scale = jnp.asarray([cfg.grid.dims[k] / cfg.box[k] for k in range(3)],
                        pos.dtype)
    c = jnp.floor(pos * scale).astype(jnp.int32)
    return c % dims


def cell_ids(cfg, coords):
    _, ncy, ncz = cfg.grid.dims
    return (coords[..., 0] * ncy + coords[..., 1]) * ncz + coords[..., 2]


def _bin_slots(cfg, pos):
    """Shared binning core: sort atoms by cell id and compute each
    atom's flat table slot (cell id * cap + within-cell rank).

    Returns (order (N,) sorted atom ids, slot (N,) scatter targets with
    rank >= cap overflow dropped via an out-of-range index,
    max_occupancy).  build_cell_table and build_pos_table MUST bin
    identically — the fused and fallback neighbor pipelines are
    cross-checked for set equality (tests/test_neighbors.py)."""
    N = cfg.n_at
    grid = cfg.grid
    cap = grid.cap
    cid = cell_ids(cfg, cell_coords(cfg, pos))            # (N,)
    order = jnp.argsort(cid)                              # stable
    sorted_cid = cid[order]
    # rank of each atom within its cell = position - first position of cell
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(N, dtype=jnp.int32) - first.astype(jnp.int32)
    slot = jnp.where(rank < cap, sorted_cid * cap + rank,
                     grid.n_cell * cap)
    return order, slot, jnp.max(rank) + 1


def build_cell_table(cfg, pos):
    """Build the FLAT (n_cell * cap,) atom-index table.

    Returns (table, max_occupancy).  Empty slots hold the sentinel index
    ``n_at`` (callers pad per-atom arrays with one extra row).

    The table stays 1-D on purpose: a (n_cell, cap~4) layout would
    lane-pad the trailing dim to 128 on TPU (32x memory blowup on large
    grids) and every stencil gather would read the padding.
    """
    N = cfg.n_at
    grid = cfg.grid
    order, slot, max_occ = _bin_slots(cfg, pos)
    table = jnp.full((grid.n_cell * grid.cap,), N, dtype=jnp.int32)
    table = table.at[slot].set(order.astype(jnp.int32), mode="drop")
    return table, max_occ


def stencil_offsets(cfg):
    """Static (S, 3) array of neighbor-cell offsets."""
    return np.asarray(cfg.grid.stencil, dtype=np.int32)


def stencil_cell_ids(cfg, coords):
    """Flat CELL ids of every stencil cell per atom: (N, S) int32.

    coords: (N, 3) integer cell coordinates.  Cell c's slots are the
    contiguous table rows [c*cap, (c+1)*cap) in the layout shared by
    build_cell_table and build_pos_table.
    """
    grid = cfg.grid
    dims = jnp.asarray(grid.dims, jnp.int32)
    offs = jnp.asarray(stencil_offsets(cfg))              # (S, 3)
    ncoord = (coords[:, None, :] + offs[None, :, :]) % dims   # (N, S, 3)
    _, ncy, ncz = grid.dims
    return (ncoord[..., 0] * ncy + ncoord[..., 1]) * ncz + ncoord[..., 2]


def stencil_slot_ids(cfg, coords):
    """Flat table-slot ids of every stencil-cell slot per atom.

    coords: (N, 3) integer cell coordinates.  Returns (N, S*cap) int32
    indices into the flat (n_cell*cap,) table layout shared by
    build_cell_table and build_pos_table.
    """
    grid = cfg.grid
    cap = grid.cap
    ncid = stencil_cell_ids(cfg, coords)                  # (N, S)
    slots = (ncid[:, :, None] * cap
             + jnp.arange(cap, dtype=jnp.int32)[None, None, :])
    return slots.reshape(slots.shape[0], -1)              # (N, S*cap)


def gather_candidates(cfg, table, coords):
    """Per-atom candidate neighbor indices.

    coords: (N, 3) integer cell coordinates of each atom.
    Returns (N, S*cap) int32 candidate atom ids (sentinel = n_at).

    This replaces the reference's cell-pair traversal kernels
    (cuPairs.cu:1180-2057 cell_list4/5 family): every atom reads the atom
    lists of its stencil cells; forces are accumulated on the reading atom
    only, so Newton's third law is recomputed instead of scattered —
    race-free and perfectly regular for the VPU.

    The flat-index gather from the 1-D table — (N, S) cell ids expand to
    (N, S*cap) slot ids — is one clean 1-D gather, no lane padding.
    (A lax.gather of cap-length runs was measured ~equal here and
    slowed the neighbor-rebuild path; reverted.)
    """
    return table[stencil_slot_ids(cfg, coords)]           # (N, S*cap)


def build_pos_table(cfg, pos):
    """Fused position+index cell table: (n_cell*cap, 4) rows of
    (x, y, z, atom-index-as-float); empty slots hold index ``n_at``.

    Rationale (measured, TPU v5e): the candidate pass is HBM-LATENCY
    bound, ~6.6 ns per random scalar gather but ~1.3 ns/element for
    consecutive AoS rows.  Gathering (x, y, z, idx) in ONE 4-wide AoS
    row walks HBM once instead of twice (int-table gather + position
    gather) — the full neighbor rebuild dropped 62 -> 33 ms at 40k
    atoms (tools/bench_nbr.py).  Requires n_at < 2^24 for exact float32
    index round-trip (callers fall back to build_cell_table otherwise).
    """
    N = cfg.n_at
    grid = cfg.grid
    dt = pos.dtype
    order, slot, max_occ = _bin_slots(cfg, pos)
    rows = jnp.concatenate([pos[order], order[:, None].astype(dt)],
                           axis=1)
    ptab = jnp.zeros((grid.n_cell * grid.cap, 4), dt).at[:, 3].set(
        float(N))
    ptab = ptab.at[slot].set(rows, mode="drop")
    return ptab, max_occ
