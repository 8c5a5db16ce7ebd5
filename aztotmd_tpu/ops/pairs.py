"""Pair interactions — the hot path.

TPU re-design of the reference's pair traversal + per-pair physics
(reference: src/cuPairs.cu:117-167 ``pair_1``, :2266-2517 ``cell_list5a``,
:1474 ``cell_list4b_noshared``, :2519-2568 ``iter_fastCellList``):

* every atom gathers the candidate atoms of its stencil cells into a
  regular (N, M) matrix (M = n_stencil * cell capacity);
* Coulomb + VdW force/energy are evaluated on the whole matrix with masks
  (no divergent branches, everything fuses on the VPU);
* the force on atom i is the row sum — Newton's third law is recomputed
  rather than scattered, eliminating the reference's half-atomic force
  accumulation (cuPairs.cu:54-65) and all associated races;
* energies are 0.5 * masked sums (each pair appears twice);
* optional per-atom nearest-candidate reductions replace the atomicMin
  candidate registration of ``try_to_bind`` (cuBonds.cu:8-59) and
  ``try_to_jump`` (cuEjump.cu:39-76).

Periodic minimum-image replaces the reference's precomputed per-cell-pair
shift vectors (valid whenever box >= 2*cutoff, which split_cells also
assumes via cell-size >= cutoff).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..io.control import ELEC_NONE
from . import cell_list as cl
from .elec import coul_eval
from .vdw import vdw_eval

MX_FRC = 1.0e4      # force auto-cap (defines.h:10, cuPairs.cu:94-115)


@jax.tree_util.register_dataclass
@dataclass
class PairResult:
    frc: jax.Array          # (N, 3)
    eng_vdw: jax.Array      # scalar
    eng_coul: jax.Array     # scalar
    max_occ: jax.Array      # max cell occupancy (overflow monitoring)
    # nearest eligible bonding partner per atom (or N when none)
    bind_idx: jax.Array
    bind_r2: jax.Array
    # nearest acceptor per donor atom (or N when none)
    jump_idx: jax.Array
    jump_r2: jax.Array


def min_image(delta, cfg):
    box = jnp.asarray(cfg.box, delta.dtype)
    return delta - box * jnp.round(delta / box)


def pair_forces(cfg, ff, pos, types, radii=None, parents=None,
                want_bind: bool = False, want_jump: bool = False) -> PairResult:
    N = cfg.n_at
    dt = pos.dtype
    nsp = cfg.n_spec

    coords = cl.cell_coords(cfg, pos)
    table, max_occ = cl.build_cell_table(cfg, pos)
    cand = cl.gather_candidates(cfg, table, coords)       # (N, M) ids
    M = cand.shape[1]

    # pad per-atom arrays with a sentinel row
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    types_p = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)], axis=0)

    pj = pos_p[cand]                                      # (N, M, 3)
    delta = min_image(pos[:, None, :] - pj, cfg)
    r2 = jnp.sum(delta * delta, axis=-1)                  # (N, M)

    own = jnp.arange(N, dtype=jnp.int32)[:, None]
    valid = (cand != N) & (cand != own)
    mask = valid & (r2 <= cfg.r2_max)

    r2s = jnp.where(mask, r2, 1.0)
    r = jnp.sqrt(r2s)

    tj = types_p[cand]                                    # (N, M)
    ti = types[:, None]

    # --- Coulomb (pair part) ---
    if cfg.elec_type != ELEC_NONE:
        tp = ti * nsp + tj
        chp = ff.chprod.reshape(-1)[tp]
        fc, ec = coul_eval(cfg, r2s, r, chp)
        # the reference evaluates funcCoul for every in-range pair; zero
        # charge product zeroes both terms identically
        fc = jnp.where(mask, fc, 0.0)
        ec = jnp.where(mask, ec, 0.0)
    else:
        fc = ec = jnp.zeros_like(r2s)

    # --- VdW ---
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
        if cfg.use_radii:
            rad_p = jnp.concatenate([radii, jnp.ones((1,), dt)], axis=0)
            rad_i = jnp.broadcast_to(radii[:, None], r2s.shape)
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

    f = fc + fv
    # force auto-cap (AUTO_CAP, defines.h:8-10): clamp the scalar pair force
    f = jnp.clip(f, -MX_FRC, MX_FRC)

    frc = jnp.einsum("nm,nmk->nk", f, delta)              # row-sum forces
    eng_vdw = 0.5 * jnp.sum(ev)
    eng_coul = 0.5 * jnp.sum(ec)

    # --- bonding candidates (try_to_bind, cuBonds.cu:8-59) ---
    if want_bind:
        tpair = ti * nsp + tj
        can = (ff.bonding_matr.reshape(-1)[tpair] != 0) & valid \
            & (r2 <= ff.bind_r2.reshape(-1)[tpair])
        if parents is not None:
            # exclude already-bonded pairs (cuBonds.cu:21-24)
            par_p = jnp.concatenate([parents, -jnp.ones((1,), jnp.int32)])
            can = can & (parents[:, None] != cand) & (par_p[cand] != own)
        bind_idx, bind_r2 = _row_argmin(cand, r2, can, N)
    else:
        bind_idx = jnp.full((N,), N, jnp.int32)
        bind_r2 = jnp.full((N,), jnp.inf, dt)

    # --- e-jump candidates (try_to_jump, cuEjump.cu:39-76) ---
    if want_jump:
        jump_idx, jump_r2 = _jump_candidates(cfg, ff, types, tj, cand,
                                             r2, valid)
    else:
        jump_idx = jnp.full((N,), N, jnp.int32)
        jump_r2 = jnp.full((N,), jnp.inf, dt)

    return PairResult(frc=frc, eng_vdw=eng_vdw, eng_coul=eng_coul,
                      max_occ=max_occ,
                      bind_idx=bind_idx, bind_r2=bind_r2,
                      jump_idx=jump_idx, jump_r2=jump_r2)


def bind_jump_candidates(cfg, ff, pos, types, parents=None,
                         want_bind=True, want_jump=True):
    """Standalone bind/jump candidate selection over the cell-list
    candidate matrix (the try_to_bind/try_to_jump registrations of
    pair_1, cuPairs.cu:117-167, without the force work).

    Used by the slab engine's reactive path: candidate selection is a
    pure function of (pos, types, parents), so running it from the
    psum-assembled global position table yields bit-identical
    candidates everywhere — the deterministic analog of the
    reference's atomicMin registration."""
    N = cfg.n_at
    table, _ = cl.build_cell_table(cfg, pos)
    own = jnp.arange(N, dtype=jnp.int32)
    return bind_jump_candidates_rows(
        cfg, ff, table, pos, types, parents, pos, own, types,
        parents, want_bind=want_bind, want_jump=want_jump)


def bind_jump_candidates_rows(cfg, ff, table, pos, types, parents,
                              row_pos, row_own, row_types, row_parents,
                              want_bind=True, want_jump=True):
    """Candidate selection for an arbitrary ROW SET against the global
    cell table — the sharding core of bind_jump_candidates.

    ``table``: flat cell table built over the GLOBAL ``pos``/``types``/
    ``parents`` (all (N,)-indexed).  ``row_pos (R, 3)`` / ``row_own``
    (global atom id per row, sentinel n_at for dead rows) /
    ``row_types`` / ``row_parents`` describe the rows to compute.  The
    slab mesh passes its OWNED slots here and psum-merges the per-gid
    results (parallel/slab_react.py) — each row's arithmetic is
    identical to the replicated pass, so the merge is bit-exact.
    """
    N = cfg.n_at
    dt = pos.dtype
    nsp = cfg.n_spec
    coords = cl.cell_coords(cfg, row_pos)
    cand = cl.gather_candidates(cfg, table, coords)       # (R, M)
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    types_p = jnp.concatenate([types, jnp.zeros((1,), jnp.int32)], axis=0)
    delta = min_image(row_pos[:, None, :] - pos_p[cand], cfg)
    r2 = jnp.sum(delta * delta, axis=-1)
    own = row_own[:, None]
    valid = (cand != N) & (cand != own) & (own != N)
    tj = types_p[cand]
    ti = row_types[:, None]
    R = row_pos.shape[0]
    if want_bind:
        tpair = ti * nsp + tj
        can = (ff.bonding_matr.reshape(-1)[tpair] != 0) & valid \
            & (r2 <= ff.bind_r2.reshape(-1)[tpair])
        if parents is not None:
            par_p = jnp.concatenate([parents, -jnp.ones((1,), jnp.int32)])
            can = can & (row_parents[:, None] != cand) & (par_p[cand] != own)
        bind_idx, bind_r2 = _row_argmin(cand, r2, can, N)
    else:
        bind_idx = jnp.full((R,), N, jnp.int32)
        bind_r2 = jnp.full((R,), jnp.inf, dt)
    if want_jump:
        jump_idx, jump_r2 = _jump_candidates(cfg, ff, row_types, tj,
                                             cand, r2, valid,
                                             sentinel=N)
    else:
        jump_idx = jnp.full((R,), N, jnp.int32)
        jump_r2 = jnp.full((R,), jnp.inf, dt)
    return bind_idx, bind_r2, jump_idx, jump_r2


def _jump_candidates(cfg, ff, types, tj, cand, r2, valid,
                     sentinel=None):
    """Per-role e-jump candidate selection (try_to_jump semantics,
    cuEjump.cu:39-76): a donor row stores its nearest ACCEPTOR — one
    combined argmin over both directions could return a nearest
    non-acceptor donor for a dual-role species, which then fails
    do_jumps' acceptor check and blocks a jump the reference performs.
    A pure-acceptor row stores its nearest donor so the jmp_oft extra
    passes (ejump.cpp:599-609), which re-validate roles against the
    mutated types in do_jumps, let a freshly-reduced atom donate back.
    """
    N = types.shape[0] if sentinel is None else sentinel
    don_i = (ff.spec_donacc[types] & 1).astype(bool)
    acc_i = (ff.spec_donacc[types] & 2).astype(bool)
    acc_j = (ff.spec_donacc[tj] & 2).astype(bool)
    don_j = (ff.spec_donacc[tj] & 1).astype(bool)
    rng = valid & (r2 <= cfg.r2_elec)
    idx_d, r2_d = _row_argmin(cand, r2, don_i[:, None] & acc_j & rng, N)
    idx_a, r2_a = _row_argmin(cand, r2, acc_i[:, None] & don_j & rng, N)
    return (jnp.where(don_i, idx_d, idx_a),
            jnp.where(don_i, r2_d, r2_a))


def _row_argmin(cand, r2, mask, sentinel):
    """Nearest masked candidate per row: (idx, r2); sentinel when none."""
    big = jnp.asarray(jnp.inf, r2.dtype)
    r2m = jnp.where(mask, r2, big)
    j = jnp.argmin(r2m, axis=1)
    rows = jnp.arange(r2.shape[0])
    best_r2 = r2m[rows, j]
    best_id = jnp.where(jnp.isfinite(best_r2), cand[rows, j], sentinel)
    return best_id.astype(jnp.int32), best_r2


def all_pairs_forces(cfg, ff, pos, types, radii=None) -> PairResult:
    """O(N^2) traversal (reference: cuPairs.cu:220-270 ``all_pair``) — used
    for small systems and as a cross-check oracle for the cell list."""
    N = cfg.n_at
    dt = pos.dtype
    delta = min_image(pos[:, None, :] - pos[None, :, :], cfg)
    r2 = jnp.sum(delta * delta, axis=-1)
    eye = jnp.eye(N, dtype=bool)
    mask = (~eye) & (r2 <= cfg.r2_max)
    r2s = jnp.where(mask, r2, 1.0)
    r = jnp.sqrt(r2s)
    nsp = cfg.n_spec
    tp = types[:, None] * nsp + types[None, :]

    if cfg.elec_type != ELEC_NONE:
        fc, ec = coul_eval(cfg, r2s, r, ff.chprod.reshape(-1)[tp])
        fc = jnp.where(mask, fc, 0.0)
        ec = jnp.where(mask, ec, 0.0)
    else:
        fc = ec = jnp.zeros_like(r2s)

    if cfg.vdw_families:
        kind = ff.vdw_kind.reshape(-1)[tp]
        vp = ff.vdw_p.reshape(-1, 5)[tp]
        vmask = mask & (r2 <= ff.vdw_r2cut.reshape(-1)[tp])
        kind = jnp.where(vmask, kind, 0)
        if cfg.use_radii:
            rad_i = jnp.broadcast_to(radii[:, None], r2s.shape)
            rad_j = jnp.broadcast_to(radii[None, :], r2s.shape)
        else:
            rad_i = rad_j = None
        fv, ev = vdw_eval(kind, vp, r2s, r, rad_i, rad_j,
                          families=cfg.vdw_families)
        fv = jnp.where(vmask, fv, 0.0)
        ev = jnp.where(vmask, ev, 0.0)
    else:
        fv = ev = jnp.zeros_like(r2s)

    f = jnp.clip(fc + fv, -MX_FRC, MX_FRC)
    frc = jnp.einsum("nm,nmk->nk", f, delta)
    z = jnp.full((N,), N, jnp.int32)
    zr = jnp.full((N,), jnp.inf, dt)
    return PairResult(frc=frc,
                      eng_vdw=0.5 * jnp.sum(ev),
                      eng_coul=0.5 * jnp.sum(ec),
                      max_occ=jnp.zeros((), jnp.int32),
                      bind_idx=z, bind_r2=zr, jump_idx=z, jump_r2=zr)
