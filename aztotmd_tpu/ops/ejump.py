"""Electron hopping (redox charge transfer between species).

TPU re-design of reference src/cuEjump.cu (``try_to_jump`` :39-76,
``cuda_ejump`` :78-332) and its serial twin src/ejump.cpp (:168-590):

* candidate (donor -> nearest acceptor) pairs come from the pair pass
  (ops.pairs ``want_jump``), replacing the atomicMin registration;
* dU is evaluated over the *bonded neighborhood* like the CUDA kernel:
  per-atom mutation energies dU_ox / dU_red are accumulated over the live
  bond table with segment sums (VdW difference + Coulomb difference +
  bond-energy difference), then combined per candidate pair, plus the
  external-field term and the species own-energy difference (the serial
  engine includes own energies, ejump.cpp:238-247; the CUDA kernel carries
  a "!add own energy" TODO at cuEjump.cu:229 — we implement the physics);
* acceptance: eq (|dU| < dEjump), min (dU < 0), or full Metropolis
  (the CUDA branch is a stub at cuEjump.cu:238-246; the serial engine's
  exp(-dU/kT) scheme, ejump.cpp:545-560, is implemented here);
* the double atomicCAS type swap becomes a deterministic lowest-donor-wins
  claim on acceptors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import units
from ..io.control import JUMP_EQ, JUMP_METR, JUMP_MIN
from .bonds import bond_eval, _evol_bondtype
from .pairs import min_image
from .vdw import vdw_eval


def _vdw_energy(cfg, ff, t1, t2, r2, r):
    """VdW energy between species t1 and t2 at distance r (eng_r twins),
    respecting the per-pair cutoff."""
    nsp = cfg.n_spec
    tp = t1 * nsp + t2
    kind = ff.vdw_kind.reshape(-1)[tp]
    p = ff.vdw_p.reshape(-1, 5)[tp]
    r2cut = ff.vdw_r2cut.reshape(-1)[tp]
    kind = jnp.where(r2 <= r2cut, kind, 0)
    _, e = vdw_eval(kind, p, r2, r, None, None,
                    families=tuple(f for f in cfg.vdw_families if f != 7))
    return e


def _bond_energy(cfg, ff, bt, r2, r):
    kind = jnp.where(bt != 0, ff.bond_kind[bt], 0)
    _, e = bond_eval(kind, ff.bond_p[bt], r2, r, kinds=cfg.bond_kinds)
    return jnp.where(bt != 0, e, 0.0)


def _mutation_energies(cfg, ff, state):
    """Per-atom energy change of switching atom i to its ox / red form,
    summed over its bonded neighborhood (cuEjump.cu:131-216)."""
    N = cfg.n_at
    types = state.types
    at1, at2, bt = state.bond_at1, state.bond_at2, state.bond_type
    live = bt != 0

    pos = state.pos
    delta = min_image(pos[at1] - pos[at2], cfg)
    r2 = jnp.where(live, jnp.sum(delta * delta, axis=-1), 1.0)
    r = jnp.sqrt(r2)

    t1 = types[at1]
    t2 = types[at2]
    e_cur = _bond_energy(cfg, ff, jnp.where(live, bt, 0), r2, r)

    dU_ox = jnp.zeros((N,), pos.dtype)
    dU_red = jnp.zeros((N,), pos.dtype)

    for which, table in (("ox", ff.spec_oxform), ("red", ff.spec_redform)):
        for side in (0, 1):
            me = at1 if side == 0 else at2
            nei = at2 if side == 0 else at1
            tme = t1 if side == 0 else t2
            tnei = t2 if side == 0 else t1
            new_t = table[tme] - 1                  # -1 = no form
            ok = live & (new_t >= 0)
            new_t_safe = jnp.maximum(new_t, 0)
            # VdW difference
            dvdw = _vdw_energy(cfg, ff, new_t_safe, tnei, r2, r) \
                - _vdw_energy(cfg, ff, tme, tnei, r2, r)
            # Coulomb difference (simplest assumption, cuEjump.cu:160)
            dq = ff.spec_charge[new_t_safe] - ff.spec_charge[tme]
            dcoul = cfg.coul_scale * ff.spec_charge[tnei] / r * dq
            # bond-energy difference: current type vs evolved type
            s1n = jnp.where(side == 0, new_t_safe, tnei)
            s2n = jnp.where(side == 0, tnei, new_t_safe)
            nbt = _evol_bondtype(ff, bt, s1n, s2n)
            e_new = _bond_energy(cfg, ff, jnp.abs(nbt), r2, r)
            dbond = e_new - e_cur
            contrib = jnp.where(ok, dvdw + dcoul + dbond, 0.0)
            idx = jnp.where(ok, me, N)
            if which == "ox":
                dU_ox = dU_ox.at[idx].add(contrib, mode="drop")
            else:
                dU_red = dU_red.at[idx].add(contrib, mode="drop")
    return dU_ox, dU_red


def env_du_partial(cfg, ff, pos_i, types_i, pos_j, types_j, jmask,
                   self_pairs):
    """Partial environment-dU sums over an arbitrary COLUMN SET of
    neighbors j (the pairwise core of the serial twin's captured-list
    sweep, ejump.cpp:200-262).

    ``pos_i (N,3)`` / ``types_i (N,)``: the atoms whose ox/red mutation
    energies are accumulated.  ``pos_j (M,3)`` / ``types_j (M,)``: the
    neighbor columns contributing (a device's owned slab slots in the
    sharded sweep, or all atoms); ``jmask (M,)`` marks live columns and
    ``self_pairs (N,M)`` the (i,j) entries that are the same atom.

    Returns partial ``(dU_ox, dU_red)`` of shape (N,); summing the
    partials over disjoint column sets (e.g. ``lax.psum`` over slab
    devices) reproduces the full sweep.
    """
    delta = min_image(pos_i[:, None, :] - pos_j[None, :, :], cfg)
    r2 = jnp.sum(delta * delta, axis=-1)
    within = jmask[None, :] & ~self_pairs & (r2 <= cfg.r2_max)
    r2s = jnp.where(within, r2, 1.0)
    r = jnp.sqrt(r2s)
    q = ff.spec_charge
    tj = jnp.broadcast_to(types_j[None, :], r2.shape)
    out = []
    for table in (ff.spec_oxform, ff.spec_redform):
        new_t = table[types_i] - 1                  # -1 = no form
        ok = new_t >= 0
        new_safe = jnp.maximum(new_t, 0)
        dv = _vdw_energy(cfg, ff, new_safe[:, None], tj, r2s, r) \
            - _vdw_energy(cfg, ff, types_i[:, None], tj, r2s, r)
        dq = (q[new_safe] - q[types_i])[:, None]
        dc = cfg.coul_scale * q[tj] / r * dq
        out.append(jnp.sum(
            jnp.where(within & ok[:, None], dv + dc, 0.0), axis=1))
    return out[0], out[1]


def env_candidates(cfg, pos):
    """(N, M) cell-table candidate list for the environment-dU sweep —
    the same stencil reach as the pair pass (sentinel N, self
    excluded).  Positions are invariant across a step's jump passes,
    so callers running several do_jumps passes (jmp_oft, step.py)
    build this ONCE per step and pass it as nbr_idx."""
    from . import cell_list as cl
    N = cfg.n_at
    coords = cl.cell_coords(cfg, pos)
    table, _ = cl.build_cell_table(cfg, pos)
    cand = cl.gather_candidates(cfg, table, coords)
    own = jnp.arange(N, dtype=cand.dtype)[:, None]
    return jnp.where(cand == own, N, cand)


def _env_mutation_energies(cfg, ff, state, nbr_idx=None):
    """Serial-twin ENVIRONMENT dU (ejump.cpp:200-262): per-atom energy
    change of switching atom i to its ox/red form, summed over its
    captured neighbors at their CURRENT types — VdW difference under
    the per-pair r2cut plus the plain-Coulomb difference
    Fcoul * q_k * (q_new - q_old) / r (the reference's "change to
    Ewald?" TODO notwithstanding).  Neighbors come from the Verlet
    list when available, else a masked all-pairs sweep (bond-free
    ejump decks are small).  Both are cut at cfg.r2_max, the reach of
    the reference's captured list."""
    N = cfg.n_at
    pos = state.pos
    types = state.types
    dt = pos.dtype

    if nbr_idx is None and N > 8192 and cfg.grid is not None:
        # large bond-free decks on the block/pallas/gather engines
        # (no Verlet list in the step): sweep the cell-table candidate
        # matrix — the same stencil reach as the pair pass — instead
        # of O(N^2) all pairs.  step.py hoists this build out of the
        # per-step jump-pass loop (positions are loop-invariant).
        nbr_idx = env_candidates(cfg, pos)
    if nbr_idx is None:
        return env_du_partial(cfg, ff, pos, types, pos, types,
                              jnp.ones((N,), bool),
                              jnp.eye(N, dtype=bool))
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), dt)], axis=0)
    types_p = jnp.concatenate(
        [types, jnp.zeros((1,), jnp.int32)], axis=0)
    q = ff.spec_charge
    # column-chunk the AoS gather + family evals: the (N, M, 3) gather
    # result lane-pads 3 -> 128, so bound the transient like the
    # neighbor rebuild does (neighbors.py) instead of materializing a
    # cell-matrix-wide sweep at once
    M = nbr_idx.shape[1]
    chunk = max(1, int((2 << 30) // max(N * 128 * 4, 1)))
    sums = [jnp.zeros((N,), dt), jnp.zeros((N,), dt)]
    forms = []
    for table in (ff.spec_oxform, ff.spec_redform):
        new_t = table[types] - 1                    # -1 = no form
        forms.append((new_t >= 0, jnp.maximum(new_t, 0)))
    for i in range(0, M, chunk):
        nb = nbr_idx[:, i:i + chunk]
        valid = nb < N
        delta = min_image(pos[:, None, :] - pos_p[nb], cfg)
        tj = types_p[nb]
        r2 = jnp.sum(delta * delta, axis=-1)
        within = valid & (r2 <= cfg.r2_max)
        r2s = jnp.where(within, r2, 1.0)
        r = jnp.sqrt(r2s)
        for k, (ok, new_safe) in enumerate(forms):
            dv = _vdw_energy(cfg, ff, new_safe[:, None], tj, r2s, r) \
                - _vdw_energy(cfg, ff, types[:, None], tj, r2s, r)
            dq = (q[new_safe] - q[types])[:, None]
            dc = cfg.coul_scale * q[tj] / r * dq
            contrib = jnp.where(within & ok[:, None], dv + dc, 0.0)
            sums[k] = sums[k] + jnp.sum(contrib, axis=1)
    return sums[0], sums[1]


def do_jumps(cfg, ff, state, jump_idx, active=None, nbr_idx=None,
             env_du_fn=None):
    """Perform electron jumps for donor atoms with candidate acceptors.
    jump_idx[i] = nearest acceptor of donor i (sentinel n_at).

    `active`: optional scalar bool gating the whole pass — the jmp_rare
    frequency schedule (ejump.cpp:592-597) masks acceptance instead of
    branching (a TPU lax.cond may execute both branches).
    `nbr_idx`: optional (N, K) Verlet list for the bond-free
    environment-dU scheme (see _env_mutation_energies).
    `env_du_fn`: optional callable ``state -> (dU_ox, dU_red)``
    replacing the local environment sweep — the slab mesh passes a
    sharded partial-sum + psum closure here (parallel/slab_react.py)
    so bond-free ejump decks scale past one device's all-pairs
    budget."""
    N = cfg.n_at
    dt = state.pos.dtype
    types = state.types
    me = jnp.arange(N, dtype=jnp.int32)

    don = (ff.spec_donacc[types] & 1) != 0
    has = don & (jump_idx < N)
    if active is not None:
        has = has & active
    acc = jnp.clip(jump_idx, 0, N - 1)
    acc_t = types[acc]
    has = has & ((ff.spec_donacc[acc_t] & 2) != 0)

    ox = ff.spec_oxform[types] - 1
    red = ff.spec_redform[acc_t] - 1
    has = has & (ox >= 0) & (red >= 0)
    ox = jnp.maximum(ox, 0)
    red = jnp.maximum(red, 0)

    if cfg.use_bnd:
        dU_ox, dU_red = _mutation_energies(cfg, ff, state)
        dU = dU_ox + dU_red[acc]
    else:
        # bond-free decks: the serial engine's environment scheme
        # (ejump.cpp:200-262) — the CUDA twin has no equivalent (its
        # dU covers the bonded neighborhood only)
        if env_du_fn is not None:
            dU_ox, dU_red = env_du_fn(state)
        else:
            dU_ox, dU_red = _env_mutation_energies(cfg, ff, state,
                                                   nbr_idx)
        dU = dU_ox + dU_red[acc]
        # the reference's acceptor loop SKIPS the donor
        # (ejump.cpp:236-239) while the donor loop keeps the acceptor
        # at its old type — remove the acceptor->donor term the
        # per-atom sum double-collected
        d_ij = min_image(state.pos - state.pos[acc], cfg)
        r2ij = jnp.sum(d_ij * d_ij, axis=-1)
        r2ij = jnp.where(has, r2ij, 1.0)
        rij = jnp.sqrt(r2ij)
        corr = _vdw_energy(cfg, ff, red, types, r2ij, rij) \
            - _vdw_energy(cfg, ff, acc_t, types, r2ij, rij) \
            + cfg.coul_scale * ff.spec_charge[types] / rij \
            * (ff.spec_charge[red] - ff.spec_charge[acc_t])
        dU = dU - jnp.where(has, corr, 0.0)

    # own-energy difference (serial engine, ejump.cpp:238-247)
    dU = dU + (ff.spec_energy[ox] - ff.spec_energy[types]) \
        + (ff.spec_energy[red] - ff.spec_energy[acc_t])

    # external-field term (cuEjump.cu:230-234); px = image shift of the
    # acceptor relative to the donor
    ex = cfg.ext_field[0]
    la = cfg.box[0]
    raw = state.pos[:, 0] - state.pos[acc, 0]
    px = jnp.round(raw / la)
    if ex != 0.0:
        dU = dU + ex * (state.pos[:, 0] * (ff.spec_charge[ox]
                                           - ff.spec_charge[types])
                        + (state.pos[acc, 0] + px * la)
                        * (ff.spec_charge[red] - ff.spec_charge[acc_t]))

    # acceptance
    if cfg.ejtype == JUMP_EQ:
        do = (dU > -cfg.d_ejump) & (dU < cfg.d_ejump)
        rng = state.rng
    elif cfg.ejtype == JUMP_MIN:
        do = dU < 0.0
        rng = state.rng
    elif cfg.ejtype == JUMP_METR:
        rng, k = jax.random.split(state.rng)
        xi = jax.random.uniform(k, (N,), dt)
        kt = units.KB * cfg.temp
        do = (dU < 0.0) | (xi < jnp.exp(-jnp.minimum(dU / kt, 50.0)))
    else:
        return state
    do = do & has

    # deterministic conflict resolution: lowest donor wins each acceptor;
    # an atom cannot be donor and acceptor in the same step
    big = jnp.iinfo(jnp.int32).max
    claim = jnp.full((N,), big, jnp.int32)
    claim = claim.at[jnp.where(do, acc, N)].min(
        jnp.where(do, me, big), mode="drop")
    win = do & (claim[acc] == me) & (claim == big)  # donor itself unclaimed
    win = win & ~win[acc]     # break donor chains (i -> j while j -> k)

    # apply type changes
    new_types = types
    new_types = new_types.at[jnp.where(win, me, N)].set(
        jnp.where(win, ox, 0), mode="drop")
    new_types = new_types.at[jnp.where(win, acc, N)].set(
        jnp.where(win, red, 0), mode="drop")

    touched = state.touched
    touched = touched.at[jnp.where(win, me, N)].set(True, mode="drop")
    touched = touched.at[jnp.where(win, acc, N)].set(True, mode="drop")

    n_win = jnp.sum(win, dtype=jnp.int32)
    # box-edge jump counters, x only (cuEjump.cu:286-307)
    pos_cross = win & ((px > 0) | ((px == 0)
                                   & (state.pos[acc, 0] > state.pos[:, 0])))
    neg_cross = win & ((px < 0) | ((px == 0)
                                   & (state.pos[acc, 0] < state.pos[:, 0])))

    spec_number = jnp.zeros((cfg.n_spec,), jnp.int32).at[new_types].add(1)
    return state.replace(
        types=new_types, touched=touched, rng=rng,
        n_jump=state.n_jump + n_win,
        jump_pos=state.jump_pos + jnp.sum(pos_cross, dtype=jnp.int32),
        jump_neg=state.jump_neg + jnp.sum(neg_cross, dtype=jnp.int32),
        spec_number=spec_number)
