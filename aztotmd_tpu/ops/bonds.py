"""Bonds: constant and reactive (form / break / mutate at runtime).

TPU re-design of reference src/cuBonds.cu:
  * ``apply_const_bonds`` (:709-796)  -> vectorized masked bond forces
  * ``apply_bonds``       (:306-706)  -> same + type repair, min/max length
    triggers, atom-type mutation; the atomicCAS races become a
    deterministic lowest-slot-wins claim, losers retry next step (the bond
    length condition persists, so the behaviour is self-healing exactly
    like the reference's repair path)
  * ``create_bonds``      (:898-1100) -> candidate pairs from the pair pass
    (nearest eligible neighbor, replacing the atomicMin registration of
    ``try_to_bind``), deterministic per-atom claim instead of CAS locks,
    prefix-sum append into the fixed-capacity bond table
  * ``clear_bonds``       (:864-896, a serial 1-thread kernel) -> stable
    cumsum compaction
  * ``refresh_atomTypes`` (:1102-1120) -> wholesale segment-sum recount
  * per-type count/length/lifetime statistics (cuStruct.h:154-176)

``nbonds`` and ``parents`` are recomputed wholesale from the live bond
table after every topology change (the reference patches them incrementally
with the exclude_parents walk, cuBonds.cu:90-233; wholesale recompute gives
the same invariant deterministically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..io.field import (BOND_BUCK, BOND_E612, BOND_HARM, BOND_MORSE,
                        BOND_PEDONE)
from .pairs import min_image

# the reference zeroes velocities of reactive-bonded atoms near force
# equilibrium ("temporary" equilibration hack, cuBonds.cu:622-627);
# controlled by cfg.bond_equil_hack (deck/CLI-visible switch)


def bond_eval(kind, p, r2, r, kinds=()):
    """Bond force-over-r and energy (cuBonds.cu:1123-1233), masked multi-
    family evaluation like ops.vdw."""
    f = jnp.zeros_like(r2)
    e = jnp.zeros_like(r2)
    p0, p1, p2, p3, p4 = (p[..., k] for k in range(5))
    for fam in kinds:
        m = kind == fam
        if fam == BOND_HARM:
            x = r - p1
            ee = 0.5 * p0 * x * x
            ff = -p0 / r * x
        elif fam == BOND_MORSE:
            x = jnp.exp(-p1 * (r - p2))
            y = 1.0 - x
            ee = p0 * y * y - p3
            ff = -2.0 * p0 * p1 * x * y / r
        elif fam == BOND_PEDONE:
            x = jnp.exp(-p1 * (r - p2))
            y = 1.0 - x
            ir2 = 1.0 / r2
            ir12 = (ir2 * ir2) ** 3
            ee = p0 * y * y - p3 - p4 * ir12
            ff = -2.0 * p0 * p1 * x * y / r - 12.0 * p4 * ir12 * ir2
        elif fam == BOND_BUCK:
            ir2 = 1.0 / r2
            ir4 = ir2 * ir2
            ex = jnp.exp(-r / jnp.where(m, p1, 1.0))
            ee = p0 * ex - p2 * ir4 * ir2
            ff = p0 * ex / (r * jnp.where(m, p1, 1.0)) - 6.0 * p2 * ir4 * ir4
        elif fam == BOND_E612:
            ir2 = 1.0 / r2
            ir4 = ir2 * ir2
            ex = jnp.exp(-r / jnp.where(m, p1, 1.0))
            ee = p0 * ex - p2 * ir4 * ir2 - p3 * ir4 * ir4 \
                - p4 * ir4 * ir4 * ir4
            ff = p0 * ex / (r * jnp.where(m, p1, 1.0)) - 6.0 * p2 * ir4 * ir4 \
                - 8.0 * p3 * ir4 * ir4 * ir2 - 12.0 * p4 * ir4 * ir4 * ir4 * ir2
        else:
            continue
        f = jnp.where(m, ff, f)
        e = jnp.where(m, ee, e)
    return f, e


def bond_energy_only(ff, cfg, bt, r2, r):
    """Energy of bond type bt at distance r (eng_knr twins)."""
    kind = ff.bond_kind[bt]
    p = ff.bond_p[bt]
    _, e = bond_eval(kind, p, r2, r, kinds=cfg.bond_kinds)
    return jnp.where(bt > 0, e, 0.0)


def _evol_bondtype(ff, bt, s1, s2):
    """New (signed) bond type when atom types change (cuBonds.cu:273-291):
    prefer the 'evol' bond if its species match, else def_bonds matrix."""
    nsp = ff.def_bond.shape[0]
    ev = ff.bond_evol[bt]
    ev_s1 = ff.bond_spec1[ev]
    ev_s2 = ff.bond_spec2[ev]
    by_matrix = ff.def_bond.reshape(-1)[s1 * nsp + s2]
    return jnp.where(
        ev != 0,
        jnp.where((s1 == ev_s1) & (s2 == ev_s2), ev,
                  jnp.where((s1 == ev_s2) & (s2 == ev_s1), -ev, by_matrix)),
        by_matrix)


def refresh_derived(cfg, ff, state):
    """Recompute nbonds, parents and per-species counts from the live bond
    table + types (wholesale replacement for exclude_parents /
    refresh_atomTypes)."""
    N = cfg.n_at
    at1, at2, bt = state.bond_at1, state.bond_at2, state.bond_type
    live = bt != 0
    hat = ff.bond_hatom[bt]                      # -1 covalent
    t1 = state.types[at1]
    t2 = state.types[at2]
    # nbonds convention of create_bonds (cuBonds.cu:1047-1056): endpoint
    # counts the bond if the *other* endpoint is not the H-atom of an H-bond
    inc1 = live & (hat != t2)
    inc2 = live & (hat != t1)
    nbonds = jnp.zeros((N,), jnp.int32)
    nbonds = nbonds.at[at1].add(inc1.astype(jnp.int32))
    nbonds = nbonds.at[at2].add(inc2.astype(jnp.int32))

    # parents: partner of the lowest-slot live bond; H-bonds only parent
    # the H atom (read_bondlist convention, bonds.cpp:85-99)
    mxB = at1.shape[0]
    slot = jnp.arange(mxB, dtype=jnp.int32)
    key = slot * (N + 1)
    big = jnp.iinfo(jnp.int32).max
    p1_ok = live & ((hat == -1) | (hat == t1))   # at1 gets parent at2
    p2_ok = live & ((hat == -1) | (hat == t2))
    best = jnp.full((N,), big, jnp.int32)
    best = best.at[at1].min(jnp.where(p1_ok, key + at2, big))
    best = best.at[at2].min(jnp.where(p2_ok, key + at1, big))
    parents = jnp.where(best == big, -1, best % (N + 1))

    spec_number = jnp.zeros((cfg.n_spec,), jnp.int32).at[state.types].add(1)
    return state.replace(nbonds=nbonds, parents=parents,
                         spec_number=spec_number)


def apply_bonds(cfg, ff, state):
    """Bond forces (+ reactive repair/mutation when use_bnd == 2).
    Returns (state, eng_bond)."""
    at1, at2, bt = state.bond_at1, state.bond_at2, state.bond_type
    types = state.types
    N = cfg.n_at
    mxB = at1.shape[0]
    live = bt != 0
    topo_changed = False

    if cfg.use_bnd == 2:
        # --- stage 1: orientation / type repair (cuBonds.cu:399-456) ---
        s1 = types[at1]
        s2 = types[at2]
        ok = (ff.bond_spec1[bt] == s1) & (ff.bond_spec2[bt] == s2)
        rev = (ff.bond_spec1[bt] == s2) & (ff.bond_spec2[bt] == s1) & (s1 != s2)
        at1, at2 = (jnp.where(rev, at2, at1), jnp.where(rev, at1, at2))
        s1, s2 = (jnp.where(rev, s2, s1), jnp.where(rev, s1, s2))
        mismatch = live & ~ok & ~rev
        defb = _evol_bondtype(ff, bt, s1, s2)
        # repaired (signed) type; 0 -> bond dies
        rep = jnp.where(mismatch, defb, bt)
        rep_rev = rep < 0
        at1, at2 = (jnp.where(rep_rev, at2, at1), jnp.where(rep_rev, at1, at2))
        s1, s2 = (jnp.where(rep_rev, s2, s1), jnp.where(rep_rev, s1, s2))
        new_bt = jnp.abs(rep)
        repair_delete = mismatch & (new_bt == 0)
        save_lt = mismatch

        # --- stage 2: distance triggers (cuBonds.cu:467-487) ---
        delta = min_image(state.pos[at1] - state.pos[at2], cfg)
        r2 = jnp.sum(delta * delta, axis=-1)
        mx_trig = live & ~repair_delete & (ff.bond_mx_ex[new_bt] != 0) \
            & (r2 > ff.bond_r2max[new_bt])
        mn_trig = live & ~repair_delete & ~mx_trig \
            & (ff.bond_mn_ex[new_bt] != 0) & (r2 < ff.bond_r2min[new_bt])
        mnmx = jnp.where(mx_trig, 1, 0)
        trig = mx_trig | mn_trig
        trig_delete = mx_trig & (ff.bond_new_type[new_bt, 1] == 0)

        # --- stage 3: deterministic claim for atom-type mutation ---
        # (replaces the atomicCAS two-phase lock, cuBonds.cu:497-549)
        slot = jnp.arange(mxB, dtype=jnp.int32)
        big = jnp.iinfo(jnp.int32).max
        want = trig
        claim = jnp.full((N,), big, jnp.int32)
        claim = claim.at[at1].min(jnp.where(want, slot, big))
        claim = claim.at[at2].min(jnp.where(want, slot, big))
        win = want & (claim[at1] == slot) & (claim[at2] == slot)

        nt_rows = ff.bond_new_type[new_bt, mnmx]
        ns1 = ff.bond_new_spec1[new_bt, mnmx]
        ns2 = ff.bond_new_spec2[new_bt, mnmx]

        # apply type mutations of winning bonds
        types = types.at[jnp.where(win, at1, N)].set(
            jnp.where(win, ns1, 0), mode="drop")
        types = types.at[jnp.where(win, at2, N)].set(
            jnp.where(win, ns2, 0), mode="drop")

        # --- stage 4: bond record updates ---
        win_delete = win & trig_delete
        win_mutate = win & trig & ~trig_delete
        mut_rev = nt_rows < 0
        mut_bt = jnp.abs(nt_rows)
        final_bt = jnp.where(win_mutate, mut_bt, new_bt)
        final_bt = jnp.where(win_delete | repair_delete, 0, final_bt)
        swap = win_mutate & mut_rev
        at1, at2 = (jnp.where(swap, at2, at1), jnp.where(swap, at1, at2))
        save_lt = save_lt | win

        # lifetime statistics on the *old* type (keep_bndlifetime)
        age = (state.step - state.bond_start).astype(state.bt_lt_sum.dtype)
        lt_idx = jnp.where(save_lt & live, bt, 0)
        bt_lt_sum = state.bt_lt_sum.at[lt_idx].add(
            jnp.where(save_lt & live, age, 0.0))
        bt_lt_count = state.bt_lt_count.at[lt_idx].add(
            (save_lt & live).astype(jnp.int32))
        bond_start = jnp.where(save_lt, state.step, state.bond_start)

        # per-type counts: -old +new for changed live bonds
        chg = save_lt & live
        bt_count = state.bt_count.at[jnp.where(chg, bt, 0)].add(
            jnp.where(chg, -1, 0))
        bt_count = bt_count.at[jnp.where(chg, final_bt, 0)].add(
            jnp.where(chg & (final_bt != 0), 1, 0))

        bt = final_bt
        live = bt != 0
        touched = state.touched
        touched = touched.at[jnp.where(win, at1, N)].set(True, mode="drop")
        touched = touched.at[jnp.where(win, at2, N)].set(True, mode="drop")
        touched = touched.at[jnp.where(win_delete | repair_delete, at1, N)
                             ].set(True, mode="drop")
        touched = touched.at[jnp.where(win_delete | repair_delete, at2, N)
                             ].set(True, mode="drop")
        state = state.replace(types=types, bond_at1=at1, bond_at2=at2,
                              bond_type=bt, bond_start=bond_start,
                              bt_lt_sum=bt_lt_sum, bt_lt_count=bt_lt_count,
                              bt_count=bt_count, touched=touched)
        topo_changed = True
    else:
        delta = min_image(state.pos[at1] - state.pos[at2], cfg)
        r2 = jnp.sum(delta * delta, axis=-1)

    # --- forces on live bonds ---
    r2s = jnp.where(live, r2, 1.0)
    r = jnp.sqrt(r2s)
    kind = jnp.where(live, ff.bond_kind[bt], 0)
    f, e = bond_eval(kind, ff.bond_p[bt], r2s, r, kinds=cfg.bond_kinds)
    f = jnp.where(live, f, 0.0)
    e = jnp.where(live, e, 0.0)
    fd = f[:, None] * delta
    frc = state.frc.at[at1].add(fd).at[at2].add(-fd)
    eng = jnp.sum(e)

    # mean-length statistics (accumulated over the whole run, like the
    # reference's never-reset rSumm/rCount)
    stat_idx = jnp.where(live, bt, 0)
    bt_r_sum = state.bt_r_sum.at[stat_idx].add(jnp.where(live, r, 0.0))
    bt_r_count = state.bt_r_count.at[stat_idx].add(live.astype(jnp.int32))
    state = state.replace(frc=frc, bt_r_sum=bt_r_sum, bt_r_count=bt_r_count)

    if cfg.use_bnd == 2 and cfg.bond_equil_hack:
        # zero the velocities of near-equilibrium reactive bond partners
        calm = live & (f > -0.1) & (f < 0.1)
        vmask = jnp.zeros((N,), bool)
        vmask = vmask.at[jnp.where(calm, at1, N)].set(True, mode="drop")
        vmask = vmask.at[jnp.where(calm, at2, N)].set(True, mode="drop")
        state = state.replace(vel=jnp.where(vmask[:, None], 0.0, state.vel))

    if topo_changed:
        state = compact_bonds(cfg, state)
        state = refresh_derived(cfg, ff, state)

    return state, eng


def compact_bonds(cfg, state):
    """Stable compaction of the bond table (replaces the serial clear_bonds
    kernel, cuBonds.cu:864-896)."""
    bt = state.bond_type
    live = bt != 0
    mxB = bt.shape[0]
    dest = jnp.cumsum(live.astype(jnp.int32)) - 1
    dest = jnp.where(live, dest, mxB)            # dropped -> out of range
    def mv(a, fill=0):
        out = jnp.full_like(a, fill)
        return out.at[dest].set(a, mode="drop")
    return state.replace(
        bond_at1=mv(state.bond_at1), bond_at2=mv(state.bond_at2),
        bond_type=mv(bt), bond_start=mv(state.bond_start),
        n_bond=jnp.sum(live, dtype=jnp.int32))


def create_bonds(cfg, ff, state, bind_idx, bind_r2):
    """Create bonds from pair-pass candidates (cuBonds.cu:898-1100).

    bind_idx[i] = nearest eligible neighbor of atom i (sentinel n_at).
    The CAS lock pair becomes a deterministic claim: an ordered candidate
    pair (a, b) is created iff the proposing atom wins both endpoints."""
    N = cfg.n_at
    nsp = cfg.n_spec
    has = bind_idx < N
    a = jnp.minimum(jnp.arange(N, dtype=jnp.int32), bind_idx)
    b = jnp.maximum(jnp.arange(N, dtype=jnp.int32), bind_idx)
    a = jnp.where(has, a, N)
    b = jnp.where(has, b, N)

    s1 = state.types[jnp.clip(a, 0, N - 1)]
    s2 = state.types[jnp.clip(b, 0, N - 1)]
    btype = ff.bonding_matr.reshape(-1)[s1 * nsp + s2]
    has = has & (btype != 0)

    # claim both endpoints (proposer index = atom id)
    me = jnp.arange(N, dtype=jnp.int32)
    big = jnp.iinfo(jnp.int32).max
    claim = jnp.full((N,), big, jnp.int32)
    claim = claim.at[jnp.where(has, a, N)].min(
        jnp.where(has, me, big), mode="drop")
    claim = claim.at[jnp.where(has, b, N)].min(
        jnp.where(has, me, big), mode="drop")
    win = has & (claim[jnp.clip(a, 0, N - 1)] == me) \
        & (claim[jnp.clip(b, 0, N - 1)] == me)

    # dedup mutual proposals (both atoms proposing the same ordered pair):
    # keep the lower proposer
    partner = bind_idx
    mutual = win & (partner[jnp.clip(partner, 0, N - 1)] == me)
    win = win & ~(mutual & (partner < me))

    # orientation + type change on formation
    rev = btype < 0
    bt_abs = jnp.abs(btype)
    id1 = jnp.where(rev, b, a)
    id2 = jnp.where(rev, a, b)
    new_t1 = ff.bond_spec1[bt_abs]
    new_t2 = ff.bond_spec2[bt_abs]

    # append into free slots
    rank = jnp.cumsum(win.astype(jnp.int32)) - 1
    slot = state.n_bond + rank
    mxB = state.bond_type.shape[0]
    ok = win & (slot < mxB)
    tgt = jnp.where(ok, slot, mxB)
    bond_at1 = state.bond_at1.at[tgt].set(id1, mode="drop")
    bond_at2 = state.bond_at2.at[tgt].set(id2, mode="drop")
    bond_type = state.bond_type.at[tgt].set(bt_abs, mode="drop")
    bond_start = state.bond_start.at[tgt].set(state.step, mode="drop")
    n_new = jnp.sum(ok, dtype=jnp.int32)

    types = state.types
    types = types.at[jnp.where(ok, id1, N)].set(
        jnp.where(ok, new_t1, 0), mode="drop")
    types = types.at[jnp.where(ok, id2, N)].set(
        jnp.where(ok, new_t2, 0), mode="drop")

    bt_count = state.bt_count.at[jnp.where(ok, bt_abs, 0)].add(
        jnp.where(ok, 1, 0))

    touched = state.touched
    touched = touched.at[jnp.where(ok, id1, N)].set(True, mode="drop")
    touched = touched.at[jnp.where(ok, id2, N)].set(True, mode="drop")

    state = state.replace(
        bond_at1=bond_at1, bond_at2=bond_at2, bond_type=bond_type,
        bond_start=bond_start, n_bond=state.n_bond + n_new,
        types=types, bt_count=bt_count, touched=touched)
    return refresh_derived(cfg, ff, state)


def bond_means(cfg, state):
    """ltMean/rMean for the stat stream (calc_quantities, main.cu:161-177)."""
    lt = jnp.where(state.bt_lt_count > 0,
                   state.bt_lt_sum * cfg.dt
                   / jnp.maximum(state.bt_lt_count, 1), 0.0)
    rm = jnp.where(state.bt_r_count > 0,
                   state.bt_r_sum / jnp.maximum(state.bt_r_count, 1), 0.0)
    return state.replace(bt_lt_mean=lt, bt_r_mean=rm)


def fix_bonds(cfg, ff, state):
    """Final bond-type repair before saving (cuBonds.cu:799-862)."""
    at1, at2, bt = state.bond_at1, state.bond_at2, state.bond_type
    live = bt != 0
    s1 = state.types[at1]
    s2 = state.types[at2]
    ok = (ff.bond_spec1[bt] == s1) & (ff.bond_spec2[bt] == s2)
    rev = (ff.bond_spec1[bt] == s2) & (ff.bond_spec2[bt] == s1) & ~ok
    mism = live & ~ok & ~rev
    defb = _evol_bondtype(ff, bt, s1, s2)
    new_bt = jnp.where(mism, jnp.abs(defb), bt)
    flip = rev | (mism & (defb < 0))
    at1n = jnp.where(flip, at2, at1)
    at2n = jnp.where(flip, at1, at2)
    return state.replace(bond_at1=at1n, bond_at2=at2n, bond_type=new_bt)
