"""The MD step: one pure function, jitted once, scanned on device.

Replaces the reference's per-step host-driven kernel schedule with global
barriers after every stage (reference: src/main.cu:281-410) by a single
fused XLA program — zero host round-trips per step, with `lax.scan` for
multi-step chunks.

Stage order mirrors main.cu exactly:
  reset -> [Nose] -> verlet1 (+wrap, counters, F=-qE) -> bond forces
  -> pair forces (cell list) -> [Ewald recip] -> [create bonds] -> [ejump]
  -> [angles] -> verlet2 -> apply_tstat -> calc_quantities
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.state import Energies, MDState
from ..io.control import ELEC_EWALD, TSTAT_NOSE, TSTAT_RADI
from ..ops import angles as ops_angles
from ..ops import bonds as ops_bonds
from ..ops import ejump as ops_ejump
from ..ops import cellblock as ops_cellblock
from ..ops import integrate as integ
from ..ops import pairs as ops_pairs
from ..ops import thermostat as tstat
from ..ops.elec import ewald_recip


@dataclasses.dataclass(frozen=True)
class StepAux:
    """Static auxiliary device data closed over by the step function."""
    photons: jax.Array | None = None    # (N,) photon energies (radiative)
    rk: jax.Array | None = None         # (K,3) Ewald k-vectors
    kweights: jax.Array | None = None   # (K,) exp(-k^2/4a^2)/k^2


def rebuild_neighbors_state(cfg, state):
    """Unconditional FULL Verlet-list rebuild (used at scan
    boundaries — a data-dependent lax.cond on TPU may execute BOTH
    branches, which made dense decks pay the full rebuild every step).
    With the two-level list on, this rebuilds the outer list and
    refines the inner one from it."""
    from ..ops import neighbors as ops_nbr
    if cfg.nb_outer > 1:
        if ops_nbr.sorted_build_ok(cfg):
            # the fused sorted build returns nearest-first rows + their
            # build-time r2 keys: the inner refine AT THE SAME positions
            # is a prefix slice, no second gather/top_k pass
            ocfg = dataclasses.replace(cfg, n_neigh=cfg.n_neigh2,
                                       nb_skin=cfg.nb_skin2)
            idx2, skey2, nmax2, occ = ops_nbr.build_neighbors_keys(
                ocfg, state.pos)
            idx, nmax = ops_nbr.prefix_refine(
                idx2, skey2, cfg.r_max + cfg.nb_skin, cfg.n_neigh,
                cfg.n_at)
        else:
            idx2, nmax2, occ = ops_nbr.build_outer_neighbors(
                cfg, state.pos)
            idx, nmax = ops_nbr.refine_neighbors(cfg, state.pos, idx2)
        extra = {}
        if cfg.nb_orowcap:
            # outer-occupied row ids for the outer-row-compacted refine
            # (refine_neighbors_rows(orow=...)); exact between rebuilds
            orow, n_orow = ops_nbr.compact_orows(
                idx2, cfg.nb_orowcap, cfg.n_at)
            extra = dict(orow_idx=orow,
                         orow_over=jnp.maximum(state.orow_over, n_orow))
        return state.replace(
            nbr_idx=idx, nbr_ref=state.pos, nbr2_idx=idx2,
            nbr_over=jnp.maximum(state.nbr_over, nmax),
            nbr2_over=jnp.maximum(state.nbr2_over, nmax2),
            cell_overflow=jnp.maximum(state.cell_overflow, occ),
            **extra, **_rowcomp_updates(cfg, state, idx))
    idx, nmax, occ = ops_nbr.build_neighbors(cfg, state.pos)
    return state.replace(
        **_rowcomp_updates(cfg, state, idx),
        nbr_idx=idx, nbr_ref=state.pos,
        nbr_over=jnp.maximum(state.nbr_over, nmax),
        cell_overflow=jnp.maximum(state.cell_overflow, occ))


def _rowcomp_updates(cfg, state, idx):
    """State updates for the row-compacted walk (cfg.nb_rowcap > 0):
    recompact whenever the inner list changes."""
    if not cfg.nb_rowcap:
        return {}
    from ..ops import neighbors as ops_nbr
    nbrow, n_rows = ops_nbr.compact_rows(idx, cfg.nb_rowcap, cfg.n_at)
    return dict(nbrow_idx=nbrow,
                nbrow_over=jnp.maximum(state.nbrow_over, n_rows))


def refine_neighbors_state(cfg, state):
    """Cheap inner refine from the existing outer list."""
    from ..ops import neighbors as ops_nbr
    if cfg.nb_rowcap:
        # row-first: select occupied rows before building their lists
        # (the (N, K2) top_k + (N*K) gathers were ~3 ms of the 4.4 ms
        # refine at 40k atoms; the row-domain ops are ~free).  With
        # nb_orowcap the phase-1 sweep runs over the outer-occupied
        # rows recorded at the last full rebuild instead of all N.
        idx, nbrow, nmax, n_rows = ops_nbr.refine_neighbors_rows(
            cfg, state.pos, state.nbr2_idx, cfg.nb_rowcap,
            orow=state.orow_idx if cfg.nb_orowcap else None)
        return state.replace(
            nbr_idx=idx, nbr_ref=state.pos,
            nbr_over=jnp.maximum(state.nbr_over, nmax),
            nbrow_idx=nbrow,
            nbrow_over=jnp.maximum(state.nbrow_over, n_rows))
    idx, nmax = ops_nbr.refine_neighbors(cfg, state.pos, state.nbr2_idx)
    return state.replace(
        nbr_idx=idx, nbr_ref=state.pos,
        nbr_over=jnp.maximum(state.nbr_over, nmax),
        **_rowcomp_updates(cfg, state, idx))


def make_step(cfg, aux: StepAux | None = None,
              nbr_auto_rebuild: bool = True):
    """Build the single-step function step(state, ff) -> state.

    nbr_auto_rebuild: include the in-step conditional Verlet rebuild
    (single-step usage). The scanned multi-step path instead rebuilds
    unconditionally every cfg.nb_rebuild steps and passes False here.
    """
    aux = aux or StepAux()
    want_bind = cfg.use_bnd == 2 and cfg.use_linkage != 0
    want_jump = cfg.ejtype != 0

    def step(state: MDState, ff) -> MDState:
        fdt = state.pos.dtype
        E = state.energies
        eng_kin = E.kin                      # survives across steps

        # --- [Nose] start-of-step scaling (main.cu:291-299) ---
        vel = state.vel
        chit, consint = state.chit, state.consint
        if cfg.tstat_type == TSTAT_NOSE:
            vel, eng_kin, chit, consint = tstat.nose_apply(
                cfg, vel, eng_kin, chit, consint)
        state = state.replace(vel=vel, chit=chit, consint=consint)

        # --- verlet 1st stage + periodic wrap + counters ---
        upd, eng_field = integ.verlet1(cfg, ff, state)
        state = state.replace(
            **upd, touched=jnp.zeros_like(state.touched))

        # --- bond forces (+ reactive mutations) ---
        eng_bond = jnp.zeros((), fdt)
        if cfg.use_bnd:
            state, eng_bond = ops_bonds.apply_bonds(cfg, ff, state)

        # --- pair forces over the cell list / neighbor list ---
        if cfg.pair_engine == "neighbor":
            from ..ops import neighbors as ops_nbr
            # skin monitor: 2*max displacement since the last rebuild
            disp = state.pos - state.nbr_ref
            box = jnp.asarray(cfg.box, state.pos.dtype)
            disp = disp - box * jnp.round(disp / box)
            max_disp = jnp.sqrt(jnp.max(jnp.sum(disp * disp, axis=-1)))
            stale = 2.0 * max_disp > cfg.nb_skin

            if nbr_auto_rebuild:
                # single-step mode: rebuild on schedule or violation.
                # NOTE: TPU may execute both cond branches — fine for
                # cheap rebuilds, the scanned path avoids this entirely.
                need = ((state.step % cfg.nb_rebuild) == 0) | stale

                def rebuild(pos):
                    idx, nmax, occ = ops_nbr.build_neighbors(cfg, pos)
                    return idx, pos, nmax, occ

                def keep(pos):
                    return (state.nbr_idx, state.nbr_ref, state.nbr_over,
                            jnp.zeros((), jnp.int32))

                nbr_idx, nbr_ref, nbr_over, occ = jax.lax.cond(
                    need, rebuild, keep, state.pos)
                viol = (stale & (state.step % cfg.nb_rebuild != 0)) \
                    .astype(jnp.int32)
                state = state.replace(
                    nbr_idx=nbr_idx, nbr_ref=nbr_ref,
                    nbr_over=jnp.maximum(state.nbr_over, nbr_over),
                    nbr_viol=state.nbr_viol + viol,
                    cell_overflow=jnp.maximum(state.cell_overflow, occ))
            else:
                # scanned mode: rebuild happens at scan boundaries;
                # count any in-flight staleness for the runner to react
                nbr_idx = state.nbr_idx
                state = state.replace(
                    nbr_viol=state.nbr_viol + stale.astype(jnp.int32))
            if cfg.nb_rowcap and not nbr_auto_rebuild:
                # row-compacted walk: nbrow_idx is recompacted by the
                # scan-boundary rebuild/refine (same cadence as
                # nbr_idx); the auto-rebuild path keeps the dense walk
                # (compaction inside the lax.cond would run per step)
                pr = ops_nbr.pair_forces_rows(
                    cfg, ff, state.pos, state.types, state.nbrow_idx,
                    radii=state.radii if cfg.use_radii else None,
                    parents=state.parents,
                    want_bind=want_bind, want_jump=want_jump)
            else:
                pr = ops_nbr.pair_forces_neighbors(
                    cfg, ff, state.pos, state.types, nbr_idx,
                    radii=state.radii if cfg.use_radii else None,
                    parents=state.parents,
                    want_bind=want_bind, want_jump=want_jump)
        else:
            if cfg.pair_engine == "pallas":
                from ..ops.pallas_pair import pair_forces_pallas
                pair_fn = pair_forces_pallas
            elif cfg.pair_engine == "sparse":
                from ..ops.pallas_sparse import pair_forces_sparse
                pair_fn = pair_forces_sparse
            elif cfg.pair_engine == "block":
                pair_fn = ops_cellblock.pair_forces_block
            else:
                pair_fn = ops_pairs.pair_forces
            pr = pair_fn(
                cfg, ff, state.pos, state.types,
                radii=state.radii if cfg.use_radii else None,
                parents=state.parents,
                want_bind=want_bind, want_jump=want_jump)
        state = state.replace(
            frc=state.frc + pr.frc,
            cell_overflow=jnp.maximum(state.cell_overflow, pr.max_occ))

        eng_coul1 = pr.eng_coul
        eng_coul2 = jnp.zeros((), fdt)
        eng_coul3 = jnp.asarray(cfg.eng_ewald_const, fdt)

        # --- Ewald reciprocal space ---
        if cfg.elec_type == ELEC_EWALD:
            charge = ff.spec_charge[state.types]
            frc_r, eng_r = ewald_recip(cfg, state.pos, charge,
                                       aux.rk, aux.kweights)
            state = state.replace(frc=state.frc + frc_r)
            eng_coul2 = eng_r.astype(fdt)

        # --- create new bonds from pair-pass candidates ---
        if want_bind:
            state = ops_bonds.create_bonds(cfg, ff, state,
                                           pr.bind_idx, pr.bind_r2)

        # --- electron jumps (frequency gating: ejump.cpp:592-617) ---
        if cfg.ejtype:
            # bond-free decks compute the serial-twin environment dU
            # over the Verlet list when the neighbor engine runs
            # (ejump.cpp:200-262); other engines fall back to a masked
            # all-pairs sweep inside do_jumps
            jump_nbr = None
            if not cfg.use_bnd:
                if cfg.pair_engine == "neighbor":
                    jump_nbr = state.nbr_idx
                elif cfg.n_at > 8192 and cfg.grid is not None:
                    # hoist the cell-table candidate build out of the
                    # jump passes (positions are invariant across them)
                    jump_nbr = ops_ejump.env_candidates(cfg, state.pos)
            f = int(cfg.ejump_freq)
            if f < 0:
                # jmp_rare: one jump pass every |f| steps — gate by
                # masking acceptance (a lax.cond may run both branches
                # on TPU; the mask costs nothing)
                active = (state.step % (-f)) == 0
                state = ops_ejump.do_jumps(cfg, ff, state, pr.jump_idx,
                                           active=active,
                                           nbr_idx=jump_nbr)
            elif f <= 4:
                # jmp_oft: f jump passes per step over this step's
                # candidates (each pass sees the types the previous one
                # mutated, so conflict-blocked donors can retry)
                for _ in range(max(f, 1)):
                    state = ops_ejump.do_jumps(cfg, ff, state,
                                               pr.jump_idx,
                                               nbr_idx=jump_nbr)
            else:
                state = jax.lax.fori_loop(
                    0, f, lambda _, s: ops_ejump.do_jumps(
                        cfg, ff, s, pr.jump_idx, nbr_idx=jump_nbr),
                    state)

        # --- valence angles ---
        eng_angle = jnp.zeros((), fdt)
        if cfg.use_angl:
            if cfg.use_angl == 2:
                state = ops_angles.refresh_angles(cfg, ff, state)
            state, eng_angle = ops_angles.apply_angles(cfg, ff, state)

        # --- verlet 2nd stage ---
        if cfg.reset_vels:
            zero_now = state.step % cfg.reset_vels == 0
            vel2, eng_kin2 = integ.verlet2(cfg, ff, state.vel, state.frc,
                                           state.types)
            vel2 = jnp.where(zero_now, 0.0, vel2)
            eng_kin2 = jnp.where(zero_now, 0.0, eng_kin2)
        else:
            vel2, eng_kin2 = integ.verlet2(cfg, ff, state.vel, state.frc,
                                           state.types)
        state = state.replace(vel=vel2)
        eng_kin = eng_kin2

        # --- thermostat ---
        eng_temp = jnp.zeros((), fdt)
        upd = tstat.apply_tstat(cfg, ff, state, eng_kin, photons=aux.photons)
        eng_kin = upd.pop("_eng_kin")
        if "_eng_temp" in upd:
            eng_temp = upd.pop("_eng_temp")
        state = state.replace(**upd)

        # --- calc_quantities (main.cu:121-194) ---
        coul_tot = eng_coul1 + eng_coul2 + eng_coul3
        pot = coul_tot + pr.eng_vdw + eng_bond + eng_angle
        energies = Energies(
            kin=eng_kin.astype(fdt),
            vdw=pr.eng_vdw.astype(fdt), coul1=eng_coul1.astype(fdt),
            coul2=eng_coul2, coul3=eng_coul3,
            bond=eng_bond.astype(fdt), angle=eng_angle.astype(fdt),
            temp=eng_temp.astype(fdt), field=eng_field.astype(fdt),
            pot=pot.astype(fdt),
            tot=(pot + eng_kin).astype(fdt))

        pres, buf_p, buf_n, i_mom = integ.pressure_update(cfg, state)
        if cfg.use_bnd:
            state = ops_bonds.bond_means(cfg, state)

        return state.replace(
            energies=energies, pressure=pres,
            mom_buf_pos=buf_p, mom_buf_neg=buf_n, i_mom=i_mom,
            step=state.step + 1)

    return step


def make_multi_step(cfg, aux: StepAux | None = None, jit: bool = True,
                    donate: bool = False):
    """n-step scan: state <- step^n(state), no host sync inside.

    With the Verlet-list engine the list is rebuilt UNCONDITIONALLY
    every cfg.nb_rebuild steps (outer scan), keeping the inner step free
    of data-dependent control flow.
    """
    if cfg.pair_engine != "neighbor":
        step = make_step(cfg, aux)

        def multi(state, ff, n: int):
            def body(s, _):
                return step(s, ff), None
            state, _ = jax.lax.scan(body, state, None, length=n)
            return state
    else:
        step = make_step(cfg, aux, nbr_auto_rebuild=False)
        R = max(int(cfg.nb_rebuild), 1)
        Q = max(int(cfg.nb_outer), 1)

        def multi(state, ff, n: int):
            def inner(s, _):
                return step(s, ff), None

            def block(s, r, full):
                s = rebuild_neighbors_state(cfg, s) if full \
                    else refine_neighbors_state(cfg, s)
                s, _ = jax.lax.scan(inner, s, None, length=r)
                return s

            if Q > 1:
                # two-level: a full rebuild every Q*R steps, cheap
                # refines from the outer list every R steps between
                def superblock(s, m):
                    s = rebuild_neighbors_state(cfg, s)
                    s, _ = jax.lax.scan(inner, s, None, length=min(R, m))
                    m_in, rem_in = divmod(max(m - R, 0), R)
                    if m_in:
                        def iblock(s, _):
                            return block(s, R, False), None
                        s, _ = jax.lax.scan(iblock, s, None,
                                            length=m_in)
                    if rem_in:
                        s = block(s, rem_in, False)
                    return s

                n_sup, rem = divmod(n, Q * R)
                if n_sup:
                    def souter(s, _):
                        return superblock(s, Q * R), None
                    state, _ = jax.lax.scan(souter, state, None,
                                            length=n_sup)
                if rem:
                    state = superblock(state, rem)
                return state

            n_out, rem = divmod(n, R)
            if n_out:
                def outer(s, _):
                    return block(s, R, True), None
                state, _ = jax.lax.scan(outer, state, None, length=n_out)
            if rem:
                state = block(state, rem, True)
            return state

    if not jit:
        return multi
    return jax.jit(multi, static_argnums=2,
                   donate_argnums=(0,) if donate else ())
