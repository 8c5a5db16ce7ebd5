"""Valence angles: harmonic-cosine forces and runtime angle rebuild.

TPU re-design of reference src/cuAngles.cu:
  * ``apply_angles`` + ``angle_hcos`` (:169-284) -> vectorized 3-body
    force with scatter-add (replacing 9 atomicAdds per angle)
  * ``refresh_angles`` (:8-122) -> for atoms whose type/topology changed
    this step ("touched"), delete their centered angles and rebuild all
    ligand pairs from the live bond table
  * ``clear_angles`` (:124-165, serial kernel) -> stable cumsum compaction
"""

from __future__ import annotations

import jax.numpy as jnp

from .pairs import min_image

MAX_BOND_NEI = 8        # matches the reference's nei[8] (cuAngles.cu:12)


def apply_angles(cfg, ff, state):
    """Angle forces + energy. Returns (state, eng_angle)."""
    c, l1, l2, at = (state.ang_central, state.ang_lig1,
                     state.ang_lig2, state.ang_type)
    live = at != 0
    pos = state.pos

    dij = min_image(pos[l1] - pos[c], cfg)
    dik = min_image(pos[l2] - pos[c], cfg)
    r2ij = jnp.sum(dij * dij, axis=-1)
    r2ik = jnp.sum(dik * dik, axis=-1)
    r2ij = jnp.where(live, r2ij, 1.0)
    r2ik = jnp.where(live, r2ik, 1.0)
    rij = jnp.sqrt(r2ij)
    rik = jnp.sqrt(r2ik)

    k = ff.ang_p[at, 0]
    cos0 = ff.ang_p[at, 1]
    cos_th = jnp.sum(dij * dik, axis=-1) / (rij * rik)
    dcos = cos_th - cos0
    c1 = -k * dcos
    c2 = 1.0 / (rij * rik)

    # force distribution (angle_hcos, cuAngles.cu:230-284)
    f1 = c1[:, None] * (dik * c2[:, None]
                        - cos_th[:, None] * dij / r2ij[:, None])
    f2 = c1[:, None] * (dij * c2[:, None]
                        - cos_th[:, None] * dik / r2ik[:, None])
    fc = -(f1 + f2)
    f1 = jnp.where(live[:, None], f1, 0.0)
    f2 = jnp.where(live[:, None], f2, 0.0)
    fc = jnp.where(live[:, None], fc, 0.0)

    frc = state.frc.at[c].add(fc).at[l1].add(f1).at[l2].add(f2)
    eng = jnp.sum(jnp.where(live, 0.5 * k * dcos * dcos, 0.0))
    return state.replace(frc=frc), eng


def refresh_angles(cfg, ff, state):
    """Rebuild angles of touched atoms from the live bond table."""
    N = cfg.n_at
    mxA = state.ang_type.shape[0]
    touched = state.touched

    # 1. drop angles whose central atom was touched (cuAngles.cu:27-42)
    keep = (state.ang_type != 0) & ~touched[state.ang_central]
    at = jnp.where(keep, state.ang_type, 0)

    # 2. bonded-neighbor table (N, MAX_BOND_NEI) from live bonds
    nb = _bond_neighbors(cfg, state)

    # 3. candidate new angles for touched atoms whose species forms angles
    t_ang = ff.spec_angle_type[state.types]               # (N,)
    make = touched & (t_ang != 0) & (state.nbonds > 1)
    pairs = [(i, j) for i in range(MAX_BOND_NEI - 1)
             for j in range(i + 1, MAX_BOND_NEI)]
    pi = jnp.asarray([p[0] for p in pairs], jnp.int32)    # (P,)
    pj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    li = nb[:, pi]                                        # (N, P)
    lj = nb[:, pj]
    cand_ok = make[:, None] & (li < N) & (lj < N)

    # 4. compact survivors + append candidates (clear_angles + atomicAdd)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, dest, mxA)
    n_keep = jnp.sum(keep, dtype=jnp.int32)

    def mv(a):
        return jnp.zeros_like(a).at[dest].set(a, mode="drop")

    ang_c = mv(state.ang_central)
    ang_1 = mv(state.ang_lig1)
    ang_2 = mv(state.ang_lig2)
    ang_t = mv(at)

    flat_ok = cand_ok.reshape(-1)
    rank = jnp.cumsum(flat_ok.astype(jnp.int32)) - 1
    slot = jnp.where(flat_ok, n_keep + rank, mxA)
    centr = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                             cand_ok.shape).reshape(-1)
    t_rows = jnp.broadcast_to(t_ang[:, None], cand_ok.shape).reshape(-1)
    ang_c = ang_c.at[slot].set(centr, mode="drop")
    ang_1 = ang_1.at[slot].set(li.reshape(-1), mode="drop")
    ang_2 = ang_2.at[slot].set(lj.reshape(-1), mode="drop")
    ang_t = ang_t.at[slot].set(t_rows, mode="drop")

    n_angle = jnp.minimum(n_keep + jnp.sum(flat_ok, dtype=jnp.int32),
                          mxA)
    return state.replace(ang_central=ang_c, ang_lig1=ang_1, ang_lig2=ang_2,
                         ang_type=ang_t, n_angle=n_angle)


def _bond_neighbors(cfg, state):
    """(N, MAX_BOND_NEI) partners from the live bond table (sentinel N)."""
    N = cfg.n_at
    at1, at2, bt = state.bond_at1, state.bond_at2, state.bond_type
    live = bt != 0
    ends = jnp.concatenate([jnp.where(live, at1, N),
                            jnp.where(live, at2, N)])
    partners = jnp.concatenate([at2, at1])
    order = jnp.argsort(ends)
    se = ends[order]
    first = jnp.searchsorted(se, se, side="left")
    rank = jnp.arange(se.shape[0], dtype=jnp.int32) - first.astype(jnp.int32)
    slot = se * MAX_BOND_NEI + rank
    ok = (se < N) & (rank < MAX_BOND_NEI)
    slot = jnp.where(ok, slot, N * MAX_BOND_NEI)
    nb = jnp.full((N * MAX_BOND_NEI,), N, jnp.int32)
    nb = nb.at[slot].set(partners[order], mode="drop")
    return nb.reshape(N, MAX_BOND_NEI)
