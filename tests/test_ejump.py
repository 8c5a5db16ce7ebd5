"""Electron-hopping tests on a synthetic Fe2+/Fe3+ redox deck."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aztotmd_tpu.io.atoms import AtomsData
from aztotmd_tpu.io.control import (ControlSpec, ElecSpec, TStatSpec,
                                    JUMP_MIN, JUMP_METR, ELEC_DIRECT)
from aztotmd_tpu.io.field import parse_field
from aztotmd_tpu.runtime.setup import build_system
from aztotmd_tpu.runtime.step import make_step

# two iron oxidation states; Fe3 is the acceptor (reduces to Fe2),
# Fe2 the donor (oxidizes to Fe3); own energies favour the jump
FIELD = """
spec 2
Fe2\tFe\t55.8\t2.0\t0.5
Fe3\tFe\t55.8\t3.0\t0.0
red-ox 1
2 Fe3 Fe2
vdw 1
Fe2\tFe2\tlnjs\t4.0\t0.005\t2.2
"""


def redox_system(scheme=JUMP_MIN, d=(0.0, 0.0)):
    fld = parse_field(FIELD)
    assert fld.species[0].donacc & 1          # Fe2 donor
    assert fld.species[1].donacc & 2          # Fe3 acceptor
    assert fld.species[0].oxForm == 2         # Fe2 -> Fe3 (1-based)
    assert fld.species[1].redForm == 1        # Fe3 -> Fe2
    # donor and acceptor 1.5 A apart, far from the other pair
    pos = np.array([[3.0, 3.0, 3.0], [4.5, 3.0, 3.0],
                    [9.0, 9.0, 9.0], [9.0, 9.0, 3.0]])
    names = ["Fe2", "Fe3", "Fe2", "Fe2"]
    ctl = ControlSpec(t_step=0.0001, n_step=4,
                      tstat=TStatSpec(type=0, temp=300.0),
                      elec=ElecSpec(type=ELEC_DIRECT, r_real=6.0))
    ctl.ejump = 1
    ctl.ejtype = scheme
    ctl.r_elec = 2.0
    atoms = AtomsData(names=names, pos=pos, box=(12.0, 12.0, 12.0))
    return build_system(ctl, fld, atoms, dtype="f64", seed=5)


def test_jump_swaps_types_and_conserves_charge():
    """min scheme: the donor/acceptor pair with dU < 0 swaps types;
    total charge and species counts stay consistent."""
    cfg, ff, state, aux = redox_system(scheme=JUMP_MIN)
    assert cfg.ejtype == JUMP_MIN
    q0 = float(jnp.sum(ff.spec_charge[state.types]))
    n_fe2_0 = int(jnp.sum(state.types == 0))
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)
    q1 = float(jnp.sum(ff.spec_charge[state.types]))
    assert q1 == pytest.approx(q0, abs=1e-12)
    # species counters track the types array
    n_fe2 = int(jnp.sum(state.types == 0))
    assert int(state.spec_number[0]) == n_fe2
    assert int(state.spec_number[1]) == int(jnp.sum(state.types == 1))
    assert n_fe2_0 == n_fe2       # a swap preserves counts per species


def test_jump_counter_increments_when_jump_happens():
    cfg, ff, state, aux = redox_system(scheme=JUMP_MIN)
    step = jax.jit(make_step(cfg, aux))
    s1 = step(state, ff)
    types0 = np.asarray(state.types)
    types1 = np.asarray(s1.types)
    swapped = (types0 != types1).sum()
    # either a swap happened (pair of changes) and was counted, or not
    assert swapped in (0, 2)
    if swapped:
        assert int(s1.n_jump) >= 1
        # the donor became Fe3 and the acceptor became Fe2
        assert types1[0] == 1 and types1[1] == 0


# equal own energies AND equal charges: the environment-dU scheme
# (serial twin, ejump.cpp:200-262) contributes F*q_k*dq/r per neighbor,
# so a charge-changing swap no longer has dU == 0 — the gating test
# needs a deck where every pass is energetically allowed
FIELD_EQ = FIELD.replace("2.0\t0.5", "2.0\t0.0") \
                .replace("55.8\t3.0", "55.8\t2.0")


def gated_system(ejump: int):
    """eq-scheme deck where dU = 0, so a jump fires on every allowed
    pass (the pair flip-flops); n_jump then counts the pass schedule."""
    from aztotmd_tpu.io.control import JUMP_EQ
    fld = parse_field(FIELD_EQ)
    pos = np.array([[3.0, 3.0, 3.0], [4.5, 3.0, 3.0],
                    [9.0, 9.0, 9.0], [9.0, 9.0, 3.0]])
    names = ["Fe2", "Fe3", "Fe2", "Fe2"]
    ctl = ControlSpec(t_step=0.0001, n_step=6,
                      tstat=TStatSpec(type=0, temp=300.0),
                      elec=ElecSpec(type=ELEC_DIRECT, r_real=6.0))
    ctl.ejump = ejump
    ctl.ejtype = JUMP_EQ
    ctl.d_ejump = 1.0
    ctl.r_elec = 2.0
    atoms = AtomsData(names=names, pos=pos, box=(12.0, 12.0, 12.0))
    return build_system(ctl, fld, atoms, dtype="f64", seed=5)


def test_ejump_frequency_gating():
    """jmp_rare/jmp_oft schedules (ejump.cpp:592-617): eJump -3 attempts
    jumps only on steps 0,3,...; eJump 1 every step; eJump 2 twice per
    step."""
    for ejump, expect in ((1, 6), (-3, 2), (2, 12)):
        cfg, ff, state, aux = gated_system(ejump)
        assert cfg.ejump_freq == ejump
        step = jax.jit(make_step(cfg, aux))
        for _ in range(6):
            state = step(state, ff)
        assert int(state.n_jump) == expect, \
            f"eJump {ejump}: got {int(state.n_jump)}, want {expect}"


def test_metropolis_scheme_runs():
    cfg, ff, state, aux = redox_system(scheme=JUMP_METR)
    step = jax.jit(make_step(cfg, aux))
    for _ in range(5):
        state = step(state, ff)
    assert bool(jnp.all(jnp.isfinite(state.pos)))
    assert int(jnp.sum(state.types == 0)) + \
        int(jnp.sum(state.types == 1)) == cfg.n_at


def _ejump_oracle(pos, types, box, r_elec, d_ejump, e_own, oxf, redf,
                  donacc, scheme="eq", env=None):
    """Independent O(N^2) NumPy model of one jump pass: each donor
    targets its NEAREST acceptor within r_elec (pre-pass types,
    cuEjump.cu:39-76), claims resolve first-donor-wins with no retry.
    dU is the own-energy difference plus, when ``env`` provides
    (charges, coul_scale, vdw_kind, vdw_p, vdw_r2cut, r_max), the
    serial engine's environment sums over all neighbors within r_max
    (ejump.cpp:200-262: per-pair-cutoff VdW difference + plain-Coulomb
    F*q_k*dq/r; the acceptor loop skips the donor, the donor loop
    keeps the acceptor at its old type).  Returns
    (types, n_jump, jump_pos, jump_neg)."""
    n = len(types)
    types = types.copy()
    la = box[0]
    # nearest acceptor per donor, min-image
    d = pos[:, None, :] - pos[None, :, :]
    d -= np.asarray(box) * np.round(d / np.asarray(box))
    r2 = np.sum(d * d, axis=-1)
    np.fill_diagonal(r2, np.inf)
    is_don = (donacc[types] & 1) != 0
    is_acc = (donacc[types] & 2) != 0
    r2a = np.where(is_acc[None, :], r2, np.inf)
    nearest = np.argmin(r2a, axis=1)
    ok = is_don & (r2a[np.arange(n), nearest] <= r_elec * r_elec)

    def vdw_e(t1, t2, rr2):
        if env is None:
            return 0.0
        _, _, kind, p, r2cut, _ = env
        k = kind[t1, t2]
        if k == 0 or rr2 > r2cut[t1, t2]:
            return 0.0
        assert k == 1, "oracle models lnjs only"
        p0, p1 = p[t1, t2, 0], p[t1, t2, 1]
        sr6 = (p1 / rr2) ** 3
        return p0 * sr6 * (sr6 - 1.0)

    def env_du(i, j, ti2, tj2):
        """VdW + Coulomb environment difference for the (i->ti2,
        j->tj2) swap, serial scheme."""
        if env is None:
            return 0.0
        q, fcoul, _, _, _, r_max = env
        du = 0.0
        ti, tj = types[i], types[j]
        for k in range(n):
            if k != i and r2[i, k] <= r_max * r_max:
                rr = math.sqrt(r2[i, k])
                du += vdw_e(ti2, types[k], r2[i, k]) \
                    - vdw_e(ti, types[k], r2[i, k]) \
                    + fcoul * q[types[k]] * (q[ti2] - q[ti]) / rr
            if k != j and k != i and r2[j, k] <= r_max * r_max:
                rr = math.sqrt(r2[j, k])
                du += vdw_e(tj2, types[k], r2[j, k]) \
                    - vdw_e(tj, types[k], r2[j, k]) \
                    + fcoul * q[types[k]] * (q[tj2] - q[tj]) / rr
        return du

    n_jump = jp = jn = 0
    claimed = np.zeros(n, bool)
    for i in range(n):
        if not ok[i] or claimed[i]:
            continue
        j = nearest[i]
        if claimed[j]:
            continue
        ti, tj = types[i], types[j]
        ox, red = oxf[ti] - 1, redf[tj] - 1
        if ox < 0 or red < 0:
            continue
        dU = (e_own[ox] - e_own[ti]) + (e_own[red] - e_own[tj]) \
            + env_du(i, j, ox, red)
        accept = abs(dU) < d_ejump if scheme == "eq" else dU < 0.0
        if not accept:
            continue
        types[i], types[j] = ox, red
        claimed[i] = claimed[j] = True
        n_jump += 1
        px = np.round((pos[i, 0] - pos[j, 0]) / la)
        if px > 0 or (px == 0 and pos[j, 0] > pos[i, 0]):
            jp += 1
        elif px < 0 or (px == 0 and pos[j, 0] < pos[i, 0]):
            jn += 1
    return types, n_jump, jp, jn


def test_ejump_matches_numpy_oracle_multielectron():
    """Multi-electron deck: jump outcomes, jumps.dat counters and the
    box-crossing split must match the independent NumPy model over
    several steps (VERDICT r1 #9)."""
    from aztotmd_tpu.io.control import JUMP_EQ
    rng = np.random.default_rng(42)
    n = 24
    box = (14.0, 14.0, 14.0)
    pos = rng.uniform(0.2, 13.8, size=(n, 3))
    names = ["Fe2"] * 12 + ["Fe3"] * 12
    fld = parse_field(FIELD)
    ctl = ControlSpec(t_step=1e-7, n_step=6,
                      tstat=TStatSpec(type=0, temp=300.0),
                      elec=ElecSpec(type=ELEC_DIRECT, r_real=6.0))
    ctl.ejump = 1
    ctl.ejtype = JUMP_EQ
    # wide enough to accept SOME environment dUs and reject others —
    # the env term (serial scheme) is tens of eV at these charges
    ctl.d_ejump = 40.0
    ctl.r_elec = 3.0
    atoms = AtomsData(names=names, pos=pos, box=box)
    cfg, ff, state, aux = build_system(ctl, fld, atoms, dtype="f64",
                                       seed=9)
    step = jax.jit(make_step(cfg, aux))

    e_own = np.asarray(ff.spec_energy)
    oxf = np.array([s.oxForm for s in fld.species])
    redf = np.array([s.redForm for s in fld.species])
    donacc = np.array([s.donacc for s in fld.species])
    env = (np.asarray(ff.spec_charge), cfg.coul_scale,
           np.asarray(ff.vdw_kind), np.asarray(ff.vdw_p),
           np.asarray(ff.vdw_r2cut), cfg.r_max)

    otypes = np.asarray(state.types)
    tot = tp = tn = 0
    for k in range(4):
        # oracle pass on the CURRENT positions/types (dt is tiny, so
        # positions are effectively frozen between passes)
        opos = np.asarray(state.pos)
        otypes, nj, jp, jn = _ejump_oracle(
            opos, otypes, box, ctl.r_elec, ctl.d_ejump, e_own,
            oxf, redf, donacc, env=env)
        tot += nj; tp += jp; tn += jn
        state = step(state, ff)
        np.testing.assert_array_equal(np.asarray(state.types), otypes,
                                      err_msg=f"step {k}")
        assert int(state.n_jump) == tot
        assert int(state.jump_pos) == tp
        assert int(state.jump_neg) == tn
    assert tot >= 3      # the deck must actually exercise several jumps


def test_dual_role_species_jumps_past_nearer_donor():
    """A dual-role (donor+acceptor) species must target its nearest
    ACCEPTOR, even when a donor sits closer: a combined argmin over
    both role directions would return the nearer donor, which then
    fails do_jumps' acceptor check and silently blocks a jump the
    reference's try_to_jump (nearest acceptor only, cuEjump.cu:39-76)
    would perform."""
    from aztotmd_tpu.io.control import JUMP_EQ
    # equal charges and no vdw between the involved species: the
    # environment-dU sums cancel, so acceptance is decided by own
    # energies alone (keeps the test focused on candidate SELECTION)
    fld = parse_field("""
spec 5
X2\tX\t55.8\t2.0\t0.0
X3\tX\t55.8\t2.0\t10.0
Fe2\tFe\t55.8\t2.0\t0.0
Fe3\tFe\t55.8\t2.0\t0.0
Fe4\tFe\t55.8\t2.0\t0.0
red-ox 2
3 Fe4 Fe3 Fe2
2 X3 X2
vdw 1
Fe2\tFe2\tlnjs\t4.0\t0.005\t2.2
""")
    # Fe3 sits mid-chain: donor (-> Fe4) AND acceptor (-> Fe2)
    assert fld.species[3].donacc == 3
    # A = dual-role Fe3; B = donor X2 at 1.0 A (the decoy, whose own
    # jump is energetically forbidden: dU = +10 outside the eq window);
    # C = acceptor Fe4 at 1.8 A (the correct target, dU = 0)
    pos = np.array([[3.0, 3.0, 3.0],     # A Fe3
                    [2.0, 3.0, 3.0],     # B X2
                    [4.8, 3.0, 3.0]])    # C Fe4
    names = ["Fe3", "X2", "Fe4"]
    ctl = ControlSpec(t_step=0.0001, n_step=1,
                      tstat=TStatSpec(type=0, temp=300.0),
                      elec=ElecSpec(type=ELEC_DIRECT, r_real=6.0))
    ctl.ejump = 1
    ctl.ejtype = JUMP_EQ
    ctl.d_ejump = 1.0
    ctl.r_elec = 2.0
    atoms = AtomsData(names=names, pos=pos, box=(12.0, 12.0, 12.0))
    cfg, ff, state, aux = build_system(ctl, fld, atoms, dtype="f64",
                                       seed=7)
    step = jax.jit(make_step(cfg, aux))
    s1 = step(state, ff)
    types1 = np.asarray(s1.types)
    assert int(s1.n_jump) == 1
    assert types1[0] == 4        # A oxidized Fe3 -> Fe4
    assert types1[2] == 3        # C reduced Fe4 -> Fe3
    assert types1[1] == 0        # the decoy donor untouched


def test_env_du_cell_sweep_matches_all_pairs_large_deck():
    """Bond-free decks past 8192 atoms sweep the cell-table candidate
    matrix instead of O(N^2) all pairs (ops/ejump.py
    _env_mutation_energies); the stencil reach equals the pair pass's,
    so the sums must match the all-pairs sweep exactly."""
    from aztotmd_tpu.ops.ejump import (_env_mutation_energies,
                                       env_du_partial)

    fld = parse_field(FIELD)
    n = 8300                                  # just past the old cap
    rng = np.random.default_rng(3)
    box = 40.0
    pos = rng.uniform(0, box, size=(n, 3))
    names = ["Fe2" if i % 3 else "Fe3" for i in range(n)]
    ctl = ControlSpec(t_step=0.0001, n_step=1,
                      tstat=TStatSpec(type=0, temp=300.0),
                      elec=ElecSpec(type=ELEC_DIRECT, r_real=6.0))
    ctl.ejump = 1
    ctl.ejtype = JUMP_MIN
    ctl.r_elec = 2.0
    atoms = AtomsData(names=names, pos=pos, box=(box, box, box))
    cfg, ff, state, aux = build_system(ctl, fld, atoms, dtype="f64",
                                       seed=9)
    assert cfg.grid is not None and cfg.n_at > 8192

    got_ox, got_red = _env_mutation_energies(cfg, ff, state)
    # all-pairs reference for a row subset only (the full N^2 f64
    # sweep took ~12 min on the CPU mesh; 512 rows keep the check
    # representative and fast)
    rows = np.sort(rng.choice(n, size=512, replace=False))
    want_ox, want_red = env_du_partial(
        cfg, ff, state.pos[rows], state.types[rows], state.pos,
        state.types, jnp.ones((n,), bool),
        jnp.asarray(rows)[:, None] == jnp.arange(n)[None, :])
    np.testing.assert_allclose(np.asarray(got_ox)[rows],
                               np.asarray(want_ox),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_red)[rows],
                               np.asarray(want_red),
                               rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------
# Metropolis acceptance STATISTICS (VERDICT r3 item 5).  The CUDA
# branch stubs the Metropolis scheme (cuEjump.cu:238-246); the serial
# build defines it (ejump.cpp:545-560: accept iff dU < 0 or
# xi < exp(-dU/kT)).  Our implementation is the only full one, so its
# statistics get a real test: a deck engineered so EVERY candidate jump
# has the same, analytically known dU, sampled over many RNG trials.
def _du_system(scheme, e_ox, temp=300.0, d_ejump=1.0, m_pairs=128):
    """m_pairs isolated donor/acceptor pairs with a CONSTANT jump dU.

    All charges are zero and there are no VdW entries, so the
    environment-dU sweep (ejump.cpp:200-262) vanishes identically and
    dU reduces to the own-energy difference
    (E[D1]-E[D0]) + (E[A1]-E[A0]) = e_ox exactly (ejump.cpp:238-247).
    Two disjoint red-ox couples keep the swap asymmetric (a single
    couple gives dU == 0 by symmetry)."""
    field = f"""
spec 4
D0\tFe\t55.8\t0.0\t0.0
D1\tFe\t55.8\t0.0\t{e_ox:.12f}
A0\tCu\t63.5\t0.0\t0.0
A1\tCu\t63.5\t0.0\t0.0
red-ox 2
2 D1 D0
2 A0 A1
vdw 0
"""
    fld = parse_field(field)
    nx, ny, nz = 8, 4, 4
    assert nx * ny * nz == m_pairs
    cell = 10.0
    centers = np.stack(np.meshgrid(
        (np.arange(nx) + 0.3) * cell, (np.arange(ny) + 0.3) * cell,
        (np.arange(nz) + 0.3) * cell, indexing="ij"), -1).reshape(-1, 3)
    pos = np.empty((2 * m_pairs, 3))
    pos[0::2] = centers
    pos[1::2] = centers + np.array([1.5, 0.0, 0.0])
    names = ["D0", "A0"] * m_pairs
    ctl = ControlSpec(t_step=0.0001, n_step=1,
                      tstat=TStatSpec(type=0, temp=temp),
                      elec=ElecSpec(type=ELEC_DIRECT, r_real=6.0))
    ctl.ejump = 1
    ctl.ejtype = scheme
    ctl.r_elec = 2.0
    ctl.d_ejump = d_ejump
    atoms = AtomsData(names=names, pos=pos,
                      box=(nx * cell, ny * cell, nz * cell))
    return build_system(ctl, fld, atoms, dtype="f64", seed=7)


def _jump_rate(cfg, ff, state, n_trials=400):
    """Acceptance rate of do_jumps over fresh RNG keys: every even atom
    is a donor whose candidate is the next atom."""
    from aztotmd_tpu.ops.ejump import do_jumps

    N = cfg.n_at
    jidx = np.full(N, N, np.int32)
    jidx[0::2] = np.arange(1, N, 2)
    jidx_d = jnp.asarray(jidx)

    def trial(key):
        out = do_jumps(cfg, ff, state.replace(rng=key), jidx_d)
        return out.n_jump - state.n_jump

    wins = jax.jit(jax.vmap(trial))(
        jax.vmap(jax.random.PRNGKey)(jnp.arange(n_trials)))
    return float(jnp.sum(wins)) / (n_trials * (N // 2))


def test_metropolis_acceptance_statistics():
    """Measured acceptance vs exp(-dU/kT) at dU = kT*ln2 (p = 1/2).
    51,200 Bernoulli draws give sigma = sqrt(p(1-p)/n) ~ 0.0022; the
    0.011 tolerance is 5 sigma (false-failure odds ~ 1 in 3.5M)."""
    from aztotmd_tpu import units

    kt = units.KB * 300.0
    cfg, ff, state, aux = _du_system(JUMP_METR, e_ox=math.log(2.0) * kt)
    rate = _jump_rate(cfg, ff, state)
    assert abs(rate - 0.5) < 0.011, rate


def test_metropolis_limits():
    """dU < 0 accepts always; dU = 10 kT accepts ~exp(-10) ~ 4.5e-5."""
    from aztotmd_tpu import units

    kt = units.KB * 300.0
    cfg, ff, state, aux = _du_system(JUMP_METR, e_ox=-0.25)
    assert _jump_rate(cfg, ff, state, n_trials=8) == 1.0
    cfg, ff, state, aux = _du_system(JUMP_METR, e_ox=10.0 * kt)
    assert _jump_rate(cfg, ff, state, n_trials=50) < 0.005


def test_eq_and_min_scheme_thresholds():
    """Pin the serial twin's acceptance definitions (ejump.cpp:545-560):
    eq accepts iff |dU| < dEjump (window, both signs), min iff dU < 0 —
    deterministic, no RNG dependence."""
    from aztotmd_tpu.io.control import JUMP_EQ

    for scheme, e_ox, expect in (
            (JUMP_EQ, 0.5, 1.0), (JUMP_EQ, -0.5, 1.0),
            (JUMP_EQ, 1.5, 0.0), (JUMP_EQ, -1.5, 0.0),
            (JUMP_MIN, -0.5, 1.0), (JUMP_MIN, 0.5, 0.0)):
        cfg, ff, state, aux = _du_system(scheme, e_ox=e_ox, d_ejump=1.0)
        assert _jump_rate(cfg, ff, state, n_trials=4) == expect, \
            (scheme, e_ox)
