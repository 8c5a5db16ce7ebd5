"""Pallas pair-kernel tests (interpret mode on CPU).

Covers the two fused TPU kernels against the all-pairs oracle:
the dense tiled O(N^2) kernel (clustered decks, case study 2 regime)
and the stacked cell-block kernel (uniform dense decks).
"""

import dataclasses

import jax
import numpy as np
import pytest

from aztotmd_tpu.ops import pairs as ops_pairs
from aztotmd_tpu.ops.pallas_pair import (pair_forces_allpairs,
                                         pair_forces_pallas)


def _clustered_system(n_atoms=257, nsp=1, elec=0, seed=3, radii=False):
    """A cs2-shaped cluster: atoms packed into a sub-box of a larger
    periodic box (the regime where cell decompositions overcount)."""
    from aztotmd_tpu import units
    from aztotmd_tpu.core.config import build_sim_config
    from aztotmd_tpu.core.ffield import build_forcefield
    from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
    from aztotmd_tpu.io.field import (VDW_LJ, VDW_SURK, FieldSpec,
                                      SpeciesSpec, VdWSpec)

    rng = np.random.default_rng(seed)
    box = 30.0
    pos = rng.uniform(2.0, 14.0, size=(n_atoms, 3))
    f = FieldSpec()
    f.species = [SpeciesSpec(name=f"S{k}", nuclei=0,
                             mass=39.9 * units.M_SCALE,
                             charge=(0.5 if k % 2 else -0.5)
                             * units.Q_SCALE if elec else 0.0,
                             energy=0.0)
                 for k in range(nsp)]
    f.nnames = [s.name for s in f.species]
    f.nnumbers = [0] * nsp
    rcut = 5.0
    f.pairpots = []
    f.vdw_index = [[None] * nsp for _ in range(nsp)]
    idx = 0
    for a in range(nsp):
        for b in range(a, nsp):
            if radii:
                pp = VdWSpec(type=VDW_SURK, spec1=a, spec2=b,
                             r2cut=rcut * rcut, p0=75.0, p1=8.0,
                             p2=1.0, p3=1.0, use_radii=1)
            else:
                pp = VdWSpec(type=VDW_LJ, spec1=a, spec2=b,
                             r2cut=rcut * rcut, p0=4 * 0.01,
                             p1=3.4 * 3.4, p2=24 * 0.01)
            f.pairpots.append(pp)
            f.vdw_index[a][b] = idx
            f.vdw_index[b][a] = idx
            idx += 1
    f.maxRvdw = rcut
    ctl = ControlSpec(t_step=0.001, n_step=1,
                      tstat=TStatSpec(type=0, temp=100.0),
                      elec=ElecSpec(type=elec, r_real=rcut, alpha=0.3))
    cfg = build_sim_config(ctl, f, (box, box, box), n_atoms,
                           dtype="f32", pos=pos, pair_engine="pallas")
    ff = build_forcefield(f, ctl.t_step, dtype=np.float32)
    types = np.asarray(rng.integers(0, nsp, n_atoms), np.int32)
    rad = (0.577 + 0.1 * rng.uniform(size=n_atoms)).astype(np.float32) \
        if radii else None
    return cfg, ff, (np.asarray(pos, np.float32), types, rad)


@pytest.mark.parametrize("nsp,elec,radii", [(1, 0, False), (1, 0, True),
                                            (2, 1, False), (3, 2, True)])
def test_allpairs_kernel_matches_oracle(nsp, elec, radii):
    cfg, ff, (pos, types, rad) = _clustered_system(
        n_atoms=257, nsp=nsp, elec=elec, radii=radii)
    import jax.numpy as jnp
    pos_j = jnp.asarray(pos)
    types_j = jnp.asarray(types)
    rad_j = jnp.asarray(rad) if rad is not None else None
    pr = jax.jit(lambda p, t: pair_forces_allpairs(
        cfg, ff, p, t, radii=rad_j, interpret=True))(pos_j, types_j)
    orc = ops_pairs.all_pairs_forces(cfg, ff, pos_j, types_j,
                                     radii=rad_j)
    scale = float(np.abs(np.asarray(orc.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(orc.frc),
                               rtol=0, atol=3e-5 * scale)
    assert float(pr.eng_vdw) == pytest.approx(float(orc.eng_vdw),
                                              rel=1e-4, abs=1e-6)
    if elec:
        assert float(pr.eng_coul) == pytest.approx(float(orc.eng_coul),
                                                   rel=1e-4, abs=1e-6)


_FAMILY_PARAMS = {
    # pre-scaled params per family (parse-time conventions of
    # io/field.py:_read_vdw_line; LJ: p0=4e, p1=s^2, p2=24e)
    "lnjs": dict(p0=4 * 0.01, p1=3.4 * 3.4, p2=24 * 0.01),
    "buck": dict(p0=1200.0, p1=0.31, p2=27.88),
    "p746": dict(p0=100.0, p1=5.0, p2=20.0),
    "bmhs": dict(p0=300.0, p1=3.0, p2=2.5, p3=50.0, p4=100.0),
    "elin": dict(p0=500.0, p1=0.30, p2=2.0),
    "einv": dict(p0=500.0, p1=0.30, p2=5.0),
}


@pytest.mark.parametrize("fam", sorted(_FAMILY_PARAMS))
def test_allpairs_kernel_every_vdw_family(fam):
    """Every VdW family through the dense Pallas kernel vs the oracle.

    Regression: the kernel's buck/elin/einv exponent used
    exp(-r * rho) where the engine convention stores p1 = rho and
    evaluates exp(-r / rho) (ops/vdw.py:_safe) — a 10^5x energy error
    on any Buckingham deck (examples/ejump_redox) that the LJ/Surkov
    fixtures never exercised."""
    import jax.numpy as jnp
    from aztotmd_tpu import units
    from aztotmd_tpu.core.config import build_sim_config
    from aztotmd_tpu.core.ffield import build_forcefield
    from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
    from aztotmd_tpu.io.field import (_VDW_ABBR, FieldSpec, SpeciesSpec,
                                      VdWSpec)

    rng = np.random.default_rng(5)
    box = 24.0
    n_side = 7
    g = (np.arange(n_side) + 0.5) * (box / n_side)
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    pos += rng.uniform(-0.5, 0.5, pos.shape)          # min sep ~2.4 A
    n = len(pos)
    f = FieldSpec()
    f.species = [SpeciesSpec(name="S0", nuclei=0,
                             mass=39.9 * units.M_SCALE, charge=0.0,
                             energy=0.0)]
    f.nnames = ["S0"]
    f.nnumbers = [0]
    rcut = 5.0
    pp = VdWSpec(type=_VDW_ABBR[fam], spec1=0, spec2=0,
                 r2cut=rcut * rcut, **_FAMILY_PARAMS[fam])
    f.pairpots = [pp]
    f.vdw_index = [[0]]
    f.maxRvdw = rcut
    ctl = ControlSpec(t_step=0.001, n_step=1,
                      tstat=TStatSpec(type=0, temp=100.0),
                      elec=ElecSpec(type=0, r_real=rcut))
    cfg = build_sim_config(ctl, f, (box, box, box), n,
                           dtype="f32", pos=pos, pair_engine="pallas")
    ff = build_forcefield(f, ctl.t_step, dtype=np.float32)
    pos_j = jnp.asarray(pos, jnp.float32)
    types_j = jnp.zeros((n,), jnp.int32)
    pr = jax.jit(lambda p, t: pair_forces_allpairs(
        cfg, ff, p, t, interpret=True))(pos_j, types_j)
    orc = ops_pairs.all_pairs_forces(cfg, ff, pos_j, types_j)
    scale = float(np.abs(np.asarray(orc.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(orc.frc),
                               rtol=0, atol=3e-5 * scale)
    assert float(pr.eng_vdw) == pytest.approx(float(orc.eng_vdw),
                                              rel=1e-4, abs=1e-6)
    assert abs(float(orc.eng_vdw)) > 1e-3      # family actually active


def test_allpairs_multitile_accumulation():
    """N spanning several (T, T) tiles exercises the j-axis revisiting
    accumulation path."""
    cfg, ff, (pos, types, rad) = _clustered_system(n_atoms=700)
    import jax.numpy as jnp
    pos_j = jnp.asarray(pos)
    types_j = jnp.asarray(types)
    pr = jax.jit(lambda p, t: pair_forces_allpairs(
        cfg, ff, p, t, interpret=True, tile=256))(pos_j, types_j)
    orc = ops_pairs.all_pairs_forces(cfg, ff, pos_j, types_j)
    scale = float(np.abs(np.asarray(orc.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(orc.frc),
                               rtol=0, atol=3e-5 * scale)
    assert float(pr.eng_vdw) == pytest.approx(float(orc.eng_vdw),
                                              rel=1e-4)


def test_stacked_pallas_kernel_matches_block():
    """The stacked cell-block Pallas kernel against the XLA block
    engine on a uniform deck (dispatcher must NOT reroute: block cost
    below padded N^2)."""
    from aztotmd_tpu.ops.cellblock import pair_forces_block
    from aztotmd_tpu.systems import build_lj_argon
    cfg, ff, state, aux = build_lj_argon(n_atoms=2048, density=0.012,
                                         dtype="f32", seed=17)
    from aztotmd_tpu.ops.cellblock import make_block_grid
    grid = make_block_grid(cfg.box, cfg.r_max, cfg.n_at,
                           pos=np.asarray(state.pos))
    cfg = dataclasses.replace(cfg, grid=grid, pair_engine="pallas")
    pr = jax.jit(lambda p, t: pair_forces_pallas(
        cfg, ff, p, t, interpret=True))(state.pos, state.types)
    orc = pair_forces_block(cfg, ff, state.pos, state.types)
    scale = float(np.abs(np.asarray(orc.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(orc.frc),
                               rtol=0, atol=3e-5 * scale)
    assert float(pr.eng_vdw) == pytest.approx(float(orc.eng_vdw),
                                              rel=1e-4)


def test_cs2_deck_selects_pallas_allpairs():
    """The auto-select must route case study 2 (clustered Surkov deck)
    to the pallas engine, whose dispatcher picks the dense kernel."""
    from aztotmd_tpu.runtime.setup import load_deck_dir
    sysd = load_deck_dir("/root/reference/case study 2", dtype="f32")
    cfg = sysd["cfg"]
    assert cfg.pair_engine == "pallas"
    from aztotmd_tpu.ops.pallas_pair import allpairs_cost
    g = cfg.grid
    assert allpairs_cost(cfg) < len(g.stencil) * g.cap * g.cap * g.n_cell


def test_allpairs_reactive_candidates_match_gather_engine():
    """Fused bind/jump candidate registration inside the dense kernel
    must reproduce the gather engine's per-role nearest candidates
    (try_to_bind/try_to_jump, cuPairs.cu:117-167)."""
    import jax.numpy as jnp
    from aztotmd_tpu.io.atoms import AtomsData
    from aztotmd_tpu.io.control import (ControlSpec, ElecSpec, TStatSpec,
                                        ELEC_DIRECT, JUMP_EQ)
    from aztotmd_tpu.io.field import parse_field
    from aztotmd_tpu.runtime.setup import build_system
    from aztotmd_tpu.ops.pairs import pair_forces as gather_pair

    rng = np.random.default_rng(11)
    n = 260
    box = 22.0
    pos = rng.uniform(0.5, 21.5, size=(n, 3))
    names = [("A" if k % 3 == 0 else ("B" if k % 3 == 1 else "C"))
             for k in range(n)]
    fld = parse_field("""
spec 3
A\tA\t39.9\t1.0\t0.0
B\tB\t39.9\t-1.0\t0.0
C\tC\t39.9\t0.5\t0.0
red-ox 1
2 A B
vdw 2
A\tB\tlnjs\t4.0\t0.01\t2.5
A\tA\tlnjs\t4.0\t0.01\t2.8
linkage 1
A\tC\thrm\t1.2\t2.0\t3.0\t1.4
""")
    ctl = ControlSpec(t_step=0.001, n_step=1,
                      tstat=TStatSpec(type=0, temp=100.0),
                      elec=ElecSpec(type=ELEC_DIRECT, r_real=5.0))
    ctl.ejump = 1
    ctl.ejtype = JUMP_EQ
    ctl.d_ejump = 1.0
    ctl.r_elec = 4.0
    atoms = AtomsData(names=names, pos=pos, box=(box, box, box))
    cfg, ff, state, aux = build_system(ctl, fld, atoms, dtype="f32",
                                       seed=3)
    args = dict(radii=None, parents=state.parents,
                want_bind=bool(cfg.use_bnd == 2), want_jump=True)
    pr = jax.jit(lambda p, t: pair_forces_allpairs(
        cfg, ff, p, t, interpret=True, **args))(state.pos, state.types)
    orc = gather_pair(cfg, ff, state.pos, state.types, **args)
    scale = float(np.abs(np.asarray(orc.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(orc.frc),
                               rtol=0, atol=3e-5 * scale)
    np.testing.assert_array_equal(np.asarray(pr.jump_idx),
                                  np.asarray(orc.jump_idx))
    if args["want_bind"]:
        np.testing.assert_array_equal(np.asarray(pr.bind_idx),
                                      np.asarray(orc.bind_idx))
    # at least some real candidates in this geometry
    assert int(np.sum(np.asarray(pr.jump_idx) < cfg.n_at)) > 5
