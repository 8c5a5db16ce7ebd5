"""Morton block-sparse Pallas pair engine (ops.pallas_sparse) tests.

Interpret mode on CPU, cross-checked against the all-pairs oracle and
the gather engine's reactive candidates — the same harness the dense
kernel uses (tests/test_pallas.py), extended with the sparse-specific
hazards: worklist truncation, periodic AABB gaps across the box wrap,
and the multi-cluster geometry that motivates the engine.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aztotmd_tpu.ops import pairs as ops_pairs
from aztotmd_tpu.ops.pallas_sparse import (estimate_sparse_pairs,
                                           pair_forces_sparse)
from test_pallas import _clustered_system


def _multi_cluster_system(n_atoms=1500, n_clusters=5, nsp=2, elec=1,
                          box=120.0, seed=7, radii=False):
    """Several dense clusters scattered in a large periodic box — the
    regime where the worklist is SPARSE (most tile pairs are out of
    range) and where cell decompositions pay cap^2 on empty space.
    One cluster straddles the box corner to exercise the periodic
    min-image AABB gap."""
    from aztotmd_tpu import units
    from aztotmd_tpu.core.config import build_sim_config
    from aztotmd_tpu.core.ffield import build_forcefield
    from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
    from aztotmd_tpu.io.field import (VDW_LJ, VDW_SURK, FieldSpec,
                                      SpeciesSpec, VdWSpec)

    rng = np.random.default_rng(seed)
    centers = rng.uniform(10.0, box - 10.0, size=(n_clusters, 3))
    centers[0] = (0.5, box - 0.5, 0.5)          # wraps all three axes
    per = n_atoms // n_clusters
    chunks = [centers[k] + rng.uniform(-6.0, 6.0, size=(per, 3))
              for k in range(n_clusters)]
    rest = n_atoms - per * n_clusters
    if rest:
        chunks.append(rng.uniform(0.0, box, size=(rest, 3)))
    pos = np.concatenate(chunks) % box

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
                           dtype="f32", pos=pos, pair_engine="sparse")
    ff = build_forcefield(f, ctl.t_step, dtype=np.float32)
    types = np.asarray(rng.integers(0, nsp, n_atoms), np.int32)
    rad = (0.577 + 0.1 * rng.uniform(size=n_atoms)).astype(np.float32) \
        if radii else None
    return cfg, ff, (np.asarray(pos, np.float32), types, rad)


def _assert_matches(pr, orc, elec):
    scale = float(np.abs(np.asarray(orc.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(orc.frc),
                               rtol=0, atol=3e-5 * scale)
    assert float(pr.eng_vdw) == pytest.approx(float(orc.eng_vdw),
                                              rel=1e-4, abs=1e-6)
    if elec:
        assert float(pr.eng_coul) == pytest.approx(float(orc.eng_coul),
                                                   rel=1e-4, abs=1e-6)


@pytest.mark.parametrize("nsp,elec,radii", [(1, 0, False), (2, 1, False),
                                            (3, 2, True)])
def test_sparse_matches_oracle_multi_cluster(nsp, elec, radii):
    cfg, ff, (pos, types, rad) = _multi_cluster_system(
        n_atoms=1500, nsp=nsp, elec=elec, radii=radii)
    pos_j, types_j = jnp.asarray(pos), jnp.asarray(types)
    rad_j = jnp.asarray(rad) if rad is not None else None
    pr = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, radii=rad_j, interpret=True, tile=128))(
        pos_j, types_j)
    orc = ops_pairs.all_pairs_forces(cfg, ff, pos_j, types_j, radii=rad_j)
    _assert_matches(pr, orc, elec)
    # the worklist really dropped tile pairs (full sparsity shows at
    # larger N — 12 tiles over 5 clusters stay fairly coupled)
    n_t = 1536 // 128
    assert int(pr.max_occ) < (8 * n_t * n_t) // 10


def test_sparse_matches_oracle_single_cluster():
    """The cs2-like regime at a size the dense kernel would still
    handle — the two engines must agree bit-for-bit in their shared
    physics (same _tile_physics body)."""
    cfg, ff, (pos, types, rad) = _clustered_system(n_atoms=700, nsp=2,
                                                   elec=1)
    pos_j, types_j = jnp.asarray(pos), jnp.asarray(types)
    pr = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, interpret=True, tile=128))(pos_j, types_j)
    orc = ops_pairs.all_pairs_forces(cfg, ff, pos_j, types_j)
    _assert_matches(pr, orc, True)


def test_sparse_tile_sizes_agree():
    """tile=128 and tile=256 partition the Morton order differently but
    must produce identical physics."""
    cfg, ff, (pos, types, rad) = _multi_cluster_system(n_atoms=1100,
                                                       nsp=1, elec=0)
    pos_j, types_j = jnp.asarray(pos), jnp.asarray(types)
    pr1 = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, interpret=True, tile=128))(pos_j, types_j)
    pr2 = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, interpret=True, tile=256))(pos_j, types_j)
    scale = float(np.abs(np.asarray(pr1.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr1.frc), np.asarray(pr2.frc),
                               rtol=0, atol=2e-5 * scale)
    assert float(pr1.eng_vdw) == pytest.approx(float(pr2.eng_vdw),
                                               rel=1e-5)


def test_sparse_worklist_estimate_matches_kernel_monitor():
    cfg, ff, (pos, types, rad) = _multi_cluster_system(n_atoms=1500,
                                                       nsp=1, elec=0)
    est = estimate_sparse_pairs(cfg.box, cfg.r_max, pos, 128)
    pr = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, interpret=True, tile=128))(
        jnp.asarray(pos), jnp.asarray(types))
    assert int(pr.max_occ) == est


def test_sparse_truncation_is_monitored():
    """A too-small pair_cap must surface the REQUIRED count in max_occ
    (the runner's regrow trigger) — never a silent loss."""
    cfg, ff, (pos, types, rad) = _multi_cluster_system(n_atoms=1100,
                                                       nsp=1, elec=0)
    full = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, interpret=True, tile=128))(
        jnp.asarray(pos), jnp.asarray(types))
    need = int(full.max_occ)
    cut = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, interpret=True, tile=128,
        pair_cap=max(need // 2, 16)))(
        jnp.asarray(pos), jnp.asarray(types))
    assert int(cut.max_occ) == need          # monitor sees the truth
    # and the truncated forces really differ (the monitor matters)
    assert not np.allclose(np.asarray(cut.frc), np.asarray(full.frc))
    # truncation must degrade to the block engine's failure mode —
    # bounded finite errors (unvisited tiles masked to zero), never
    # uninitialized-buffer garbage/NaN
    assert np.all(np.isfinite(np.asarray(cut.frc)))
    assert np.isfinite(float(cut.eng_vdw))


def test_sparse_f64_falls_back_to_block_engine():
    """f64 validation mode must route to the XLA block engine (Mosaic
    kernels compute f32); max_occ then carries CELL occupancy, which
    the runner compares against grid.cap, not sparse_pair_cap."""
    from aztotmd_tpu.ops.cellblock import pair_forces_block
    cfg, ff, (pos, types, rad) = _multi_cluster_system(
        n_atoms=400, n_clusters=3, box=60.0, nsp=1, elec=0)
    p64 = jnp.asarray(pos, jnp.float64)
    t = jnp.asarray(types)
    pr = pair_forces_sparse(cfg, ff, p64, t)
    orc = pair_forces_block(cfg, ff, p64, t)
    np.testing.assert_array_equal(np.asarray(pr.frc), np.asarray(orc.frc))
    assert int(pr.max_occ) == int(orc.max_occ)


def test_sparse_reactive_candidates_match_gather_engine():
    """Fused bind/jump candidates (per-role nearest, parent exclusion)
    through the sparse kernel vs the gather engine — mirrors the dense
    kernel's test (try_to_bind/try_to_jump, cuPairs.cu:117-167)."""
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
    pr = jax.jit(lambda p, t: pair_forces_sparse(
        cfg, ff, p, t, interpret=True, tile=128, **args))(
        state.pos, state.types)
    orc = gather_pair(cfg, ff, state.pos, state.types, **args)
    scale = float(np.abs(np.asarray(orc.frc)).max()) or 1.0
    np.testing.assert_allclose(np.asarray(pr.frc), np.asarray(orc.frc),
                               rtol=0, atol=3e-5 * scale)
    np.testing.assert_array_equal(np.asarray(pr.jump_idx),
                                  np.asarray(orc.jump_idx))
    if args["want_bind"]:
        np.testing.assert_array_equal(np.asarray(pr.bind_idx),
                                      np.asarray(orc.bind_idx))
    assert int(np.sum(np.asarray(pr.jump_idx) < cfg.n_at)) > 5


def test_sparse_step_trajectory_matches_block_engine():
    """The sparse engine through the FULL jitted multi-step scan vs the
    XLA block engine: same trajectory within f32 force tolerance over a
    short NVE run (integration-level guard: Morton sort/unsort + the
    worklist path sit inside the scanned step here)."""
    from aztotmd_tpu.ops.cellblock import make_block_grid
    from aztotmd_tpu.runtime.step import make_multi_step
    from aztotmd_tpu.systems import build_lj_argon

    cfg, ff, state, aux = build_lj_argon(n_atoms=600, density=0.018,
                                         dtype="f32", seed=23)
    grid = make_block_grid(cfg.box, cfg.r_max, cfg.n_at,
                           pos=np.asarray(state.pos))
    cfg_b = dataclasses.replace(cfg, grid=grid, pair_engine="block")
    cfg_s = dataclasses.replace(cfg, grid=grid, pair_engine="sparse",
                                sparse_tile=128, sparse_pair_cap=0)
    n = 20
    sb = make_multi_step(cfg_b, aux, jit=True)(state, ff, n)
    ss = make_multi_step(cfg_s, aux, jit=True)(state, ff, n)
    pb, ps = np.asarray(sb.pos), np.asarray(ss.pos)
    np.testing.assert_allclose(ps, pb, rtol=0, atol=1e-3)
    assert float(ss.energies.tot) == pytest.approx(
        float(sb.energies.tot), rel=1e-4)


def test_sparse_step_atom_sharded_mesh_matches_single_device():
    """The sparse engine under the 8-device atom-sharded mesh
    (parallel/mesh.py: XLA propagates shardings through the unchanged
    step) must reproduce the single-device step exactly."""
    import jax.numpy as jnp
    from aztotmd_tpu.parallel.mesh import make_mesh, make_sharded_step
    from aztotmd_tpu.runtime.step import make_step

    cfg, ff, (pos, types, rad) = _multi_cluster_system(
        n_atoms=1536, nsp=2, elec=1)
    from aztotmd_tpu.core.state import init_state
    state = init_state(cfg, jnp.asarray(types), jnp.asarray(pos))
    st1 = jax.jit(make_step(cfg, None))(state, ff)
    mesh = make_mesh(8)
    step, st, ffs = make_sharded_step(cfg, None, mesh, state, ff)[:3]
    st2 = step(st, ffs)
    np.testing.assert_array_equal(np.asarray(st1.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(st1.frc), np.asarray(st2.frc))
    assert float(st1.energies.tot) == float(st2.energies.tot)


def test_sparse_auto_selected_for_large_clustered_deck():
    """build_sim_config must route a big multi-cluster system (past the
    dense kernel's N^2 sweet spot, with a cap-poisoned block grid) to
    the sparse engine and size its worklist capacity."""
    cfg, ff, (pos, types, rad) = _multi_cluster_system(
        n_atoms=9000, n_clusters=8, nsp=1, elec=0, box=200.0)
    from aztotmd_tpu.core.config import build_sim_config
    # rebuild with auto selection
    from aztotmd_tpu import units
    from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
    from aztotmd_tpu.io.field import VDW_LJ, FieldSpec, SpeciesSpec, VdWSpec
    f = FieldSpec()
    f.species = [SpeciesSpec(name="S0", nuclei=0,
                             mass=39.9 * units.M_SCALE, charge=0.0,
                             energy=0.0)]
    f.nnames = ["S0"]
    f.nnumbers = [0]
    rcut = 5.0
    f.pairpots = [VdWSpec(type=VDW_LJ, spec1=0, spec2=0,
                          r2cut=rcut * rcut, p0=4 * 0.01, p1=3.4 * 3.4,
                          p2=24 * 0.01)]
    f.vdw_index = [[0]]
    f.maxRvdw = rcut
    ctl = ControlSpec(t_step=0.001, n_step=1,
                      tstat=TStatSpec(type=0, temp=100.0),
                      elec=ElecSpec(type=0, r_real=rcut))
    acfg = build_sim_config(ctl, f, (200.0,) * 3, len(pos),
                            dtype="f32", pos=pos, pair_engine="auto")
    assert acfg.pair_engine == "sparse"
    assert acfg.sparse_pair_cap > 0
    est = estimate_sparse_pairs(acfg.box, acfg.r_max, pos,
                                acfg.sparse_tile)
    assert acfg.sparse_pair_cap >= est
