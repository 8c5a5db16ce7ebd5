"""Roll-based cell-block pair engine vs the all-pairs oracle and the
gather engine."""

import dataclasses

import jax
import numpy as np
import pytest

from aztotmd_tpu.ops import cellblock, pairs as ops_pairs
from aztotmd_tpu.systems import build_lj_argon


def _system(n=256, density=0.012, dtype="f64", seed=2, **kw):
    return build_lj_argon(n_atoms=n, density=density, dtype=dtype,
                          seed=seed, **kw)


def test_block_matches_all_pairs():
    cfg, ff, state, aux = _system()
    pr_b = jax.jit(lambda p, t: cellblock.pair_forces_block(
        cfg, ff, p, t))(state.pos, state.types)
    pr_o = ops_pairs.all_pairs_forces(cfg, ff, state.pos, state.types)
    np.testing.assert_allclose(np.asarray(pr_b.frc), np.asarray(pr_o.frc),
                               rtol=1e-10, atol=1e-12)
    assert float(pr_b.eng_vdw) == pytest.approx(float(pr_o.eng_vdw),
                                                rel=1e-12)


def test_block_matches_gather_engine():
    cfg, ff, state, aux = _system(n=500, seed=9)
    gcfg = dataclasses.replace(cfg, pair_engine="gather")
    pr_b = jax.jit(lambda p, t: cellblock.pair_forces_block(
        cfg, ff, p, t))(state.pos, state.types)
    pr_g = jax.jit(lambda p, t: ops_pairs.pair_forces(
        gcfg, ff, p, t))(state.pos, state.types)
    np.testing.assert_allclose(np.asarray(pr_b.frc), np.asarray(pr_g.frc),
                               rtol=1e-10, atol=1e-12)
    assert float(pr_b.eng_vdw) == pytest.approx(float(pr_g.eng_vdw),
                                                rel=1e-12)


def test_block_grid_occupancy():
    from aztotmd_tpu.ops.cellblock import make_block_grid
    # dilute case-study-1 geometry: the block grid must keep cells full
    g = make_block_grid((1141.5, 1141.5, 1141.5), 4.0, 40000)
    assert g.n_cell <= 40000
    assert len(g.stencil) == 27
    # dense liquid: edge ~ rcut
    g2 = make_block_grid((70.0, 70.0, 70.0), 4.0, 4096)
    assert all(e >= 4.0 for e in g2.edge)


def test_block_full_step_matches_gather_step():
    """Whole MD step identical under both engines (f64)."""
    from aztotmd_tpu.runtime.step import make_step
    cfg, ff, state, aux = _system(n=216, seed=4)
    gcfg = dataclasses.replace(cfg, pair_engine="gather")
    s_b = jax.jit(make_step(cfg, aux))(state, ff)
    s_g = jax.jit(make_step(gcfg, aux))(state, ff)
    np.testing.assert_allclose(np.asarray(s_b.pos), np.asarray(s_g.pos),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s_b.frc), np.asarray(s_g.frc),
                               rtol=1e-9, atol=1e-12)
    assert float(s_b.energies.tot) == pytest.approx(
        float(s_g.energies.tot), rel=1e-10)


def test_neighbor_engine_matches_all_pairs_over_steps():
    """Verlet-list engine: forces match the all-pairs oracle at rebuild
    AND between rebuilds (list stays valid within the skin)."""
    import jax.numpy as jnp
    from aztotmd_tpu.runtime.step import make_step
    cfg, ff, state, aux = _system(n=343, density=0.015, seed=13)
    assert cfg.pair_engine == "neighbor"
    step = jax.jit(make_step(cfg, aux))
    for k in range(cfg.nb_rebuild + 3):     # crosses one rebuild boundary
        state = step(state, ff)
        pr_o = ops_pairs.all_pairs_forces(cfg, ff, state.pos, state.types)
        # state.frc holds the pair forces of the step just taken
        np.testing.assert_allclose(np.asarray(state.frc),
                                   np.asarray(pr_o.frc),
                                   rtol=1e-9, atol=1e-11)
    assert int(state.nbr_viol) == 0
    assert int(state.nbr_over) <= cfg.n_neigh
