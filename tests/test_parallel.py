"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aztotmd_tpu.parallel import make_mesh, make_sharded_step
from aztotmd_tpu.runtime.step import make_step
from aztotmd_tpu.systems import build_lj_argon


def test_sharded_step_matches_single_device():
    """The atom-sharded step over 8 devices must produce the same physics
    as the single-device step (pure data-parallel decomposition)."""
    cfg, ff, state, aux = build_lj_argon(n_atoms=512, density=0.012,
                                         dtype="f64", seed=11)
    step = jax.jit(make_step(cfg, aux))
    ref = step(state, ff)

    mesh = make_mesh(8)
    sstep, sstate, sff = make_sharded_step(cfg, aux, mesh, state, ff,
                                           donate=False)
    out = sstep(sstate, sff)

    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.frc), np.asarray(ref.frc),
                               rtol=1e-9, atol=1e-11)
    assert float(out.energies.tot) == pytest.approx(
        float(ref.energies.tot), rel=1e-10)


def test_sharded_multi_step_runs():
    cfg, ff, state, aux = build_lj_argon(n_atoms=256, density=0.012,
                                         dtype="f64", seed=3)
    mesh = make_mesh(4)
    sstep, sstate, sff = make_sharded_step(cfg, aux, mesh, state, ff)
    for _ in range(5):
        sstate = sstep(sstate, sff)
    assert int(sstate.step) == 5
    assert bool(jnp.all(jnp.isfinite(sstate.pos)))


def test_domain_decomposition_matches_all_pairs():
    """shard_map x-slab decomposition with ppermute halo exchange must
    reproduce the all-pairs oracle forces and energy."""
    import dataclasses
    from aztotmd_tpu.ops import pairs as ops_pairs
    from aztotmd_tpu.ops.cellblock import make_block_grid
    from aztotmd_tpu.parallel.domain import pair_forces_domain

    cfg, ff, state, aux = build_lj_argon(n_atoms=512, density=0.012,
                                         dtype="f64", seed=21)
    # block grid with ncx divisible by the mesh size
    grid = make_block_grid(cfg.box, cfg.r_max, cfg.n_at)
    assert grid.dims[0] % 4 == 0 or grid.dims[0] >= 4
    ncx = (grid.dims[0] // 4) * 4
    grid = dataclasses.replace(grid, dims=(max(ncx, 4),) + grid.dims[1:],
                               edge=(cfg.box[0] / max(ncx, 4),)
                               + grid.edge[1:])
    dcfg = dataclasses.replace(cfg, grid=grid)

    mesh = make_mesh(4, axis="x")
    frc, e_vdw, e_coul = jax.jit(
        lambda p, t: pair_forces_domain(dcfg, ff, p, t, mesh))(
        state.pos, state.types)
    pr = ops_pairs.all_pairs_forces(cfg, ff, state.pos, state.types)
    np.testing.assert_allclose(np.asarray(frc), np.asarray(pr.frc),
                               rtol=1e-9, atol=1e-11)
    assert float(e_vdw) == pytest.approx(float(pr.eng_vdw), rel=1e-10)
