"""Unit guards for the fused sorted neighbor pipeline
(ops/neighbors.build_neighbors_keys + prefix_refine): same neighbor
SETS as the fallback two-gather pipeline, nearest-first ordering, and
prefix_refine == refine_neighbors at the build positions.
"""

import dataclasses

import numpy as np
import pytest

from aztotmd_tpu.ops import neighbors as nbr
from test_pairs import lj_control, lj_field, make_cfg


def _rand_system(n=600, box=80.0, seed=7):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, size=(n, 3))
    cfg = make_cfg(n, box, lj_field(rcut=4.0), lj_control(box),
                   dtype="f32", pos=pos, pair_engine="neighbor")
    return cfg, pos.astype(np.float32)


def test_fused_sorted_build_matches_fallback_sets():
    cfg, pos = _rand_system()
    assert nbr.sorted_build_ok(cfg), "test system should take the fused path"
    idx_f, nmax_f, occ_f = nbr.build_neighbors(cfg, pos)

    # force the fallback two-gather pipeline: shrink M past the fused
    # threshold is not possible without changing the grid, so lower the
    # threshold instead by faking a big n_at check via monkey path:
    # easiest honest fallback = top_k branch with K<=32 on the same cfg
    import jax.numpy as jnp
    from aztotmd_tpu.ops import cell_list as cl
    from aztotmd_tpu.ops.pairs import min_image
    gcfg = dataclasses.replace(cfg, grid=cfg.nb_grid)
    coords = cl.cell_coords(gcfg, pos)
    table, occ_o = cl.build_cell_table(gcfg, pos)
    cand = cl.gather_candidates(gcfg, table, coords)
    pos_p = jnp.concatenate([jnp.asarray(pos),
                             jnp.zeros((1, 3), jnp.float32)], axis=0)
    delta = min_image(jnp.asarray(pos)[:, None, :] - pos_p[cand], cfg)
    r2 = jnp.sum(delta * delta, axis=-1)
    own = jnp.arange(cfg.n_at, dtype=jnp.int32)[:, None]
    r_nb = cfg.r_max + cfg.nb_skin
    mask = np.asarray((cand != cfg.n_at) & (cand != own)
                      & (r2 <= r_nb * r_nb))
    cand = np.asarray(cand)

    N, K = cfg.n_at, cfg.n_neigh
    idx_f = np.asarray(idx_f)
    assert int(occ_f) == int(occ_o)
    for i in range(N):
        want = set(cand[i][mask[i]])
        got = set(x for x in idx_f[i] if x < N)
        if len(want) <= K:
            assert got == want, f"row {i}"
        else:
            # capacity overflow keeps the NEAREST K
            assert got <= want and len(got) == K
    # overflow monitor = max true in-reach count
    assert int(nmax_f) == int(mask.sum(axis=1).max())


def test_fused_rows_are_nearest_first():
    cfg, pos = _rand_system(seed=11)
    idx, skey, nmax, _ = nbr.build_neighbors_keys(cfg, pos)
    skey = np.asarray(skey)
    # keys ascend along each row (inf padding clipped: inf-inf = nan)
    finite = np.where(np.isfinite(skey), skey, np.float32(3e38))
    assert (np.diff(finite, axis=1) >= 0).all()
    # keys match recomputed distances for real entries
    idx = np.asarray(idx)
    box = np.asarray(cfg.box)
    for i in (0, 1, 17, 100):
        for k, j in enumerate(idx[i]):
            if j >= cfg.n_at:
                continue
            d = pos[i] - pos[j]
            d -= box * np.round(d / box)
            assert np.isclose(skey[i, k], (d * d).sum(), rtol=1e-5)


def test_prefix_refine_matches_refine_neighbors():
    cfg, pos = _rand_system(seed=23)
    # give the config a two-level-ish split: refine to a smaller reach
    inner_K = 8
    icfg = dataclasses.replace(cfg, n_neigh=inner_K, nb_skin=0.5)
    idx2, skey, _, _ = nbr.build_neighbors_keys(cfg, pos)
    a_idx, a_max = nbr.refine_neighbors(icfg, pos, idx2)
    b_idx, b_max = nbr.prefix_refine(idx2, skey,
                                     icfg.r_max + icfg.nb_skin,
                                     inner_K, cfg.n_at)
    a = np.sort(np.asarray(a_idx), axis=1)
    b = np.sort(np.asarray(b_idx), axis=1)
    assert np.array_equal(a, b)
    assert int(a_max) == int(b_max)
