"""Attribute the cs1 ring overhead for the ACTUAL production cadence
(rdf_from_outer superblocks, runner.py:_build_programs ring plan):

  one 800-step superblock (k_super=4 stat periods) =
      full rebuild (outer candidate pass + inner refine)
    + 16 x [inner refine + 50 steps + rdf_sample_list on nbr2]
    + 4 stat rows

Ingredients timed on the real TPU, >=10 pipelined calls per
measurement so the ~30-100 ms tunnel round trip amortizes out:

  steps50_refine  inner refine + 50 steps (the ring sub-block)
  rebuild         rebuild_neighbors_state (full outer+inner pass)
  rdf_sample      rdf_sample_list on the (N, n_neigh2) outer list
  stat_row        the on-device stat row builder
  superblock      the composed 800-step superblock
  ring20          the production ring program, 20 samples (4000 steps)

Run: timeout 1200 python tools/bench_ring_super.py  (TPU, serial, bg)
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=12, steps=None):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    per = f"  ({ms / steps * 1e3:.1f} us/step)" if steps else ""
    print(f"{name}: {ms:.3f} ms/call{per}", file=sys.stderr)
    return ms


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import (
        make_multi_step, make_step, refine_neighbors_state,
        rebuild_neighbors_state)
    from aztotmd_tpu.runtime import statring
    from aztotmd_tpu.ops import rdf as R

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    cfg, state, ctl, ff, aux = (sysd["cfg"], sysd["state"], sysd["ctl"],
                                sysd["ff"], sysd["aux"])
    fld = sysd["fld"]
    N = cfg.n_at
    p_stat, p_rdf = ctl.stat, ctl.fr_rdf
    print(f"N={N} p_stat={p_stat} p_rdf={p_rdf} engine={cfg.pair_engine} "
          f"nb_outer={cfg.nb_outer} nb_rebuild={cfg.nb_rebuild} "
          f"n_neigh2={cfg.n_neigh2}", file=sys.stderr)

    pos_h = np.asarray(sysd["atoms"].pos, np.float64)
    m_min = min([sp.mass for sp in fld.species if sp.mass > 0], default=0.0)
    rcfg = R.make_rdf_config(ctl, cfg, pos=pos_h, m_min=m_min)
    types_h = np.array([fld.spec_id(nm) for nm in sysd["atoms"].names],
                       np.int32)
    spec_counts0 = np.bincount(types_h, minlength=cfg.n_spec)
    spec_nuclei = jnp.asarray(
        np.array([s.nuclei for s in fld.species], np.int32))
    nucl_number = jnp.asarray(np.ones(max(cfg.n_nucl, 1), np.int32))
    hist, nhist = R.zero_hist(rcfg)
    print(f"rdf: n_bin={rcfg.n_bin} n_pair={rcfg.n_pair} "
          f"r_rdf={np.sqrt(rcfg.r2_max):.2f}", file=sys.stderr)

    # warm the state: one full rebuild so lists exist
    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))

    # --- ingredient: inner refine + 50 steps (ring sub-block) ---
    step1 = make_step(cfg, aux, nbr_auto_rebuild=False)

    def base_refine(s, n=50):
        s = refine_neighbors_state(cfg, s)

        def inner(s_, _):
            return step1(s_, ff), None
        s, _ = jax.lax.scan(inner, s, None, length=n)
        return s
    f_refine = jax.jit(base_refine)
    t_refine = timeit("steps50_refine", f_refine, state, steps=50)

    # --- ingredient: full rebuild (outer candidate pass + inner) ---
    f_rb = jax.jit(lambda s: rebuild_neighbors_state(cfg, s))
    t_rb = timeit("rebuild", f_rb, state)

    # --- ingredient: RDF sample straight off the outer list ---
    f_rdf = jax.jit(lambda s, h, nh: R.rdf_sample_list(
        cfg, rcfg, s.pos, s.types, s.spec_number, spec_nuclei,
        nucl_number, s.nbr2_idx, h, nh))
    t_rdf = timeit("rdf_sample", f_rdf, state, hist, nhist)

    # --- ingredient: stat row ---
    stat_row = statring.make_stat_row(cfg, spec_counts0)
    f_row = jax.jit(stat_row)
    t_row = timeit("stat_row", f_row, state)

    # --- composed: one superblock exactly as the ring builds it ---
    k_super = 4
    n_sub = p_stat // p_rdf

    def stat_block(s, h, nh):
        nbr = s.nbr2_idx

        def body(c, _):
            s, h, nh = c
            s = base_refine(s, p_rdf)
            h, nh = R.rdf_sample_list(cfg, rcfg, s.pos, s.types,
                                      s.spec_number, spec_nuclei,
                                      nucl_number, nbr, h, nh)
            return (s, h, nh), None
        (s, h, nh), _ = jax.lax.scan(body, (s, h, nh), None, length=n_sub)
        return s, h, nh

    def superblock(s, h, nh):
        s = rebuild_neighbors_state(cfg, s)

        def body(c, _):
            s, h, nh = c
            s, h, nh = stat_block(s, h, nh)
            return (s, h, nh), stat_row(s)
        (s, h, nh), rows = jax.lax.scan(body, (s, h, nh), None,
                                        length=k_super)
        return s, h, nh, rows
    f_sup = jax.jit(superblock)
    t_sup = timeit("superblock800", f_sup, state, hist, nhist,
                   steps=k_super * p_stat)

    # --- composed: the ring, 5 superblocks (4000 steps) ---
    def ring(s, h, nh, n_sup: int):
        def body(c, _):
            s, h, nh = c
            s, h, nh, rows = superblock(s, h, nh)
            return (s, h, nh), rows
        (s, h, nh), rows = jax.lax.scan(body, (s, h, nh), None,
                                        length=n_sup)
        return s, h, nh, rows
    f_ring = jax.jit(ring, static_argnums=3)
    t_ring = timeit("ring5x800", lambda s, h, nh: f_ring(s, h, nh, 5),
                    state, hist, nhist, reps=5, steps=5 * k_super * p_stat)

    if t_sup and t_refine:
        acct = (t_rb or 0) + 4 * n_sub * ((t_refine or 0) + (t_rdf or 0)) \
            + 4 * (t_row or 0)
        print(f"\naccounting for one 800-step superblock:", file=sys.stderr)
        print(f"  rebuild {t_rb:.1f} + 16*(sub {t_refine:.1f} + "
              f"rdf {t_rdf:.1f}) + 4*row {t_row:.2f} = {acct:.1f} ms "
              f"(measured superblock {t_sup:.1f}, ring/800 "
              f"{(t_ring or 0) / 5:.1f})", file=sys.stderr)
        print(f"  e2e measured 447.8 us/step = 358.2 ms/800",
              file=sys.stderr)


if __name__ == "__main__":
    main()
