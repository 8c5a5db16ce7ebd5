"""Attribute the cs1 ring overhead: bare engine ~0.73 ms/step vs ring
~1.18 ms/step (+0.45 ms/step of sampling machinery).

Times each ring ingredient (runtime/runner.py:_build_programs) at cs1
scale on the real TPU, pipelining >=10 calls per measurement so the
tunnel round trip (~30-100 ms floor) amortizes out:

  steps50_full    make_multi_step 50 steps (FULL rebuild at call start)
  steps50_refine  inner refine + 50 steps (the ring's sub-block)
  cand_pass       build_neighbors(lcfg) — the per-stat-period candidate
                  pass serving RDF + outer Verlet
  refine_outer    top-k refine of the outer list from the RDF list
  rdf_sample      rdf_sample_list on the shared list
  stat_row        the on-device stat row builder
  stat_block200   the composed 200-step stat period
  ring10          the production ring program, 10 samples (2000 steps)

Run: timeout 1200 python tools/bench_ring.py   (TPU, serial, background)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=12, steps=None, donate=False):
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
    from aztotmd_tpu.ops.neighbors import (
        build_neighbors, build_neighbors_keys, prefix_refine,
        refine_neighbors, sorted_build_ok)
    import dataclasses as dc
    import math

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    cfg, state, ctl, ff, aux = (sysd["cfg"], sysd["state"], sysd["ctl"],
                                sysd["ff"], sysd["aux"])
    fld = sysd["fld"]
    N = cfg.n_at
    p_stat, p_rdf = ctl.stat, ctl.fr_rdf
    print(f"N={N} p_stat={p_stat} p_rdf={p_rdf} engine={cfg.pair_engine} "
          f"nb_outer={cfg.nb_outer} nb_rebuild={cfg.nb_rebuild}",
          file=sys.stderr)

    pos_h = np.asarray(sysd["atoms"].pos, np.float64)
    m_min = min([sp.mass for sp in fld.species if sp.mass > 0], default=0.0)
    rcfg = R.make_rdf_config(ctl, cfg, pos=pos_h, m_min=m_min)
    lcfg = R.rdf_list_cfg(cfg, rcfg)
    types_h = np.array([fld.spec_id(nm) for nm in sysd["atoms"].names],
                       np.int32)
    spec_counts0 = np.bincount(types_h, minlength=cfg.n_spec)
    spec_nuclei = jnp.asarray(
        np.array([s.nuclei for s in fld.species], np.int32))
    nucl_number = jnp.asarray(np.ones(max(cfg.n_nucl, 1), np.int32))
    hist, nhist = R.zero_hist(rcfg)

    # warm the state: one full rebuild so lists exist
    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))

    # --- ingredient: 50 steps with full rebuild (bare multi_step) ---
    t_full = timeit("steps50_full", lambda s: base(s, ff, 50), state,
                    steps=50)

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

    # --- ingredient: candidate pass (RDF list build) ---
    f_cand = jax.jit(lambda p: build_neighbors(lcfg, p))
    t_cand = timeit("cand_pass", f_cand, state.pos)

    nbr, _, _ = jax.block_until_ready(f_cand(state.pos))

    # --- ingredient: outer refine from the RDF list ---
    ocfg_view = dc.replace(cfg, n_neigh=cfg.n_neigh2, nb_skin=cfg.nb_skin2)
    f_rout = jax.jit(lambda p, nb: refine_neighbors(ocfg_view, p, nb))
    t_rout = timeit("refine_outer", f_rout, state.pos, nbr)

    # --- ingredient: RDF sample on the shared list ---
    f_rdf = jax.jit(lambda p, h, nh: R.rdf_sample_list(
        cfg, rcfg, p, state.types, state.spec_number, spec_nuclei,
        nucl_number, nbr, h, nh))
    t_rdf = timeit("rdf_sample", f_rdf, state.pos, hist, nhist)

    # --- ingredient: stat row ---
    stat_row = statring.make_stat_row(cfg, spec_counts0)
    f_row = jax.jit(stat_row)
    t_row = timeit("stat_row", f_row, state)

    # --- composed: one stat period exactly as the ring builds it ---
    rdf_covers_outer = (math.sqrt(rcfg.r2_max) + rcfg.skin
                        >= cfg.r_max + cfg.nb_skin2)
    print(f"rdf_covers_outer={rdf_covers_outer}", file=sys.stderr)

    use_sorted = sorted_build_ok(lcfg)
    print(f"use_sorted={use_sorted}", file=sys.stderr)

    def stat_block(s, h, nh):
        if use_sorted:
            nbr_, skey_, nmax_rdf, _ = build_neighbors_keys(lcfg, s.pos)
        else:
            nbr_, nmax_rdf, _ = build_neighbors(lcfg, s.pos)
        s = s.replace(rdf_over=jnp.maximum(s.rdf_over, nmax_rdf))
        if rdf_covers_outer:
            if use_sorted:
                idx2, nmax2 = prefix_refine(
                    nbr_, skey_, cfg.r_max + cfg.nb_skin2,
                    cfg.n_neigh2, cfg.n_at)
            else:
                idx2, nmax2 = refine_neighbors(ocfg_view, s.pos, nbr_)
            s = s.replace(nbr2_idx=idx2,
                          nbr2_over=jnp.maximum(s.nbr2_over, nmax2))
        else:
            s = rebuild_neighbors_state(cfg, s)

        def body(c, _):
            s, h, nh = c
            s = base_refine(s, p_rdf)
            h, nh = R.rdf_sample_list(cfg, rcfg, s.pos, s.types,
                                      s.spec_number, spec_nuclei,
                                      nucl_number, nbr_, h, nh)
            return (s, h, nh), None
        (s, h, nh), _ = jax.lax.scan(body, (s, h, nh), None,
                                     length=p_stat // p_rdf)
        return s, h, nh
    f_blk = jax.jit(stat_block)
    t_blk = timeit("stat_block200", f_blk, state, hist, nhist,
                   steps=p_stat)

    # --- composed: the ring, 10 samples ---
    def ring(s, h, nh, n_samples: int):
        def body(c, _):
            s, h, nh = c
            s, h, nh = stat_block(s, h, nh)
            return (s, h, nh), stat_row(s)
        (s, h, nh), rows = jax.lax.scan(body, (s, h, nh), None,
                                        length=n_samples)
        return s, h, nh, rows
    f_ring = jax.jit(ring, static_argnums=3)
    t_ring = timeit("ring10", lambda s, h, nh: f_ring(s, h, nh, 10),
                    state, hist, nhist, reps=5, steps=10 * p_stat)

    if t_blk and t_full and t_refine:
        n_sub = p_stat // p_rdf
        acct = (t_cand or 0) + (t_rout or 0) \
            + n_sub * ((t_refine or 0) + (t_rdf or 0)) + (t_row or 0)
        print(f"\naccounting for one {p_stat}-step period:", file=sys.stderr)
        print(f"  cand {t_cand:.1f} + refine_outer {t_rout:.1f} + "
              f"{n_sub}*(sub {t_refine:.1f} + rdf {t_rdf:.1f}) + "
              f"row {t_row:.2f} = {acct:.1f} ms "
              f"(measured block {t_blk:.1f}, ring/sample "
              f"{(t_ring or 0) / 10:.1f})", file=sys.stderr)
        print(f"  bare 200 steps via full-rebuild chunks: "
              f"{t_full * p_stat / 50:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
