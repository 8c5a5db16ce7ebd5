"""Bisect the ring composition anomaly: 5 x superblock(800) measured
274 us/step standalone, but scan(superblock, length=5) measured 625
us/step in the same process (tools/bench_ring_super.py).  Candidates:
stat-row outputs accumulating through the scan, donation, rebuild
placement, or tunnel drift between the two measurements.

Measures, in one process (A/B/A pattern to catch tunnel drift):
  sup_a        superblock standalone (baseline)
  ring_plain   scan of 5 superblocks, rows emitted      (the anomaly?)
  ring_norows  scan of 5 superblocks, rows DROPPED
  ring_donate  ring_plain jitted with donate_argnums
  ring_nordf   ring_plain without the rdf_sample call
  sup_a2       superblock standalone again (drift check)

Run: env PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
     python tools/bench_ring_bisect.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=8, steps=None):
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
        make_step, refine_neighbors_state, rebuild_neighbors_state)
    from aztotmd_tpu.runtime import statring
    from aztotmd_tpu.ops import rdf as R

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    cfg, state, ctl, ff, aux = (sysd["cfg"], sysd["state"], sysd["ctl"],
                                sysd["ff"], sysd["aux"])
    fld = sysd["fld"]
    p_stat, p_rdf = ctl.stat, ctl.fr_rdf

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

    from aztotmd_tpu.runtime.step import make_multi_step
    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))

    step1 = make_step(cfg, aux, nbr_auto_rebuild=False)
    stat_row = statring.make_stat_row(cfg, spec_counts0)
    k_super, n_sub = 4, p_stat // p_rdf

    def base_refine(s, n=50):
        s = refine_neighbors_state(cfg, s)

        def inner(s_, _):
            return step1(s_, ff), None
        s, _ = jax.lax.scan(inner, s, None, length=n)
        return s

    def make_superblock(with_rdf=True):
        def stat_block(s, h, nh):
            nbr = s.nbr2_idx

            def body(c, _):
                s, h, nh = c
                s = base_refine(s, p_rdf)
                if with_rdf:
                    h, nh = R.rdf_sample_list(
                        cfg, rcfg, s.pos, s.types, s.spec_number,
                        spec_nuclei, nucl_number, nbr, h, nh)
                return (s, h, nh), None
            (s, h, nh), _ = jax.lax.scan(body, (s, h, nh), None,
                                         length=n_sub)
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
        return superblock

    superblock = make_superblock(True)
    f_sup = jax.jit(superblock)
    timeit("sup_a", f_sup, state, hist, nhist, steps=k_super * p_stat)

    def ring(s, h, nh, keep_rows=True, with_rdf=True):
        sup = make_superblock(with_rdf)

        def body(c, _):
            s, h, nh = c
            s, h, nh, rows = sup(s, h, nh)
            return (s, h, nh), (rows if keep_rows else None)
        (s, h, nh), rows = jax.lax.scan(body, (s, h, nh), None, length=5)
        return s, h, nh, rows

    n_steps = 5 * k_super * p_stat
    f_plain = jax.jit(lambda s, h, nh: ring(s, h, nh))
    timeit("ring_plain", f_plain, state, hist, nhist, reps=5,
           steps=n_steps)

    f_norows = jax.jit(lambda s, h, nh: ring(s, h, nh, keep_rows=False))
    timeit("ring_norows", f_norows, state, hist, nhist, reps=5,
           steps=n_steps)

    f_donate = jax.jit(lambda s, h, nh: ring(s, h, nh),
                       donate_argnums=(0, 1, 2))
    # donation consumes the inputs: re-make them per rep via a chain
    def donate_rep(s, h, nh):
        return f_donate(s, h, nh)
    s2, h2, nh2 = state, hist, nhist
    try:
        out = jax.block_until_ready(donate_rep(s2, h2, nh2))
        s2, h2, nh2 = out[0], out[1], out[2]
        t0 = time.time()
        for _ in range(5):
            s2, h2, nh2, _ = f_donate(s2, h2, nh2)
        jax.block_until_ready(s2.pos)
        ms = (time.time() - t0) / 5 * 1e3
        print(f"ring_donate: {ms:.3f} ms/call  "
              f"({ms / n_steps * 1e3:.1f} us/step)", file=sys.stderr)
    except Exception as e:
        print(f"ring_donate: FAILED {e}", file=sys.stderr)

    f_nordf = jax.jit(lambda s, h, nh: ring(s, h, nh, with_rdf=False))
    timeit("ring_nordf", f_nordf, state, hist, nhist, reps=5,
           steps=n_steps)

    timeit("sup_a2", f_sup, state, hist, nhist, steps=k_super * p_stat)


if __name__ == "__main__":
    main()
