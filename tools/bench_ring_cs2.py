"""Attribute the cs2 ring overhead (round-5): e2e 985 steps/s vs
bench 2550 — the delta is the deck's every-10-step all-pairs RDF.
Times each ingredient on the real TPU:

  steps10      make_multi_step 10 steps (the ring sub-block; pallas
               dense engine, no Verlet machinery)
  rdf_sample   rdf_sample_allpairs (N^2 = 16M candidates, n_bin~400)
  rdf_nohist   the same sample with the histogram replaced by a sum
               (isolates gather/distance pipeline vs _hist_counts)
  stat_row     the on-device stat row builder
  period200    the composed 200-step stat period
  ring5        5 periods (1000 steps)

Run: env PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
     python tools/bench_ring_cs2.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=10, steps=None):
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
    from aztotmd_tpu.runtime.step import make_multi_step
    from aztotmd_tpu.runtime import statring
    from aztotmd_tpu.ops import rdf as R

    sysd = load_deck_dir("/root/reference/case study 2", dtype="f32")
    cfg, state, ctl, ff, aux = (sysd["cfg"], sysd["state"], sysd["ctl"],
                                sysd["ff"], sysd["aux"])
    fld = sysd["fld"]
    p_stat, p_rdf = ctl.stat, ctl.fr_rdf
    print(f"N={cfg.n_at} p_stat={p_stat} p_rdf={p_rdf} "
          f"engine={cfg.pair_engine}", file=sys.stderr)

    pos_h = np.asarray(sysd["atoms"].pos, np.float64)
    m_min = min([sp.mass for sp in fld.species if sp.mass > 0], default=0.0)
    rcfg = R.make_rdf_config(ctl, cfg, pos=pos_h, m_min=m_min)
    print(f"rdf: n_bin={rcfg.n_bin} n_pair={rcfg.n_pair} n_spec="
          f"{rcfg.n_spec} k_cap={rcfg.k_cap}", file=sys.stderr)
    types_h = np.array([fld.spec_id(nm) for nm in sysd["atoms"].names],
                       np.int32)
    spec_counts0 = np.bincount(types_h, minlength=cfg.n_spec)
    spec_nuclei = jnp.asarray(
        np.array([s.nuclei for s in fld.species], np.int32))
    nucl_number = jnp.asarray(np.ones(max(cfg.n_nucl, 1), np.int32))
    hist, nhist = R.zero_hist(rcfg)

    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))

    t10 = timeit("steps10", lambda s: base(s, ff, p_rdf), state,
                 steps=p_rdf)

    f_rdf = jax.jit(lambda s, h, nh: R.rdf_sample(
        cfg, rcfg, s.pos, s.types, s.spec_number, spec_nuclei,
        nucl_number, h, nh))
    t_rdf = timeit("rdf_sample", f_rdf, state, hist, nhist)

    # gather/distance pipeline only (histogram replaced by a sum)
    def nohist(s):
        N = cfg.n_at
        dt = s.pos.dtype
        box = jnp.asarray(cfg.box, dt)
        r2 = jnp.zeros((N, N), dt)
        for k in range(3):
            d = s.pos[:, k][:, None] - s.pos[:, k][None, :]
            d = d - box[k] * jnp.round(d / box[k])
            r2 = r2 + d * d
        own = jnp.arange(N, dtype=jnp.int32)
        mask = (own[:, None] < own[None, :]) & (r2 < rcfg.r2_max)
        r = jnp.sqrt(jnp.where(mask, r2, 1.0))
        ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32),
                         rcfg.n_bin - 1)
        return jnp.sum(jnp.where(mask, ib, 0))
    t_nh = timeit("rdf_nohist", jax.jit(nohist), state)

    stat_row = statring.make_stat_row(cfg, spec_counts0)
    t_row = timeit("stat_row", jax.jit(stat_row), state)

    def period(s, h, nh):
        def body(c, _):
            s, h, nh = c
            s = base(s, ff, p_rdf)
            h, nh = R.rdf_sample(cfg, rcfg, s.pos, s.types,
                                 s.spec_number, spec_nuclei,
                                 nucl_number, h, nh)
            return (s, h, nh), None
        (s, h, nh), _ = jax.lax.scan(body, (s, h, nh), None,
                                     length=p_stat // p_rdf)
        return s, h, nh, stat_row(s)
    f_per = jax.jit(period)
    t_per = timeit("period200", f_per, state, hist, nhist, steps=p_stat)

    def ring(s, h, nh):
        def body(c, _):
            s, h, nh = c
            s, h, nh, row = period(s, h, nh)
            return (s, h, nh), row
        (s, h, nh), rows = jax.lax.scan(body, (s, h, nh), None, length=5)
        return s, h, nh, rows
    t_ring = timeit("ring5", jax.jit(ring), state, hist, nhist, reps=5,
                    steps=5 * p_stat)

    if t_per and t10 and t_rdf:
        n_sub = p_stat // p_rdf
        acct = n_sub * (t10 + t_rdf) + (t_row or 0)
        print(f"\nperiod: {n_sub}*(steps {t10:.2f} + rdf {t_rdf:.2f}) + "
              f"row {t_row:.2f} = {acct:.1f} ms (measured {t_per:.1f}; "
              f"ring/200 {(t_ring or 0) / 5:.1f}; e2e measured 990 "
              f"us/step = 198 ms/200)", file=sys.stderr)


if __name__ == "__main__":
    main()
