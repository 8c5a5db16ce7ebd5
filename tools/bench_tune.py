"""Sweep the two-level Verlet-list parameters on the real TPU for the
headline deck (case study 1): nb_outer (inner refines per full candidate
pass), nb_rebuild (steps per inner refine), and the outer skin.

The production defaults come from build_sim_config's closed-form search
(config.py: nb_outer <= 8, skin2 = nb_outer * skin); this sweeps past
that cap to find whether a longer-lived outer list buys more at cs1's
dilution.  Prints steps/s per combo using the bench.py methodology
(jitted multi-step scan, best of windows).

Run: timeout 3600 env PYTHONPATH=/root/repo:/root/.axon_site \\
       python tools/bench_tune.py
"""
import dataclasses
import itertools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from aztotmd_tpu.core.config import (_max_neigh_count, _round_up,
                                         make_cell_grid)
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import make_multi_step

    deck = os.environ.get("AZTOT_BENCH_DECK",
                          "/root/reference/case study 1")
    chunk = int(os.environ.get("AZTOT_BENCH_CHUNK", "2000"))
    windows = int(os.environ.get("AZTOT_BENCH_WINDOWS", "3"))

    sysd = load_deck_dir(deck)
    cfg0, ff, state0, aux = (sysd["cfg"], sysd["ff"], sysd["state"],
                             sysd["aux"])
    pos_h = np.asarray(sysd["atoms"].pos, np.float64)
    print(f"baseline cfg: R={cfg0.nb_rebuild} Q={cfg0.nb_outer} "
          f"K={cfg0.n_neigh} K2={cfg0.n_neigh2} skin={cfg0.nb_skin} "
          f"skin2={cfg0.nb_skin2}", file=sys.stderr)

    outers = [int(q) for q in os.environ.get(
        "AZTOT_TUNE_OUTER", "8,12,16,24").split(",")]
    rebuilds = [int(r) for r in os.environ.get(
        "AZTOT_TUNE_REBUILD", "0").split(",")]   # 0 = keep default

    results = []
    for q, r in itertools.product(outers, rebuilds):
        cfg = cfg0
        R = r or cfg0.nb_rebuild
        if q != cfg0.nb_outer:
            skin2 = cfg0.nb_skin * q
            mx2 = _max_neigh_count(pos_h, cfg0.box,
                                   cfg0.r_max + skin2, n_sample=4096)
            k2 = _round_up(max(8, mx2 + max(4, mx2 // 4)), 8)
            if k2 >= cfg0.n_at:
                print(f"Q={q}: K2={k2} too large, skip", file=sys.stderr)
                continue
            grid = make_cell_grid(cfg0.box, cfg0.r_max + skin2,
                                  cfg0.n_at, pos=pos_h)
            cfg = dataclasses.replace(cfg0, nb_outer=q, nb_skin2=skin2,
                                      n_neigh2=k2, nb_grid=grid)
        cfg = dataclasses.replace(cfg, nb_rebuild=R)
        tag = f"Q={cfg.nb_outer} R={cfg.nb_rebuild} K2={cfg.n_neigh2}"
        st = state0
        if cfg.n_neigh2 != state0.nbr2_idx.shape[1]:
            # resize the outer-list buffer to the combo's K2; the first
            # chunk's full rebuild repopulates it
            st = state0.replace(nbr2_idx=jnp.full(
                (cfg.n_at, max(cfg.n_neigh2, 1)), cfg.n_at, jnp.int32))
        # no donation: state0 is reused across combos
        multi = jax.jit(make_multi_step(cfg, aux, jit=False),
                        static_argnums=2)
        try:
            t0 = time.time()
            state = multi(st, ff, chunk)
            jax.block_until_ready(state.pos)
            warm = time.time() - t0
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        times = []
        for _ in range(windows):
            t0 = time.time()
            state = multi(state, ff, chunk)
            jax.block_until_ready(state.pos)
            times.append(time.time() - t0)
        sps = chunk / min(times)
        results.append((sps, tag))
        print(f"{tag}: {sps:.1f} steps/s (compile {warm:.0f}s, "
              f"windows {[round(t, 2) for t in times]})", file=sys.stderr)
    for sps, tag in sorted(results, reverse=True):
        print(f"{sps:9.1f}  {tag}")


if __name__ == "__main__":
    main()
