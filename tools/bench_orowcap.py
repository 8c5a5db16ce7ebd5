"""A/B the outer-row-compacted refine (cfg.nb_orowcap) on a deck whose
outer-row occupancy is below the 60% gate (tools/make_dilute_deck.py).
Measures the bench-style scan chunks (where the every-nb_rebuild
refine is the second-biggest item) with the auto-selected orowcap vs
forced off.

    env PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
        python tools/bench_orowcap.py /tmp/dilute_lj
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import sys
import time

import jax


def bench(cfg, state, ff, aux, chunk=2000, windows=5):
    from aztotmd_tpu.runtime.step import make_multi_step
    fn = make_multi_step(cfg, aux)
    s = jax.block_until_ready(fn(state, ff, chunk))
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        s = fn(s, ff, chunk)
        jax.block_until_ready(s.pos)
        best = min(best, time.time() - t0)
    return chunk / best


def main():
    deck = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dilute_lj"
    from aztotmd_tpu.runtime.setup import load_deck_dir

    sysd = load_deck_dir(deck, dtype="f32")
    cfg, state, ff, aux = (sysd["cfg"], sysd["state"], sysd["ff"],
                           sysd["aux"])
    print(f"N={cfg.n_at} engine={cfg.pair_engine} "
          f"rowcap={cfg.nb_rowcap} orowcap={cfg.nb_orowcap}",
          file=sys.stderr)
    if not cfg.nb_orowcap:
        print("orowcap gate did NOT engage on this deck", file=sys.stderr)

    on = bench(cfg, state, ff, aux)
    print(f"orowcap={cfg.nb_orowcap}: {on:.1f} steps/s", file=sys.stderr)

    cfg_off = dataclasses.replace(cfg, nb_orowcap=0)
    off = bench(cfg_off, state, ff, aux)
    print(f"orowcap=0: {off:.1f} steps/s", file=sys.stderr)
    print(f"speedup {on / off:.3f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
