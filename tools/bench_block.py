#!/usr/bin/env python
"""Time the cs1 hot-loop pieces on the real TPU: the inner 50-step scan,
the refine pass, and the full rebuild — the denominators for the
round-4 step-overhead harvest.

    timeout 1500 env PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/bench_block.py

Measurement pattern per CLAUDE.md: chain each rep's input on the
previous rep's value, sync ONCE at the end with a d2h (np.asarray) —
per-rep block_until_ready measures the ~30 ms tunnel round trip, and
block_until_ready is not a reliable barrier when outputs alias inputs.
"""

import sys
import time

import numpy as np

import jax


def timeit(fn, st, reps=30, label=""):
    st = fn(st)                       # compile + warm
    np.asarray(st.pos[0])
    t0 = time.time()
    for _ in range(reps):
        st = fn(st)
    np.asarray(st.pos[0])             # hard sync (d2h)
    dt = (time.time() - t0) / reps
    print(f"{label:28s} {dt * 1e3:8.3f} ms/call", file=sys.stderr)
    return dt, st


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import (make_multi_step, make_step,
                                          rebuild_neighbors_state,
                                          refine_neighbors_state)

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    cfg, state, ff, aux = (sysd["cfg"], sysd["state"], sysd["ff"],
                           sysd["aux"])
    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))

    step1 = make_step(cfg, aux, nbr_auto_rebuild=False)

    @jax.jit
    def scan50(s):
        def inner(s_, _):
            return step1(s_, ff), None
        s, _ = jax.lax.scan(inner, s, None, length=50)
        return s

    refine = jax.jit(lambda s: refine_neighbors_state(cfg, s))
    rebuild = jax.jit(lambda s: rebuild_neighbors_state(cfg, s))

    t_scan, state = timeit(scan50, state, label="scan50 (no refine)")
    t_ref, state = timeit(refine, state, label="refine")
    t_reb, state = timeit(rebuild, state, reps=10, label="full rebuild")

    per_step = (t_scan / 50 + t_ref / cfg.nb_rebuild
                + t_reb / (cfg.nb_rebuild * cfg.nb_outer))
    print(f"inner {t_scan / 50 * 1e6:.1f} us/step + refine "
          f"{t_ref / cfg.nb_rebuild * 1e6:.1f} us/step + rebuild "
          f"{t_reb / (cfg.nb_rebuild * cfg.nb_outer) * 1e6:.1f} us/step "
          f"= {per_step * 1e6:.1f} us/step "
          f"({1.0 / per_step:.0f} steps/s ceiling)")


if __name__ == "__main__":
    main()
