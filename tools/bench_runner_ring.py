"""Time the PRODUCTION runner's own _ring_fn (the exact program the
e2e loop dispatches) against the hand-built ring of
tools/bench_ring_bisect.py (274 us/step) and the e2e stage timer
(447.8 us/step, round-5 cs1 run).  Also times one full dispatch +
flush round trip the way _run_loop_ring sequences them, to separate
program time from tunnel/dispatch plumbing.

Run: env PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
     python tools/bench_runner_ring.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.runner import MDRunner

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    r = MDRunner(sysd, out_dir="/tmp/bench_runner_ring")
    print(f"plan={r._ring_plan} s_cap={r.s_cap}", file=sys.stderr)

    state, hist, nhist, ff = r.state, r.hist, r.nhist, r.ff
    n_samp = 50
    steps = n_samp * r.p_stat

    # warm/compile
    out = r._ring_fn(state, hist, nhist, ff, n_samp)
    jax.block_until_ready(out[0].pos)
    state, hist, nhist, fr, ir = out

    # pipelined program-only timing (donated args: chain the carries)
    reps = 6
    t0 = time.time()
    for _ in range(reps):
        state, hist, nhist, fr, ir = r._ring_fn(state, hist, nhist,
                                                ff, n_samp)
    jax.block_until_ready(state.pos)
    ms = (time.time() - t0) / reps * 1e3
    print(f"_ring_fn pipelined: {ms:.1f} ms/dispatch "
          f"({ms / steps * 1e3:.1f} us/step)", file=sys.stderr)

    # the e2e sequencing: dispatch, then flush previous rows (d2h),
    # with the stage barrier on the new state — one at a time
    pend = (fr, ir)
    t0 = time.time()
    for _ in range(reps):
        state, hist, nhist, fr, ir = r._ring_fn(state, hist, nhist,
                                                ff, n_samp)
        np.asarray(pend[0]); np.asarray(pend[1])
        pend = (fr, ir)
        jax.block_until_ready(state.pos)
    ms = (time.time() - t0) / reps * 1e3
    print(f"dispatch+flush+barrier: {ms:.1f} ms/dispatch "
          f"({ms / steps * 1e3:.1f} us/step)", file=sys.stderr)

    # same but WITHOUT the per-dispatch barrier (the non---timings path)
    t0 = time.time()
    for _ in range(reps):
        state, hist, nhist, fr, ir = r._ring_fn(state, hist, nhist,
                                                ff, n_samp)
        np.asarray(pend[0]); np.asarray(pend[1])
        pend = (fr, ir)
    jax.block_until_ready(state.pos)
    ms = (time.time() - t0) / reps * 1e3
    print(f"dispatch+flush, no barrier: {ms:.1f} ms/dispatch "
          f"({ms / steps * 1e3:.1f} us/step)", file=sys.stderr)


if __name__ == "__main__":
    main()
