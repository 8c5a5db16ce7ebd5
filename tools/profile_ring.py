"""Profile the PRODUCTION cs1 ring program on the real TPU: build the
runner exactly as `run` does, dispatch its _ring_fn a few times, and
aggregate per-kernel device time from a jax.profiler trace.

Complements tools/profile_step.py (bare 50-step sub-block) and
tools/bench_ring.py (per-ingredient wall clock): this shows where the
COMPOSED ring spends device time, including fusion differences the
standalone measurements can't see.

Run: timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \\
       python tools/profile_ring.py [n_samp]
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

import jax


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.runner import MDRunner

    n_samp = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    r = MDRunner(sysd, out_dir="/tmp/ring_prof_out", quiet=True)
    assert r.ring_ok, "cs1 must take the ring path"
    print("ring plan:", r._ring_plan, file=sys.stderr)

    s, h, nh, ff = r.state, r.hist, r.nhist, r.ff
    out = r._ring_fn(s, h, nh, ff, n_samp)
    s, h, nh, fr, ir = jax.block_until_ready(out)

    t0 = time.time()
    reps = 6
    for _ in range(reps):
        s, h, nh, fr, ir = r._ring_fn(s, h, nh, ff, n_samp)
    np.asarray(fr)                                # hard sync (d2h)
    per = (time.time() - t0) / reps
    steps = n_samp * r.p_stat
    print(f"ring({n_samp}) warm: {per*1e3:.1f} ms/call "
          f"({per/steps*1e6:.1f} us/step, {steps/per:.0f} steps/s)",
          file=sys.stderr)

    with jax.profiler.trace("/tmp/ring_trace"):
        s, h, nh, fr, ir = r._ring_fn(s, h, nh, ff, n_samp)
        np.asarray(fr)

    paths = sorted(glob.glob("/tmp/ring_trace/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    cnts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if not name or name.startswith(("$", "process_")):
            continue
        durs[name] += ev.get("dur", 0)
        cnts[name] += 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:50]
    tot = sum(durs.values())
    print(f"\ntop kernels (one ring({n_samp}) = {steps} steps; "
          f"total {tot/1e3:.1f} ms incl. host lanes):", file=sys.stderr)
    for name, d in rows:
        print(f"  {d/1e3:8.2f} ms  x{cnts[name]:<5d} {name[:100]}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
