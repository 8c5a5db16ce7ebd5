"""Profile the cs1 hot loop on the real TPU: per-kernel timing of one
50-step scan block (the ring sub-block), aggregated from a
jax.profiler trace.

Round-1 finding: the per-step cost is dominated by per-fusion launch
overheads (~50 fused kernels per step).  This tool names them so the
next optimization targets the right fusions.

Run: timeout 1200 env PYTHONPATH=/root/repo:/root/.axon_site \\
       python tools/profile_step.py [deck_dir]
(deck_dir defaults to case study 1.)
Writes /tmp/step_trace/ and prints the aggregated kernel table.
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
    from aztotmd_tpu.runtime.step import (make_step, make_multi_step,
                                          refine_neighbors_state)

    deck = (sys.argv[1] if len(sys.argv) > 1
            else "/root/reference/case study 1")
    sysd = load_deck_dir(deck, dtype="f32")
    cfg, state, ff, aux = (sysd["cfg"], sysd["state"], sysd["ff"],
                           sysd["aux"])
    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))

    step1 = make_step(cfg, aux, nbr_auto_rebuild=False)

    @jax.jit
    def block50(s):
        s = refine_neighbors_state(cfg, s)

        def inner(s_, _):
            return step1(s_, ff), None
        s, _ = jax.lax.scan(inner, s, None, length=50)
        return s

    s = jax.block_until_ready(block50(state))    # compile warm
    t0 = time.time()
    for _ in range(10):
        s = block50(s)
    np.asarray(s.pos)                            # hard sync (d2h)
    print(f"block50 warm: {(time.time() - t0) / 10 * 1e3:.1f} ms/call",
          file=sys.stderr)

    with jax.profiler.trace("/tmp/step_trace"):
        for _ in range(3):
            s = block50(s)
        np.asarray(s.pos)

    # aggregate device kernel durations from the trace
    paths = sorted(glob.glob("/tmp/step_trace/**/*.trace.json.gz",
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
        # TPU device lanes have pid names like "/device:TPU:0" in
        # the metadata; cheap filter: kernel-ish names
        name = ev.get("name", "")
        if not name or name.startswith(("$", "process_")):
            continue
        durs[name] += ev.get("dur", 0)
        cnts[name] += 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(durs.values())
    print(f"\ntop kernels (3 blocks of 50 steps; total {tot/1e3:.1f} ms "
          "incl. host lanes):", file=sys.stderr)
    for name, d in rows:
        print(f"  {d/1e3:8.2f} ms  x{cnts[name]:<5d} {name[:90]}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
