#!/usr/bin/env python
"""Measure the reactive-mesh topology cost at 100k atoms / 100k bonds
(VERDICT r3 item 6): replicated reactive tables + per-step
assemble_global (N,3) psum vs the same geometry with constant bonds,
on the virtual CPU mesh.

    python tools/make_reactive_stress.py --rings 12500 --out /tmp/rx100k
    python tools/make_reactive_stress.py --rings 12500 --const \
        --out /tmp/rx100k_const
    python tools/bench_reactive_mesh.py [n_dev ...]

Prints per-step wall times for (reactive, constant) at each mesh size;
the difference bounds the replicated reactive pass + assembly cost.
CPU-mesh caveat: all virtual devices share host cores, so ABSOLUTE
times overstate hardware; the reactive/constant RATIO and the
per-device memory are the transferable numbers.
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")


def bench(deck, n_dev, steps=24):
    from aztotmd_tpu.runtime.runner import MDRunner
    from aztotmd_tpu.runtime.setup import load_deck_dir
    import tempfile

    td = tempfile.mkdtemp()
    r = MDRunner(load_deck_dir(deck, dtype="f32"), out_dir=td,
                 quiet=True, mesh_devices=n_dev)
    multi = r.multi
    st = jax.block_until_ready(multi(r.state, r.ff, 2))   # compile+warm
    t0 = time.time()
    st = jax.block_until_ready(multi(st, r.ff, steps))
    dt = (time.time() - t0) / steps
    return dt, int(st.pos.shape[0])


def main():
    n_devs = [int(a) for a in sys.argv[1:]] or [4]
    for n_dev in n_devs:
        tr, slots_r = bench("/tmp/rx100k", n_dev)
        tc, _ = bench("/tmp/rx100k_const", n_dev)
        over = (tr - tc) / tc * 100
        # slots_r is the GLOBAL sharded shape; per-device is /n_dev
        print(f"n_dev={n_dev}: reactive {tr * 1e3:8.1f} ms/step  "
              f"constant {tc * 1e3:8.1f} ms/step  "
              f"reactive overhead {over:+.0f}%  "
              f"(slots/dev {slots_r // n_dev})", flush=True)


if __name__ == "__main__":
    main()
