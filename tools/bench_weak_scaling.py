#!/usr/bin/env python
"""Weak-scaling probe for the slab mesh (VERDICT r3 item 4b): fixed
N/D atoms per device, D = 2, 4, 8 on the virtual CPU mesh.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_weak_scaling.py

The deck is an LJ liquid at ~0.0085 atoms/A^3 (molten-salt-like
density) so the slab block pair pass has well-occupied cells — on the
single-core CI host a cs1-density deck wastes >95% of the cap^2 tile
work on empty slots and takes hours.  Per-device state is O(N/D) by
construction (slot capacity printed); the per-step wall-time column is
indicative only — all virtual devices share the host core(s), so ideal
weak scaling shows ~D-fold time growth here (total work grows, cores
don't).  The transferable evidence is (a) slots/device ~constant,
(b) per-step time growing NO FASTER than the shared-core slowdown,
i.e. no super-linear migration/halo blowup.
"""

import os
import sys
import tempfile
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

DENS = 0.0085                        # atoms/A^3, LJ liquid regime


def write_deck(path, n):
    box = float(np.cbrt(n / DENS))
    rng = np.random.default_rng(17)
    # jittered lattice start: no overlapping pairs at liquid density
    m = int(np.ceil(n ** (1 / 3)))
    a = box / m
    g = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1)
         .reshape(-1, 3)[:n] + 0.5) * a
    pos = (g + rng.uniform(-0.12, 0.12, (n, 3)) * a) % box
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "atoms.xyz"), "w") as f:
        f.write(f"{n}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        np.savetxt(f, pos, fmt="Ar\t%.6f\t%.6f\t%.6f")
    with open(os.path.join(path, "control.txt"), "w") as f:
        f.write("""timestep 0.001 ps
nstep 1000
nequil 0
eqfreq 100
temperature 298.0\tradi\t0.2
init_vel\tzero\t0.0332
permittivity 1.0
elec\tnone
rdf\t7.0 0.05\t50\t100000\tnucl
stat\t100
""")
    with open(os.path.join(path, "field.txt"), "w") as f:
        f.write("""spec 1
Ar\tAr\t39.9\t0.0\t0.0
red-ox 0
vdw 1
Ar\tAr\tlnjs\t4.0    0.01006\t3.3952
""")


def main():
    from aztotmd_tpu.runtime.runner import MDRunner
    from aztotmd_tpu.runtime.setup import load_deck_dir

    per_dev = int(os.environ.get("WEAK_N_PER_DEV", "4000"))
    steps = int(os.environ.get("WEAK_STEPS", "12"))
    for d in ([int(a) for a in sys.argv[1:]] or [2, 4, 8]):
        deck = tempfile.mkdtemp(prefix=f"weak{d}_")
        write_deck(deck, per_dev * d)
        r = MDRunner(load_deck_dir(deck, dtype="f32"),
                     out_dir=tempfile.mkdtemp(), quiet=True,
                     mesh_devices=d)
        st = jax.block_until_ready(r.multi(r.state, r.ff, 2))
        t0 = time.time()
        st = jax.block_until_ready(r.multi(st, r.ff, steps))
        dt = (time.time() - t0) / steps
        # st.pos is mesh-sharded: .shape[0] is the GLOBAL slot count
        print(f"D={d}: N={per_dev * d:7d}  {dt * 1e3:8.2f} ms/step  "
              f"slots/dev {st.pos.shape[0] // d}  "
              f"mig_lost {int(st.mig_lost)}", flush=True)


if __name__ == "__main__":
    main()
