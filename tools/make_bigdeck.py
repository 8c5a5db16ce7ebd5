#!/usr/bin/env python
"""Generate a large-N LJ argon deck by tiling case study 1 (same
density, same potential, same radiative thermostat) — the scale demo
past the reference's single-GPU ceiling (VERDICT r3 item 4a).

    python tools/make_bigdeck.py --tiles 3 --out /tmp/big_lj

tiles=2 -> 320,000 atoms; tiles=3 -> 1,080,000 atoms.  The reference
deck's 40,000 positions are replicated on a tiles^3 lattice with a
small deterministic jitter (distinct positions, identical density
2.69e-5 atoms/A^3; case study 1/atoms.xyz, control.txt).
"""

import argparse
import os

import numpy as np

CS1 = "/root/reference/case study 1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=3)
    ap.add_argument("--out", default="/tmp/big_lj")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--stat", type=int, default=200)
    args = ap.parse_args()

    with open(os.path.join(CS1, "atoms.xyz")) as f:
        n0 = int(f.readline().split()[0])
        box0 = float(f.readline().split()[1])
        base = np.loadtxt(f, usecols=(1, 2, 3), max_rows=n0)
    assert base.shape == (n0, 3)

    t = args.tiles
    rng = np.random.default_rng(11)
    shifts = np.stack(np.meshgrid(*[np.arange(t) * box0] * 3,
                                  indexing="ij"), -1).reshape(-1, 3)
    pos = (base[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    pos += rng.uniform(-0.05, 0.05, pos.shape)   # break exact tiling
    box = box0 * t
    pos %= box
    n = len(pos)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "atoms.xyz"), "w") as f:
        f.write(f"{n}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        np.savetxt(f, pos, fmt="Ar\t%.6f\t%.6f\t%.6f")

    with open(os.path.join(args.out, "control.txt"), "w") as f:
        f.write(f"""timestep 0.001 ps
nstep {args.steps}
nequil  0
eqfreq 100
temperature 298.0\tradi\t0.2
init_vel\tzero\t0.0332
permittivity  1.0
cell_list\t85.0
max_neigh\t185
elec\tfenn\t8.0\t0.4\t6\t6\t6
rdf\t14.0   0.02\t50\t{10 * args.steps}\tnucl
eJump\t0\t1.7\tmetr
Ux\t\t0.0
stat\t\t{args.stat}
""")
    with open(os.path.join(args.out, "field.txt"), "w") as f:
        f.write("""spec 1
Ar\tAr\t39.9\t0.0\t0.0
red-ox 0
vdw 1
Ar\tAr\tlnjs\t4.0    0.01006\t3.3952
""")
    print(f"wrote {args.out}: {n} atoms, box {box:.1f}")


if __name__ == "__main__":
    main()
