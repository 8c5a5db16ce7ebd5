"""Ultra-dilute LJ deck (VERDICT r4 item 7): case study 1's 40,000 Ar
atoms with positions and box scaled by --scale (density / scale^3), so
the OUTER Verlet row occupancy drops below the nb_orowcap gate (60%)
and the outer-row-compacted refine has a workload that exercises it
end-to-end.

    python tools/make_dilute_deck.py --scale 3 --out /tmp/dilute_lj

scale=3: density 1.0e-6 atoms/A^3 (27x more dilute than cs1), outer
occupancy ~20% at the ~40 A outer reach.
"""
import argparse
import os

import numpy as np

CS1 = "/root/reference/case study 1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=3.0)
    ap.add_argument("--out", default="/tmp/dilute_lj")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--stat", type=int, default=200)
    args = ap.parse_args()

    with open(os.path.join(CS1, "atoms.xyz")) as f:
        n0 = int(f.readline().split()[0])
        box0 = float(f.readline().split()[1])
        base = np.loadtxt(f, usecols=(1, 2, 3), max_rows=n0)
    s = args.scale
    pos = base * s
    box = box0 * s

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "atoms.xyz"), "w") as f:
        f.write(f"{n0}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for p in pos:
            f.write(f"Ar\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    with open(os.path.join(CS1, "field.txt")) as f:
        field = f.read()
    open(os.path.join(args.out, "field.txt"), "w").write(field)
    open(os.path.join(args.out, "control.txt"), "w").write(f"""\
timestep 0.001 ps
nstep {args.steps}
nequil  0
eqfreq 100
temperature 298.0\tradi\t0.2
init_vel\tzero\t0.0332

permittivity  1.0

elec\tfenn\t8.0\t0.4\t6\t6\t6

rdf\t14.0   0.02\t50\t{args.steps}\tnucl

eJump\t0\t1.7\tmetr

Ux\t\t0.0

stat\t\t{args.stat}
""")
    print(f"dilute deck (density {n0 / box**3:.2e} atoms/A^3) "
          f"written to {args.out}")


if __name__ == "__main__":
    main()
