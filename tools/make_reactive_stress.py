#!/usr/bin/env python
"""Generate a >=100k-atom / >=100k-bond REACTIVE stress deck
(VERDICT r3 item 6): rings of 8 alternating A-B atoms (1 bond per
atom) at reactive_polymer's density, with breakable bonds + linkage
creation — the scaling probe for the replicated-topology reactive mesh
pass (parallel/slab_react.py assemble_global).

    python tools/make_reactive_stress.py --rings 12500 --out /tmp/rx100k
    python tools/make_reactive_stress.py --rings 12500 --const --out ...

--const writes the same geometry with CONSTANT (non-reactive) bonds so
the reactive pass's cost is measurable by difference.
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rings", type=int, default=12500)
    ap.add_argument("--out", default="/tmp/rx100k")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--const", action="store_true",
                    help="constant bonds instead of reactive")
    args = ap.parse_args()

    ring_n = 8
    n = args.rings * ring_n
    dens = 512 / 20.0 ** 3                 # reactive_polymer's density
    box = float(np.cbrt(n / dens))
    side = int(np.ceil(np.cbrt(args.rings)))
    spacing = box / side
    rng = np.random.default_rng(3)

    # ring template: radius for bond length ~1.5 A
    th = 2 * np.pi * np.arange(ring_n) / ring_n
    rad = 1.5 / (2 * np.sin(np.pi / ring_n))
    tmpl = np.stack([rad * np.cos(th), rad * np.sin(th),
                     np.zeros(ring_n)], axis=1)

    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)
    cells = cells[:args.rings]
    centers = (cells + 0.5) * spacing
    pos = (centers[:, None, :] + tmpl[None, :, :]
           + rng.uniform(-0.05, 0.05, (args.rings, ring_n, 3)))
    pos = pos.reshape(-1, 3) % box

    names = np.where(np.arange(n) % 2 == 0, "A", "B")
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "atoms.xyz"), "w") as f:
        f.write(f"{n}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for nm, p in zip(names, pos):
            f.write(f"{nm}\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")

    # one bond per atom: i -> next around the ring (n bonds total)
    with open(os.path.join(args.out, "bonds.txt"), "w") as f:
        f.write(f"{n}\n")
        for r in range(args.rings):
            b = r * ring_n
            for k in range(ring_n):
                f.write(f"{b + k} {b + (k + 1) % ring_n} 1\n")

    bond = ("1 A B harm 12.0 1.5 con con" if args.const
            else "1 A B harm 12.0 1.5 con br 2.5 A B")
    link = "" if args.const else "linkage 1\nA B 1.8 1\n1\n"
    with open(os.path.join(args.out, "field.txt"), "w") as f:
        f.write(f"""spec 2
A\tA\t20.0\t0.0\t0.0
B\tB\t20.0\t0.0\t0.0
red-ox 0
vdw 3
A\tA\tlnjs\t5.0\t0.008\t2.4
A\tB\tlnjs\t5.0\t0.006\t2.3
B\tB\tlnjs\t5.0\t0.008\t2.4
bonds 1
{bond}
{link}""")
    with open(os.path.join(args.out, "control.txt"), "w") as f:
        f.write(f"""timestep 0.0005 ps
nstep {args.steps}
nequil 0
eqfreq 100
temperature 400.0\tnose\t0.2
init_vel\tgaus

permittivity 1.0
elec\tnone

rdf\t6.0 0.05\t100\t0\t-nucl
stat\t100
""")
    print(f"wrote {args.out}: {n} atoms, {n} bonds, box {box:.1f}, "
          f"reactive={not args.const}")


if __name__ == "__main__":
    main()
