"""Write the cs1 NVE drift deck (VERDICT r4 item 8): case study 1 with
the thermostat OFF and Gaussian initial velocities at 298 K, so the
100k-step f32 total-energy drift on the real chip can be recorded
against the f64 envelope (the reference's float32 + force-cap regime,
cuInit.cu:775-779, defines.h:8-10, is the comparison point).

Usage: python tools/make_nve_deck.py /tmp/cs1_nve
"""
import os
import shutil
import sys

SRC = "/root/reference/case study 1"

CONTROL = """timestep 0.001 ps
nstep 100000
nequil  0
eqfreq 100
temperature 298.0\tnone
init_vel\tgaus\t0.0332

permittivity  1.0

cell_list\t85.0
max_neigh\t185

elec\tfenn\t8.0\t0.4\t6\t6\t6

eJump\t0\t1.7\tmetr

Ux\t\t0.0

rdf\t14.0   0.02\t50\t500000\tnucl
stat\t\t200
"""


def main(dst):
    os.makedirs(dst, exist_ok=True)
    for f in ("atoms.xyz", "field.txt"):
        shutil.copy(os.path.join(SRC, f), os.path.join(dst, f))
    with open(os.path.join(dst, "control.txt"), "w") as f:
        f.write(CONTROL)
    print(f"NVE deck written to {dst}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/cs1_nve")
