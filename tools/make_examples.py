#!/usr/bin/env python
"""Generate the example decks under examples/ (run from the repo root).

Three ready-to-run systems covering the BASELINE.json config classes the
case studies don't: a charged ionic melt (full Ewald), a bonded molecular
fluid (harmonic bonds + angles from list files), and an electron-hopping
redox mixture.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
EX = os.path.join(HERE, "..", "examples")


def write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def write_xyz(path, names, pos, box):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"{len(names)}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for nm, p in zip(names, pos):
            f.write(f"{nm}\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")


def molten_salt():
    """Rock-salt NaCl, 1728 ions, full Ewald, Nose-Hoover at 1100 K."""
    d = os.path.join(EX, "molten_salt")
    a = 5.64
    cells = 6
    box = a * cells
    names, pos = [], []
    for i in range(2 * cells):
        for j in range(2 * cells):
            for k in range(2 * cells):
                names.append("Na" if (i + j + k) % 2 == 0 else "Cl")
                pos.append([i * a / 2, j * a / 2, k * a / 2])
    write_xyz(os.path.join(d, "atoms.xyz"), names, np.asarray(pos), box)
    write(os.path.join(d, "control.txt"), f"""timestep 0.001 ps
nstep 10000
nequil 1000
eqfreq 100
temperature 1100.0\tnose\t0.5
init_vel\tgaus

permittivity 1.0
elec\tpme\t9.0\t0.35\t8\t8\t8

rdf\t9.0 0.05\t50\t0\t-nucl
stat\t100
""")
    # Born-Mayer-Huggins (Tosi-Fumi-like, eV/A units)
    write(os.path.join(d, "field.txt"), """spec 2
Na\tNa\t23.0\t1.0\t0.0
Cl\tCl\t35.5\t-1.0\t0.0
red-ox 0
vdw 3
Na\tNa\tbmhs\t9.0\t0.26370\t3.1546\t2.340\t1.0486\t0.49935
Na\tCl\tbmhs\t9.0\t0.21096\t3.1546\t2.755\t6.9906\t8.6758
Cl\tCl\tbmhs\t9.0\t0.15822\t3.1546\t3.170\t72.402\t145.427
""")


def bonded_fluid():
    """64 bent triatomic molecules (A-B-A), harmonic bonds + hcos angles
    supplied as bonds.txt / angles.txt list files."""
    d = os.path.join(EX, "bonded_fluid")
    n_mol = 64
    spacing = 6.0
    side = 4
    box = side * spacing
    names, pos, bonds, angles = [], [], [], []
    rng = np.random.default_rng(7)
    m = 0
    for i in range(side):
        for j in range(side):
            for k in range(side):
                c = (np.array([i, j, k]) + 0.5) * spacing \
                    + rng.uniform(-0.3, 0.3, 3)
                names += ["B", "A", "A"]
                pos += [c.tolist(),
                        (c + [1.0, 0.0, 0.0]).tolist(),
                        (c + [-0.3, 0.95, 0.0]).tolist()]
                b = 3 * m
                bonds += [(b + 1, b, 1), (b + 2, b, 1)]
                angles.append((b, b + 1, b + 2, 1))
                m += 1
    write_xyz(os.path.join(d, "atoms.xyz"), names,
              np.asarray(pos) % box, box)
    with open(os.path.join(d, "bonds.txt"), "w") as f:
        f.write(f"{len(bonds)}\n")
        for a1, a2, t in bonds:
            f.write(f"{a1} {a2} {t}\n")
    with open(os.path.join(d, "angles.txt"), "w") as f:
        f.write(f"{len(angles)}\n")
        for c, l1, l2, t in angles:
            f.write(f"{c} {l1} {l2} {t}\n")
    write(os.path.join(d, "control.txt"), """timestep 0.0005 ps
nstep 20000
nequil 1000
eqfreq 100
temperature 300.0\tnose\t0.2
init_vel\tgaus

permittivity 1.0
elec\tnone

rdf\t6.0 0.05\t100\t0\t-nucl
stat\t100
""")
    write(os.path.join(d, "field.txt"), """spec 2
A\tA\t1.0\t0.0\t0.0
B\tB\t16.0\t0.0\t0.0
red-ox 0
vdw 1
B\tB\tlnjs\t5.0\t0.01\t3.2
bonds 1
1 B A harm 25.0 1.0 con con
angles 1
1 B hcos 3.0 -0.3
bond_list 1
angle_list 1
""")


def ejump_redox():
    """Charge-neutral Fe2+/Fe3+/O2- mixture with direct Coulomb and
    Metropolis electron hopping between the iron oxidation states."""
    d = os.path.join(EX, "ejump_redox")
    rng = np.random.default_rng(11)
    box = 24.0
    g = np.arange(8) * 3.0 + 1.5
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pos = (pos + rng.uniform(-0.4, 0.4, pos.shape)) % box
    # 96 Fe2+ (+192) + 64 Fe3+ (+192) + 192 O2- (-384) = neutral
    names = ["Fe2"] * 96 + ["Fe3"] * 64 + ["O"] * 192
    rng.shuffle(names)
    pos = pos[:len(names)]
    write_xyz(os.path.join(d, "atoms.xyz"), names, pos, box)
    write(os.path.join(d, "control.txt"), """timestep 0.001 ps
nstep 10000
nequil 500
eqfreq 100
temperature 600.0\tnose\t0.3
init_vel\tgaus

permittivity 4.0
elec\tdir\t8.0

eJump\t5\t3.0\tmetr

rdf\t8.0 0.05\t100\t0\t-nucl
stat\t100
""")
    write(os.path.join(d, "field.txt"), """spec 3
Fe2\tFe\t55.8\t2.0\t0.6
Fe3\tFe\t55.8\t3.0\t0.0
O\tO\t16.0\t-2.0\t0.0
red-ox 1
2 Fe3 Fe2
vdw 4
Fe2\tO\tbuck\t8.0\t1200.0\t0.31\t0.0
Fe3\tO\tbuck\t8.0\t1500.0\t0.29\t0.0
O\tO\tbuck\t8.0\t22764.0\t0.149\t27.88
Fe2\tFe3\tbuck\t8.0\t800.0\t0.3\t0.0
""")


def reactive_polymer():
    """Runtime bond chemistry (the reference's flagship capability,
    cuBonds.cu:306-706, :898-1100): A-B bonds FORM within the linkage
    radius and BREAK when stretched past 2.5 A — the deck starts with
    no bonds at all and polymerizes as it runs (watch nBnd in the
    console line / stat_bnd.dat)."""
    d = os.path.join(EX, "reactive_polymer")
    rng = np.random.default_rng(13)
    box = 20.0
    g = np.arange(8) * 2.5 + 1.25
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pos = (pos + rng.uniform(-0.5, 0.5, pos.shape)) % box
    names = ["A", "B"] * (len(pos) // 2)
    rng.shuffle(names)
    write_xyz(os.path.join(d, "atoms.xyz"), names, pos, box)
    write(os.path.join(d, "control.txt"), """timestep 0.0005 ps
nstep 20000
nequil 500
eqfreq 100
temperature 400.0\tnose\t0.2
init_vel\tgaus

permittivity 1.0
elec\tnone

rdf\t6.0 0.05\t100\t0\t-nucl
stat\t100
""")
    write(os.path.join(d, "field.txt"), """spec 2
A\tA\t20.0\t0.0\t0.0
B\tB\t20.0\t0.0\t0.0
red-ox 0
vdw 3
A\tA\tlnjs\t5.0\t0.008\t2.4
A\tB\tlnjs\t5.0\t0.006\t2.3
B\tB\tlnjs\t5.0\t0.008\t2.4
bonds 1
1 A B harm 12.0 1.5 con br 2.5 A B
linkage 1
A B 1.8 1
""")


def nanoclusters():
    """Many dense LJ nanoparticles in a large periodic box — the
    multi-cluster generalization of case study 2's geometry at a size
    (12k atoms) past the dense O(N^2) kernel's sweet spot.  Auto-selects
    the Morton block-sparse pair engine (ops/pallas_sparse.py): most
    tile pairs are out of range, so the worklist kernel skips the empty
    space a cell grid would pay cap^2 for."""
    d = os.path.join(EX, "nanoclusters")
    rng = np.random.default_rng(29)
    box = 170.0
    n_clusters = 10
    per = 1200
    # non-overlapping centers (cluster radius ~22 A): rejection-sample
    # with a 50 A minimum separation under the periodic metric
    centers = []
    while len(centers) < n_clusters:
        c = rng.uniform(0.0, box, size=3)
        dd = np.asarray(centers) - c if centers else np.zeros((0, 3))
        dd -= box * np.round(dd / box)
        if not len(dd) or (np.sum(dd * dd, axis=1) > 50.0 ** 2).all():
            centers.append(c)
    centers = np.asarray(centers)
    # jittered-lattice spheres: min separation ~2.9 A keeps the LJ
    # start well-behaved (random placement overlaps atoms and blows up
    # within a few steps)
    s = 2.6
    g = (np.arange(-8, 9) + 0.5) * s
    cube = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    cube = cube[np.argsort(np.sum(cube * cube, axis=1))][:per]
    chunks = []
    for k in range(n_clusters):
        jit = rng.uniform(-0.25, 0.25, cube.shape)
        chunks.append(centers[k] + cube + jit)
    pos = np.concatenate(chunks) % box
    names = ["Ar"] * len(pos)
    write_xyz(os.path.join(d, "atoms.xyz"), names, pos, box)
    write(os.path.join(d, "control.txt"), """timestep 0.001 ps
nstep 10000
nequil 500
eqfreq 100
temperature 90.0\tnose\t0.5
init_vel\tgaus

permittivity 1.0
elec\tnone

rdf\t6.0 0.05\t200\t0\t-nucl
stat\t200
""")
    write(os.path.join(d, "field.txt"), """spec 1
Ar\tAr\t39.948\t0.0\t0.0
red-ox 0
vdw 1
Ar\tAr\tlnjs\t6.0\t0.0104\t2.5
""")


if __name__ == "__main__":
    molten_salt()
    bonded_fluid()
    ejump_redox()
    reactive_polymer()
    nanoclusters()
    print("examples written under", os.path.abspath(EX))
