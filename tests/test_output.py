"""Output layer tests: RDF math vs a NumPy oracle, writers' formats,
runner end-to-end smoke, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aztotmd_tpu.ops import rdf as ops_rdf
from aztotmd_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from aztotmd_tpu.systems import build_lj_argon


def numpy_rdf(pos, types, box, n_spec, rcfg, spec_number):
    """Double-precision brute-force oracle of brute_rdf
    (cuStat.cu:436-512)."""
    n = len(pos)
    vol = box[0] * box[1] * box[2]
    hist = np.zeros((rcfg.n_bin, rcfg.n_pair))
    for i in range(n - 1):
        d = pos[i + 1:] - pos[i]
        d -= np.asarray(box) * np.round(d / np.asarray(box))
        r2 = np.sum(d * d, axis=1)
        for k in np.flatnonzero(r2 < rcfg.r2_max):
            j = i + 1 + k
            ib = min(int(np.sqrt(r2[k]) / rcfg.d_rdf), rcfg.n_bin - 1)
            mn, mx = sorted((types[i], types[j]))
            ip = mn * (n_spec - 1) + (mn * (1 - mn)) // 2 + mx
            hist[ib, ip] += 2.0 * vol / (spec_number[mn] * spec_number[mx])
    return hist


def test_rdf_matches_numpy_oracle():
    cfg, ff, state, aux = build_lj_argon(n_atoms=125, density=0.012,
                                         dtype="f64", seed=5)
    from aztotmd_tpu.core.config import make_cell_grid
    r_rdf, d_rdf = 6.0, 0.1
    grid = make_cell_grid(cfg.box, r_rdf, cfg.n_at)
    rcfg = ops_rdf.RdfConfig(n_bin=int(r_rdf / d_rdf), d_rdf=d_rdf,
                             r2_max=r_rdf * r_rdf, n_spec=1, n_nucl=1,
                             nuclei=False, grid=grid)
    hist, _ = ops_rdf.zero_hist(rcfg, jnp.float64)
    spec_nuclei = jnp.zeros((1,), jnp.int32)
    nucl_number = jnp.asarray([cfg.n_at], jnp.int32)
    hist, _ = ops_rdf.rdf_sample(cfg, rcfg, state.pos, state.types,
                                 state.spec_number, spec_nuclei,
                                 nucl_number, hist)
    oracle = numpy_rdf(np.asarray(state.pos), np.asarray(state.types),
                       cfg.box, 1, rcfg, np.asarray(state.spec_number))
    np.testing.assert_allclose(np.asarray(hist), oracle, rtol=1e-9)
    # every pair within reach counted exactly once
    assert np.asarray(hist).sum() > 0


def test_checkpoint_roundtrip(tmp_path):
    cfg, ff, state, aux = build_lj_argon(n_atoms=64, dtype="f64", seed=9)
    from aztotmd_tpu.runtime.step import make_step
    step = jax.jit(make_step(cfg, aux))
    state = step(state, ff)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state, {"step": int(state.step)})
    restored = load_checkpoint(p, state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed trajectory identical to uninterrupted one
    s1 = step(state, ff)
    s2 = step(restored, ff)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))


def test_runner_end_to_end_case2(tmp_path, case2_dir):
    """Short case-study-2 run: all output files exist and parse."""
    from aztotmd_tpu.runtime.runner import run_deck
    out = str(tmp_path)
    r = run_deck(case2_dir, out_dir=out, n_steps=10, quiet=True)
    assert int(r.state.step) == 10
    files = os.listdir(out)
    # case study 2's rdf directive ends with "-nucl" -> no rdf_n.dat
    for f in ("stat.dat", "msd.dat", "rdf.dat", "revcon.xyz",
              "velocities.dat", "tchars.dat"):
        assert f in files, f"missing {f}"
    stat = open(os.path.join(out, "stat.dat")).read().splitlines()
    assert stat[0].startswith("time\tstep\tengTot")
    assert "engTerm" in stat[0]           # radiative thermostat column
    # stat period in the deck is 200 -> only the two header lines here
    assert len(stat) == 2
    rev = open(os.path.join(out, "revcon.xyz")).read().splitlines()
    assert rev[0].strip() == "4000"
    assert rev[1].startswith("1 ")
    # revcon must be re-loadable by the atoms parser
    from aztotmd_tpu.io.atoms import parse_atoms_file
    atoms = parse_atoms_file(os.path.join(out, "revcon.xyz"))
    assert atoms.n_atoms == 4000




def test_ring_mode_matches_legacy_sampling(tmp_path):
    """The on-device stat ring must produce identical output files to
    the legacy per-sample host-pull path (same deck, same steps)."""
    from aztotmd_tpu.runtime.runner import run_deck
    deck = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "bonded_fluid")
    out_a = str(tmp_path / "ring")
    out_b = str(tmp_path / "legacy")
    run_deck(deck, out_dir=out_a, n_steps=300, quiet=True)
    os.environ["AZTOTMD_NO_RING"] = "1"
    try:
        run_deck(deck, out_dir=out_b, n_steps=300, quiet=True)
    finally:
        del os.environ["AZTOTMD_NO_RING"]
    for f in ("stat.dat", "msd.dat", "rdf.dat",
              "revcon.xyz", "stat_bnd.dat", "velocities.dat"):
        pa, pb = os.path.join(out_a, f), os.path.join(out_b, f)
        assert os.path.exists(pa) == os.path.exists(pb), f
        if os.path.exists(pa):
            assert open(pa).read() == open(pb).read(), f"{f} differs"
    # msd_d: the ring computes the per-species MSD reduction on device
    # in f32; the legacy path reduces on host in f64 — equal to ~1e-6
    la = open(os.path.join(out_a, "msd_d.dat")).read().splitlines()
    lb = open(os.path.join(out_b, "msd_d.dat")).read().splitlines()
    assert la[0] == lb[0] and len(la) == len(lb)
    for ra, rb in zip(la[2:], lb[2:]):
        va = np.asarray([float(x) for x in ra.split()])
        vb = np.asarray([float(x) for x in rb.split()])
        np.testing.assert_allclose(va, vb, rtol=2e-5, atol=1e-6)


def test_ring_list_rdf_matches_legacy(tmp_path):
    """When fr_rdf < stat on a large dilute deck the ring samples RDF
    from the skin-padded neighbor list (rdf_sample_list); the histogram
    must match the direct candidate-matrix sampling of the legacy path
    exactly.  (Small/dense decks dispatch to all-pairs instead, so this
    needs a deck with N > S*cap.)"""
    from aztotmd_tpu.runtime.runner import run_deck
    deck = str(tmp_path / "deck")
    os.makedirs(deck)
    # 12^3 = 1728-atom dilute LJ lattice in a 96 A box
    n_side, spacing = 12, 8.0
    box = n_side * spacing
    g = np.arange(n_side) * spacing + 0.37 * spacing
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    with open(os.path.join(deck, "atoms.xyz"), "w") as f:
        f.write(f"{len(pos)}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for p in pos:
            f.write(f"Ar\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    open(os.path.join(deck, "field.txt"), "w").write(
        "spec 1\nAr\tAr\t40.0\t0.0\t0.0\n"
        "red-ox 0\nvdw 1\nAr\tAr\tlnjs\t4.0\t0.01\t3.4\n")
    open(os.path.join(deck, "control.txt"), "w").write(
        "timestep 0.0002 ps\nnstep 1000\n"
        "temperature 100.0\tnose\t0.5\ninit_vel\tgaus\n"
        "permittivity 1.0\nelec\tnone\n"
        "rdf\t6.0 0.05\t25\t0\t-nucl\nstat\t50\n")

    out_a = str(tmp_path / "ring")
    out_b = str(tmp_path / "legacy")
    r = run_deck(deck, out_dir=out_a, n_steps=200, quiet=True)
    assert r.rcfg is not None and r.rcfg.k_cap > 0, \
        "deck must exercise the list path"
    # the deep-outer-window deck must take the rdf-from-outer ring path
    # (RDF sampled straight off the outer Verlet list, outer rebuild
    # amortized over k_super stat periods) — byte-equality below is
    # what proves it sound
    assert r._ring_plan.get("rdf_from_outer"), r._ring_plan
    assert r._ring_plan["k_super"] >= 1
    os.environ["AZTOTMD_NO_RING"] = "1"
    try:
        run_deck(deck, out_dir=out_b, n_steps=200, quiet=True)
    finally:
        del os.environ["AZTOTMD_NO_RING"]
    ra = open(os.path.join(out_a, "rdf.dat")).read()
    rb = open(os.path.join(out_b, "rdf.dat")).read()
    assert ra == rb, "list-sampled rdf.dat differs from direct sampling"
    sa = open(os.path.join(out_a, "stat.dat")).read()
    sb = open(os.path.join(out_b, "stat.dat")).read()
    assert sa == sb


def test_rdf_overfill_writes_before_reset(tmp_path):
    """The >500-sample overfill reset (rdf_iter, cuStat.cu:568-589) must
    never swallow an intermediate rdfN.dat or the final rdf.dat: the
    reference writes the file first, then clears the buffer.  A run with
    fr_rdf=1 crosses the 500-sample window twice; every periodic file
    and the final rdf.dat must exist (the 500k-step cs2 production run
    originally lost half its rdfN.dat files and rdf.dat to this)."""
    from aztotmd_tpu.runtime.runner import run_deck
    deck = str(tmp_path / "deck")
    os.makedirs(deck)
    n_side, spacing = 5, 8.0
    box = n_side * spacing
    g = np.arange(n_side) * spacing + 0.37 * spacing
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    with open(os.path.join(deck, "atoms.xyz"), "w") as f:
        f.write(f"{len(pos)}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for p in pos:
            f.write(f"Ar\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    open(os.path.join(deck, "field.txt"), "w").write(
        "spec 1\nAr\tAr\t40.0\t0.0\t0.0\n"
        "red-ox 0\nvdw 1\nAr\tAr\tlnjs\t4.0\t0.01\t3.4\n")
    open(os.path.join(deck, "control.txt"), "w").write(
        "timestep 0.0002 ps\nnstep 1200\n"
        "temperature 100.0\tnose\t0.5\ninit_vel\tgaus\n"
        "permittivity 1.0\nelec\tnone\n"
        "rdf\t6.0 0.05\t1\t200\t-nucl\nstat\t50\n")
    out = str(tmp_path / "out")
    r = run_deck(deck, out_dir=out, n_steps=1200, quiet=True)
    assert r.ring_ok, "deck must exercise the ring path"
    for step in range(200, 1201, 200):
        assert os.path.exists(os.path.join(out, f"rdf{step}.dat")), \
            f"rdf{step}.dat missing (reset swallowed the window)"
    final = os.path.join(out, "rdf.dat")
    assert os.path.exists(final), "final rdf.dat missing"
    # finalize falls back to the last written window when the overfill
    # reset just zeroed the live histogram
    assert open(final).read() == open(
        os.path.join(out, "rdf1200.dat")).read()


def test_rdf_counts_rows_partition_sums_to_allpairs():
    """The slab chunk's per-device partial counts
    (ops.rdf.rdf_counts_rows over disjoint row sets) must sum to the
    single-chip all-pairs counts EXACTLY — the bit-exactness claim the
    psum merge in parallel/slab.make_slab_rdf_chunk rests on."""
    cfg, ff, state, aux = build_lj_argon(n_atoms=120, density=0.012,
                                         dtype="f64", seed=11)
    from aztotmd_tpu.core.config import make_cell_grid
    r_rdf, d_rdf = 6.0, 0.1
    grid = make_cell_grid(cfg.box, r_rdf, cfg.n_at)
    rcfg = ops_rdf.RdfConfig(n_bin=int(r_rdf / d_rdf), d_rdf=d_rdf,
                             r2_max=r_rdf * r_rdf, n_spec=1, n_nucl=1,
                             nuclei=False, grid=grid)
    N = cfg.n_at
    pos = state.pos
    types = state.types

    hist0, _ = ops_rdf.zero_hist(rcfg, jnp.float64)
    want, _ = ops_rdf.rdf_sample_allpairs(
        cfg, rcfg, pos, types, state.spec_number,
        jnp.zeros((1,), jnp.int32), jnp.asarray([N], jnp.int32), hist0)

    # partition the atoms into 4 shuffled, padded row sets (the slab
    # slot layout: rows in arbitrary order, dead slots gid -1)
    rng = np.random.default_rng(0)
    perm = rng.permutation(N)
    total = np.zeros((rcfg.n_bin, rcfg.n_pair))
    C = N // 4 + 3                              # slot capacity w/ padding
    for d in range(4):
        own = perm[d * (N // 4):(d + 1) * (N // 4)] if d < 3 \
            else perm[3 * (N // 4):]
        gid = np.full(C, -1, np.int32)
        gid[:len(own)] = own
        row_pos = np.zeros((C, 3))
        row_pos[:len(own)] = np.asarray(pos)[own]
        row_types = np.zeros(C, np.int32)
        row_types[:len(own)] = np.asarray(types)[own]
        counts = ops_rdf.rdf_counts_rows(
            cfg, rcfg, jnp.asarray(row_pos), jnp.asarray(gid),
            jnp.asarray(row_types), pos, types)
        total += np.asarray(counts)

    sn = np.asarray(state.spec_number, np.float64)
    w = 2.0 * float(np.prod(cfg.box)) / (sn[0] * sn[0])
    np.testing.assert_array_equal(total * w, np.asarray(want))


def test_rdf_rows_matches_list_sampling():
    """rdf_refine_rows + rdf_sample_rows (the round-5 row-compacted
    per-stat-period RDF path) must reproduce rdf_sample_list's
    histogram BITWISE when the caps suffice: counts are integer-exact
    in f32 and every in-range pair lands once on its smaller-id row in
    both paths (ops/rdf.py docstrings)."""
    import dataclasses
    from aztotmd_tpu.ops.neighbors import build_outer_neighbors

    cfg, ff, state, aux = build_lj_argon(n_atoms=4096, density=1.4e-3,
                                         dtype="f32", seed=3)
    # a two-level-list-like view: outer reach well past the RDF reach
    cfg2 = dataclasses.replace(cfg, n_neigh2=24, nb_skin2=8.0)
    nbr2, _, _ = build_outer_neighbors(cfg2, state.pos)

    from aztotmd_tpu.core.config import make_cell_grid
    # the LJ lattice keeps min pair distance ~8.5 A at this density:
    # r_rdf must reach past it for a populated histogram
    r_rdf, d_rdf = 10.0, 0.1
    grid = make_cell_grid(cfg.box, r_rdf, cfg.n_at)
    rcfg = ops_rdf.RdfConfig(n_bin=int(r_rdf / d_rdf), d_rdf=d_rdf,
                             r2_max=r_rdf * r_rdf, n_spec=1, n_nucl=1,
                             nuclei=False, grid=grid)
    spec_nuclei = jnp.zeros((1,), jnp.int32)
    nucl_number = jnp.asarray([cfg.n_at], jnp.int32)
    h0, _ = ops_rdf.zero_hist(rcfg)

    ha, _ = ops_rdf.rdf_sample_list(cfg, rcfg, state.pos, state.types,
                                    state.spec_number, spec_nuclei,
                                    nucl_number, nbr2, h0, None)

    reach = r_rdf + 1.0
    tbl, over = ops_rdf.rdf_refine_rows(cfg, rcfg, state.pos, nbr2,
                                        reach, r_cap=4096, k_rdf=16)
    rows_need, k_need = int(over) // 1024, int(over) % 1024
    assert 0 < rows_need <= 4096 and 0 < k_need <= 16, (rows_need, k_need)
    hb, _ = ops_rdf.rdf_sample_rows(cfg, rcfg, state.pos, state.types,
                                    state.spec_number, spec_nuclei,
                                    nucl_number, tbl, h0, None)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
    assert float(np.asarray(ha).sum()) > 0

    # truncation is REPORTED: tiny caps must surface the true needs
    tbl2, over2 = ops_rdf.rdf_refine_rows(cfg, rcfg, state.pos, nbr2,
                                          reach, r_cap=8, k_rdf=2)
    rn2, kn2 = int(over2) // 1024, int(over2) % 1024
    assert rn2 == rows_need and kn2 == k_need


def test_ring_rdf_rows_matches_disabled(tmp_path):
    """End-to-end A/B: a dilute deck that engages the row-compacted
    RDF ring path must write byte-identical rdf.dat / stat.dat with
    the mode forced off (AZTOTMD_NO_RDF_ROWS)."""
    from aztotmd_tpu.runtime.runner import run_deck
    deck = str(tmp_path / "deck")
    os.makedirs(deck)
    # 16^3 = 4096 atoms, 12.7 A spacing, +-3 A jitter: most rows have
    # no entry at the ~7 A refine reach (the rows gate cap <= 0.7 N
    # engages) but the jitter puts a measurable pair population in
    # range for the byte-equality check
    n_side, spacing = 16, 12.7
    box = n_side * spacing
    g = np.arange(n_side) * spacing + 0.37 * spacing
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    pos += np.random.default_rng(4).uniform(-3.0, 3.0, pos.shape)
    pos %= box
    with open(os.path.join(deck, "atoms.xyz"), "w") as f:
        f.write(f"{len(pos)}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for p in pos:
            f.write(f"Ar\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    open(os.path.join(deck, "field.txt"), "w").write(
        "spec 1\nAr\tAr\t40.0\t0.0\t0.0\n"
        "red-ox 0\nvdw 1\nAr\tAr\tlnjs\t4.0\t0.01\t3.4\n")
    open(os.path.join(deck, "control.txt"), "w").write(
        "timestep 0.0005 ps\nnstep 400\n"
        "temperature 100.0\tnose\t0.5\ninit_vel\tgaus\n"
        "permittivity 1.0\nelec\tnone\n"
        "rdf\t6.0 0.05\t25\t0\t-nucl\nstat\t100\n")

    out_a = str(tmp_path / "rows")
    out_b = str(tmp_path / "norows")
    os.environ["AZTOTMD_RDF_ROWS"] = "1"       # experimental opt-in
    try:
        r = run_deck(deck, out_dir=out_a, n_steps=400, quiet=True)
        assert r._ring_plan.get("rdf_rows"), r._ring_plan
    finally:
        del os.environ["AZTOTMD_RDF_ROWS"]
    r2 = run_deck(deck, out_dir=out_b, n_steps=400, quiet=True)
    assert not r2._ring_plan.get("rdf_rows"), r2._ring_plan
    assert r2._ring_plan.get("rdf_from_outer"), r2._ring_plan
    for f in ("rdf.dat", "stat.dat", "msd.dat"):
        assert open(os.path.join(out_a, f)).read() == \
            open(os.path.join(out_b, f)).read(), f"{f} differs"


def test_rdf_counts_rows_cells_matches_rows_partition():
    """The O(C * stencil * cap) cell-candidate slab RDF
    (ops.rdf.rdf_counts_rows_cells — the big-N replacement for the
    O(C * N) rows-vs-global broadcast, round-5 mesh scale fix) must
    produce the SAME per-device partial counts as rdf_counts_rows on
    every row subset, and the partition must still sum to the
    all-pairs histogram."""
    cfg, ff, state, aux = build_lj_argon(n_atoms=240, density=0.012,
                                         dtype="f64", seed=13)
    from aztotmd_tpu.core.config import make_cell_grid
    r_rdf, d_rdf = 6.0, 0.1
    grid = make_cell_grid(cfg.box, r_rdf, cfg.n_at)
    rcfg = ops_rdf.RdfConfig(n_bin=int(r_rdf / d_rdf), d_rdf=d_rdf,
                             r2_max=r_rdf * r_rdf, n_spec=1, n_nucl=1,
                             nuclei=False, grid=grid)
    N = cfg.n_at
    pos, types = state.pos, state.types

    hist0, _ = ops_rdf.zero_hist(rcfg, jnp.float64)
    want, _ = ops_rdf.rdf_sample_allpairs(
        cfg, rcfg, pos, types, state.spec_number,
        jnp.zeros((1,), jnp.int32), jnp.asarray([N], jnp.int32), hist0)

    rng = np.random.default_rng(2)
    perm = rng.permutation(N)
    total = np.zeros((rcfg.n_bin, rcfg.n_pair))
    C = N // 4 + 3
    for d in range(4):
        own = perm[d * (N // 4):(d + 1) * (N // 4)] if d < 3 \
            else perm[3 * (N // 4):]
        gid = np.full(C, -1, np.int32)
        gid[:len(own)] = own
        row_pos = np.zeros((C, 3))
        row_pos[:len(own)] = np.asarray(pos)[own]
        row_types = np.zeros(C, np.int32)
        row_types[:len(own)] = np.asarray(types)[own]
        a = ops_rdf.rdf_counts_rows(
            cfg, rcfg, jnp.asarray(row_pos), jnp.asarray(gid),
            jnp.asarray(row_types), pos, types)
        b = ops_rdf.rdf_counts_rows_cells(
            cfg, rcfg, jnp.asarray(row_pos), jnp.asarray(gid),
            jnp.asarray(row_types), pos, types)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        total += np.asarray(b)

    sn = np.asarray(state.spec_number, np.float64)
    w = 2.0 * float(np.prod(cfg.box)) / (sn[0] * sn[0])
    np.testing.assert_array_equal(total * w, np.asarray(want))


def _tiny_deck(path, stat, fr_rdf, nstep=200):
    """Minimal 27-atom LJ deck with parameterized stat/rdf cadences."""
    os.makedirs(path, exist_ok=True)
    n_side, spacing = 3, 8.0
    box = n_side * spacing
    g = np.arange(n_side) * spacing + 0.37 * spacing
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   axis=-1).reshape(-1, 3)
    with open(os.path.join(path, "atoms.xyz"), "w") as f:
        f.write(f"{len(pos)}\n1 {box:.6f} {box:.6f} {box:.6f}\n")
        for p in pos:
            f.write(f"Ar\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    open(os.path.join(path, "field.txt"), "w").write(
        "spec 1\nAr\tAr\t40.0\t0.0\t0.0\n"
        "red-ox 0\nvdw 1\nAr\tAr\tlnjs\t4.0\t0.01\t3.4\n")
    open(os.path.join(path, "control.txt"), "w").write(
        "timestep 0.0002 ps\n"
        f"nstep {nstep}\n"
        "temperature 100.0\tnose\t0.5\ninit_vel\tgaus\n"
        "permittivity 1.0\nelec\tnone\n"
        f"rdf\t6.0 0.05\t{fr_rdf}\t{10 * nstep}\t-nucl\n"
        f"stat\t{stat}\n")


@pytest.mark.parametrize("stat,fr_rdf,want_ring", [
    (50, 50, True),    # rdf divides stat: ring engages
    (100, 50, True),   # rdf sub-blocks inside the stat period
    (10, 50, False),   # stat FINER than rdf: p_stat % p_rdf != 0
])
def test_ring_cadence_gate(tmp_path, stat, fr_rdf, want_ring):
    """The on-device stat ring requires every rdf sub-block to fit
    inside a stat period (p_stat % p_rdf == 0, runner.py ring_ok).
    A stat-10/rdf-50 deck silently falls back to legacy per-period
    host sampling — pin the gate so a cadence change can't silently
    disengage the fast path (this bit tools/bench_mesh_bigN.py in
    round 5: the 320k scale deck was generated with stat=10 and lost
    the ring)."""
    from aztotmd_tpu.runtime.runner import MDRunner
    from aztotmd_tpu.runtime.setup import load_deck_dir
    deck = str(tmp_path / f"deck_{stat}_{fr_rdf}")
    _tiny_deck(deck, stat=stat, fr_rdf=fr_rdf)
    r = MDRunner(load_deck_dir(deck, dtype="f32"),
                 out_dir=str(tmp_path / "out"), quiet=True)
    assert r.ring_ok == want_ring
    if want_ring:
        # the ring must still deliver correct results at this cadence
        r.run(100)
        assert r.n_dispatch <= 100 // stat + 1


def test_ring_runs_f64_deck(tmp_path):
    """f64 validation mode through the PRODUCTION ring path: the RDF
    histogram buffers are f32 ring carries, and an f64-mode sample
    must not promote them mid-scan (scan carry dtype mismatch — found
    on the first f64 run with x64 actually enabled, round 5; fixed by
    dtype-stable accumulation in ops.rdf._apply_weights)."""
    from aztotmd_tpu.runtime.runner import MDRunner
    from aztotmd_tpu.runtime.setup import load_deck_dir
    deck = str(tmp_path / "deck_f64")
    _tiny_deck(deck, stat=50, fr_rdf=50, nstep=100)
    r = MDRunner(load_deck_dir(deck, dtype="f64"),
                 out_dir=str(tmp_path / "out_f64"), quiet=True)
    assert r.ring_ok
    assert r.state.pos.dtype == jnp.float64
    r.run(100)
    s = open(str(tmp_path / "out_f64" / "stat.dat")).read()
    assert len(s.splitlines()) >= 3          # header x2 + a stat row
