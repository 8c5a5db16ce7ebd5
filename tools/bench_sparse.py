"""Pair-pass micro-bench: Morton block-sparse kernel vs block engine vs
dense Pallas on LARGE clustered systems (the >8k-atom regime the dense
O(N^2) kernel can no longer cover; STATUS.md round-3 gap).

Synthetic decks: n_clusters dense LJ clusters (~0.5 atoms/A^3 core)
scattered in a large periodic box — the multi-cluster generalization of
case study 2's geometry at sizes the reference never reaches.

Run: timeout 3600 env PYTHONPATH=/root/repo:/root/.axon_site \\
       python tools/bench_sparse.py
NEVER kill mid-compile (wedges the tunnel d2h path for hours).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, pos, reps=20):
    """Value-chained timing, one final d2h sync (tools/bench_nbr.py)."""
    @jax.jit
    def chained(p):
        out = fn(p)
        return out, p + 1e-6 * out.frc.astype(p.dtype)

    try:
        t0 = time.time()
        out, p = chained(pos)
        np.asarray(p)
        warm = time.time() - t0
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return None, None
    t0 = time.time()
    for _ in range(reps):
        out, p = chained(p)
    np.asarray(p)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name}: {ms:.3f} ms/call (warm/compile {warm:.1f}s)",
          file=sys.stderr)
    return ms, out


def clustered(n_atoms, n_clusters, box, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(12.0, box - 12.0, size=(n_clusters, 3))
    per = n_atoms // n_clusters
    rad = (per / 0.5 * 3.0 / (4 * np.pi)) ** (1 / 3)   # ~0.5 atoms/A^3
    chunks = []
    for k in range(n_clusters):
        u = rng.normal(size=(per, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        r = rad * rng.uniform(size=(per, 1)) ** (1 / 3)
        chunks.append(centers[k] + u * r)
    rest = n_atoms - per * n_clusters
    if rest:
        chunks.append(rng.uniform(0, box, size=(rest, 3)))
    return np.concatenate(chunks) % box


def main():
    import dataclasses
    from aztotmd_tpu import units
    from aztotmd_tpu.core.config import build_sim_config
    from aztotmd_tpu.core.ffield import build_forcefield
    from aztotmd_tpu.io.control import ControlSpec, ElecSpec, TStatSpec
    from aztotmd_tpu.io.field import VDW_LJ, FieldSpec, SpeciesSpec, VdWSpec
    from aztotmd_tpu.ops.cellblock import pair_forces_block
    from aztotmd_tpu.ops.pallas_pair import pair_forces_allpairs
    from aztotmd_tpu.ops.pallas_sparse import (estimate_sparse_pairs,
                                               pair_forces_sparse)

    import os
    rcut = 5.0
    cases = {8192: (8192, 6, 120.0), 20000: (20000, 12, 180.0),
             40000: (40000, 24, 240.0)}
    sizes = [int(s) for s in os.environ.get(
        "AZTOT_SPARSE_SIZES", "8192,20000,40000").split(",")]
    tiles = [int(t) for t in os.environ.get(
        "AZTOT_SPARSE_TILES", "128,256,512").split(",")]
    for n_atoms, n_clusters, box in (cases[s] for s in sizes):
        pos = clustered(n_atoms, n_clusters, box)
        f = FieldSpec()
        f.species = [SpeciesSpec(name="S0", nuclei=0,
                                 mass=39.9 * units.M_SCALE, charge=0.0,
                                 energy=0.0)]
        f.nnames = ["S0"]
        f.nnumbers = [0]
        f.pairpots = [VdWSpec(type=VDW_LJ, spec1=0, spec2=0,
                              r2cut=rcut * rcut, p0=4 * 0.01,
                              p1=3.4 * 3.4, p2=24 * 0.01)]
        f.vdw_index = [[0]]
        f.maxRvdw = rcut
        ctl = ControlSpec(t_step=0.001, n_step=1,
                          tstat=TStatSpec(type=0, temp=100.0),
                          elec=ElecSpec(type=0, r_real=rcut))
        cfg = build_sim_config(ctl, f, (box,) * 3, n_atoms, dtype="f32",
                               pos=pos, pair_engine="block")
        ff = build_forcefield(f, ctl.t_step, dtype=np.float32)
        g = cfg.grid
        bc = len(g.stencil) * g.cap * g.cap * g.n_cell
        print(f"\n=== N={n_atoms} clusters={n_clusters} box={box} "
              f"auto={cfg.pair_engine} block_cost={bc:.2e} "
              f"cap={g.cap} ===", file=sys.stderr)
        for T in tiles:
            est = estimate_sparse_pairs(cfg.box, cfg.r_max, pos, T)
            n_t = -(-n_atoms // T)
            print(f"  T={T}: worklist {est} of {n_t * n_t} "
                  f"({est * T * T:.2e} slot-pairs)", file=sys.stderr)
        pos_j = jnp.asarray(pos, jnp.float32)
        types = jnp.zeros((n_atoms,), jnp.int32)

        outs = {}
        variants = [("block", lambda p: pair_forces_block(
            cfg, ff, p, types))]
        if n_atoms <= 20000:
            variants.append(("dense_T512", lambda p: pair_forces_allpairs(
                cfg, ff, p, types)))
        for T in tiles:
            cap = min(int(estimate_sparse_pairs(cfg.box, cfg.r_max,
                                                pos, T) * 1.3) + 64,
                      (-(-n_atoms // T)) ** 2)
            variants.append((f"sparse_T{T}", (
                lambda TT, cc: lambda p: pair_forces_sparse(
                    cfg, ff, p, types, tile=TT, pair_cap=cc))(T, cap)))
        for name, fn in variants:
            ms, out = timeit(f"N{n_atoms}/{name}", fn, pos_j)
            if out is not None:
                outs[name] = (np.asarray(out.frc), float(out.eng_vdw))
        ref_name = "block" if "block" in outs else "dense_T512"
        ref = outs.get(ref_name)
        if ref is not None:
            scale = np.abs(ref[0]).max() or 1.0
            for name, (frc, ev) in outs.items():
                if name == ref_name:
                    continue
                md = np.abs(frc - ref[0]).max() / scale
                ed = abs(ev - ref[1]) / max(abs(ref[1]), 1e-9)
                print(f"  {name}: frc reldiff {md:.2e} "
                      f"eng reldiff {ed:.2e}", file=sys.stderr)


if __name__ == "__main__":
    main()
