"""Micro-bench of neighbor-list candidate-pass variants on the real TPU.

The full candidate pass (ops/neighbors.build_neighbors) costs ~63 ms at
cs1 scale and is the dominant ring overhead (tools/bench_ring.py) plus
the bare engine's outer-rebuild cost.  Hypothesis: the (N, M) int32
table gather is HBM-latency-bound (~6.6 ns/element) and the follow-up
(N, M, 3) AoS position gather doubles the latency walk; fusing position
and index into one (n_cell*cap, 4) float table row should roughly halve
the pass.  The 8.6M-element compaction scatter is the other suspect —
a row sort both avoids it and upgrades truncation to nearest-K.

Variants (same (N, K) contract as build_neighbors):
  A  current build_neighbors
  B  fused pos+idx table, cumsum+scatter compaction (current)
  C  fused pos+idx table, row-sort compaction (nearest-K)
  D  current two-gather candidates, row-sort compaction

Run: timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \\
       python tools/bench_nbr.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, pos, reps=30):
    """VALUE-chained timing with one final d2h readback.

    Methodology (measured on the axon TPU backend, 2026-08):
      * jax.block_until_ready is NOT a reliable barrier here — when a
        jitted output aliases an input (e.g. `p + 0 * x` folds to `p`),
        "blocked" calls measured 0.05 ms for a program whose true cost
        is 61 ms.  A final np.asarray (d2h) is the only hard sync.
      * each rep's input must VALUE-depend on the previous rep's output,
        or reps can overlap/elide.
      * a per-rep d2h measures the tunnel round trip (~100-400 ms), so
        sync ONCE after a long chain and divide.
    """
    @jax.jit
    def chained(p):
        out = fn(p)
        return out, p + 1e-6 * out[1].astype(p.dtype)

    try:
        out, p = chained(pos)
        np.asarray(p)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return None, None
    t0 = time.time()
    for _ in range(reps):
        out, p = chained(p)
    np.asarray(p)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name}: {ms:.2f} ms/call", file=sys.stderr)
    return ms, out


def main():
    import dataclasses
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.ops import rdf as R
    from aztotmd_tpu.ops import cell_list as cl
    from aztotmd_tpu.ops.neighbors import build_neighbors
    from aztotmd_tpu.ops.pairs import min_image

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    cfg, state, ctl, fld = (sysd["cfg"], sysd["state"], sysd["ctl"],
                            sysd["fld"])
    pos_h = np.asarray(sysd["atoms"].pos, np.float64)
    m_min = min([sp.mass for sp in fld.species if sp.mass > 0], default=0.0)
    rcfg = R.make_rdf_config(ctl, cfg, pos=pos_h, m_min=m_min)
    lcfg = R.rdf_list_cfg(cfg, rcfg)
    N = cfg.n_at
    pos = state.pos

    for tag, ccfg in (("rdf_list", lcfg),
                      ("outer_list", dataclasses.replace(
                          cfg, n_neigh=cfg.n_neigh2,
                          nb_skin=cfg.nb_skin2))):
        gcfg = dataclasses.replace(ccfg, grid=ccfg.nb_grid)
        grid = gcfg.grid
        K = ccfg.n_neigh
        cap = grid.cap
        S = len(grid.stencil)
        M = S * cap
        r_nb = ccfg.r_max + ccfg.nb_skin
        print(f"\n[{tag}] K={K} cap={cap} S={S} M={M} reach={r_nb:.2f} "
              f"n_cell={grid.n_cell}", file=sys.stderr)
        dt = pos.dtype

        def stencil_slots(p):
            coords = cl.cell_coords(gcfg, p)
            dims = jnp.asarray(grid.dims, jnp.int32)
            offs = jnp.asarray(cl.stencil_offsets(gcfg))
            ncoord = (coords[:, None, :] + offs[None, :, :]) % dims
            _, ncy, ncz = grid.dims
            ncid = (ncoord[..., 0] * ncy + ncoord[..., 1]) * ncz \
                + ncoord[..., 2]
            return (ncid[:, :, None] * cap
                    + jnp.arange(cap, dtype=jnp.int32)[None, None, :]
                    ).reshape(N, -1)

        def build_ptab(p):
            cid = cl.cell_ids(gcfg, cl.cell_coords(gcfg, p))
            order = jnp.argsort(cid)
            scid = cid[order]
            first = jnp.searchsorted(scid, scid, side="left")
            rank = jnp.arange(N, dtype=jnp.int32) - first.astype(jnp.int32)
            slot = jnp.where(rank < cap, scid * cap + rank,
                             grid.n_cell * cap)
            rows = jnp.concatenate(
                [p[order], order[:, None].astype(dt)], axis=1)
            ptab = jnp.zeros((grid.n_cell * cap, 4), dt)
            ptab = ptab.at[:, 3].set(float(N))
            ptab = ptab.at[slot].set(rows, mode="drop")
            return ptab

        own = jnp.arange(N, dtype=jnp.int32)[:, None]
        cols = max(1, int((2 << 30) // max(N * 128 * 4, 1)))

        def fused_r2_cand(p):
            ptab = build_ptab(p)
            slots = stencil_slots(p)
            outs = []
            for i in range(0, M, cols):
                g = ptab[slots[:, i:i + cols]]
                c = g[..., 3].astype(jnp.int32)
                delta = min_image(p[:, None, :] - g[..., :3], cfg)
                outs.append((jnp.sum(delta * delta, axis=-1), c))
            r2 = jnp.concatenate([o[0] for o in outs], axis=1)
            cand = jnp.concatenate([o[1] for o in outs], axis=1)
            mask = (cand != N) & (cand != own) & (r2 <= r_nb * r_nb)
            return r2, cand, mask

        def current_r2_cand(p):
            coords = cl.cell_coords(gcfg, p)
            table, _ = cl.build_cell_table(gcfg, p)
            cand = cl.gather_candidates(gcfg, table, coords)
            pos_p = jnp.concatenate([p, jnp.zeros((1, 3), dt)], axis=0)
            outs = []
            for i in range(0, M, cols):
                delta = min_image(p[:, None, :] - pos_p[cand[:, i:i + cols]],
                                  cfg)
                outs.append(jnp.sum(delta * delta, axis=-1))
            r2 = jnp.concatenate(outs, axis=1)
            mask = (cand != N) & (cand != own) & (r2 <= r_nb * r_nb)
            return r2, cand, mask

        def compact_scatter(r2, cand, mask):
            cnt = jnp.cumsum(mask, axis=1)
            rows = jnp.arange(N, dtype=jnp.int32)[:, None]
            tgt = jnp.where(mask & (cnt <= K), cnt - 1, K)
            flat = (rows * (K + 1) + tgt).reshape(-1)
            out = jnp.full((N * (K + 1),), N, jnp.int32)
            out = out.at[flat].set(cand.reshape(-1), mode="drop")
            return out.reshape(N, K + 1)[:, :K], jnp.max(cnt[:, -1])

        def compact_sort(r2, cand, mask):
            key = jnp.where(mask, r2, jnp.inf).astype(jnp.float32)
            skey, sval = jax.lax.sort((key, cand), dimension=1,
                                      num_keys=1)
            idx = jnp.where(jnp.isfinite(skey[:, :K]), sval[:, :K], N)
            return idx, jnp.max(jnp.sum(mask, axis=1))

        variants = [
            ("A_current", lambda p: build_neighbors(ccfg, p)[:2]),
            ("B_fused_scatter", lambda p: compact_scatter(*fused_r2_cand(p))),
            ("C_fused_sort", lambda p: compact_sort(*fused_r2_cand(p))),
            ("D_current_sort", lambda p: compact_sort(*current_r2_cand(p))),
        ]
        outs = {}
        for name, fn in variants:
            ms, out = timeit(f"{tag}/{name}", fn, pos)
            if out is not None:
                idx = np.asarray(out[0])
                # order-invariant checksum: sorted row contents
                outs[name] = np.sort(idx, axis=1)
        ref = outs.get("A_current")
        for name, v in outs.items():
            if ref is not None and name != "A_current":
                same = np.array_equal(np.where(v < N, v, N),
                                      np.where(ref < N, ref, N))
                print(f"  {name} rows == A: {same}", file=sys.stderr)


if __name__ == "__main__":
    main()
