"""Micro-bench of the per-step pair-pass position gather on the real
TPU (the cs1 hot kernel: fusion.42 = pos_p[cand] at 202 us/step, plus
~50 us/step of per-step index clamp/select preprocessing that XLA fails
to hoist out of the 50-step scan even though cand is loop-invariant).

Variants (all end in the same per-atom force-like reduce so the gather
materializes exactly as in pair_forces_neighbors):
  A  baseline        pos_p[cand] default indexing (fill_or_drop: pads,
                     clamps, compare+select per step)
  B  promise         x.at[cand].get(mode="promise_in_bounds") — indices
                     are in [0, N] by construction (N = dump row)
  C  pad4            (N+1, 4) table (x,y,z,0) instead of (N+1, 3)
  D  morton          same graph, atoms renumbered along a Z-order curve
                     (gather locality: neighbor rows land in nearby
                     (8,128) tiles) — measures the locality headroom of
                     keeping the state spatially sorted
  E  morton+promise  D + B combined

Run: timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/bench_gather.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, pos, reps=10, inner=50):
    """Scan the op `inner` times inside ONE jitted program (mirrors the
    real 50-step block, so per-iter costs are not dispatch-floor-bound),
    value-chain reps, one hard d2h sync (see tools/bench_nbr.py)."""
    @jax.jit
    def chained(p):
        def body(p_, _):
            return p_ + 1e-7 * fn(p_), None
        p, _ = jax.lax.scan(body, p, None, length=inner)
        return p

    try:
        p = chained(pos)
        np.asarray(p)
        t0 = time.time()
        for _ in range(reps):
            p = chained(p)
        np.asarray(p)
        us = (time.time() - t0) / (reps * inner) * 1e6
        print(f"{name}: {us:.1f} us/iter", file=sys.stderr)
        return us
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return None


def min_image(delta, box):
    return delta - box * jnp.round(delta / box)


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import make_multi_step

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    cfg, state, ff, aux = (sysd["cfg"], sysd["state"], sysd["ff"],
                           sysd["aux"])
    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))
    N = cfg.n_at
    cand = np.asarray(state.nbr_idx)          # (N, K) inner list
    K = cand.shape[1]
    pos_np = np.asarray(state.pos)
    box = np.asarray(cfg.box, np.float32)
    n_real = int((cand != N).sum())
    print(f"N={N} K={K} real_entries={n_real}", file=sys.stderr)

    def physics(pos_p, cand_dev, p):
        d = min_image(p[:, None, :] - pos_p[cand_dev][..., :3],
                      jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((cand_dev != N) & (r2 < 25.0), 1.0 / (r2 + 1.0),
                      0.0)
        return jnp.sum(d * w[..., None], axis=1)   # per-atom (N,3)

    cand_d = jax.device_put(jnp.asarray(cand))

    def a_fn(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        return physics(pos_p, cand_d, p)

    def b_fn(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        d = min_image(
            p[:, None, :]
            - pos_p.at[cand_d].get(mode="promise_in_bounds"),
            jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((cand_d != N) & (r2 < 25.0), 1.0 / (r2 + 1.0), 0.0)
        return jnp.sum(d * w[..., None], axis=1)

    def c_fn(p):
        pos4 = jnp.concatenate(
            [jnp.pad(p, ((0, 1), (0, 0))),
             jnp.zeros((N + 1, 1), p.dtype)], axis=1)
        d = min_image(p[:, None, :] - pos4[cand_d][..., :3],
                      jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((cand_d != N) & (r2 < 25.0), 1.0 / (r2 + 1.0), 0.0)
        return jnp.sum(d * w[..., None], axis=1)

    timeit("A baseline      ", a_fn, jnp.asarray(pos_np))
    timeit("B promise       ", b_fn, jnp.asarray(pos_np))
    timeit("C pad4          ", c_fn, jnp.asarray(pos_np))

    # Morton renumbering: perm[r] = old id at new row r
    cell = 8.0
    ix = (pos_np / cell).astype(np.int64)

    def spread(v):
        v &= (1 << 21) - 1
        v = (v | (v << 32)) & 0x1F00000000FFFF
        v = (v | (v << 16)) & 0x1F0000FF0000FF
        v = (v | (v << 8)) & 0x100F00F00F00F00F
        v = (v | (v << 4)) & 0x10C30C30C30C30C3
        v = (v | (v << 2)) & 0x1249249249249249
        return v

    key = spread(ix[:, 0]) | (spread(ix[:, 1]) << 1) | (spread(ix[:, 2]) << 2)
    perm = np.argsort(key, kind="stable")          # new row -> old id
    inv = np.empty(N + 1, np.int64)
    inv[perm] = np.arange(N)
    inv[N] = N                                     # dump row maps to dump
    pos_m = pos_np[perm]
    cand_m = inv[cand[perm]].astype(np.int32)      # renumbered graph
    cand_md = jax.device_put(jnp.asarray(cand_m))

    def d_fn(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        d = min_image(p[:, None, :] - pos_p[cand_md], jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((cand_md != N) & (r2 < 25.0), 1.0 / (r2 + 1.0),
                      0.0)
        return jnp.sum(d * w[..., None], axis=1)

    def e_fn(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        d = min_image(
            p[:, None, :]
            - pos_p.at[cand_md].get(mode="promise_in_bounds"),
            jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((cand_md != N) & (r2 < 25.0), 1.0 / (r2 + 1.0),
                      0.0)
        return jnp.sum(d * w[..., None], axis=1)

    timeit("D morton        ", d_fn, jnp.asarray(pos_m))
    timeit("E morton+promise", e_fn, jnp.asarray(pos_m))

    # F: compacted pair list — ~442 real pairs at cs1 density means the
    # padded (N, K) walk does 360x more gather rows than physics needs.
    # Cost structure: two (P,3) gathers + physics + one (P -> N) dual
    # scatter-add.  The scatter is the suspect (CLAUDE.md: 40k-row
    # scatters onto small tables are slow; here it is P=1024 rows onto
    # (N+1,3)).
    ii, kk = np.nonzero(cand != N)
    jj = cand[ii, kk]
    P = 1024
    pi = np.full(P, N, np.int32)
    pj = np.full(P, N, np.int32)
    pi[:len(ii)] = ii
    pj[:len(jj)] = jj
    pi_d = jax.device_put(jnp.asarray(pi))
    pj_d = jax.device_put(jnp.asarray(pj))

    def f_fn(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        a = pos_p[pi_d]
        b = pos_p[pj_d]
        d = min_image(a - b, jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((pi_d != N) & (r2 < 25.0), 1.0 / (r2 + 1.0), 0.0)
        f = d * w[:, None]
        out = (jnp.zeros((N + 1, 3), p.dtype)
               .at[pi_d].add(f).at[pj_d].add(-f))
        return out[:N]

    timeit("F pairlist+scat ", f_fn, jnp.asarray(pos_np))

    # floors: G = no physics at all (scan + chained add only);
    # H = alloc + dual scatter only (no gathers/physics);
    # I = F with P=4096 (capacity sensitivity)
    def g_fn(p):
        return p

    def h_fn(p):
        f = jnp.ones((P, 3), p.dtype)
        out = (jnp.zeros((N + 1, 3), p.dtype)
               .at[pi_d].add(f).at[pj_d].add(-f))
        return out[:N]

    P4 = 4096
    pi4 = np.full(P4, N, np.int32)
    pj4 = np.full(P4, N, np.int32)
    pi4[:len(ii)] = ii
    pj4[:len(jj)] = jj
    pi4_d = jax.device_put(jnp.asarray(pi4))
    pj4_d = jax.device_put(jnp.asarray(pj4))

    def i_fn(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        a = pos_p[pi4_d]
        b = pos_p[pj4_d]
        d = min_image(a - b, jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((pi4_d != N) & (r2 < 25.0), 1.0 / (r2 + 1.0), 0.0)
        f = d * w[:, None]
        out = (jnp.zeros((N + 1, 3), p.dtype)
               .at[pi4_d].add(f).at[pj4_d].add(-f))
        return out[:N]

    timeit("G scan floor    ", g_fn, jnp.asarray(pos_np))
    timeit("H scatter only  ", h_fn, jnp.asarray(pos_np))
    timeit("I pairlist P4096", i_fn, jnp.asarray(pos_np))

    # isolate: gathers vs scatters vs index shape
    def j_fn(p):   # gathers only, P=1024, 1-D index
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        return jnp.sum(pos_p[pi_d] - pos_p[pj_d], axis=0,
                       keepdims=True) * jnp.ones((N, 1), p.dtype)

    def k_fn(p):   # gathers only, P=4096, 1-D index
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        return jnp.sum(pos_p[pi4_d] - pos_p[pj4_d], axis=0,
                       keepdims=True) * jnp.ones((N, 1), p.dtype)

    def l_fn(p):   # scatter only, P=4096
        f = jnp.ones((P4, 3), p.dtype)
        out = (jnp.zeros((N + 1, 3), p.dtype)
               .at[pi4_d].add(f).at[pj4_d].add(-f))
        return out[:N]

    pi2d = jax.device_put(jnp.asarray(pi4.reshape(32, 128)))
    pj2d = jax.device_put(jnp.asarray(pj4.reshape(32, 128)))

    def m_fn(p):   # gathers only, P=4096, (32,128) 2-D index
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        return jnp.sum(pos_p[pi2d] - pos_p[pj2d], axis=(0, 1),
                       keepdims=True).reshape(1, 3) \
            * jnp.ones((N, 1), p.dtype)

    def n_fn(p):   # full pairlist physics, 2-D index + dual scatter
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        a = pos_p[pi2d]
        b = pos_p[pj2d]
        d = min_image(a - b, jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((pi2d != N) & (r2 < 25.0), 1.0 / (r2 + 1.0), 0.0)
        f = (d * w[..., None]).reshape(P4, 3)
        out = (jnp.zeros((N + 1, 3), p.dtype)
               .at[pi4_d].add(f).at[pj4_d].add(-f))
        return out[:N]

    timeit("J gath P1024 1d ", j_fn, jnp.asarray(pos_np))
    timeit("K gath P4096 1d ", k_fn, jnp.asarray(pos_np))
    timeit("L scat P4096    ", l_fn, jnp.asarray(pos_np))
    timeit("M gath P4096 2d ", m_fn, jnp.asarray(pos_np))
    timeit("N pair P4096 2d ", n_fn, jnp.asarray(pos_np))

    # O: row-compacted neighbor walk — only rows with >=1 real
    # neighbor (both directions present, so i-side accumulation alone
    # is exact), (R, K) walk + per-row reduce + UNIQUE-index scatter.
    # Bitwise-identical per-row sums to the dense (N, K) walk.
    has = (cand != N).any(axis=1)
    rows_real = np.nonzero(has)[0]
    R = 2048
    rows = np.full(R, N, np.int32)
    rows[:len(rows_real)] = rows_real
    cand_r = np.full((R, K), N, np.int32)
    cand_r[:len(rows_real)] = cand[rows_real]
    rows_d = jax.device_put(jnp.asarray(rows))
    cand_rd = jax.device_put(jnp.asarray(cand_r))
    print(f"rows with neighbors: {len(rows_real)} (R_cap={R})",
          file=sys.stderr)

    def o_fn(p):
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        a = pos_p[rows_d]                      # (R, 3)
        b = pos_p[cand_rd]                     # (R, K, 3)
        d = min_image(a[:, None, :] - b, jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((cand_rd != N) & (r2 < 25.0),
                      1.0 / (r2 + 1.0), 0.0)
        f = jnp.sum(d * w[..., None], axis=1)  # (R, 3)
        out = jnp.zeros((N + 1, 3), p.dtype).at[rows_d].add(
            f, unique_indices=True)
        return out[:N]

    def o2_fn(p):  # same but sorted+unique flags
        pos_p = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        a = pos_p[rows_d]
        b = pos_p[cand_rd]
        d = min_image(a[:, None, :] - b, jnp.asarray(box))
        r2 = jnp.sum(d * d, axis=-1)
        w = jnp.where((cand_rd != N) & (r2 < 25.0),
                      1.0 / (r2 + 1.0), 0.0)
        f = jnp.sum(d * w[..., None], axis=1)
        out = jnp.zeros((N + 1, 3), p.dtype).at[rows_d].add(
            f, unique_indices=True, indices_are_sorted=True)
        return out[:N]

    timeit("O rowcomp R2048 ", o_fn, jnp.asarray(pos_np))
    timeit("O2 rowcomp+sort ", o2_fn, jnp.asarray(pos_np))

    # how local did the graph get?
    real = cand_m != N
    rows = np.broadcast_to(np.arange(N)[:, None], cand_m.shape)
    dist = np.abs(cand_m - rows)[real]
    if dist.size:
        print(f"morton |j-i| median={np.median(dist):.0f} "
              f"p90={np.percentile(dist, 90):.0f} max={dist.max()}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
