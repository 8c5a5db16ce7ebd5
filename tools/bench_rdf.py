"""Micro-bench of RDF all-pairs histogram variants on the real TPU.

cs2's end-to-end is RDF-bound (~260 ms/sample measured round 3 for the
(n_slot, E) equality-compare histogram at E=16M, n_slot=400).  This
bench isolates the histogram count step and compares:

  A  current rdf_sample_allpairs (production path)
  B  A + optimization_barrier on the flat ids (stops XLA re-fusing the
     sqrt/id pipeline into every slot-tile of the compare-reduce)
  C  cumulative edge compares, lanes-last, i-chunked lax.scan
     (no sqrt, no flat ids: bin b holds r2 in [(b*d)^2, ((b+1)*d)^2))
  D  C without the scan: one fused (N, N, n_edge) broadcast reduce

Run: timeout 590 python tools/bench_rdf.py   (TPU, serial, background)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.ops import rdf as R

    sysd = load_deck_dir("/root/reference/case study 2", dtype="f32")
    cfg, state, ctl = sysd["cfg"], sysd["state"], sysd["ctl"]
    rcfg = R.make_rdf_config(ctl, cfg, pos=np.asarray(state.pos))
    N = cfg.n_at
    print(f"N={N} n_bin={rcfg.n_bin} n_pair={rcfg.n_pair} "
          f"r2_max={rcfg.r2_max}", file=sys.stderr)
    pos = state.pos
    types = state.types
    dt = pos.dtype

    hist = jnp.zeros((rcfg.n_bin, rcfg.n_pair), dt)
    sn = state.spec_number
    snuc = sysd["ff"].spec_nuclei if hasattr(sysd["ff"], "spec_nuclei") \
        else jnp.zeros((cfg.n_spec,), jnp.int32)
    nnum = jnp.ones((max(cfg.n_nucl, 1),), jnp.int32)

    def variant_A(pos):
        h, _ = R.rdf_sample_allpairs(cfg, rcfg, pos, types, sn, snuc,
                                     nnum, hist, None)
        return h

    def _r2_mask(pos):
        box = jnp.asarray(cfg.box, dt)
        r2 = jnp.zeros((N, N), dt)
        for k in range(3):
            d = pos[:, k][:, None] - pos[:, k][None, :]
            d = d - box[k] * jnp.round(d / box[k])
            r2 = r2 + d * d
        own = jnp.arange(N, dtype=jnp.int32)
        mask = (own[:, None] < own[None, :]) & (r2 < rcfg.r2_max)
        return r2, mask

    def variant_B(pos):
        r2, mask = _r2_mask(pos)
        r = jnp.sqrt(jnp.where(mask, r2, 1.0))
        ib = jnp.minimum((r / rcfg.d_rdf).astype(jnp.int32),
                         rcfg.n_bin - 1)
        B = rcfg.n_bin
        flat = jax.lax.optimization_barrier(
            jnp.where(mask, ib, B).reshape(-1))
        slots = jnp.arange(B, dtype=jnp.int32)
        return jnp.sum((flat[None, :] == slots[:, None]).astype(dt),
                       axis=1)

    edges = (np.arange(rcfg.n_bin, dtype=np.float64) * rcfg.d_rdf) ** 2
    e2_np = np.append(edges, rcfg.r2_max).astype(np.float32)

    def _cum_counts(r2, mask, e2):
        c = jnp.sum(jnp.where(mask[:, :, None], r2[:, :, None] < e2,
                              False).astype(dt), axis=(0, 1))
        return c[1:] - c[:-1]

    def variant_D(pos):
        r2, mask = _r2_mask(pos)
        e2 = jnp.asarray(e2_np)
        return _cum_counts(r2, mask, e2)

    def variant_C(pos, chunk=256):
        e2 = jnp.asarray(e2_np)
        box = jnp.asarray(cfg.box, dt)
        n_pad = ((N + chunk - 1) // chunk) * chunk
        padded = jnp.concatenate(
            [pos, jnp.full((n_pad - N, 3), 1e6, dt)], axis=0)
        own_all = jnp.arange(n_pad, dtype=jnp.int32)
        pc = padded.reshape(-1, chunk, 3)
        oc = own_all.reshape(-1, chunk)

        def body(acc, xs):
            pch, och = xs
            r2 = jnp.zeros((chunk, N), dt)
            for k in range(3):
                d = pch[:, k][:, None] - pos[:, k][None, :]
                d = d - box[k] * jnp.round(d / box[k])
                r2 = r2 + d * d
            mask = (och[:, None] < jnp.arange(N, dtype=jnp.int32)[None]) \
                & (r2 < rcfg.r2_max)
            c = jnp.sum(jnp.where(mask[:, :, None],
                                  r2[:, :, None] < e2, False).astype(dt),
                        axis=(0, 1))
            return acc + c, None
        acc, _ = jax.lax.scan(body, jnp.zeros((rcfg.n_bin + 1,), dt),
                              (pc, oc))
        return acc[1:] - acc[:-1]

    variants = [("A_current", variant_A), ("B_barrier", variant_B),
                ("C_cum_scan", variant_C), ("D_cum_fused", variant_D)]
    results = {}
    for name, fn in variants:
        f = jax.jit(fn)
        try:
            out = jax.block_until_ready(f(pos))
        except Exception as e:
            print(f"{name}: FAILED {e}", file=sys.stderr)
            continue
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            out = f(pos)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / reps * 1e3
        results[name] = ms
        tot = float(jnp.sum(out))
        print(f"{name}: {ms:.2f} ms/sample  (checksum {tot:.1f})",
              file=sys.stderr)
    print(results)


if __name__ == "__main__":
    main()
