"""Histogram strategy shoot-out at cs2 scale (E = 16M ids, 400 slots):
the (n_slot, E) masked-compare reduce runs at VPU rate — 6.4e9
compare+adds ~ 6.6 ms at peak, which IS the measured cs2 RDF cost.
Candidate replacements:

  compare      the production path (ids[None,:] == slots[:,None]).sum
  dot_bf16     ones(1,E) @ onehot(E, n_slot) as bf16 MXU matmul —
               exact while per-bin counts < 2^24 (f32 accumulation);
               wins IFF XLA fuses the compare into the dot operand
               instead of materializing (E, n_slot)
  dot_chunk    same, scanned over E-chunks (bounds any materialization)
  sort16m      jnp.sort + searchsorted (the CPU path, for reference)

Run: env PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
     python tools/bench_hist.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

E = 16_000_000
NSLOT = 400


def timeit(name, fn, *args, reps=10):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return None, None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name}: {ms:.3f} ms", file=sys.stderr)
    return ms, out


def main():
    rng = np.random.default_rng(0)
    # ~5% of ids in [0, NSLOT), rest at the drop slot (the cs2 mask
    # profile: most pairs out of RDF range)
    ids_h = np.where(rng.random(E) < 0.05,
                     rng.integers(0, NSLOT, E),
                     NSLOT).astype(np.int32)
    ids = jnp.asarray(ids_h)
    want = np.bincount(ids_h, minlength=NSLOT + 1)[:NSLOT]

    slots = jnp.arange(NSLOT, dtype=jnp.int32)

    @jax.jit
    def compare(ids):
        x = jax.lax.optimization_barrier(ids)
        return jnp.sum((x[None, :] == slots[:, None]).astype(jnp.float32),
                       axis=1)

    @jax.jit
    def dot_bf16(ids):
        x = jax.lax.optimization_barrier(ids)
        oh = (x[:, None] == slots[None, :]).astype(jnp.bfloat16)
        return jnp.matmul(jnp.ones((1, E), jnp.bfloat16), oh,
                          preferred_element_type=jnp.float32)[0]

    @jax.jit
    def dot_chunk(ids):
        x = jax.lax.optimization_barrier(ids).reshape(64, -1)

        def body(acc, row):
            oh = (row[:, None] == slots[None, :]).astype(jnp.bfloat16)
            return acc + jnp.matmul(
                jnp.ones((1, row.shape[0]), jnp.bfloat16), oh,
                preferred_element_type=jnp.float32)[0], None
        acc, _ = jax.lax.scan(body, jnp.zeros((NSLOT,), jnp.float32), x)
        return acc

    @jax.jit
    def sort16m(ids):
        s = jnp.sort(ids)
        edges = jnp.arange(NSLOT + 1, dtype=jnp.int32)
        pos = jnp.searchsorted(s, edges, side="left")
        return jnp.diff(pos).astype(jnp.float32)

    for name, fn in [("compare", compare), ("dot_bf16", dot_bf16),
                     ("dot_chunk", dot_chunk), ("sort16m", sort16m)]:
        ms, out = timeit(name, fn, ids)
        if out is not None:
            ok = np.array_equal(np.asarray(out).astype(np.int64), want)
            print(f"  exact: {ok}", file=sys.stderr)


if __name__ == "__main__":
    main()
