#!/usr/bin/env python
"""Measure the row-walk's (N,3) layout tax on TPU (round-4 item 2).

The profiled cs1 inner loop spends ~55-65 us/step transposing and
zero-initializing ROW-MAJOR (40000,3) buffers around a 1280-row walk:
{1,0:T(8,128)} pads the 3-wide minor dim to 128 lanes (20.5 MB
physical for 480 KB of data), so the pos pad + gather operand copy and
the frc scatter target + transpose-back move ~60 MB/step for ~60 KB of
useful traffic (HLO: copy.159/164, pad.20, slice.327, fusion.60's
init).

This harness times a scan mimicking the step's structure (elementwise
integrator ops on compact {0,1} carries + the row walk) for each
gather x scatter strategy:

  gather:  aos_pad  concat sentinel row, AoS row gather  (current)
           aos_clip clip ids, AoS row gather, no pad row
           flat     reshape(-1) + 3-wide window gather from 1D
           soa      three per-component 1D gathers
  scatter: aos_pad  zeros(N+1,3).at[rows].add  (current)
           flat     zeros(3N+3,).at[flat_ids].add + reshape
           soa      three zeros(N+1,).at[rows].add + stack

Run: timeout 3000 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/bench_layout.py
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

N, R, K, STEPS = 40000, 1280, 4, 50


def make_fn(gather, scatter):
    def body(carry, _):
        pos, vel, frc = carry
        # integrator-like elementwise ops (keep carry layouts honest)
        vel = vel + 0.01 * frc
        pos = pos + 0.001 * vel
        pos = pos - jnp.floor(pos / 100.0) * 100.0

        if gather == "aos_pad":
            pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)])
            g = pos_p[CAND]                       # (R, K, 3)
            pi = pos_p[ROWS]
        elif gather == "aos_clip":
            cc = jnp.minimum(CAND, N - 1)
            g = pos[cc]
            pi = pos[jnp.minimum(ROWS, N - 1)]
        elif gather == "flat":
            pf = jnp.reshape(pos, (-1,))
            base = jnp.minimum(CAND, N - 1) * 3
            g = pf[base[:, :, None] + jnp.arange(3)]
            bi = jnp.minimum(ROWS, N - 1) * 3
            pi = pf[bi[:, None] + jnp.arange(3)]
        elif gather == "soa":
            cc = jnp.minimum(CAND, N - 1)
            rr = jnp.minimum(ROWS, N - 1)
            g = jnp.stack([pos[:, c][cc] for c in range(3)], axis=-1)
            pi = jnp.stack([pos[:, c][rr] for c in range(3)], axis=-1)

        delta = pi[:, None, :] - g
        r2 = jnp.sum(delta * delta, axis=-1)
        m = (CAND < N) & (r2 < 25.0)
        f = jnp.where(m, 1.0 / (r2 + 1.0), 0.0)
        frow = jnp.sum(f[:, :, None] * delta, axis=1)   # (R, 3)

        kw = dict(unique_indices=True, indices_are_sorted=True)
        if scatter == "aos_pad":
            frc = jnp.zeros((N + 1, 3), pos.dtype) \
                .at[ROWS].add(frow, **kw)[:N]
        elif scatter == "flat":
            ids = (ROWS[:, None] * 3 + jnp.arange(3)).reshape(-1)
            frc = jnp.zeros((3 * N + 3,), pos.dtype) \
                .at[ids].add(frow.reshape(-1), **kw)[:3 * N] \
                .reshape(N, 3)
        elif scatter == "soa":
            cols = [jnp.zeros((N + 1,), pos.dtype)
                    .at[ROWS].add(frow[:, c], **kw)[:N]
                    for c in range(3)]
            frc = jnp.stack(cols, axis=-1)

        vel = vel + 0.01 * frc
        eng = jnp.sum(vel * vel)                 # reduce (layout pull)
        vel = vel * (1.0 - 1e-9 * eng)           # keep eng live
        return (pos, vel, frc), None

    @jax.jit
    def run(carry):
        return jax.lax.scan(body, carry, None, length=STEPS)[0]

    return run


def main():
    global ROWS, CAND
    rng = np.random.default_rng(2)
    rows = np.sort(rng.choice(N, R, replace=False)).astype(np.int32)
    cand = rng.integers(0, N, (R, K)).astype(np.int32)
    cand[rng.random((R, K)) < 0.3] = N           # sentinels
    ROWS = jnp.asarray(rows)
    CAND = jnp.asarray(cand)

    pos0 = jnp.asarray(rng.uniform(0, 100, (N, 3)).astype(np.float32))
    vel0 = jnp.asarray(rng.normal(0, 0.1, (N, 3)).astype(np.float32))
    frc0 = jnp.asarray(np.zeros((N, 3), np.float32))

    results = {}
    for gather in ("aos_pad", "aos_clip", "flat", "soa"):
        for scatter in ("aos_pad", "flat", "soa"):
            fn = make_fn(gather, scatter)
            c = fn((pos0, vel0, frc0))           # compile + warm
            np.asarray(c[0][0, 0])
            t0 = time.time()
            for _ in range(20):
                c = fn(c)
            np.asarray(c[0][0, 0])               # one hard sync
            dt = (time.time() - t0) / 20 / STEPS
            results[(gather, scatter)] = dt
            print(f"gather={gather:8s} scatter={scatter:8s} "
                  f"{dt * 1e6:8.2f} us/step", flush=True)

    best = min(results, key=results.get)
    print(f"best: {best} at {results[best] * 1e6:.2f} us/step "
          f"(current aos_pad/aos_pad "
          f"{results[('aos_pad', 'aos_pad')] * 1e6:.2f})")


if __name__ == "__main__":
    main()
