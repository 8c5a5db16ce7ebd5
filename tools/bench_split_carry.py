"""Scan loop-carry experiment (round-4 lead, round-5 test): the inner
50-step scan carries the FULL MDState — including the neighbor-list
leaves the step never writes between refines (nbr2_idx is (N, 24)
int32 = 3.8 MB at cs1 scale, plus nbr_idx / nbrow_idx / orow_idx /
nbr_ref / pos0 / photons-adjacent state).  The round-4 profile blamed
~30 us/step on scan carry copies (copy.159/164).  This times
base_refine(50) three ways:

  full_carry    the production form (scan over the whole MDState)
  split_carry   scan only the leaves the step writes; close over the
                static ones (lists, nbr_ref, pos0)
  full_again    drift check

Run: env PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
     python tools/bench_split_carry.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=12, steps=None):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    per = f"  ({ms / steps * 1e3:.1f} us/step)" if steps else ""
    print(f"{name}: {ms:.3f} ms/call{per}", file=sys.stderr)
    return ms


# MDState fields the step WRITES when nbr_auto_rebuild=False on a
# non-reactive neighbor-engine deck (everything else is constant
# between refines)
STATIC_FIELDS = ("nbr_idx", "nbr2_idx", "nbrow_idx", "orow_idx",
                 "nbr_ref", "pos0", "types", "parents", "nbonds",
                 "spec_number", "bond_at1", "bond_at2", "bond_type",
                 "bond_start", "ang_central", "ang_lig1", "ang_lig2",
                 "ang_type")


def main():
    import dataclasses
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import (make_multi_step, make_step,
                                          refine_neighbors_state)

    sysd = load_deck_dir("/root/reference/case study 1", dtype="f32")
    cfg, state, ff, aux = (sysd["cfg"], sysd["state"], sysd["ff"],
                           sysd["aux"])

    base = make_multi_step(cfg, aux, donate=False)
    state = jax.block_until_ready(base(state, ff, 1))
    step1 = make_step(cfg, aux, nbr_auto_rebuild=False)

    fields = [f.name for f in dataclasses.fields(state)]
    static = [f for f in STATIC_FIELDS if f in fields
              and getattr(state, f, None) is not None]
    print(f"static leaves: {static}", file=sys.stderr)

    def full(s, n=50):
        s = refine_neighbors_state(cfg, s)

        def inner(s_, _):
            return step1(s_, ff), None
        s, _ = jax.lax.scan(inner, s, None, length=n)
        return s
    f_full = jax.jit(full)
    timeit("full_carry", f_full, state, steps=50)

    def split(s, n=50):
        s = refine_neighbors_state(cfg, s)
        frozen = {k: getattr(s, k) for k in static}

        def inner(dyn, _):
            s_ = dyn.replace(**frozen)
            s2 = step1(s_, ff)
            # drop the static leaves from the carry (replace with the
            # frozen versions is free at trace level; carrying zeros
            # would change shapes, so carry the dynamic subset as dict)
            d2 = {k: getattr(s2, k) for k in fields if k not in static}
            return dyn.replace(**d2), None
        dyn0 = s
        out, _ = jax.lax.scan(inner, dyn0, None, length=n)
        return out

    # NOTE: the simple version above still carries the full pytree.
    # The real split: carry a dict of ONLY dynamic leaves.
    def split2(s, n=50):
        s = refine_neighbors_state(cfg, s)
        frozen = {k: getattr(s, k) for k in static}
        dyn_keys = [k for k in fields if k not in static
                    and getattr(s, k, None) is not None]
        dyn0 = {k: getattr(s, k) for k in dyn_keys}
        template = s

        def inner(dyn, _):
            s_ = template.replace(**frozen, **dyn)
            s2 = step1(s_, ff)
            return {k: getattr(s2, k) for k in dyn_keys}, None
        dyn, _ = jax.lax.scan(inner, dyn0, None, length=n)
        return template.replace(**frozen, **dyn)
    f_split = jax.jit(split2)
    out_a = jax.block_until_ready(f_full(state))
    out_b = jax.block_until_ready(f_split(state))
    same = np.array_equal(np.asarray(out_a.pos), np.asarray(out_b.pos))
    print(f"split2 trajectory identical: {same}", file=sys.stderr)
    timeit("split_carry", f_split, state, steps=50)
    timeit("full_again", f_full, state, steps=50)


if __name__ == "__main__":
    main()
