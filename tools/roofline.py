"""Roofline / utilization accounting for the headline decks (VERDICT r4
item 4): turn "5.4x the provisional bar" into an absolute statement of
how much of the chip the step actually uses, and where the ceiling is.

v2 notes (why not just cost_analysis on the bench scan program):
* XLA's HloCostAnalysis does NOT reliably multiply `while`-loop bodies
  by trip count on this backend, and it counts Pallas kernels (custom
  calls) as ZERO flops / ~zero bytes.  The v1 numbers for cs2 (0.02
  MB/step) were artifacts of both.
* So v2 compiles each constituent program SEPARATELY — the inner step
  (no scan, no cond), the every-R refine, the every-Q*R full rebuild —
  pulls cost_analysis off each, and amortizes by the known cadence.
  The measured time still comes from the real scan-mode chunk (the
  program bench.py times).
* The Pallas dense pair kernel (cs2) gets an ANALYTIC account:
  slot-pairs = n_pad^2 (pallas_pair.pair_cost), ~50 f32 ops per
  slot-pair through _tile_physics (dx/dy/dz + PBC wrap + r2 + rsqrt +
  LJ 6-12 + Fennel real-space + force accumulation), HBM bytes =
  2 * n_tiles^2 * T * 16 B (i-column + j-row block loads; outputs are
  O(N)).  It is VPU work, not MXU, so it is also scored against the
  MEASURED VPU elementwise ceiling of this chip (~0.9e12 f32
  lane-ops/s, from the compare-histogram floor: 7.1 ms for 400 x 16M
  element compares, BASELINE.md round-5).

Peaks used:
    HBM bandwidth   819 GB/s      (public v5e spec)
    f32 peak        ~98 TFLOP/s   (MXU; irrelevant for this VPU code,
                                   shown for scale)
    VPU measured    ~0.9 T f32 lane-ops/s on THIS chip via the tunnel

Run: env PYTHONPATH=/root/repo:/root/.axon_site timeout 3500 \
     /opt/venv/bin/python tools/roofline.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

V5E_HBM_GBPS = 819.0
V5E_F32_TFLOPS = 98.0
VPU_MEAS_TOPS = 0.9          # measured on this chip (histogram floor)
PALLAS_FLOP_PER_PAIR = 50.0  # documented estimate (see module docstring)

DECKS = [
    ("cs1", "/root/reference/case study 1", 2000),
    ("cs2", "/root/reference/case study 2", 2000),
]


def cost_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"cost_analysis failed: {e}", file=sys.stderr)
        return float("nan"), float("nan")


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import (make_multi_step, make_step,
                                          rebuild_neighbors_state,
                                          refine_neighbors_state)

    rows = []
    for name, deck, chunk in DECKS:
        sysd = load_deck_dir(deck, dtype="f32")
        cfg, state, ff, aux = (sysd["cfg"], sysd["state"], sysd["ff"],
                               sysd["aux"])

        # --- measured per-step time: the real bench scan program ---
        fn = jax.jit(make_multi_step(cfg, aux, jit=False),
                     static_argnums=2)
        s = jax.block_until_ready(fn(state, ff, chunk))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            s = fn(s, ff, chunk)
            jax.block_until_ready(s.pos)
            best = min(best, time.time() - t0)
        ms_step = best / chunk * 1e3

        # --- cost side: amortized sum of the constituent programs ---
        parts = []   # (label, weight per step, flops, bytes)
        if cfg.pair_engine == "neighbor":
            step1 = jax.jit(make_step(cfg, aux, nbr_auto_rebuild=False))
            ref = jax.jit(lambda st: refine_neighbors_state(cfg, st))
            reb = jax.jit(lambda st: rebuild_neighbors_state(cfg, st))
            R = max(int(cfg.nb_rebuild), 1)
            Q = max(int(cfg.nb_outer), 1)
            for label, f, lower_args, w in [
                    ("step", step1, (state, ff), 1.0),
                    ("refine", ref, (state,), 1.0 / R),
                    ("rebuild", reb, (state,), 1.0 / (Q * R))]:
                fl, by = cost_of(f.lower(*lower_args).compile())
                parts.append((label, w, fl, by))
        else:
            step1 = jax.jit(make_step(cfg, aux))
            fl, by = cost_of(step1.lower(state, ff).compile())
            parts.append(("step(xla)", 1.0, fl, by))
            if cfg.pair_engine == "pallas":
                from aztotmd_tpu.ops import pallas_pair as pp
                T = min(512, pp._round_up_int(cfg.n_at, 128))
                n_pad = pp._round_up_int(cfg.n_at, T)
                n_t = n_pad // T
                pfl = n_pad * n_pad * PALLAS_FLOP_PER_PAIR
                pby = 2.0 * n_t * n_t * T * 16.0
                parts.append(("pallas-pair(analytic)", 1.0, pfl, pby))

        f_step = sum(w * fl for _, w, fl, _ in parts)
        b_step = sum(w * by for _, w, _, by in parts)
        for label, w, fl, by in parts:
            print(f"  {name}/{label}: x{w:.5f}/step  "
                  f"{fl/1e6:.2f} MFLOP  {by/1e6:.2f} MB", file=sys.stderr)

        bw_floor_ms = b_step / (V5E_HBM_GBPS * 1e9) * 1e3
        vpu_floor_ms = f_step / (VPU_MEAS_TOPS * 1e12) * 1e3
        rows.append(dict(deck=name, n_at=cfg.n_at, ms_step=ms_step,
                         flops_step=f_step, bytes_step=b_step,
                         bw_floor_ms=bw_floor_ms,
                         vpu_floor_ms=vpu_floor_ms))
        print(f"{name}: N={cfg.n_at} measured {ms_step*1e3:.1f} us/step | "
              f"{f_step/1e6:.1f} MFLOP/step "
              f"({vpu_floor_ms*1e3:.1f} us at the measured "
              f"{VPU_MEAS_TOPS:.1f} T-op/s VPU rate = "
              f"{vpu_floor_ms/ms_step*100:.1f}%) | "
              f"{b_step/1e6:.2f} MB/step ({bw_floor_ms*1e3:.2f} us at "
              f"{V5E_HBM_GBPS:.0f} GB/s = "
              f"{bw_floor_ms/ms_step*100:.1f}% HBM BW)", file=sys.stderr)
        hw_floor = max(bw_floor_ms, vpu_floor_ms)
        print(f"{name}: hardware floor {hw_floor*1e3:.1f} us/step -> "
              f"{(ms_step-hw_floor)/ms_step*100:.0f}% of the step is "
              f"dispatch/launch/latency + unmodeled overhead",
              file=sys.stderr)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
