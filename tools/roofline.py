"""Roofline / utilization accounting for the headline decks (VERDICT r4
item 4): turn "5.4x the provisional bar" into an absolute statement of
how much of the chip the step actually uses, and where the ceiling is.

For each deck this compiles the SAME scan-mode program bench.py times
(make_multi_step over a chunk of steps) and pulls XLA's own
cost_analysis (flops, bytes accessed) off the compiled executable, then
scores the measured per-step time against the TPU v5e single-chip
peaks:

    HBM bandwidth   819 GB/s
    MXU             197 TFLOP/s bf16 / ~98 TFLOP/s f32
    (public v5e specs; the axon device reports "TPU v5 lite")

Output: one table row per deck with flops/step, HBM bytes/step, the
bandwidth floor bytes/819GBps, the compute floor flops/peak, and the
measured ms/step — the gap between measured and max(floors) is
dispatch/launch/latency overhead (the known ~50-fusion step structure),
i.e. the part more fusion would recover.

Run: env PYTHONPATH=/root/repo:/root/.axon_site timeout 3500 \
     python tools/roofline.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax

V5E_HBM_GBPS = 819.0
V5E_F32_TFLOPS = 98.0

DECKS = [
    ("cs1", "/root/reference/case study 1", 2000),
    ("cs2", "/root/reference/case study 2", 2000),
]


def main():
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import make_multi_step

    rows = []
    for name, deck, chunk in DECKS:
        sysd = load_deck_dir(deck, dtype="f32")
        cfg, state, ff, aux = (sysd["cfg"], sysd["state"], sysd["ff"],
                               sysd["aux"])
        base = make_multi_step(cfg, aux, jit=False)
        fn = jax.jit(base, static_argnums=2)
        lowered = fn.lower(state, ff, chunk)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
        except Exception as e:
            print(f"{name}: cost_analysis failed: {e}", file=sys.stderr)
            ca = {}
        flops = float(ca.get("flops", float("nan")))
        bytes_acc = float(ca.get("bytes accessed", float("nan")))
        # warm + measure (best of 3 windows, value-chained)
        out = jax.block_until_ready(fn(state, ff, chunk))
        best = float("inf")
        s = out
        for _ in range(3):
            t0 = time.time()
            s = fn(s, ff, chunk)
            jax.block_until_ready(s.pos)
            best = min(best, time.time() - t0)
        ms_step = best / chunk * 1e3
        f_step = flops / chunk
        b_step = bytes_acc / chunk
        bw_floor_ms = b_step / (V5E_HBM_GBPS * 1e9) * 1e3
        fl_floor_ms = f_step / (V5E_F32_TFLOPS * 1e12) * 1e3
        rows.append(dict(deck=name, n_at=cfg.n_at, ms_step=ms_step,
                         flops_step=f_step, bytes_step=b_step,
                         bw_floor_ms=bw_floor_ms,
                         fl_floor_ms=fl_floor_ms))
        print(f"{name}: N={cfg.n_at} measured {ms_step*1e3:.1f} us/step | "
              f"{f_step/1e6:.1f} MFLOP/step ({fl_floor_ms*1e3:.2f} us at "
              f"{V5E_F32_TFLOPS:.0f} TF/s = "
              f"{fl_floor_ms/ms_step*100:.1f}% MXU) | "
              f"{b_step/1e6:.2f} MB/step ({bw_floor_ms*1e3:.2f} us at "
              f"{V5E_HBM_GBPS:.0f} GB/s = "
              f"{bw_floor_ms/ms_step*100:.1f}% HBM BW)", file=sys.stderr)
        hw_floor = max(bw_floor_ms, fl_floor_ms)
        print(f"{name}: hardware floor {hw_floor*1e3:.1f} us/step -> "
              f"{(ms_step-hw_floor)/ms_step*100:.0f}% of the step is "
              f"dispatch/launch/latency overhead", file=sys.stderr)

    import json
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
