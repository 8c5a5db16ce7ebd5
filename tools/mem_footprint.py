#!/usr/bin/env python
"""Report device-memory footprint for a deck: state/forcefield bytes
plus the TPU allocator's live/peak counters after one warm ring
dispatch (the production program, so rebuild transients are included).

    PYTHONPATH=.:/root/.axon_site python tools/mem_footprint.py <deck>

The reference engine is hard-capped by one GPU's memory (all arrays
sized at init, cuInit.cu); this tool documents the headroom story at
10-25x the reference deck size on one TPU chip.
"""
import sys
import tempfile

import numpy as np
import jax


def main():
    deck = sys.argv[1]
    from aztotmd_tpu.runtime.runner import MDRunner
    from aztotmd_tpu.runtime.setup import load_deck_dir

    r = MDRunner(load_deck_dir(deck, dtype="f32"),
                 out_dir=tempfile.mkdtemp(), quiet=True)
    state_b = sum(v.nbytes for v in jax.tree_util.tree_leaves(r.state))
    ff_b = sum(v.nbytes for v in jax.tree_util.tree_leaves(r.ff))
    print(f"N={r.cfg.n_at}  state={state_b / 1e6:.1f} MB  "
          f"ff={ff_b / 1e6:.1f} MB", flush=True)

    # one warm dispatch of the production ring program (proves it runs)
    out = r._ring_fn(r.state, r.hist, r.nhist, r.ff, 1)
    r.state, r.hist, r.nhist = out[0], out[1], out[2]
    np.asarray(r.state.nbr_over)

    # the axon backend exposes no runtime allocator stats
    # (memory_stats() is empty), so report the compiled executable's
    # own memory analysis: args + outputs + temporaries is the peak
    # HBM the ring program needs (the rebuild transients live in
    # temp_size).
    ma = (r._ring_fn.lower(r.state, r.hist, r.nhist, r.ff, 1)
          .compile().memory_analysis())
    if ma is not None:
        arg, out_b, tmp, code = (ma.argument_size_in_bytes,
                                 ma.output_size_in_bytes,
                                 ma.temp_size_in_bytes,
                                 ma.generated_code_size_in_bytes)
        alias = getattr(ma, "alias_size_in_bytes", 0)
        print(f"ring program HBM: args={arg / 1e6:.1f} MB "
              f"out={out_b / 1e6:.1f} MB (aliased {alias / 1e6:.1f}) "
              f"temps={tmp / 1e6:.1f} MB code={code / 1e6:.1f} MB "
              f"peak~={(arg + out_b - alias + tmp) / 1e9:.3f} GB",
              flush=True)


if __name__ == "__main__":
    main()
