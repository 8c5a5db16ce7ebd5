"""On-device stat ring: sample rows accumulated inside the jitted chunk.

The reference's most engineered subsystem is its buffered stat stream —
a device ring buffer filled by `write_stat` every `dstep` steps and
flushed to the host once per `nstep` samples (cuStat.cu:17-71 write_stat,
:387-404 stat_iter).  The TPU-native equivalent: the scanned multi-step
chunk advances one stat period per scan iteration and emits the full
sample row (floats + ints) as the scan's stacked output, so one host
round-trip fetches dozens of samples.  On the ~100 ms axon tunnel this
is the difference between ~135 and ~700 steps/s end-to-end.

Row layout is fixed per run (all shapes static): a float row with the
energies / momenta / pressure / per-species displacement-MSD / bond
means, and an int row with the step counter, species counts, crossing
counters, jump counters, and the overflow monitors.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_layout(n_spec: int, n_bt: int):
    """Column slices for the float and int sample rows."""
    fsl, off = {}, 0
    for name, w in [("eng", 8), ("pos_mom", 3), ("neg_mom", 3),
                    ("press", 1), ("x1", 1), ("msd", n_spec),
                    ("bt_r", n_bt), ("bt_lt", n_bt)]:
        fsl[name] = slice(off, off + w)
        off += w
    nf = off
    isl, off = {}, 0
    for name, w in [("step", 1), ("spec", n_spec), ("cpos", 3 * n_spec),
                    ("cneg", 3 * n_spec), ("nbond", 1), ("njump", 1),
                    ("jpos", 1), ("jneg", 1), ("over", 7), ("btc", n_bt)]:
        isl[name] = slice(off, off + w)
        off += w
    return fsl, nf, isl, off


# float-row "eng" column order (matches StatWriter's expectations)
ENG_KEYS = ("tot", "kin", "vdw", "coul1", "coul2", "bond", "angle", "temp")


def make_stat_row(cfg, spec_counts0):
    """Build stat_row(state) -> (frow float32, irow int32).

    spec_counts0: initial per-species atom counts (the displacement-MSD
    denominators are bound at t=0, matching MsdDisplWriter / the serial
    build's out_msd, out_md.cpp:89-124).
    """
    counts = jnp.asarray(np.maximum(np.asarray(spec_counts0), 1),
                         jnp.float32)
    sp_ids = jnp.asarray(np.arange(cfg.n_spec, dtype=np.int32))

    def stat_row(state):
        E = state.energies
        dt = state.pos.dtype
        # per-species mean |r(t)-r(0)|^2, minimum image — a one-hot
        # matmul, not a scatter (tiny-output scatters are slow on TPU)
        d = state.pos - state.pos0
        box = jnp.asarray(cfg.box, dt)
        d = d - box * jnp.round(d / box)
        r2 = jnp.sum(d * d, axis=1)
        oh = (state.types[:, None] == sp_ids[None, :]).astype(dt)
        msd = (r2[None, :] @ oh)[0].astype(jnp.float32) / counts

        frow = jnp.concatenate([
            jnp.stack([getattr(E, k).astype(jnp.float32)
                       for k in ENG_KEYS]),
            state.pos_mom.astype(jnp.float32),
            state.neg_mom.astype(jnp.float32),
            state.pressure.astype(jnp.float32)[None],
            state.pos[0, 0].astype(jnp.float32)[None],
            msd,
            state.bt_r_mean.astype(jnp.float32),
            state.bt_lt_mean.astype(jnp.float32),
        ])
        irow = jnp.concatenate([
            state.step[None],
            state.spec_number,
            state.cross_pos.reshape(-1),
            state.cross_neg.reshape(-1),
            state.n_bond[None], state.n_jump[None],
            state.jump_pos[None], state.jump_neg[None],
            # ALL monitors ride the row: reading any of them as a bare
            # int(state.x) in the flush path costs a blocking ~100-400
            # ms d2h round trip over the axon tunnel (three of them per
            # flush measured ~1-3 s of a 33 s cs1 production loop)
            jnp.stack([state.cell_overflow, state.nbr_over,
                       state.nbr_viol, state.nbrow_over,
                       state.nbr2_over, state.rdf_over,
                       state.orow_over]),
            state.bt_count,
        ]).astype(jnp.int32)
        return frow, irow

    return stat_row
