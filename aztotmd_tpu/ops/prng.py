"""Counter-based per-atom random bits.

The radiative thermostat needs per-atom noise that is a pure function of
(seed, step, atom id): with that property the same atom gets the same
kick no matter which device owns it or where it sits in a slot array, so
the slab-decomposed step (parallel/slab.py) reproduces the single-device
trajectory exactly.  This mirrors the reference's per-thread xorshift128
streams (cuUtils.cu:89-105) — independent per-atom streams of moderate
statistical quality, which is the right contract for thermostat noise.

The mixer is the murmur3/splitmix 32-bit finalizer (full avalanche);
two decorrelated words per (seed, step, gid) give four 16-bit uniforms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# np scalars, NOT jnp: module-level eager jnp constants are created on
# whatever backend is active at import time and get baked into traces
_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_GOLD = np.uint32(0x9E3779B9)


def _mix32(x):
    """murmur3 fmix32: bijective full-avalanche 32-bit mixer."""
    x = x ^ (x >> 16)
    x = x * _C1
    x = x ^ (x >> 13)
    x = x * _C2
    return x ^ (x >> 16)


def counter_bits2(seed, step, gid):
    """Two decorrelated uint32 words per element of ``gid``.

    seed: uint32 scalar; step: int32/uint32 scalar; gid: (n,) int32.
    """
    seed = jnp.asarray(seed).astype(jnp.uint32)
    step = jnp.asarray(step).astype(jnp.uint32)
    s = _mix32(seed ^ (step * _GOLD))
    h = _mix32(gid.astype(jnp.uint32) * _C2 + s)
    w0 = _mix32(h ^ _GOLD)
    w1 = _mix32(h + _C1)
    return w0, w1


def uniform4_16(seed, step, gid, dtype):
    """(n, 4) uniforms in [0, 1) with 16-bit resolution, keyed by
    (seed, step, gid) — four independent per-atom streams."""
    w0, w1 = counter_bits2(seed, step, gid)
    halves = [(w & jnp.uint32(0xFFFF)).astype(dtype) for w in (w0, w1)] \
        + [(w >> jnp.uint32(16)).astype(dtype) for w in (w0, w1)]
    scale = jnp.asarray(1.0 / 65536.0, dtype)
    return jnp.stack(halves, axis=-1) * scale
