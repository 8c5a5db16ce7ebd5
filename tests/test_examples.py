"""The bundled example decks parse, build, and take steps."""

import os

import jax
import numpy as np
import pytest

EX = os.path.join(os.path.dirname(__file__), "..", "examples")

DECKS = ["molten_salt", "bonded_fluid", "ejump_redox"]


@pytest.mark.parametrize("deck", DECKS)
def test_example_deck_runs(deck):
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import make_multi_step
    s = load_deck_dir(os.path.join(EX, deck), dtype="f32")
    multi = make_multi_step(s["cfg"], s["aux"])
    st = multi(s["state"], s["ff"], 3)
    assert bool(np.all(np.isfinite(np.asarray(st.pos))))
    assert np.isfinite(float(st.energies.tot))
