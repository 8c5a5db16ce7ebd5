"""The bundled example decks parse, build, and take steps."""

import os

import jax
import numpy as np
import pytest

EX = os.path.join(os.path.dirname(__file__), "..", "examples")

DECKS = ["molten_salt", "bonded_fluid", "ejump_redox",
         "reactive_polymer", "nanoclusters"]


def test_nanoclusters_selects_sparse_engine():
    """The multi-cluster deck must auto-route to the Morton block-sparse
    engine with a sized worklist capacity (ops/pallas_sparse.py)."""
    from aztotmd_tpu.runtime.setup import load_deck_dir
    s = load_deck_dir(os.path.join(EX, "nanoclusters"), dtype="f32")
    assert s["cfg"].pair_engine == "sparse"
    assert 0 < s["cfg"].sparse_pair_cap <= 2209


@pytest.mark.parametrize("deck", DECKS)
def test_example_deck_runs(deck):
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import make_multi_step
    s = load_deck_dir(os.path.join(EX, deck), dtype="f32")
    multi = make_multi_step(s["cfg"], s["aux"])
    st = multi(s["state"], s["ff"], 3)
    assert bool(np.all(np.isfinite(np.asarray(st.pos))))
    assert np.isfinite(float(st.energies.tot))


def test_reactive_polymer_forms_bonds():
    """The reactive example actually polymerizes: bonds appear within
    a few hundred steps from an initially bond-free configuration."""
    from aztotmd_tpu.runtime.setup import load_deck_dir
    from aztotmd_tpu.runtime.step import make_multi_step
    s = load_deck_dir(os.path.join(EX, "reactive_polymer"), dtype="f32")
    assert s["cfg"].use_bnd == 2 and int(s["state"].n_bond) == 0
    multi = make_multi_step(s["cfg"], s["aux"])
    st = multi(s["state"], s["ff"], 300)
    assert int(st.n_bond) > 0
    assert bool(np.all(np.isfinite(np.asarray(st.pos))))
