"""aztotmd_tpu — a TPU-native molecular-dynamics engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``raadyn/aztotmd`` CUDA engine: non-constant force fields (reactive bonds,
valence angles, electron hopping, radiative thermostat, radius-dependent
pair potentials), short-range pair potentials, Ewald/Fennel electrostatics,
cell-list pair search and a buffered statistics/RDF/trajectory output
system — built as pure-functional state + one jitted step, scaled over
device meshes with ``shard_map`` instead of CUDA blocks.
"""

__version__ = "0.1.0"


def load(deck_dir, **kw):
    """Load a reference deck directory; returns the system dict
    (cfg/ff/state/aux/ctl/fld/...)."""
    from .runtime.setup import load_deck_dir
    return load_deck_dir(deck_dir, **kw)


def run(deck_dir, out_dir=".", **kw):
    """Load and run a deck to completion (convenience wrapper around
    ``aztotmd_tpu.runtime.runner.run_deck``)."""
    from .runtime.runner import run_deck
    return run_deck(deck_dir, out_dir=out_dir, **kw)
