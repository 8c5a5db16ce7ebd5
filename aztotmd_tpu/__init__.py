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


def _enable_compile_cache():
    """Point JAX at a persistent compilation cache.

    TPU compiles here are remote and slow (15 s - minutes per program);
    the persistent cache makes every program after the first process
    launch load in ~0.1-1 s (measured 25 s -> 0.2 s for a 4M-element
    sort).  Opt out with AZTOTMD_NO_COMPILE_CACHE=1 or override the
    location with AZTOTMD_COMPILE_CACHE=<dir>.
    """
    import os
    if os.environ.get("AZTOTMD_NO_COMPILE_CACHE"):
        return
    # TPU-backed processes only: CPU executables served from the cache
    # may have been compiled by the remote compile service on a machine
    # with different CPU features (SIGILL risk, and it broke a CPU test
    # with an AOT feature-mismatch); CPU compiles are fast anyway.
    if os.environ.get("JAX_PLATFORMS", "").lower() in ("cpu", ""):
        return
    path = os.environ.get(
        "AZTOTMD_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "aztotmd_tpu",
                     "xla"))
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception:        # cache is an optimization, never fatal
        pass


_enable_compile_cache()


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
