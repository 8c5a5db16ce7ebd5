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
