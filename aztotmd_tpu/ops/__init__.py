"""Compute ops: pair potentials, electrostatics, cell list, integrator,
bonded forces, thermostats — the XLA/Pallas replacements for the
reference's CUDA kernels."""
