"""Core data model: static config, force-field tables, simulation state."""

from .config import SimConfig
from .ffield import ForceField
from .state import MDState, Energies

__all__ = ["SimConfig", "ForceField", "MDState", "Energies"]
