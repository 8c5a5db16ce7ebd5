"""Output / observability layer (reference layer L7).

Buffered statistics, RDF, trajectories, coordination numbers, restart
files — file formats byte-compatible with the reference's writers
(src/cuStat.cu, src/out_md.cpp, src/main.cu:51-118) so existing analysis
tooling keeps working.
"""

from .writers import (StatWriter, BondStatWriter, MsdWriter, JumpWriter,
                      TrajWriter, BindTrajWriter, HistWriter, VafWriter,
                      MsdDisplWriter, write_rdf_file, write_atoms_xyz,
                      write_velocities, write_thermal_chars,
                      write_bondlist, write_anglelist, write_cn, write_ncn,
                      write_bond_lengths)

__all__ = [
    "StatWriter", "BondStatWriter", "MsdWriter", "JumpWriter", "TrajWriter",
    "BindTrajWriter", "HistWriter", "VafWriter", "MsdDisplWriter",
    "write_rdf_file", "write_atoms_xyz", "write_velocities",
    "write_thermal_chars", "write_bondlist", "write_anglelist",
    "write_cn", "write_ncn", "write_bond_lengths",
]
