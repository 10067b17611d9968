"""Analysis: PDB writers, structural metrics."""
